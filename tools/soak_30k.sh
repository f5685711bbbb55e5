#!/bin/bash
# 30k-iteration on-chip soak: the REFERENCE's training regime
# (/root/reference/train.py:43-190 — 30k iters, densify to 15k, opacity
# resets every 3k, SH warmup every 1k) run end-to-end through OUR
# production CLIs on a synthetic COLMAP scene, with held-out views.
#
# Evidence produced (all under $OUT):
#   scene/          the generated COLMAP-layout dataset
#   model/          trained model: point_cloud/, checkpoints, cfg_args
#   model/training_log.jsonl   per-interval loss/N/pairs (the PSNR curve
#                              source) + densify/retry events
#   model/results.json         final held-out PSNR/SSIM (render+metrics)
#   summary.txt     one-paragraph digest (final PSNR, N, it/s, retries)
#
# Usage:   bash tools/soak_30k.sh [iters] [outdir]
# On-chip: env PYTHONPATH=/root/repo:/root/.axon_site \
#              JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
#              bash tools/soak_30k.sh 30000 /tmp/soak
set -euo pipefail
ITERS="${1:-30000}"
OUT="${2:-/tmp/soak}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

# SOAK_DEVICE=cpu pins every stage to CPU (smoke runs on hosts where the
# TPU plugin would otherwise be picked up — or hang on a dead tunnel)
if [ -n "${SOAK_DEVICE:-}" ]; then
  export GSPLAT_PLATFORM="$SOAK_DEVICE"
  GEN_DEV=(--device "$SOAK_DEVICE")
else
  GEN_DEV=()
fi

mkdir -p "$OUT"
# scene size overridable for CPU smoke runs (SOAK_W=160 SOAK_H=120 ...)
if [ ! -f "$OUT/scene/soak/sparse/0/cameras.bin" ]; then
  echo "=== generating synthetic COLMAP scene ==="
  python tools/make_synthetic_scene.py --out "$OUT/scene" --scene soak \
      --n_gaussians "${SOAK_N:-12000}" --n_cams "${SOAK_CAMS:-24}" \
      --width "${SOAK_W:-512}" --height "${SOAK_H:-384}" --seed 7 \
      "${GEN_DEV[@]}"
fi

echo "=== training $ITERS iters (full production loop) ==="
T0=$(date +%s)
python train.py -s "$OUT/scene/soak" -m "$OUT/model" \
    --iterations "$ITERS" --eval --quiet \
    --test_iterations 1000 7000 15000 22000 30000 \
    --save_iterations 7000 30000 "$ITERS" 2>&1 | tee "$OUT/train_stdout.log"
T1=$(date +%s)
echo "train wall: $((T1 - T0)) s  ($(python -c "print(f'{$ITERS/($T1-$T0):.1f}')") it/s incl. compile)"

echo "=== render + metrics on held-out views ==="
python render.py -m "$OUT/model" --skip_train
python metrics.py -m "$OUT/model"

python - "$OUT" "$ITERS" $((T1 - T0)) <<'EOF'
import json, sys, os
out, iters, wall = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
res = json.load(open(os.path.join(out, "model", "results.json")))
log = [json.loads(l) for l in open(os.path.join(out, "model",
                                                "training_log.jsonl"))]
stdout_log = open(os.path.join(out, "train_stdout.log")).read()
retries = sum(stdout_log.count(s)
              for s in ("growing", "shrinking", "overflow", "retry"))
ns = [e["total_points"] for e in log if "total_points" in e]
lines = [
    f"soak: {iters} iters in {wall}s ({iters/max(wall,1):.1f} it/s incl. "
    f"compile/eval)",
    f"final N: {ns[-1] if ns else '?'} (start {ns[0] if ns else '?'})",
    f"capacity grow/retry events: {retries}",
    f"held-out metrics: "
    + json.dumps({k: v for k, v in next(iter(res.values())).items()}),
]
open(os.path.join(out, "summary.txt"), "w").write("\n".join(lines) + "\n")
print("\n".join(lines))
EOF
echo OK
