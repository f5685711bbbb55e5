#!/usr/bin/env bash
# Round-3 on-chip measurement queue, unattended. Run the moment the TPU
# tunnel returns:
#
#   bash tools/r3_measure.sh [outdir]       # default /tmp/r3_measure
#
# Serializes every chip job (two at once contend on the single chip and
# both blow their timeouts), logs each stage, and CONTINUES on stage
# failure (a flaky tunnel shouldn't kill the whole queue — rerun the
# script; compile caches make repeats cheap). Order: correctness drives
# first, then the bench A/B, then decomposition + sweeps, then the 30k
# soak and the trained-PLY bench built on its output.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/r3_measure}"
mkdir -p "$OUT"
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
T="${TPU_CI_TIMEOUT:-1100}"

run() {  # run <logname> <cmd...>
  local log="$OUT/$1.log"; shift
  echo "=== $* → $log ==="
  if timeout "$T" "$@" > "$log" 2>&1; then echo "    ok"; else
    echo "    FAILED (exit $?) — tail:"; tail -3 "$log"; fi
}

run drive_pallas   python -u tools/drive_render.py pallas
run drive_xla      python -u tools/drive_render.py xla
run drive_train    python -u tools/drive_train.py 300
run bench_cull     python -u bench.py --row_cull
run bench_nocull   python -u bench.py
run bisect_binning python -u tools/bisect_binning.py
run sweep_16x32x256 python -u tools/sweep_tiles.py 16 32 256
run sweep_16x32x128 python -u tools/sweep_tiles.py 16 32 128
run sweep_16x64x256 python -u tools/sweep_tiles.py 16 64 256
run sweep_32x32x256 python -u tools/sweep_tiles.py 32 32 256
run sweep_16x64x128 python -u tools/sweep_tiles.py 16 64 128
run sweep_16x32x64  python -u tools/sweep_tiles.py 16 32 64

# the long tail: 30k soak (own internal timeout ~expected 30-60 min on
# chip), then the trained-PLY bench on its output
echo "=== soak_30k → $OUT/soak.log ==="
if timeout 7200 bash tools/soak_30k.sh 30000 "$OUT/soak" \
      > "$OUT/soak.log" 2>&1; then echo "    ok"; else
  echo "    FAILED (exit $?) — tail:"; tail -5 "$OUT/soak.log"; fi
PLY="$OUT/soak/model/point_cloud/iteration_30000/point_cloud.ply"
if [ -f "$PLY" ]; then
  run bench_ply python -u bench.py --ply "$PLY"
  run bench_ply_cull python -u bench.py --ply "$PLY" --row_cull
fi

echo "=== summary ==="
grep -h '"metric"\|RESULT\|vs_baseline' "$OUT"/bench_*.log "$OUT"/sweep_*.log 2>/dev/null
tail -2 "$OUT"/bisect_binning.log 2>/dev/null
