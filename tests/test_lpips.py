"""LPIPS numeric validation against a torch oracle with SHARED random
weights.

The reference computes LPIPS-VGG via lpipsPyTorch
(/root/reference/lpipsPyTorch/modules/{lpips,networks}.py, used by
metrics.py:74). Pretrained weights are not downloadable in this
environment, so the oracle here replicates the reference's exact math in
torch — z-score on the [0,1] input (networks.py:55-60), VGG16-features
forward with taps at relu{1_2,2_2,3_3,4_3,5_3} (networks.py target_layers
[4,9,16,23,30]), unit-normalized activations (utils.normalize_activation),
1x1 no-bias linear heads, spatial mean then sum (lpips.py:33-36) — with
randomly initialized conv/lin weights shared bit-for-bit with our JAX
implementation. Agreement at 1e-5 validates everything except the
downloaded weight values themselves.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/multi-device tier: full suite only

torch = pytest.importorskip("torch")

# VGG16 "D" feature config: (channels, convs per block)
_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _random_weights(rng):
    convs = []
    c_in = 3
    for c_out, reps in _CFG:
        for _ in range(reps):
            w = rng.standard_normal((c_out, c_in, 3, 3)).astype(np.float32)
            w *= np.sqrt(2.0 / (c_in * 9))
            b = 0.1 * rng.standard_normal(c_out).astype(np.float32)
            convs.append((w, b))
            c_in = c_out
    lins = [np.abs(rng.standard_normal(c).astype(np.float32)) * 0.05
            for c, _ in _CFG]
    return convs, lins


def _torch_oracle(x, y, convs, lins):
    """Reference math (lpipsPyTorch) with explicit weights."""
    import torch.nn.functional as F

    def z_score(v):
        return (v - torch.tensor(_SHIFT)[None, :, None, None]) / \
            torch.tensor(_SCALE)[None, :, None, None]

    def features(v):
        h = z_score(v)
        taps = []
        i = 0
        for b, (_, reps) in enumerate(_CFG):
            for _ in range(reps):
                w, bias = convs[i]
                h = F.relu(F.conv2d(h, torch.tensor(w), torch.tensor(bias),
                                    padding=1))
                i += 1
            # normalize_activation (lpipsPyTorch/modules/utils.py)
            nf = torch.sqrt(torch.sum(h ** 2, dim=1, keepdim=True))
            taps.append(h / (nf + 1e-10))
            if b < len(_CFG) - 1:
                h = F.max_pool2d(h, 2, 2)
        return taps

    fx, fy = features(x), features(y)
    total = torch.zeros(())
    for tx, ty, lin in zip(fx, fy, lins):
        d = (tx - ty) ** 2
        w = torch.tensor(lin)[None, :, None, None]
        total = total + torch.sum(d * w, dim=1, keepdim=True).mean((2, 3))[0, 0]
    return float(total)


def test_lpips_matches_torch_oracle(rng, tmp_path):
    convs, lins = _random_weights(rng)
    npz = {}
    for i, (w, b) in enumerate(convs):
        npz[f"conv{i}_w"] = w
        npz[f"conv{i}_b"] = b
    for j, lin in enumerate(lins):
        npz[f"lin{j}"] = lin
    path = tmp_path / "lpips_test_weights.npz"
    np.savez(path, **npz)

    x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape).astype(np.float32),
                0, 1)

    expected = _torch_oracle(torch.tensor(x), torch.tensor(y), convs, lins)

    os.environ["GSPLAT_LPIPS_WEIGHTS"] = str(path)
    try:
        from gsplat_tpu.ops.lpips import lpips_vgg
        got = float(lpips_vgg()(x, y))
    finally:
        del os.environ["GSPLAT_LPIPS_WEIGHTS"]

    assert got == pytest.approx(expected, rel=1e-5, abs=1e-6), \
        f"LPIPS mismatch: jax {got} vs torch oracle {expected}"
    # identical inputs → zero distance
    os.environ["GSPLAT_LPIPS_WEIGHTS"] = str(path)
    try:
        from gsplat_tpu.ops.lpips import lpips_vgg
        self_d = float(lpips_vgg()(x, x))
    finally:
        del os.environ["GSPLAT_LPIPS_WEIGHTS"]
    assert abs(self_d) < 1e-7


def test_metrics_cli_reports_finite_lpips_with_weights(tmp_path, rng,
                                                       monkeypatch):
    """With GSPLAT_LPIPS_WEIGHTS set, the metrics CLI computes a real LPIPS
    number (without it the schema stays intact with NaN — the offline-env
    degradation path covered by test_cli)."""
    import json
    from PIL import Image
    from gsplat_tpu.cli import metrics as metrics_cli

    convs, lins = _random_weights(rng)
    npz = {}
    for i, (w, b) in enumerate(convs):
        npz[f"conv{i}_w"] = w
        npz[f"conv{i}_b"] = b
    for j, lin in enumerate(lins):
        npz[f"lin{j}"] = lin
    wpath = tmp_path / "w.npz"
    np.savez(wpath, **npz)
    monkeypatch.setenv("GSPLAT_LPIPS_WEIGHTS", str(wpath))

    model = tmp_path / "model"
    rdir = model / "test" / "ours_7" / "renders"
    gdir = model / "test" / "ours_7" / "gt"
    rdir.mkdir(parents=True)
    gdir.mkdir(parents=True)
    for i in range(2):
        a = rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)
        b = np.clip(a + rng.integers(-20, 20, a.shape), 0, 255).astype(
            np.uint8)
        Image.fromarray(a).save(rdir / f"{i:05d}.png")
        Image.fromarray(b).save(gdir / f"{i:05d}.png")

    metrics_cli.main(["--model_paths", str(model)])
    results = json.load(open(model / "results.json"))
    lp = results["ours_7"]["LPIPS"]
    assert np.isfinite(lp) and lp > 0, f"LPIPS not computed: {lp}"


def test_weight_converter_from_torch_state_dicts(tmp_path, rng, monkeypatch):
    """tools/convert_lpips_weights.py --vgg_pth/--lin_pth: a torchvision-
    layout VGG16 state dict + a richzhang-layout calibration dict convert to
    the npz our loader consumes, and the resulting LPIPS equals computing
    with the raw arrays directly (validates the layout mapping, the part the
    shared-weights oracle test above cannot see)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_lpips_weights as conv
    from gsplat_tpu.ops import lpips as lpips_mod

    convs, lins = _random_weights(rng)
    vgg_sd = {}
    for (w, b), idx in zip(convs, conv.VGG16_CONV_IDXS):
        vgg_sd[f"features.{idx}.weight"] = torch.tensor(w)
        vgg_sd[f"features.{idx}.bias"] = torch.tensor(b)
    lin_sd = {f"lin{j}.model.1.weight":
              torch.tensor(lin.reshape(1, -1, 1, 1))
              for j, lin in enumerate(lins)}
    vgg_pth = tmp_path / "vgg16.pth"
    lin_pth = tmp_path / "lin.pth"
    torch.save(vgg_sd, vgg_pth)
    torch.save(lin_sd, lin_pth)

    out = tmp_path / "lpips_vgg.npz"
    conv.main(["--out", str(out), "--vgg_pth", str(vgg_pth),
               "--lin_pth", str(lin_pth)])

    data = np.load(out)
    assert data["conv0_w"].shape == (64, 3, 3, 3)
    assert data["conv12_w"].shape == (512, 512, 3, 3)
    assert data["lin4"].shape == (512,)
    np.testing.assert_array_equal(data["conv3_w"], convs[3][0])
    np.testing.assert_array_equal(data["lin2"], lins[2])

    # end-to-end: the converted file drives lpips_vgg()
    monkeypatch.setenv("GSPLAT_LPIPS_WEIGHTS", str(out))
    fn = lpips_mod.lpips_vgg()
    x = rng.uniform(0, 1, (1, 3, 48, 64)).astype(np.float32)
    y = rng.uniform(0, 1, (1, 3, 48, 64)).astype(np.float32)
    v = float(fn(x, y))
    assert np.isfinite(v) and v > 0
