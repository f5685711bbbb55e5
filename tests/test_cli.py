"""End-to-end CLI test: synthesize a tiny COLMAP scene on disk, then run the
full user path train.py → render.py → metrics.py (the reference's only
quality-control loop, SURVEY.md §4) and check the artifact contract:
point_cloud PLY, cfg_args.json, renders/gt PNGs, results.json schema."""
import json
import os
import struct

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # e2e/multi-device tier: full suite only

from gsplat_tpu.scene import colmap as colmap_lib


def _make_colmap_scene(root, n_pts=120, n_cams=6, W=64, H=48, rng=None):
    """Cameras on a ring looking at a small point cloud; images are flat
    renders of nothing fancy — the test checks mechanics, not quality."""
    from PIL import Image
    rng = rng or np.random.default_rng(0)
    sparse = os.path.join(root, "sparse", "0")
    images_dir = os.path.join(root, "images")
    os.makedirs(images_dir, exist_ok=True)

    fx = fy = 60.0
    cams = {1: colmap_lib.ColmapCamera(
        1, "PINHOLE", W, H, np.array([fx, fy, W / 2, H / 2]))}

    xyz = rng.standard_normal((n_pts, 3)) * 0.5
    rgb = rng.integers(0, 255, (n_pts, 3)).astype(np.uint8)
    pts = (np.arange(n_pts, dtype=np.int64), xyz, rgb, np.zeros(n_pts))

    imgs = {}
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        pos = np.array([3 * np.sin(a), 0.0, -3 * np.cos(a)])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R_wc = np.stack([right, upv, fwd], axis=0)   # world→cam rows
        t = -R_wc @ pos
        q = colmap_lib.rotmat2qvec(R_wc)
        name = f"im_{i:03d}.png"
        imgs[i + 1] = colmap_lib.ColmapImage(
            i + 1, q, t, 1, name,
            xys=np.zeros((0, 2)), point3D_ids=np.zeros((0,), np.int64))
        arr = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(images_dir, name))

    colmap_lib.write_model(cams, imgs, pts, sparse, binary=True)
    return root


def test_train_render_metrics_pipeline(tmp_path, rng):
    from gsplat_tpu.cli import train as train_cli
    from gsplat_tpu.cli import render as render_cli
    from gsplat_tpu.cli import metrics as metrics_cli

    src = _make_colmap_scene(str(tmp_path / "scene"), rng=rng)
    model = str(tmp_path / "model")
    iters = 12

    train_cli.main([
        "--source_path", src, "--model_path", model, "--eval",
        "--iterations", str(iters), "--sh_degree", "1",
        "--test_iterations", str(iters), "--save_iterations", str(iters),
        "--disable_viewer", "--quiet"])

    # artifact contract (reference scene/__init__.py:51-63, train.py:203)
    assert os.path.exists(os.path.join(model, "cfg_args.json"))
    assert os.path.exists(os.path.join(model, "cameras.json"))
    assert os.path.exists(os.path.join(model, "input.ply"))
    # structured telemetry (reference training_report scalars → JSONL)
    log_path = os.path.join(model, "training_log.jsonl")
    assert os.path.exists(log_path)
    recs = [json.loads(l) for l in open(log_path)]
    assert len(recs) >= iters
    assert {"step", "train_loss_patches/total_loss",
            "total_points"} <= set(recs[0])
    eval_recs = [r for r in recs if "test/loss_viewpoint - psnr" in r]
    assert eval_recs, "eval PSNR scalars missing from telemetry"
    ply = os.path.join(model, f"point_cloud/iteration_{iters}",
                       "point_cloud.ply")
    assert os.path.exists(ply)

    render_cli.main(["--model_path", model, "--iteration", str(iters),
                     "--quiet"])
    renders = os.path.join(model, "test", f"ours_{iters}", "renders")
    gts = os.path.join(model, "test", f"ours_{iters}", "gt")
    assert len(os.listdir(renders)) == len(os.listdir(gts)) > 0

    metrics_cli.main(["--model_paths", model])
    with open(os.path.join(model, "results.json")) as f:
        results = json.load(f)
    method = f"ours_{iters}"
    assert method in results
    for key in ("SSIM", "PSNR", "LPIPS"):
        assert key in results[method]
    assert np.isfinite(results[method]["PSNR"])
    with open(os.path.join(model, "per_view.json")) as f:
        per_view = json.load(f)
    assert len(per_view[method]["PSNR"]) == len(os.listdir(renders))


def test_train_cli_data_parallel(tmp_path, rng):
    """--data_parallel drives the camera-DP loop path over the 8-device
    mesh (smoke: loss finite, PLY saved)."""
    from gsplat_tpu.cli import train as train_cli
    src = _make_colmap_scene(str(tmp_path / "scene"), n_pts=60, n_cams=4,
                             W=32, H=32, rng=rng)
    model = str(tmp_path / "model_dp")
    train_cli.main([
        "--source_path", src, "--model_path", model,
        "--iterations", "3", "--sh_degree", "0",
        "--test_iterations", "-1", "--save_iterations", "3",
        "--disable_viewer", "--quiet", "--data_parallel"])
    assert os.path.exists(
        os.path.join(model, "point_cloud/iteration_3/point_cloud.ply"))


def test_debug_dump_on_nonfinite_loss(tmp_path, rng, monkeypatch):
    """--debug contract (reference README:156-159): a non-finite loss dumps
    the full pre-step input snapshot and aborts with a clear error."""
    import glob
    import jax.numpy as jnp
    from gsplat_tpu.cli import train as train_cli
    from gsplat_tpu.train import trainer

    src = _make_colmap_scene(str(tmp_path / "scene"), n_pts=60, n_cams=4,
                             W=32, H=32, rng=rng)
    model = str(tmp_path / "model_dbg")

    orig_step = trainer.train_step

    def poisoned_step(state, *a, **kw):
        s, aux = orig_step(state, *a, **kw)
        return s, aux._replace(loss=jnp.asarray(float("nan")))

    monkeypatch.setattr(trainer, "train_step", poisoned_step)
    with pytest.raises(FloatingPointError, match="non-finite loss"):
        train_cli.main([
            "--source_path", src, "--model_path", model,
            "--iterations", "2", "--sh_degree", "0", "--debug",
            "--test_iterations", "-1", "--save_iterations", "-1",
            "--disable_viewer", "--quiet"])
    snaps = glob.glob(os.path.join(model, "snapshot_iter*.npz"))
    assert snaps, "no snapshot dumped"
    data = np.load(snaps[0], allow_pickle=True)
    keys = set(data.keys())
    assert "gt" in keys and "iteration" in keys
    assert any(k.startswith("state") for k in keys)
    assert any(k.startswith("cam") for k in keys)


def test_train_cli_shard_gaussians(tmp_path, rng):
    """--shard_gaussians drives the gaussian-sharded-storage loop path over
    the 8-device mesh: params/moments stay row-sharded through train steps,
    densify events and capacity growth; PLY saved."""
    import jax
    from gsplat_tpu.cli import train as train_cli
    from gsplat_tpu.train import loop as loop_lib

    src = _make_colmap_scene(str(tmp_path / "scene"), n_pts=60, n_cams=4,
                             W=32, H=32, rng=rng)
    model = str(tmp_path / "model_sharded")
    captured = {}
    orig_train = loop_lib.train

    def capture_train(*a, **kw):
        scene, state = orig_train(*a, **kw)
        captured["state"] = state
        return scene, state

    loop_lib.train = capture_train
    try:
        train_cli.main([
            "--source_path", src, "--model_path", model, "--eval",
            "--iterations", "3", "--sh_degree", "0",
            "--test_iterations", "3", "--save_iterations", "3",
            "--disable_viewer", "--quiet", "--shard_gaussians"])
    finally:
        loop_lib.train = orig_train
    assert os.path.exists(
        os.path.join(model, "point_cloud/iteration_3/point_cloud.ply"))
    state = captured["state"]
    cap = state.gaussians.capacity
    rows = {s.data.shape[0] for s in state.gaussians.xyz.addressable_shards}
    assert rows == {cap // 8}, f"params not row-sharded after training: {rows}"
    rows_mu = {s.data.shape[0]
               for s in state.adam.mu["xyz"].addressable_shards}
    assert rows_mu == {cap // 8}


def test_train_cli_2d_mesh(tmp_path, rng):
    """--data_parallel --shard_gaussians together: the 2D (data x prim)
    mesh loop path — 2 cameras per step against prim-sharded parameters."""
    from gsplat_tpu.cli import train as train_cli
    src = _make_colmap_scene(str(tmp_path / "scene"), n_pts=60, n_cams=4,
                             W=32, H=32, rng=rng)
    model = str(tmp_path / "model_2d")
    train_cli.main([
        "--source_path", src, "--model_path", model,
        "--iterations", "3", "--sh_degree", "0",
        "--test_iterations", "-1", "--save_iterations", "3",
        "--disable_viewer", "--quiet", "--data_parallel",
        "--shard_gaussians"])
    assert os.path.exists(
        os.path.join(model, "point_cloud/iteration_3/point_cloud.ply"))


FAKE_COLMAP = r'''#!/usr/bin/env python
import json, os, shutil, sys
with open(os.environ["FAKE_COLMAP_LOG"], "a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\n")
def arg(name):
    for i, a in enumerate(sys.argv):
        if a == name:
            return sys.argv[i + 1]
        if a.startswith(name + "="):
            return a.split("=", 1)[1]
    return None
cmd = sys.argv[1]
if cmd == "feature_extractor":
    open(arg("--database_path"), "wb").close()
elif cmd == "mapper":
    out = os.path.join(arg("--output_path"), "0")
    os.makedirs(out, exist_ok=True)
    for n in ("cameras.bin", "images.bin", "points3D.bin"):
        open(os.path.join(out, n), "wb").close()
elif cmd == "image_undistorter":
    assert os.path.isdir(arg("--input_path")), "mapper output missing"
    out = arg("--output_path")
    sp = os.path.join(out, "sparse")
    os.makedirs(sp, exist_ok=True)
    for n in ("cameras.bin", "images.bin", "points3D.bin"):
        open(os.path.join(sp, n), "wb").close()
    imgs = os.path.join(out, "images")
    os.makedirs(imgs, exist_ok=True)
    for n in os.listdir(arg("--image_path")):
        shutil.copy2(os.path.join(arg("--image_path"), n),
                     os.path.join(imgs, n))
'''


def _fake_colmap(tmp_path, monkeypatch):
    """A stand-in colmap binary that records argv and fabricates the
    minimal outputs each downstream stage consumes (the real binary is not
    installable here; what's under test is cli/convert.py's sequencing,
    the sparse/*->sparse/0 move, and the resize pyramid — parity with
    /root/reference/convert.py:31-122)."""
    exe = tmp_path / "fake_colmap"
    exe.write_text(FAKE_COLMAP)
    exe.chmod(0o755)
    log = tmp_path / "colmap_argv.jsonl"
    monkeypatch.setenv("FAKE_COLMAP_LOG", str(log))
    return str(exe), log


def _convert_src(tmp_path, W=16, H=12, n=3):
    from PIL import Image
    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        arr = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(arr).save(src / "input" / f"im_{i}.png")
    return src


def test_convert_cli_full_pipeline(tmp_path, monkeypatch):
    from PIL import Image
    from gsplat_tpu.cli import convert as convert_cli
    import shutil as _sh

    exe, log = _fake_colmap(tmp_path, monkeypatch)
    src = _convert_src(tmp_path)
    # force the PIL resize path (no dependence on a magick install)
    monkeypatch.setattr(_sh, "which", lambda name: None)

    convert_cli.main(["--source_path", str(src),
                      "--colmap_executable", exe, "--resize"])

    calls = [json.loads(line) for line in log.read_text().splitlines()]
    assert [c[0] for c in calls] == [
        "feature_extractor", "exhaustive_matcher", "mapper",
        "image_undistorter"]
    fe, em, mp, iu = calls
    assert fe[fe.index("--ImageReader.camera_model") + 1] == "OPENCV"
    assert fe[fe.index("--ImageReader.single_camera") + 1] == "1"
    assert fe[fe.index("--SiftExtraction.use_gpu") + 1] == "1"
    assert em[em.index("--SiftMatching.use_gpu") + 1] == "1"
    assert any(a.startswith("--Mapper.ba_global_function_tolerance")
               for a in mp), "tightened BA tolerance missing"
    assert iu[iu.index("--output_type") + 1] == "COLMAP"
    # the sparse/* -> sparse/0 move: loaders expect sparse/0/{bins}
    assert sorted(os.listdir(src / "sparse")) == ["0"]
    assert sorted(os.listdir(src / "sparse" / "0")) == [
        "cameras.bin", "images.bin", "points3D.bin"]
    # resize pyramid at 1/2, 1/4, 1/8 via the PIL fallback
    for div, (w, h) in ((2, (8, 6)), (4, (4, 3)), (8, (2, 2))):
        d = src / f"images_{div}"
        assert sorted(os.listdir(d)) == sorted(os.listdir(src / "images"))
        with Image.open(d / "im_0.png") as im:
            assert im.size == (w, h)


def test_convert_cli_skip_matching_and_no_gpu(tmp_path, monkeypatch):
    from gsplat_tpu.cli import convert as convert_cli

    exe, log = _fake_colmap(tmp_path, monkeypatch)
    src = _convert_src(tmp_path)
    # --skip_matching expects a prior distorted/sparse/0 reconstruction
    pre = src / "distorted" / "sparse" / "0"
    pre.mkdir(parents=True)
    (pre / "cameras.bin").touch()

    convert_cli.main(["--source_path", str(src), "--colmap_executable",
                      exe, "--skip_matching", "--no_gpu"])
    calls = [json.loads(line) for line in log.read_text().splitlines()]
    assert [c[0] for c in calls] == ["image_undistorter"]
    assert sorted(os.listdir(src / "sparse")) == ["0"]
    # no --resize: no pyramid dirs
    assert not (src / "images_2").exists()

    # and the gpu flag threads through when matching is on
    log.write_text("")
    src2 = _convert_src(tmp_path / "b")
    convert_cli.main(["--source_path", str(src2), "--colmap_executable",
                      exe, "--no_gpu"])
    calls = [json.loads(line) for line in log.read_text().splitlines()]
    fe = calls[0]
    assert fe[fe.index("--SiftExtraction.use_gpu") + 1] == "0"
