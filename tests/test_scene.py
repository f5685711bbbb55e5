"""Scene layer tests: PLY byte-compat roundtrip, COLMAP parsers (synthetic
fixtures), Blender reader, resolution policy."""
import json
import os
import struct

import numpy as np
import pytest

from gsplat_tpu.scene import colmap as colmap_lib
from gsplat_tpu.scene import ply as ply_lib


def test_gaussian_ply_roundtrip(tmp_path, rng):
    n, K = 33, 16
    xyz = rng.standard_normal((n, 3)).astype(np.float32)
    f_dc = rng.standard_normal((n, 3)).astype(np.float32)
    f_rest = rng.standard_normal((n, K - 1, 3)).astype(np.float32)
    opacity = rng.standard_normal(n).astype(np.float32)
    scaling = rng.standard_normal((n, 3)).astype(np.float32)
    rotation = rng.standard_normal((n, 4)).astype(np.float32)
    path = str(tmp_path / "pc.ply")
    ply_lib.save_gaussian_ply(path, xyz, f_dc, f_rest, opacity, scaling,
                              rotation)
    out = ply_lib.load_gaussian_ply(path)
    np.testing.assert_array_equal(out["xyz"], xyz)
    np.testing.assert_array_equal(out["f_dc"], f_dc)
    np.testing.assert_array_equal(out["f_rest"], f_rest)
    np.testing.assert_array_equal(out["opacity"], opacity)
    np.testing.assert_array_equal(out["scaling"], scaling)
    np.testing.assert_array_equal(out["rotation"], rotation)


def test_gaussian_ply_field_order_matches_reference(tmp_path, rng):
    """The header must list the exact reference field sequence
    (gaussian_model.py:225-237) for SIBR/tooling interop."""
    n, K = 4, 4
    ply_lib.save_gaussian_ply(
        str(tmp_path / "pc.ply"),
        np.zeros((n, 3), np.float32), np.zeros((n, 3), np.float32),
        np.zeros((n, K - 1, 3), np.float32), np.zeros(n, np.float32),
        np.zeros((n, 3), np.float32), np.zeros((n, 4), np.float32))
    header = open(tmp_path / "pc.ply", "rb").read(2000).split(b"end_header")[0]
    names = [ln.split()[-1].decode() for ln in header.splitlines()
             if ln.startswith(b"property")]
    expect = (["x", "y", "z", "nx", "ny", "nz"]
              + [f"f_dc_{i}" for i in range(3)]
              + [f"f_rest_{i}" for i in range(9)]
              + ["opacity", "scale_0", "scale_1", "scale_2",
                 "rot_0", "rot_1", "rot_2", "rot_3"])
    assert names == expect


def test_point_ply_roundtrip(tmp_path, rng):
    xyz = rng.standard_normal((10, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (10, 3)).astype(np.uint8)
    path = str(tmp_path / "pts.ply")
    ply_lib.save_point_ply(path, xyz, rgb)
    xyz2, rgb2 = ply_lib.load_point_ply(path)
    np.testing.assert_allclose(xyz2, xyz, rtol=1e-6)
    np.testing.assert_allclose(rgb2 * 255, rgb, atol=0.5)


def _write_colmap_binary(sparse, rng):
    os.makedirs(sparse, exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))       # id, PINHOLE, w, h
        f.write(struct.pack("<dddd", 60.0, 60.0, 32.0, 24.0))
    # images.bin: two images
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for iid, name in [(1, b"a.png"), (2, b"b.png"), (3, b"c.png")]:
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.1 * iid, 0, 1.0])
            f.write(struct.pack("<i", iid))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))                 # 1 point2D
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
    # points3D.bin: three points
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 3))
        for pid in range(3):
            f.write(struct.pack("<q", pid))
            f.write(struct.pack("<ddd", pid, pid * 2.0, pid * 3.0))
            f.write(struct.pack("<BBB", 10 * pid, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))                  # track length
            f.write(struct.pack("<ii", 1, 0))
    return sparse


def test_colmap_binary_parsers(tmp_path, rng):
    sparse = _write_colmap_binary(str(tmp_path / "sparse"), rng)
    cams = colmap_lib.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    np.testing.assert_allclose(cams[1].params, [60, 60, 32, 24])
    imgs = colmap_lib.read_images_binary(os.path.join(sparse, "images.bin"))
    assert len(imgs) == 3 and imgs[2].name == "b.png"
    np.testing.assert_allclose(imgs[2].tvec, [0.2, 0, 1.0])
    xyz, rgb, err = colmap_lib.read_points3d_binary(
        os.path.join(sparse, "points3D.bin"))
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(xyz[2], [2, 4, 6])
    np.testing.assert_array_equal(rgb[1], [10, 20, 30])


def test_qvec_rotmat_roundtrip(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap_lib.qvec2rotmat(q)
    q2 = colmap_lib.rotmat2qvec(R)
    np.testing.assert_allclose(q2, q, atol=1e-6)


def test_colmap_scene_reader_end_to_end(tmp_path, rng):
    """Full read_colmap_scene over a synthetic dataset incl. eval split."""
    from PIL import Image
    src = str(tmp_path / "scene")
    sparse = _write_colmap_binary(os.path.join(src, "sparse", "0"), rng)
    img_dir = os.path.join(src, "images")
    os.makedirs(img_dir)
    for name in ["a.png", "b.png", "c.png"]:
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3)).astype(np.uint8)).save(
            os.path.join(img_dir, name))

    from gsplat_tpu.scene.dataset_readers import read_colmap_scene
    info = read_colmap_scene(src, eval=True, llffhold=3)
    assert len(info.test_cameras) == 1       # every 3rd by sorted name
    assert len(info.train_cameras) == 2
    assert info.train_cameras[0].width == 64
    assert abs(info.nerf_normalization["radius"]) > 0
    xyz, rgb = info.point_cloud
    assert xyz.shape == (3, 3)
    # conversion cache written
    assert os.path.exists(os.path.join(sparse, "points3D.ply"))


def test_blender_reader(tmp_path, rng):
    from PIL import Image
    src = str(tmp_path / "blender")
    os.makedirs(os.path.join(src, "train"))
    frames = []
    for i in range(3):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 + i
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
        arr = rng.integers(0, 255, (32, 40, 4)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(src, f"train/r_{i}.png"))
    with open(os.path.join(src, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    from gsplat_tpu.scene.dataset_readers import read_nerf_synthetic_scene
    info = read_nerf_synthetic_scene(src, white_background=True)
    assert len(info.train_cameras) == 3
    assert info.is_nerf_synthetic
    xyz, rgb = info.point_cloud
    assert xyz.shape[0] == 100_000
    assert np.abs(xyz).max() <= 1.3 + 1e-6


def test_camera_resolution_policy(tmp_path, rng):
    from PIL import Image
    from gsplat_tpu.scene.cameras import load_cam
    from gsplat_tpu.scene.dataset_readers import CameraInfo
    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 255, (100, 200, 3)).astype(np.uint8)).save(p)
    ci = CameraInfo(uid=0, R=np.eye(3), T=np.zeros(3), FovY=0.8, FovX=0.9,
                    image_path=p, image_name="img", width=200, height=100)
    cam = load_cam(2, ci)           # divisor 2
    assert (cam.width, cam.height) == (100, 50)
    cam = load_cam(50, ci)          # target width
    assert cam.width == 50
    cam = load_cam(-1, ci)          # small image: unchanged
    assert (cam.width, cam.height) == (200, 100)
