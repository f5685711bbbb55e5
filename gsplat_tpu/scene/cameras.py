"""Host-side cameras: image/mask/depth loading + the device CameraView.

Parity target: /root/reference/scene/cameras.py (Camera/MiniCam) and
/root/reference/utils/camera_utils.py (resolution policy, depth decode,
camera_to_JSON). Images stay numpy on host; only the small CameraView pytree
plus per-step image batches cross to the device.
"""
from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from gsplat_tpu.core.camera import CameraView
from gsplat_tpu.core.transforms import fov2focal, world_to_view
from gsplat_tpu.scene.dataset_readers import CameraInfo

WARNED_ABOUT_RESOLUTION = [False]


@dataclass
class Camera:
    """One training/eval view. Arrays are numpy (HWC float32 in [0,1])."""
    uid: int
    colmap_id: int
    R: np.ndarray
    T: np.ndarray
    FoVx: float
    FoVy: float
    image: np.ndarray                    # (3,H,W) f32 in [0,1]
    alpha_mask: np.ndarray               # (1,H,W) f32
    invdepthmap: Optional[np.ndarray]    # (1,H,W) f32 or None
    depth_mask: Optional[np.ndarray]     # (1,H,W) f32 or None
    depth_reliable: bool
    image_name: str
    width: int
    height: int
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0
    exposure_idx: int = -1

    def view(self) -> CameraView:
        return CameraView.create(self.R, self.T, self.FoVx, self.FoVy,
                                 self.znear, self.zfar, self.trans, self.scale,
                                 exposure_idx=self.exposure_idx)

    @property
    def image_width(self):
        return self.width

    @property
    def image_height(self):
        return self.height


def _resize_image(arr: np.ndarray, resolution) -> np.ndarray:
    """PIL-based resize to (W,H); arr HWC float [0,1] or HW."""
    from PIL import Image
    img = Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8))
    img = img.resize(resolution)
    return np.asarray(img).astype(np.float32) / 255.0


def _resolution_policy(resolution_arg: int, resolution_scale: float,
                       orig_w: int, orig_h: int):
    """(W, H) target from the reference resolution policy
    (utils/camera_utils.py:43-61): divisor flags {1,2,4,8}, target-width for
    other positive values, auto-downscale of >1600px-wide images at -1."""
    if resolution_arg in [1, 2, 4, 8]:
        scale = resolution_scale * resolution_arg
        return round(orig_w / scale), round(orig_h / scale)
    if resolution_arg == -1:
        if orig_w > 1600:
            if not WARNED_ABOUT_RESOLUTION[0]:
                print("[ INFO ] Encountered quite large input images "
                      "(>1.6K pixels width), rescaling to 1.6K.\n"
                      " If this is not desired, please explicitly specify "
                      "'--resolution/-r' as 1")
                WARNED_ABOUT_RESOLUTION[0] = True
            global_down = orig_w / 1600
        else:
            global_down = 1
    else:
        global_down = orig_w / resolution_arg
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_cam(resolution_arg: int, cam_info: CameraInfo, resolution_scale=1.0,
             train_test_exp=False, is_test_dataset=False,
             predecoded=None) -> Camera:
    """Resolution policy + image/depth decode.

    Parity: reference utils/camera_utils.py:16-66 (loadCam) — divisor flags
    {1,2,4,8}, target-width for other positive values, auto-downscale of
    images wider than 1600px when resolution == -1; inverse-depth PNG decode
    at /512 (synthetic 16-bit) or /(2^16) handled by the caller-provided
    scale; half-image alpha masking for train_test_exp (scene/cameras.py:50-54).

    Decode/resize runs through the native threaded loader
    (gsplat_tpu/native, libjpeg/libpng + area filter) when built; PIL is
    the fallback. Set GSPLAT_NATIVE_LOADER=0 to force PIL.
    """
    from gsplat_tpu import native

    size = native.image_size(cam_info.image_path) if native.available() \
        else None
    if size is None:
        from PIL import Image
        pil = Image.open(cam_info.image_path)
        orig_w, orig_h = pil.size
    else:
        pil = None
        orig_w, orig_h = size

    resolution = _resolution_policy(resolution_arg, resolution_scale,
                                    orig_w, orig_h)

    if predecoded is not None:
        decoded = predecoded          # from the native batch decoder
    elif pil is None:
        decoded = native.decode_image(cam_info.image_path,
                                      resolution[0], resolution[1])
    else:
        decoded = None
    if decoded is not None:
        chw, has_alpha = decoded                    # (4,H,W) RGBA
        resized = chw.transpose(1, 2, 0)            # HWC
        if not has_alpha:
            resized = resized[:, :, :3]
    else:
        if pil is None:
            from PIL import Image
            pil = Image.open(cam_info.image_path)
        arr = np.asarray(pil).astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None].repeat(3, axis=2)
        resized = _resize_image(arr, resolution)
        if resized.ndim == 2:
            resized = resized[:, :, None].repeat(3, axis=2)
    rgb = resized[:, :, :3]
    if resized.shape[2] == 4:
        alpha = resized[:, :, 3:4]
        if cam_info.bg is not None:
            # Blender RGBA: composite over bg (reference dataset_readers 255-259)
            rgb = rgb * alpha + cam_info.bg[None, None, :] * (1 - alpha)
            alpha = np.ones_like(alpha)
    else:
        alpha = np.ones_like(rgb[:, :, :1])

    W, H = resolution
    if train_test_exp and cam_info.is_test:
        alpha = alpha.copy()
        if is_test_dataset:
            alpha[:, :W // 2] = 0
        else:
            alpha[:, W // 2:] = 0

    invdepth = None
    depth_mask = None
    depth_reliable = False
    if cam_info.depth_path:
        try:
            import cv2
            raw = cv2.imread(cam_info.depth_path, cv2.IMREAD_UNCHANGED)
        except ImportError:
            from PIL import Image as _I
            raw = np.asarray(_I.open(cam_info.depth_path))
        if raw is not None:
            raw = raw.astype(np.float32)
            # 16-bit real captures /2^16·scale handled via depth_params;
            # synthetic /512 (reference camera_utils.py:25-28)
            inv = raw / (512.0 if cam_info.depth_params is None and raw.max() < 60000
                         else float(2 ** 16))
            from PIL import Image as _I
            inv_img = _I.fromarray(inv)
            inv = np.asarray(inv_img.resize(resolution,
                                            _I.Resampling.NEAREST)).copy()
            inv[inv < 0] = 0
            depth_mask = np.ones((1, H, W), np.float32)
            depth_reliable = True
            dp = cam_info.depth_params
            if dp is not None:
                if dp["scale"] < 0.2 * dp["med_scale"] or \
                        dp["scale"] > 5 * dp["med_scale"]:
                    depth_reliable = False
                    depth_mask *= 0
                if dp["scale"] > 0:
                    inv = inv * dp["scale"] + dp["offset"]
            if inv.ndim != 2:
                inv = inv[..., 0]
            invdepth = inv[None]

    return Camera(
        uid=cam_info.uid, colmap_id=cam_info.uid, R=cam_info.R, T=cam_info.T,
        FoVx=cam_info.FovX, FoVy=cam_info.FovY,
        image=np.clip(rgb, 0, 1).transpose(2, 0, 1),
        alpha_mask=alpha.transpose(2, 0, 1),
        invdepthmap=invdepth, depth_mask=depth_mask,
        depth_reliable=depth_reliable, image_name=cam_info.image_name,
        width=W, height=H)


def camera_list_from_infos(cam_infos: List[CameraInfo], resolution_scale,
                           resolution_arg, is_test_dataset,
                           train_test_exp=False) -> List[Camera]:
    """Parity: reference camera_utils.cameraList_from_camInfos (:69-75).

    When the native loader is built, the whole camera set decodes through
    ONE threaded ``decode_batch`` call per target resolution (the
    startup-latency killer for multi-hundred-image scenes); per-image
    decode/PIL remains the fallback."""
    from gsplat_tpu import native

    predecoded = {}
    if native.available():
        groups = {}
        for i, c in enumerate(cam_infos):
            size = native.image_size(c.image_path)
            if size is None:
                continue
            res = _resolution_policy(resolution_arg, resolution_scale,
                                     size[0], size[1])
            groups.setdefault(res, []).append(i)
        for (w, h), idxs in groups.items():
            out = native.decode_batch(
                [cam_infos[i].image_path for i in idxs], w, h)
            if out is not None:
                bufs, flags = out
                for j, i in enumerate(idxs):
                    predecoded[i] = (bufs[j], bool(flags[j]))
    return [load_cam(resolution_arg, c, resolution_scale, train_test_exp,
                     is_test_dataset, predecoded=predecoded.get(i))
            for i, c in enumerate(cam_infos)]


def camera_to_json(idx: int, camera) -> dict:
    """Parity: reference camera_utils.camera_to_JSON (:77-97) — viewer interop."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = camera.R.transpose()
    Rt[:3, 3] = camera.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    pos = W2C[:3, 3]
    rot = W2C[:3, :3]
    return {
        "id": idx,
        "img_name": camera.image_name,
        "width": camera.width,
        "height": camera.height,
        "position": pos.tolist(),
        "rotation": [x.tolist() for x in rot],
        "fy": fov2focal(camera.FovY if hasattr(camera, "FovY") else camera.FoVy,
                        camera.height),
        "fx": fov2focal(camera.FovX if hasattr(camera, "FovX") else camera.FoVx,
                        camera.width),
    }


class MiniCam:
    """Viewer-protocol camera (parity: reference scene/cameras.py:91-102)."""

    def __init__(self, width, height, fovy, fovx, znear, zfar,
                 world_view_transform: np.ndarray,
                 full_proj_transform: np.ndarray):
        self.image_width = width
        self.image_height = height
        self.FoVy = fovy
        self.FoVx = fovx
        self.znear = znear
        self.zfar = zfar
        # Stored in the reference's transposed (row-vector) convention.
        self.world_view_transform = world_view_transform
        self.full_proj_transform = full_proj_transform

    def view(self) -> CameraView:
        import jax.numpy as jnp
        w2v = self.world_view_transform.T            # column convention
        full = self.full_proj_transform.T
        cam_center = np.linalg.inv(w2v)[:3, 3]
        return CameraView(
            world_view=jnp.asarray(w2v, jnp.float32),
            full_proj=jnp.asarray(full, jnp.float32),
            camera_center=jnp.asarray(cam_center, jnp.float32),
            tanfovx=jnp.asarray(math.tan(self.FoVx * 0.5), jnp.float32),
            tanfovy=jnp.asarray(math.tan(self.FoVy * 0.5), jnp.float32),
            exposure_idx=jnp.asarray(-1, jnp.int32),
        )
