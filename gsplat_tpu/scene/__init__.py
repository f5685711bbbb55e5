"""Scene assembly: detect dataset layout, build camera lists, init Gaussians.

Parity target: /root/reference/scene/__init__.py (Scene class): COLMAP vs
Blender detection, input.ply + cameras.json written to the model dir, camera
shuffle, per-resolution-scale camera lists, init-from-pcd or load-ply, save
(PLY + exposure.json).
"""
from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import numpy as np

from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.scene import dataset_readers, ply as ply_lib
from gsplat_tpu.scene.cameras import Camera, camera_list_from_infos, camera_to_json


def searchForMaxIteration(folder: str) -> int:
    """Parity: reference utils/system_utils.py:searchForMaxIteration."""
    saved_iters = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved_iters)


class Scene:
    """Parity: reference scene/__init__.py:21-100."""

    gaussians: gm.GaussianParams

    def __init__(self, args, gaussians_sh_degree: int, load_iteration=None,
                 shuffle=True, resolution_scales=[1.0], capacity: int = 0):
        """args: ModelConfig-like (source_path, model_path, images, depths,
        white_background, eval, train_test_exp, resolution, sh_degree)."""
        self.model_path = args.model_path
        self.loaded_iter = None

        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = searchForMaxIteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        if os.path.exists(os.path.join(args.source_path, "sparse")):
            scene_info = dataset_readers.read_colmap_scene(
                args.source_path, args.images, args.depths, args.eval,
                args.train_test_exp)
        elif os.path.exists(os.path.join(args.source_path,
                                         "transforms_train.json")):
            print("Found transforms_train.json file, assuming Blender data set!")
            scene_info = dataset_readers.read_nerf_synthetic_scene(
                args.source_path, args.white_background, args.depths, args.eval)
        else:
            raise ValueError("Could not recognize scene type!")

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            with open(scene_info.ply_path, "rb") as src, \
                    open(os.path.join(self.model_path, "input.ply"), "wb") as dst:
                dst.write(src.read())
            cam_json = []
            for idx, cam in enumerate(scene_info.test_cameras
                                      + scene_info.train_cameras):
                cam_json.append(camera_to_json(idx, cam))
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            random.shuffle(scene_info.train_cameras)
            random.shuffle(scene_info.test_cameras)

        self.cameras_extent = scene_info.nerf_normalization["radius"]

        self.train_cameras: Dict[float, List[Camera]] = {}
        self.test_cameras: Dict[float, List[Camera]] = {}
        for scale in resolution_scales:
            print("Loading Training Cameras")
            self.train_cameras[scale] = camera_list_from_infos(
                scene_info.train_cameras, scale, args.resolution, False,
                args.train_test_exp)
            print("Loading Test Cameras")
            self.test_cameras[scale] = camera_list_from_infos(
                scene_info.test_cameras, scale, args.resolution, True,
                args.train_test_exp)

        # exposure index per train image (reference exposure_mapping)
        self.exposure_mapping = {
            cam.image_name: i
            for i, cam in enumerate(self.train_cameras[resolution_scales[0]])}
        for scale in resolution_scales:
            for cam in self.train_cameras[scale]:
                cam.exposure_idx = self.exposure_mapping.get(cam.image_name, -1)

        if self.loaded_iter:
            data = ply_lib.load_gaussian_ply(os.path.join(
                self.model_path, "point_cloud",
                f"iteration_{self.loaded_iter}", "point_cloud.ply"))
            n = data["xyz"].shape[0]
            import dataclasses
            import jax.numpy as jnp
            max_deg = int(round((data["f_rest"].shape[1] + 1) ** 0.5)) - 1
            g = gm.empty(max(capacity, n), max_deg)
            self.gaussians = dataclasses.replace(
                g,
                xyz=g.xyz.at[:n].set(data["xyz"]),
                f_dc=g.f_dc.at[:n].set(data["f_dc"]),
                f_rest=g.f_rest.at[:n].set(data["f_rest"]),
                scaling=g.scaling.at[:n].set(data["scaling"]),
                rotation=g.rotation.at[:n].set(data["rotation"]),
                opacity=g.opacity.at[:n].set(data["opacity"]),
                active=g.active.at[:n].set(True),
                active_sh_degree=jnp.asarray(max_deg, jnp.int32))
        else:
            xyz, rgb = scene_info.point_cloud
            print(f"Number of points at initialisation : {xyz.shape[0]}")
            self.gaussians = gm.create_from_pcd(
                xyz, rgb, gaussians_sh_degree,
                capacity=max(capacity, xyz.shape[0]))

        self.is_nerf_synthetic = scene_info.is_nerf_synthetic

    def save(self, iteration: int, exposures: Optional[np.ndarray] = None):
        """PLY + exposure.json (parity: scene/__init__.py:85-94)."""
        g = gm.compact(self.gaussians)
        n = int(np.asarray(g.num_active()))
        point_cloud_path = os.path.join(self.model_path,
                                        f"point_cloud/iteration_{iteration}")
        ply_lib.save_gaussian_ply(
            os.path.join(point_cloud_path, "point_cloud.ply"),
            np.asarray(g.xyz)[:n], np.asarray(g.f_dc)[:n],
            np.asarray(g.f_rest)[:n], np.asarray(g.opacity)[:n],
            np.asarray(g.scaling)[:n], np.asarray(g.rotation)[:n])
        if exposures is not None:
            exposure_dict = {
                name: np.asarray(exposures[idx]).tolist()
                for name, idx in self.exposure_mapping.items()}
            with open(os.path.join(self.model_path, "exposure.json"), "w") as f:
                json.dump(exposure_dict, f, indent=2)

    def getTrainCameras(self, scale=1.0) -> List[Camera]:
        return self.train_cameras[scale]

    def getTestCameras(self, scale=1.0) -> List[Camera]:
        return self.test_cameras[scale]
