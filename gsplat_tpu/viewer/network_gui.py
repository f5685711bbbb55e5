"""SIBR remote-viewer TCP bridge.

Wire-protocol parity with /root/reference/gaussian_renderer/network_gui.py
(:24-86) so existing SIBR_remoteGaussian_app clients work unchanged:
- receive: 4-byte LE length + JSON {resolution_x/y, train, fov_y, fov_x,
  z_near, z_far, shs_python, rot_scale_python, keep_alive,
  scaling_modifier, view_matrix[16], view_projection_matrix[16]} with the
  reference's y/z column sign flips;
- send: raw H·W·3 bytes + LE length-prefixed source-path string.
"""
from __future__ import annotations

import json
import socket
import traceback
from typing import Optional

import numpy as np

from gsplat_tpu.scene.cameras import MiniCam


class NetworkGUI:
    def __init__(self, host="127.0.0.1", port=6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    def try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except Exception:
            pass

    def _read(self):
        messageLength = self.conn.recv(4)
        messageLength = int.from_bytes(messageLength, "little")
        message = self.conn.recv(messageLength)
        return json.loads(message.decode("utf-8"))

    def _send(self, message_bytes, verify):
        if message_bytes is not None:
            self.conn.sendall(message_bytes)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(bytes(verify, "ascii"))

    def receive(self):
        """Parity: reference network_gui.py:57-86."""
        message = self._read()
        width = message["resolution_x"]
        height = message["resolution_y"]
        if width != 0 and height != 0:
            try:
                do_training = bool(message["train"])
                fovy = message["fov_y"]
                fovx = message["fov_x"]
                znear = message["z_near"]
                zfar = message["z_far"]
                do_shs_python = bool(message["shs_python"])
                do_rot_scale_python = bool(message["rot_scale_python"])
                keep_alive = bool(message["keep_alive"])
                scaling_modifier = message["scaling_modifier"]
                world_view_transform = np.reshape(
                    np.array(message["view_matrix"]), (4, 4))
                world_view_transform[:, 1] = -world_view_transform[:, 1]
                world_view_transform[:, 2] = -world_view_transform[:, 2]
                full_proj_transform = np.reshape(
                    np.array(message["view_projection_matrix"]), (4, 4))
                full_proj_transform[:, 1] = -full_proj_transform[:, 1]
                custom_cam = MiniCam(width, height, fovy, fovx, znear, zfar,
                                     world_view_transform.astype(np.float32),
                                     full_proj_transform.astype(np.float32))
            except Exception:
                traceback.print_exc()
                raise
            return (custom_cam, do_training, do_shs_python,
                    do_rot_scale_python, keep_alive, scaling_modifier)
        return None, None, None, None, None, None

    def poll(self, state, scene, pipe, rcfg, bg_color, iteration,
             max_iterations, train_test_exp=False):
        """Per-iteration polling (reference train.py:74-87)."""
        import jax.numpy as jnp
        from gsplat_tpu.ops.rasterize import render

        if self.conn is None:
            self.try_connect()
        while self.conn is not None:
            try:
                net_image_bytes = None
                (custom_cam, do_training, _shs, _rot, keep_alive,
                 scaling_modifier) = self.receive()
                if custom_cam is not None:
                    out = render(state.gaussians, custom_cam.view(),
                                 custom_cam.image_width,
                                 custom_cam.image_height,
                                 jnp.asarray(bg_color), rcfg,
                                 scaling_modifier=scaling_modifier,
                                 antialiasing=pipe.antialiasing)
                    img = np.asarray(jnp.clip(out.image, 0, 1))
                    net_image_bytes = memoryview(
                        (img * 255).astype(np.uint8).transpose(1, 2, 0)
                        .copy(order="C"))
                from gsplat_tpu.scene import Scene  # noqa
                self._send(net_image_bytes,
                           getattr(scene, "source_path", ""))
                if do_training and (iteration < max_iterations
                                    or not keep_alive):
                    break
            except Exception:
                self.conn = None
