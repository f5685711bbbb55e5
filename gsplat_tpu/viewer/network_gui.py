"""SIBR remote-viewer TCP bridge.

Wire-protocol compatible with the reference's viewer socket
(/root/reference/gaussian_renderer/network_gui.py:24-86) so existing
SIBR_remoteGaussian_app clients work unchanged. The *protocol* is fixed by
the client — 4-byte LE length-prefixed JSON request in, raw H·W·3 RGB bytes
plus a length-prefixed source-path string out, with the client's y/z column
sign convention — but the implementation here is our own: a framed-socket
helper, a dataclass request parser, and a poll loop that routes the client's
``shs_python`` / ``rot_scale_python`` toggles through the renderer's
override arguments (the reference flips its pipe flags live, train.py:79;
we feed the equivalent quantities through ``override_color`` /
``cov3d_precomp``, same as cli/render.py's python paths).
"""
from __future__ import annotations

import json
import socket
from dataclasses import dataclass
from typing import Optional

import numpy as np

from gsplat_tpu.scene.cameras import MiniCam


@dataclass(frozen=True)
class ViewerRequest:
    """One parsed client message. ``cam`` is None for empty-resolution
    keep-alive pings (the client sends those while idle)."""
    cam: Optional[MiniCam]
    training: bool = False
    sh_python: bool = False
    rot_scale_python: bool = False
    keep_alive: bool = False
    scaling_modifier: float = 1.0

    @classmethod
    def parse(cls, payload: dict) -> "ViewerRequest":
        w, h = payload["resolution_x"], payload["resolution_y"]
        if w == 0 or h == 0:
            return cls(cam=None)
        # The client streams column-major GL-convention matrices; flipping
        # the y/z basis columns converts to the renderer's camera frame
        # (wire contract shared with reference network_gui.py:75-78).
        view = np.asarray(payload["view_matrix"],
                          np.float32).reshape(4, 4)
        view[:, 1:3] *= -1.0
        viewproj = np.asarray(payload["view_projection_matrix"],
                              np.float32).reshape(4, 4)
        viewproj[:, 1] *= -1.0
        cam = MiniCam(w, h, payload["fov_y"], payload["fov_x"],
                      payload["z_near"], payload["z_far"], view, viewproj)
        return cls(cam=cam,
                   training=bool(payload["train"]),
                   sh_python=bool(payload["shs_python"]),
                   rot_scale_python=bool(payload["rot_scale_python"]),
                   keep_alive=bool(payload["keep_alive"]),
                   scaling_modifier=float(payload["scaling_modifier"]))


class NetworkGUI:
    """Non-blocking listener polled once per training iteration."""

    def __init__(self, host="127.0.0.1", port=6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn: Optional[socket.socket] = None

    # ---- framing ----

    def _recv_exact(self, n: int) -> bytes:
        chunks = []
        while n > 0:
            chunk = self.conn.recv(n)
            if not chunk:
                raise ConnectionError("viewer client closed the socket")
            chunks.append(chunk)
            n -= len(chunk)
        return b"".join(chunks)

    def read_request(self) -> ViewerRequest:
        length = int.from_bytes(self._recv_exact(4), "little")
        return ViewerRequest.parse(json.loads(self._recv_exact(length)))

    def send_frame(self, rgb_bytes: Optional[bytes], source_path: str):
        if rgb_bytes is not None:
            self.conn.sendall(rgb_bytes)
        self.conn.sendall(len(source_path).to_bytes(4, "little"))
        self.conn.sendall(source_path.encode("ascii"))

    def _try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            print(f"\nConnected by {addr}")
            self.conn.settimeout(None)
        except (BlockingIOError, OSError):
            pass

    def _drop_connection(self):
        if self.conn is not None:
            try:
                self.conn.close()
            except OSError:
                pass
            self.conn = None

    # ---- per-iteration poll (reference train.py:74-87) ----

    def poll(self, state, scene, pipe, rcfg, bg_color, iteration,
             max_iterations, train_test_exp=False):
        if self.conn is None:
            self._try_connect()
        while self.conn is not None:
            try:
                req = self.read_request()
                frame = None
                if req.cam is not None:
                    frame = self._render_frame(state, req, rcfg, pipe,
                                               bg_color)
                self.send_frame(frame, getattr(scene, "source_path", ""))
                if req.training and (iteration < max_iterations
                                     or not req.keep_alive):
                    break
            except Exception:
                self._drop_connection()

    def _render_frame(self, state, req: ViewerRequest, rcfg, pipe,
                      bg_color) -> bytes:
        import jax.numpy as jnp
        from gsplat_tpu.core import sh as sh_lib
        from gsplat_tpu.ops.rasterize import render

        g = state.gaussians
        cv = req.cam.view()

        override_color = None
        if req.sh_python:
            dirs = g.xyz - cv.camera_center[None, :]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
            override_color = jnp.maximum(
                sh_lib.eval_sh(int(g.active_sh_degree),
                               g.get_features().swapaxes(1, 2), dirs) + 0.5,
                0.0)
        cov3d = g.get_covariance(req.scaling_modifier) \
            if req.rot_scale_python else None

        out = render(g, cv, req.cam.image_width, req.cam.image_height,
                     jnp.asarray(bg_color), rcfg,
                     scaling_modifier=req.scaling_modifier,
                     antialiasing=pipe.antialiasing,
                     override_color=override_color, cov3d_precomp=cov3d)
        img = np.asarray(jnp.clip(out.image, 0, 1))
        return memoryview((img * 255).astype(np.uint8)
                          .transpose(1, 2, 0).copy(order="C"))
