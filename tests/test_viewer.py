"""SIBR remote-viewer bridge: wire-protocol loopback test.

Drives gsplat_tpu/viewer/network_gui.py with a fake SIBR client speaking
the reference protocol (network_gui.py:43-86): length-prefixed JSON camera
in, raw H·W·3 RGB bytes + length-prefixed source path out.
"""
import json
import math
import socket
import threading

import numpy as np

from tests.test_rasterize import make_scene, cfg


def _recv_exact(s, n):
    buf = b""
    while len(buf) < n:
        chunk = s.recv(n - len(buf))
        assert chunk, "connection closed early"
        buf += chunk
    return buf


def _client(port, W, H, result):
    # long timeout: the first render() compile on CPU dominates
    s = socket.create_connection(("127.0.0.1", port), timeout=240)
    view = np.eye(4, dtype=np.float32)
    # reference clients send y/z-flipped matrices; the bridge flips back
    view[:, 1] *= -1
    view[:, 2] *= -1
    proj = np.eye(4, dtype=np.float32)
    proj[:, 1] *= -1
    base = {
        "resolution_x": W, "resolution_y": H, "train": False,
        "fov_y": 0.7, "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": view.flatten().tolist(),
        "view_projection_matrix": proj.flatten().tolist(),
    }
    # request 1: kernel paths; request 2: both live python-path toggles on
    # (reference train.py:79 applies them per request)
    for tag, over in (("img", {}),
                      ("img_py", {"shs_python": True,
                                  "rot_scale_python": True})):
        payload = json.dumps({**base, **over}).encode()
        s.sendall(len(payload).to_bytes(4, "little"))
        s.sendall(payload)
        img = _recv_exact(s, W * H * 3)
        n = int.from_bytes(_recv_exact(s, 4), "little")
        result["path"] = _recv_exact(s, n).decode("ascii") if n else ""
        result[tag] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
    s.close()


def test_network_gui_roundtrip(rng):
    from gsplat_tpu.config import PipelineConfig
    from gsplat_tpu.viewer.network_gui import NetworkGUI
    from gsplat_tpu.train import trainer

    W, H = 64, 32
    g, _cam = make_scene(rng, n=100)
    state = trainer.init_state(g, 1)
    rcfg = cfg()

    server = NetworkGUI("127.0.0.1", 0)
    port = server.listener.getsockname()[1]

    result = {}
    t = threading.Thread(target=_client, args=(port, W, H, result))
    t.start()
    # poll until the request is served (try_connect is non-blocking)
    import time
    deadline = time.time() + 240
    while "img" not in result and time.time() < deadline:
        server.poll(state, object(), PipelineConfig(), rcfg,
                    np.zeros(3, np.float32), iteration=1, max_iterations=10)
        time.sleep(0.01)
    deadline = time.time() + 240
    while "img_py" not in result and time.time() < deadline:
        server.poll(state, object(), PipelineConfig(), rcfg,
                    np.zeros(3, np.float32), iteration=1, max_iterations=10)
        time.sleep(0.01)
    t.join(timeout=10)
    assert "img" in result, "no image received over the bridge"
    assert result["img"].shape == (H, W, 3)
    # the python paths compute the same SH colors / covariances through the
    # override plumbing — the served frame must match the kernel-path frame
    # (uint8 quantization allows off-by-one)
    assert "img_py" in result, "python-path request not served"
    diff = np.abs(result["img"].astype(int) - result["img_py"].astype(int))
    assert diff.max() <= 1, f"python-path frame diverged (max diff {diff.max()})"


def test_web_viewer_roundtrip(tmp_path, rng):
    """The trained-PLY web viewer (SIBR_gaussianViewer_app analogue): save a
    model PLY, load it through the viewer, fetch the page, /info and a
    rendered frame over HTTP."""
    import io
    import urllib.request
    from PIL import Image
    from gsplat_tpu.scene import ply as ply_lib
    from gsplat_tpu.viewer.web import ViewerServer, load_gaussians_from_ply
    from tests.test_rasterize import make_scene

    g, _cam = make_scene(rng, n=80)
    p = str(tmp_path / "point_cloud.ply")
    ply_lib.save_gaussian_ply(
        p, np.asarray(g.xyz), np.asarray(g.f_dc), np.asarray(g.f_rest),
        np.asarray(g.opacity), np.asarray(g.scaling), np.asarray(g.rotation))

    loaded = load_gaussians_from_ply(p)
    np.testing.assert_allclose(np.asarray(loaded.xyz), np.asarray(g.xyz),
                               rtol=1e-6)

    server = ViewerServer(loaded, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        page = urllib.request.urlopen(base + "/", timeout=120).read()
        assert b"canvas" in page
        info = json.loads(urllib.request.urlopen(base + "/info",
                                                 timeout=120).read())
        assert info["n"] == 80
        frame = urllib.request.urlopen(
            base + "/render?theta=0.3&phi=0.1&r=6&w=64&h=48",
            timeout=240).read()
        img = np.asarray(Image.open(io.BytesIO(frame)))
        assert img.shape == (48, 64, 3)
        assert img.std() > 0, "blank frame"
    finally:
        server.shutdown()
