"""Interactive viewer CLI — the SIBR_gaussianViewer_app analogue
(/root/reference/README.md:350-422): load a trained model and serve an
orbit-camera web viewer rendering through the training rasterizer."""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser


def _latest_iteration(model_path: str) -> int:
    root = os.path.join(model_path, "point_cloud")
    iters = [int(d.split("_")[-1]) for d in os.listdir(root)
             if d.startswith("iteration_")]
    if not iters:
        raise FileNotFoundError(f"no point_cloud/iteration_* under {model_path}")
    return max(iters)


def main(argv=None):
    from gsplat_tpu import config as cfg_lib

    parser = ArgumentParser(description="Interactive model viewer")
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8090)
    parser.add_argument("--white_background", action="store_true")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    it = args.iteration if args.iteration != -1 \
        else _latest_iteration(args.model_path)
    ply = os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                       "point_cloud.ply")
    print(f"Loading {ply}")

    from gsplat_tpu.viewer.web import ViewerServer, load_gaussians_from_ply
    g = load_gaussians_from_ply(ply)
    bg = (1.0, 1.0, 1.0) if args.white_background else (0.0, 0.0, 0.0)
    server = ViewerServer(g, host=args.ip, port=args.port, background=bg)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
