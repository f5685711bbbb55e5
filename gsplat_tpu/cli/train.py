"""Training CLI — flag parity with reference train.py:254-282."""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

from gsplat_tpu import config as cfg_lib
from gsplat_tpu.utils.general import safe_state


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    cfg_lib.add_model_args(parser)
    cfg_lib.add_optimization_args(parser)
    cfg_lib.add_pipeline_args(parser)
    cfg_lib.add_rasterizer_args(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--disable_viewer", action="store_true", default=False)
    parser.add_argument("--data_parallel", action="store_true", default=False,
                        help="camera data-parallel training over all devices"
                             " (one camera per chip per step)")
    parser.add_argument("--shard_gaussians", action="store_true",
                        default=False,
                        help="gaussian-sharded storage training: params, "
                             "optimizer state and stats row-sharded over "
                             "all devices (for scenes beyond one chip's "
                             "memory; see SCALING.md)")
    parser.add_argument("--shard_transient", default="replicated",
                        choices=["replicated", "ring", "slab"],
                        help="sharded-storage render-buffer strategy: "
                             "'replicated' all_gathers the (N,16) packed "
                             "rows per frame (fastest); 'ring' streams "
                             "them slab-by-slab over ppermute so the "
                             "per-chip transient is O(N/D); 'slab' also "
                             "streams BINNING (per-slab expansion + merged "
                             "sort) so nothing N-sized materializes — for "
                             "N beyond the ring ceiling (SCALING.md)")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--checkpoint_interval", type=int, default=0,
                        help="every N iterations, write an ASYNC orbax "
                             "checkpoint to <model_path>/checkpoints "
                             "(serialization overlaps training)")
    parser.add_argument("--start_checkpoint", type=str, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)

    dataset = cfg_lib.extract(cfg_lib.ModelConfig, args)
    opt = cfg_lib.extract(cfg_lib.OptimizationConfig, args)
    pipe = cfg_lib.extract(cfg_lib.PipelineConfig, args)
    rcfg = cfg_lib.extract(cfg_lib.RasterizerConfig, args)

    if not dataset.model_path:
        import dataclasses
        import uuid
        unique_str = os.getenv("OAR_JOB_ID") or str(uuid.uuid4())
        dataset = dataclasses.replace(
            dataset, model_path=os.path.join("./output/", unique_str[0:10]))
    print("Optimizing " + dataset.model_path)
    os.makedirs(dataset.model_path, exist_ok=True)
    cfg_lib.save_cfg(dataset.model_path, {
        "model": dataset, "pipeline": pipe, "optimization": opt,
        "rasterizer": rcfg})

    safe_state(args.quiet)
    from gsplat_tpu.parallel.mesh import init_distributed
    init_distributed()   # multi-host bring-up (no-op single-host)
    if args.detect_anomaly:
        import jax
        jax.config.update("jax_debug_nans", True)

    server = None
    if not args.disable_viewer:
        from gsplat_tpu.viewer.network_gui import NetworkGUI
        try:
            server = NetworkGUI(args.ip, args.port)
        except OSError as e:
            print(f"viewer bridge disabled: {e}")

    from gsplat_tpu.train.loop import train
    train(dataset, opt, pipe, rcfg, args.test_iterations,
          args.save_iterations, args.checkpoint_iterations,
          args.start_checkpoint, network_gui_server=server, quiet=args.quiet,
          data_parallel=args.data_parallel,
          checkpoint_interval=args.checkpoint_interval,
          shard_gaussians=args.shard_gaussians,
          shard_transient=args.shard_transient)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
