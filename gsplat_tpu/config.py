"""Dataclass config system with CLI reflection.

Capability parity with the reference's argparse reflection
(/root/reference/arguments/__init__.py:19-122): same flag names, shorthands
and default values where observable — but configs are plain dataclasses,
serialized to JSON (``cfg_args.json``) instead of the reference's
``eval()``-of-Namespace-repr round trip (a noted reference hazard,
SURVEY.md §7 "quirks").
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field, fields
from typing import List, Optional


# Field metadata key marking a flag that also gets a one-letter shorthand
# (reference: leading "_" attribute names, arguments/__init__.py:22-33).
def _sh(default, **kw):
    return field(default=default, metadata={"shorthand": True, **kw})


@dataclass(frozen=True)
class ModelConfig:
    """Parity: reference arguments/__init__.py:47-64 (ModelParams)."""
    sh_degree: int = 3
    source_path: str = _sh("")
    model_path: str = _sh("")
    images: str = _sh("images")
    depths: str = _sh("")
    resolution: int = _sh(-1)
    white_background: bool = _sh(False)
    train_test_exp: bool = False
    data_device: str = "tpu"   # reference default "cuda"
    eval: bool = False


@dataclass(frozen=True)
class PipelineConfig:
    """Parity: reference arguments/__init__.py:66-72 (PipelineParams)."""
    convert_SHs_python: bool = False   # use the oracle SH path (cross-check)
    compute_cov3D_python: bool = False # use the oracle covariance path
    debug: bool = False
    antialiasing: bool = False


@dataclass(frozen=True)
class OptimizationConfig:
    """Parity: reference arguments/__init__.py:74-100 (OptimizationParams).

    Note the reference README documents opacity_lr=0.05 but the code default
    is 0.025 (SURVEY.md §7); the code value is used here.
    """
    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    exposure_lr_init: float = 0.01
    exposure_lr_final: float = 0.001
    exposure_lr_delay_steps: int = 0
    exposure_lr_delay_mult: float = 0.0
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01
    random_background: bool = False
    optimizer_type: str = "default"  # "default" | "sparse_adam"


@dataclass(frozen=True)
class RasterizerConfig:
    """TPU rasterizer knobs (new capability — no reference analogue).

    tile_h × tile_w is the pixel tile used for binning AND the Pallas
    composite block. Pixels live on sublanes and gaussians on lanes inside
    the kernel, so the tile shape is free of the 128-lane constraint.
    32×32 measured fastest end-to-end at 1080p (r5 on-chip sweep, stream
    compositor: 99.8 ms/step vs 16×32's 110.8 — the −36% pair count cuts
    every M-proportional pass (the ~17 ns/row XLA scatter/gather wall,
    binning, gather-VJP) by more than the doubled per-entry compositing
    work costs; 16×64 = 104.4 ms, 32×64 OOMs the backward's (C,11,P)
    block at P=2048; vs CUDA's 16×16, the TPU kernel's per-chunk fixed
    cost and the scatter wall both reward larger tiles).
    """
    tile_h: int = 32
    tile_w: int = 32
    # Static capacity of the duplicated (tile,depth)-key list; the host
    # adapts it (grow on overflow + retry, shrink when over-provisioned)
    # and re-jits — a rare event after warm-up.
    pairs_per_gaussian: float = 12.0   # M_cap = ceil(cap * this), rounded up
    # Per-tile-row ellipse culling (ops/binning.py): expand each gaussian
    # to the level-set ellipse's exact x-interval per tile row instead of
    # its full bounding rect. Conservative — the compositor's alpha_min cut
    # already zeroes everything dropped — so images are unchanged while the
    # pair count shrinks. Default OFF: measured on-chip (r4, 1080p/200k
    # bench) the culled expansion's extra binning passes cost more than the
    # ~10% pair reduction saves — 12.3 Mpx/s culled vs 15.5 Mpx/s unculled.
    # Worth enabling only for scenes with very anisotropic/huge splats
    # where the rect expansion overshoots badly.
    row_cull: bool = False
    # Static slots per gaussian for the culled expansion: row_slots-1
    # exact single tile rows + 1 tail block covering any remaining rows
    # (jointly culled). Purely a tightness/dense-work trade — tall splats
    # beyond the single-row slots still render correctly via the tail;
    # there is no slot overflow.
    row_slots: int = 4
    # Static budget for the chunk-alignment padding of the entry list
    # (ops/binning.py align path). -1 = the safe worst case align*n_tiles;
    # hosts that probe a frame first (bench.py) right-size it from the
    # reported num_padded — expected use is ~chunk/2 per non-empty tile,
    # and every kernel grid step / M-sized pass scales with m_cap+pad_cap.
    pad_cap: int = -1
    chunk: int = 64                   # gaussians per kernel grid step
    # Compositor kernel form: "chunk" = one Mosaic grid step per entry
    # chunk (ops/pallas/composite.py); "stream" = strip grid — one step
    # per strip_chunks chunks with a fori_loop over resident blocks
    # (ops/pallas/composite_stream.py), removing the measured ~0.9 us
    # per-chunk block machinery. Only affects the Pallas path; the slab
    # t_init route always uses the chunk kernel.
    #
    # Defaults are the r5 on-chip optimum (tools/sweep_tiles.py, 1080p
    # 200k-gaussian train step): stream/64/256 = 114.5 ms vs the r4
    # chunk/256 default's 135.2 ms. The finer chunk shrinks alignment
    # padding ~4x (m_out 2.34M -> 1.81M at 1.25M pairs) and tightens the
    # early-out granularity; only the strip grid makes chunk=64 viable
    # (the chunk grid would pay its ~0.9 us fixed cost 25k times/pass).
    # Sweeps: chunk 32 = 123.9 ms (thin (G,P) blocks), chunk 256 stream
    # = 137.6 ms; strip 128/256/512 within noise; tiles 16x16 / 8x32
    # regress (pair count balloons 1.6-2.3x at P/2).
    compositor: str = "stream"
    strip_chunks: int = 256           # chunks per strip (stream form)
    # Stream-backward per-gaussian grad reductions: "vpu" = exact
    # elementwise+tree lane reduces; "mxu" = one (G,P)x(P,8) moment-basis
    # dot at bf16x3 about the tile-local origin, shifted to the mean on
    # (G,1) data afterwards (~5e-4 worst-case relative on conic GRADIENTS
    # for 1-px splats; see composite_stream.py _bwd_strip_kernel notes).
    moments: str = "vpu"
    alpha_min: float = 1.0 / 255.0    # contribution floor   [CUDA parity]
    alpha_max: float = 0.99           # alpha clamp          [CUDA parity]
    transmittance_eps: float = 1e-4   # early-out threshold  [CUDA parity]
    dilation: float = 0.3             # screen-space cov dilation (px^2)
    # "auto" → Pallas kernels on TPU, pure-XLA oracle elsewhere; library
    # callers may also pass plain bools ("on"/"off" from the CLI)
    use_pallas: str = "auto"


def _add_dataclass_args(parser: argparse.ArgumentParser, dc_type, prefix=""):
    group = parser.add_argument_group(dc_type.__name__)
    for f in fields(dc_type):
        name = "--" + f.name
        shorthand = f.metadata.get("shorthand", False)
        default = f.default if f.default is not dataclasses.MISSING else None
        if callable(getattr(f, "default_factory", None)) and \
                f.default_factory is not dataclasses.MISSING:  # type: ignore
            default = f.default_factory()  # type: ignore
        args = [name] + (["-" + f.name[0]] if shorthand else [])
        if f.type in (bool, "bool"):
            if default:       # True-default bools need an off switch too
                group.add_argument(*args, default=default,
                                   action=argparse.BooleanOptionalAction)
            else:
                group.add_argument(*args, default=default,
                                   action="store_true")
        else:
            ty = {int: int, float: float, str: str,
                  "int": int, "float": float, "str": str}.get(f.type, str)
            group.add_argument(*args, default=default, type=ty)


def extract(dc_type, args: argparse.Namespace):
    """Build a dataclass instance from parsed argparse flags."""
    kw = {}
    for f in fields(dc_type):
        if hasattr(args, f.name):
            kw[f.name] = getattr(args, f.name)
    out = dc_type(**kw)
    if isinstance(out, ModelConfig) and out.source_path:
        out = dataclasses.replace(out,
                                  source_path=os.path.abspath(out.source_path))
    return out


def add_model_args(parser, *_): _add_dataclass_args(parser, ModelConfig)
def add_pipeline_args(parser): _add_dataclass_args(parser, PipelineConfig)
def add_optimization_args(parser): _add_dataclass_args(parser, OptimizationConfig)
def add_rasterizer_args(parser): _add_dataclass_args(parser, RasterizerConfig)


def save_cfg(model_path: str, cfgs: dict) -> None:
    """Write the merged config snapshot (reference writes ``cfg_args``,
    train.py:203-204; we write JSON, safe to re-load)."""
    os.makedirs(model_path, exist_ok=True)
    payload = {k: dataclasses.asdict(v) for k, v in cfgs.items()}
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump(payload, f, indent=2)


def load_cfg(model_path: str) -> dict:
    """Load a saved config snapshot and rebuild dataclasses."""
    with open(os.path.join(model_path, "cfg_args.json")) as f:
        payload = json.load(f)
    types = {"model": ModelConfig, "pipeline": PipelineConfig,
             "optimization": OptimizationConfig, "rasterizer": RasterizerConfig}
    out = {}
    for k, v in payload.items():
        ty = types[k]
        names = {f.name for f in fields(ty)}
        out[k] = ty(**{kk: vv for kk, vv in v.items() if kk in names})
    return out


def get_combined_args(parser: argparse.ArgumentParser,
                      argv=None) -> argparse.Namespace:
    """Merge saved training config with CLI overrides.

    Parity: reference arguments/__init__.py:102-122 (get_combined_args), with
    JSON instead of eval().
    """
    import sys
    args_cmdline = parser.parse_args(sys.argv[1:] if argv is None else argv)
    merged = dict(vars(args_cmdline))
    path = os.path.join(args_cmdline.model_path or "", "cfg_args.json")
    if args_cmdline.model_path and os.path.exists(path):
        saved = load_cfg(args_cmdline.model_path)
        flat = {}
        for dc in saved.values():
            flat.update(dataclasses.asdict(dc))
        # CLI wins only where explicitly provided (non-None / non-default-str)
        defaults = {a.dest: parser.get_default(a.dest) for a in parser._actions}
        for k, v in flat.items():
            if k in merged and merged[k] == defaults.get(k):
                merged[k] = v
    return argparse.Namespace(**merged)
