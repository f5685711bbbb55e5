"""Failure snapshot dumps — the TPU analogue of the reference rasterizer's
``--debug`` contract (/root/reference/README.md:156-159: on kernel failure
the rasterizer writes a snapshot of its inputs for offline repro).

XLA kernels don't "fail" the way CUDA launches do; the observable failures
here are a non-finite loss or a pair-list overflow that persists after
capacity growth. When ``PipelineConfig.debug`` is set, the train loop calls
:func:`dump_snapshot` with everything needed to replay the step offline
(tools/debug_nan.py consumes the same arrays).
"""
from __future__ import annotations

import numpy as np


def dump_snapshot(path: str, state, cam, cam_arrays, iteration: int,
                  reason: str) -> str:
    """Write the full step input set to ``path`` (.npz). Returns the path.

    state: trainer.TrainState; cam: CameraView (pytree of arrays);
    cam_arrays: (gt, alpha_mask, invdepth_gt, depth_mask) host arrays.
    """
    import jax

    payload = {"iteration": np.asarray(iteration), "reason": np.asarray(reason)}
    for name, tree in (("state", state), ("cam", cam)):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for kp, leaf in flat:
            key = name + jax.tree_util.keystr(kp)
            payload[key] = np.asarray(leaf)
    gt, amask, inv_gt, dmask = cam_arrays
    payload.update(gt=np.asarray(gt), alpha_mask=np.asarray(amask),
                   invdepth_gt=np.asarray(inv_gt), depth_mask=np.asarray(dmask))
    np.savez_compressed(path, **payload)
    return path
