"""Training checkpoints: full state capture/restore + capacity growth.

Parity: reference ``torch.save((gaussians.capture(), iteration))`` at
train.py:188-190 / gaussian_model.py:68-100 — the checkpoint holds params,
optimizer moments, densification accumulators, SH warm-up state and
exposure. Stored as a plain .npz (host arrays) — single-host; sharded
checkpointing for multi-host pods goes through orbax in parallel/.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu.models import gaussian_model as gm
from gsplat_tpu.train import densify as densify_lib
from gsplat_tpu.train import optim
from gsplat_tpu.train import trainer


def save_checkpoint(path: str, state: "trainer.TrainState", iteration: int):
    flat, treedef = jax.tree_util.tree_flatten(state)
    np.savez_compressed(
        path, iteration=iteration, n_leaves=len(flat),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_checkpoint(path: str) -> Tuple["trainer.TrainState", int]:
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    # Rebuild treedef from a template with matching shapes
    cap = leaves[0].shape[0]
    # template: infer SH degree from f_rest leaf (index 2 by field order)
    template = _template_state(leaves)
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    assert len(flat_t) == n, f"checkpoint leaf count {n} != {len(flat_t)}"
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, int(data["iteration"])


def _template_state(leaves) -> "trainer.TrainState":
    """Build a zero state with the right pytree structure (leaf shapes come
    from the loaded arrays; only the treedef matters)."""
    cap = leaves[0].shape[0]
    k_rest = leaves[2].shape[1]
    max_deg = int(round((k_rest + 1) ** 0.5)) - 1
    g = gm.empty(cap, max_deg)
    n_img = 1
    return trainer.TrainState(
        gaussians=g, adam=optim.init(gm.trainables(g)),
        exposure=jnp.zeros((n_img, 3, 4)),
        exp_adam=optim.init({"exposure": jnp.zeros((n_img, 3, 4))}),
        stats=densify_lib.init_stats(cap),
        step=jnp.zeros((), jnp.int32))


def grow_capacity(state: "trainer.TrainState", new_cap: int) -> "trainer.TrainState":
    """Host-side capacity doubling: pad every per-slot array (params, Adam
    moments, stats). New slots are inactive with zero moments."""
    old_cap = state.gaussians.capacity
    extra = new_cap - old_cap
    if extra <= 0:
        return state

    g = gm.pad_to_capacity(state.gaussians, new_cap)

    def pad_rows(a):
        if a.ndim >= 1 and a.shape[0] == old_cap:
            pad = [(0, extra)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad)
        return a

    adam = optim.AdamState(
        mu={k: pad_rows(v) for k, v in state.adam.mu.items()},
        nu={k: pad_rows(v) for k, v in state.adam.nu.items()},
        count=state.adam.count)
    stats = densify_lib.DensifyStats(
        xyz_gradient_accum=pad_rows(state.stats.xyz_gradient_accum),
        denom=pad_rows(state.stats.denom),
        max_radii2d=pad_rows(state.stats.max_radii2d))
    return dataclasses.replace(state, gaussians=g, adam=adam, stats=stats)


# ------------------------------------------------------------------ orbax
# Sharded/async checkpointing for multi-host training (SURVEY.md §5:
# "Orbax async checkpointing at intervals; multi-host restore"). The .npz
# path above stays the single-host default; orbax handles NamedSharding'd
# arrays transparently on pods.

class AsyncCheckpointManager:
    """Periodic async checkpointing for the train loop (SURVEY.md §5 row 3:
    "Orbax async checkpointing at intervals"). ``save()`` returns as soon as
    the on-device state is snapshotted; serialization to disk happens on
    orbax's background thread, overlapping subsequent train steps. Keeps the
    newest ``max_to_keep`` steps."""

    def __init__(self, dir_path: str, max_to_keep: int = 3):
        import os
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._mngr = ocp.CheckpointManager(
            os.path.abspath(dir_path),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True))

    def save(self, iteration: int, state: "trainer.TrainState") -> None:
        self._mngr.save(iteration,
                        args=self._ocp.args.StandardSave(state))

    def restore(self, template: "trainer.TrainState", iteration: int = -1):
        """(state, iteration); -1 restores the latest step."""
        if iteration == -1:
            iteration = self._mngr.latest_step()
            if iteration is None:
                raise FileNotFoundError("no checkpoints in manager dir")
        state = self._mngr.restore(
            iteration, args=self._ocp.args.StandardRestore(template))
        return state, iteration

    def restore_latest(self):
        """(state, iteration) without a caller-supplied template: a raw
        restore provides the leaf shapes, from which the TrainState template
        is rebuilt (capacity / SH degree / image count)."""
        iteration = self._mngr.latest_step()
        if iteration is None:
            raise FileNotFoundError("no checkpoints in manager dir")
        raw = self._mngr.restore(iteration)
        cap = raw["gaussians"]["xyz"].shape[0]
        k_rest = raw["gaussians"]["f_rest"].shape[1]
        max_deg = int(round((k_rest + 1) ** 0.5)) - 1
        n_img = raw["exposure"].shape[0]
        g = gm.empty(cap, max_deg)
        template = trainer.TrainState(
            gaussians=g, adam=optim.init(gm.trainables(g)),
            exposure=jnp.zeros((n_img, 3, 4)),
            exp_adam=optim.init({"exposure": jnp.zeros((n_img, 3, 4))}),
            stats=densify_lib.init_stats(cap),
            step=jnp.zeros((), jnp.int32))
        state = self._mngr.restore(
            iteration, args=self._ocp.args.StandardRestore(template))
        return state, iteration

    def close(self) -> None:
        """Block until in-flight saves land, then release resources."""
        self._mngr.wait_until_finished()
        self._mngr.close()


def save_checkpoint_orbax(dir_path: str, state: "trainer.TrainState",
                          iteration: int) -> None:
    """Write <dir_path>/step_<iteration>/ with the full TrainState."""
    import os
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(dir_path, f"step_{iteration}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_checkpoint_orbax(dir_path: str, template: "trainer.TrainState",
                          iteration: int = -1):
    """Restore (state, iteration); iteration == -1 loads the latest step.

    ``template`` supplies shapes/dtypes/shardings (build via
    trainer.init_state with the checkpointed capacity)."""
    import os
    import re
    import orbax.checkpoint as ocp

    if iteration == -1:
        steps = [int(m.group(1)) for m in
                 (re.match(r"step_(\d+)$", d)
                  for d in os.listdir(dir_path)) if m]
        if not steps:
            raise FileNotFoundError(f"no step_* checkpoints in {dir_path}")
        iteration = max(steps)
    path = os.path.abspath(os.path.join(dir_path, f"step_{iteration}"))
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path, template)
    return state, iteration
