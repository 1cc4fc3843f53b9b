"""Checkpoint/resume for renders and inverse-rendering runs.

The reference has no checkpointing at all: the canvas lives in memory and
is dumped once at the end, so a killed render loses everything
(SURVEY.md §5; src/libs/canvas/canvas.c:303-327). Here both long-running
loops are resumable:

  * training (parallel/train.py): orbax-checkpointed TrainState
    (params + optimizer state) + PRNG key + step counter, with async
    save and automatic latest-step restore;
  * rendering (render/render.py): the chunk loop is deterministic in the
    (key, chunk_index) pair, so a render checkpoint is just the canvas
    array + number of completed chunks.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional, Tuple

import jax
import numpy as np

from fast_ray_tracer_tpu.parallel.train import TrainState


def _mgr(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def _leaf_name(path) -> str:
    """Stable, filesystem-safe name from a tree path: names are derived
    from the leaf's OWN path (e.g. params.mat_Kd, opt_state.0.mu.light_
    intensity), so adding/removing sibling entries (like the optional
    'key') can never shift which array a name refers to — the failure
    mode of the earlier positional l0/l1/... scheme."""
    import re
    s = jax.tree_util.keystr(path)
    s = re.sub(r"[^A-Za-z0-9_.]+", ".", s).strip(".")
    return s or "root"


def _flatten_nonempty(item):
    """Flatten a pytree to an orbax-friendly flat dict keyed by path
    names, skipping zero-size leaves (orbax refuses them; they carry no
    data and are reconstructed from the example structure on restore)."""
    leaves_p, treedef = jax.tree_util.tree_flatten_with_path(item)
    names = []
    seen = {}
    for p, _ in leaves_p:
        n = _leaf_name(p)
        if n in seen:            # paranoia: sanitation collision
            seen[n] += 1
            n = f"{n}.{seen[n]}"
        else:
            seen[n] = 0
        names.append(n)
    leaves = [x for _, x in leaves_p]
    payload = {n: x for n, x in zip(names, leaves) if int(np.size(x)) > 0}
    return payload, names, leaves, treedef


def save_train_state(directory: str, step: int, state: TrainState,
                     key=None, wait: bool = False) -> None:
    """Checkpoint a TrainState (+ optional PRNG key) at `step`."""
    import orbax.checkpoint as ocp
    mgr = _mgr(directory)
    item = {"params": state.params, "opt_state": state.opt_state}
    if key is not None:
        item["key"] = jax.random.key_data(key)
    payload, _, _, _ = _flatten_nonempty(item)
    mgr.save(step, args=ocp.args.StandardSave(payload))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def restore_train_state(directory: str, example: TrainState,
                        key=None) -> Optional[Tuple[int, TrainState, Any]]:
    """Restore the latest checkpoint, or None if the directory is empty.
    `example` supplies the pytree structure/dtypes (zero-size leaves come
    straight from it). Checkpoints written by the earlier positional
    (l0/l1/...) scheme are detected and read back compatibly."""
    import orbax.checkpoint as ocp
    if not os.path.isdir(directory):
        return None
    mgr = _mgr(directory)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None
    item = {"params": example.params, "opt_state": example.opt_state}
    if key is not None:
        item["key"] = jax.random.key_data(key)
    tmpl, names, leaves, treedef = _flatten_nonempty(item)
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(tmpl))
        new_leaves = [restored.get(n, x) for n, x in zip(names, leaves)]
    except Exception as named_err:
        # legacy positional layout (same item structure at save time).
        # Exception only — KeyboardInterrupt/SystemExit propagate; and if
        # the legacy read fails too, re-raise the ORIGINAL error so a
        # corrupt checkpoint surfaces as itself, not as a confusing
        # legacy-format mismatch.
        tmpl_l = {f"l{i}": x for i, x in enumerate(leaves)
                  if int(np.size(x)) > 0}
        try:
            restored = mgr.restore(step,
                                   args=ocp.args.StandardRestore(tmpl_l))
        except Exception:
            raise named_err
        new_leaves = [restored.get(f"l{i}", x)
                      for i, x in enumerate(leaves)]
    mgr.close()
    item = jax.tree_util.tree_unflatten(treedef, new_leaves)
    out_key = None
    if "key" in item:
        out_key = jax.random.wrap_key_data(item["key"])
    return step, TrainState(item["params"], item["opt_state"]), out_key


def save_render_progress(path: str, canvas: np.ndarray,
                         chunks_done: int, total_chunks: int,
                         seed: Optional[int]) -> None:
    """Atomic snapshot of a partially rendered canvas."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"canvas": np.asarray(canvas),
                     "chunks_done": int(chunks_done),
                     "total_chunks": int(total_chunks),
                     "seed": seed}, f)
    os.replace(tmp, path)


def load_render_progress(path: str):
    """-> dict with canvas/chunks_done/total_chunks/seed, or None."""
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return pickle.load(f)
