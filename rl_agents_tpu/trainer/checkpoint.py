"""Sharded array checkpointing via orbax.

TPU-native replacement for the reference's torch ``.tar`` model files
(reference: trainer/evaluation.py:292-323, deep_q_network/pytorch.py:82-93):
checkpoints are directories of sharded arrays written atomically, restore
preserves ``jax.sharding`` layouts across any number of hosts (every process
calls save/restore collectively), and retention/step bookkeeping replaces the
hand-rolled latest/checkpoint-{i} file naming. Works on any pytree: model
params, optimizer state, replay rings, PRNG keys — the whole fused train
state of ``parallel/actor_learner.py`` round-trips as one object.
"""
from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax

logger = logging.getLogger(__name__)


class OrbaxCheckpointStore:
    """A step-indexed checkpoint directory with retention.

    ``save(step, tree)`` writes atomically (a partial write never corrupts
    ``latest``); ``restore(step=None, template=None)`` reads the latest (or a
    specific) step. Passing ``template`` — a pytree of arrays or
    ``jax.ShapeDtypeStruct`` with ``sharding`` set — restores each leaf
    sharded accordingly; without one, leaves come back as host arrays.
    """

    def __init__(self, directory, max_to_keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = Path(directory).absolute()
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, tree: Any, wait: bool = True):
        self.manager.save(int(step), args=self._ocp.args.StandardSave(tree))
        if wait:
            self.manager.wait_until_finished()
        return self.directory / str(int(step))

    def restore(self, step: Optional[int] = None, template: Any = None):
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        if template is not None:
            template = jax.tree.map(_as_abstract, template)
            args = self._ocp.args.StandardRestore(template)
        else:
            args = self._ocp.args.StandardRestore()
        return self.manager.restore(int(step), args=args)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def all_steps(self):
        return sorted(self.manager.all_steps())

    def close(self):
        self.manager.close()


def _barrier(name: str):
    """Cross-host barrier; no-op in a single-process run."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def save_pytree(path, tree: Any):
    """One-shot atomic pytree checkpoint at ``path`` (a directory).

    Overwrites: orbax silently skips re-saving an existing step, so a stale
    single-step store (e.g. ``latest.orbax`` written every cadence) must be
    cleared first. In a multi-host run the clear happens on process 0 only,
    fenced by barriers, so no process races another's save against the
    rmtree (orbax save itself is collective across all processes).
    """
    import shutil

    path = Path(path)
    if jax.process_index() == 0 and path.exists():
        shutil.rmtree(path)
    _barrier(f"save_pytree:{path}")
    store = OrbaxCheckpointStore(path, max_to_keep=1)
    try:
        return store.save(0, tree)
    finally:
        store.close()


def load_pytree(path, template: Any = None):
    """Restore a ``save_pytree`` checkpoint; ``template`` re-lays-out leaves
    on its shardings. Raises ``FileNotFoundError`` without touching the disk
    when the checkpoint directory is absent (so a ``--recover`` against a
    missing file never leaves a stray empty store behind)."""
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"No checkpoint directory at {path}")
    store = OrbaxCheckpointStore(path, max_to_keep=1)
    try:
        return store.restore(template=template)
    finally:
        store.close()


def _as_abstract(leaf):
    """Template leaves as ShapeDtypeStruct so restore re-lays-out arrays on
    the leaf's (possibly multi-device) sharding without reading the donor."""
    if isinstance(leaf, jax.ShapeDtypeStruct):
        return leaf
    if isinstance(leaf, jax.Array):
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=leaf.sharding)
    return leaf
