"""Checkpointing (Orbax) with the reference's cadence and layout.

Reference behavior (SURVEY §5.4): `tf.train.Checkpoint(model, optimizer)`
saved per epoch (whisper_dist.py:916-919,956) and additionally every 50 steps
in wav2vec2 jobs (wav2vec2_dist.py:1341-1342); final weights-only save into
`<workspace>/model_cache/<name>` (whisper_dist.py:1024-1026).  The reference
never restores; `restore` here is a flagged extension (it makes the jobs
resumable under preemption, which TPU pods actually need).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from tethys_tpu.utils.artifacts import workspace_dir


class CheckpointManager:
    """Tagged synchronous checkpoints of (params, opt_state) pytrees."""

    def __init__(self, directory: Optional[str] = None):
        self.directory = directory or os.path.join(workspace_dir(), "checkpoints")
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.abspath(os.path.join(self.directory, tag))

    def save(self, tag: str, state: Any) -> str:
        # Pass device arrays straight to Orbax: it writes sharded global
        # arrays natively (each process serializes its own shards).  A
        # jax.device_get here would raise on multi-process meshes where
        # other stages'/model-shards' devices are non-addressable — the
        # same failure class gather_unpacked_params fixes for --pp
        # finalization, pinned by the 4-process jobs-entry test.
        path = self._path(tag)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, tag: str, template: Any) -> Any:
        return self._ckptr.restore(self._path(tag), target=template)

    def restore_like(self, tag: str, state: Any) -> Any:
        """Restore directly into `state`'s shardings (round-3 extension:
        makes `--resume` work for TP/SP runs — Orbax places each leaf
        according to the abstract template, so Megatron-sharded params come
        back sharded without a host round-trip through replicated form).

        Leaves that are not yet mesh-resident (e.g. Adam's scalar `count`,
        which optimizer.init leaves on the default device) are restored
        replicated on the state's mesh — a committed single-device leaf
        next to mesh-committed params would poison the next jit call."""
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = None
        for leaf in jax.tree_util.tree_leaves(state):
            s = getattr(leaf, "sharding", None)
            if isinstance(s, NamedSharding):
                mesh = s.mesh
                break

        def as_template(x):
            if not isinstance(x, jax.Array):
                return x
            sharding = x.sharding
            if not isinstance(sharding, NamedSharding) and mesh is not None:
                sharding = NamedSharding(mesh, PartitionSpec())
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

        template = jax.tree_util.tree_map(as_template, state)
        return self._ckptr.restore(self._path(tag), target=template)

    def latest_tag(self, prefix: Optional[str] = None) -> Optional[str]:
        """Newest checkpoint tag, optionally scoped to a tag prefix.

        Jobs share the default checkpoint directory, so an unscoped lookup
        could hand a whisper `--resume` a wav2vec2 pytree; callers pass their
        own tag prefix to only ever restore their own state.
        """
        tags = [
            d for d in os.listdir(self.directory)
            if os.path.isdir(os.path.join(self.directory, d))
            and (prefix is None or d.startswith(prefix))
        ]
        if not tags:
            return None
        return max(tags, key=lambda t: os.path.getmtime(
            os.path.join(self.directory, t)))


def save_final_weights(params: Any, name: str,
                       cache_dir: Optional[str] = None) -> str:
    """Final weights-only save into `<workspace>/model_cache/<name>`."""
    cache_dir = cache_dir or os.path.join(workspace_dir(), "model_cache")
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.abspath(os.path.join(cache_dir, name))
    ckptr = ocp.StandardCheckpointer()
    # No device_get: Orbax serializes sharded global arrays per-process
    # (see CheckpointManager.save) and host values pass through unchanged.
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path
