"""Checkpoint / resume: params + optimizer state + step, atomically on disk.

The reference checkpoints only model weights (`torch.save(state_dict)`,
RegressionNetwork/train.py:147-167; GenProjector/util.py:173-191) and loses
optimizer state across resumes. Here the full train state round-trips:
save(state) -> restore(template_state) with flax msgpack serialization,
plus `latest` symlinking and epoch-tagged names matching the reference's
naming scheme ({epoch}_net / latest_net).
"""

from __future__ import annotations

import os
import tempfile

import flax.serialization
import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint"]


def save_checkpoint(ckpt_dir: str, state, name: str = "latest") -> str:
    """Serialize a pytree train state to {ckpt_dir}/{name}.msgpack atomically."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    data = flax.serialization.to_bytes(state)
    path = os.path.join(ckpt_dir, f"{name}.msgpack")
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return path


def restore_checkpoint(path: str, template):
    """Restore into a template state (same structure, e.g. from create_state)."""
    with open(path, "rb") as f:
        data = f.read()
    restored = flax.serialization.from_bytes(template, data)
    # fail with the offending path instead of a downstream shape error (the
    # usual cause: template built with different --anchors/--block_config/
    # --ngf than the checkpointed run)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(jax.tree.map(jnp_shape, template))[0],
        jax.tree_util.tree_flatten_with_path(jax.tree.map(jnp_shape, restored))[0],
    ):
        if a != b:
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
            raise ValueError(
                f"checkpoint {path} does not match the model/optimizer template "
                f"at {name}: template {a} vs checkpoint {b} — check the model "
                f"size flags (--anchors/--block_config/--ngf/...) used for training"
            )
    return restored


def jnp_shape(x):
    return getattr(x, "shape", ())


def latest_checkpoint(ckpt_dir: str) -> str | None:
    p = os.path.join(ckpt_dir, "latest.msgpack")
    return p if os.path.exists(p) else None
