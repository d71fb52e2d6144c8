"""Checkpoint / resume for training state.

Two formats, mirroring the reference's dual role of .weights files
(SURVEY §5.4):
  * ``.weights`` export — the bit-compatible interchange format
    (weights + seen counter; the reference's .backup cadence,
    detector.c:150-157);
  * native ``.npz`` train-state checkpoints carrying params + momentum
    velocity + seen, so resume restores the LR-schedule position AND
    optimizer state (the reference loses velocity on restart).
"""

from __future__ import annotations

import io
import os
import tempfile

import numpy as np

import jax

from ..graph import spec as S
from .weights import save_weights, load_weights


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def _unflatten_list(flat: dict, template):
    def rebuild(t, prefix):
        if isinstance(t, dict):
            return {k: rebuild(v, f"{prefix}{k}/") for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            return [rebuild(v, f"{prefix}{i}/") for i, v in enumerate(t)]
        return flat[prefix[:-1]]
    return rebuild(template, "")


def save_train_state(path: str, state, *, atomic: bool = True):
    """state: train.trainer.TrainState."""
    arrays = {}
    for name, arr in _flatten(jax.tree.map(np.asarray, state.params), "p/"):
        arrays[name] = arr
    for name, arr in _flatten(jax.tree.map(np.asarray, state.velocity),
                              "v/"):
        arrays[name] = arr
    arrays["seen"] = np.asarray(state.seen)
    if atomic:
        d = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
        os.close(fd)
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    else:
        np.savez(path, **arrays)


def load_train_state(path: str, template_state):
    """Restore into the structure of template_state (params/velocity
    trees must match)."""
    from ..train.trainer import TrainState
    z = np.load(path)
    flat_p = {k[2:]: z[k] for k in z.files if k.startswith("p/")}
    flat_v = {k[2:]: z[k] for k in z.files if k.startswith("v/")}
    params = _unflatten_list(flat_p, jax.tree.map(np.asarray,
                                                  template_state.params))
    velocity = _unflatten_list(flat_v, jax.tree.map(np.asarray,
                                                    template_state.velocity))
    import jax.numpy as jnp
    return TrainState(params=jax.tree.map(jnp.asarray, params),
                      velocity=jax.tree.map(jnp.asarray, velocity),
                      seen=jnp.asarray(int(z["seen"])))


def export_weights(path: str, spec: S.NetworkSpec, state):
    """Write the interchange .weights with the live seen counter."""
    params = jax.tree.map(np.asarray, state.params)
    save_weights(spec, params, path, seen=int(state.seen))


def checkpoint_name(backup_dir: str, base: str, batch_num: int,
                    final: bool = False) -> str:
    """The reference's naming scheme (detector.c:150-165):
    <base>_<N>.weights every 1000 (100 below 1000), <base>_final.weights,
    <base>.backup for the rolling latest."""
    if final:
        return os.path.join(backup_dir, f"{base}_final.weights")
    return os.path.join(backup_dir, f"{base}_{batch_num}.weights")


def should_checkpoint(batch_num: int) -> bool:
    """detector.c:150: every 1000 iters, every 100 below 1000."""
    if batch_num >= 1000:
        return batch_num % 1000 == 0
    return batch_num % 100 == 0


__all__ = ["save_train_state", "load_train_state", "export_weights",
           "checkpoint_name", "should_checkpoint"]
