"""CIFAR-10 train/test app (src_yolo2/cifar.c:1-277).

  cifar train <cfg> [weights] -data <dir with data_batch_*.bin>
  cifar test  <cfg> <weights> -data <dir>   (test_batch.bin top-1)
"""

from __future__ import annotations

import glob
import os

import numpy as np

from ..graph.spec import parse_network_cfg
from ..io.weights import load_weights
from ..io import checkpoint as ckpt
from ..data.loader import load_cifar10_batch
from .cli import find_value


def load_cifar_dir(data_dir: str, train: bool = True):
    if train:
        files = sorted(glob.glob(os.path.join(data_dir, "data_batch_*.bin")))
    else:
        files = [os.path.join(data_dir, "test_batch.bin")]
    xs, ys = [], []
    for f in files:
        x, y = load_cifar10_batch(f)
        xs.append(x)
        ys.append(y)
    return np.concatenate(xs), np.concatenate(ys)


def train_cifar(cfg: str, weights, argv):
    from ..train.trainer import Trainer
    data_dir = find_value(argv, "-data", "data/cifar")
    spec = parse_network_cfg(cfg)
    params = None
    if weights:
        params, _ = load_weights(spec, weights)
    trainer = Trainer(spec, params=params)
    x_all, y_all = load_cifar_dir(data_dir, train=True)
    outer = trainer.outer_batch
    rng = np.random.default_rng(0)
    max_batches = spec.net.max_batches or 5000
    avg = None
    backup = find_value(argv, "-backup", "backup")
    os.makedirs(backup, exist_ok=True)
    base = os.path.splitext(os.path.basename(cfg))[0]
    while True:
        i = int(trainer.state.seen) // outer + 1
        if i > max_batches:
            break
        idx = rng.integers(0, len(x_all), outer)
        m = trainer.step(x_all[idx], y_all[idx])
        loss = float(m["loss"]) / outer
        avg = loss if avg is None else avg * .95 + loss * .05
        if i % 20 == 0:
            print(f"{i}: loss {loss:.5f} avg {avg:.5f} "
                  f"lr {float(m['lr']):.5f}")
        if i % 500 == 0:
            ckpt.export_weights(os.path.join(backup, f"{base}.backup"),
                                spec, trainer.state)
    ckpt.export_weights(os.path.join(backup, f"{base}.weights"),
                        spec, trainer.state)
    return trainer


def test_cifar(cfg: str, weights: str, argv):
    import jax
    import jax.numpy as jnp
    from ..graph.compiler import build_forward
    data_dir = find_value(argv, "-data", "data/cifar")
    spec = parse_network_cfg(cfg)
    params, _ = load_weights(spec, weights)
    params = jax.tree.map(jnp.asarray, params)
    fwd = jax.jit(lambda p, x: build_forward(spec)(p, x)[0])
    x_all, y_all = load_cifar_dir(data_dir, train=False)
    correct = 0
    bs = 500
    for i in range(0, len(x_all), bs):
        out = np.asarray(fwd(params, jnp.asarray(x_all[i:i + bs])))
        correct += int((out.argmax(1) == y_all[i:i + bs].argmax(1)).sum())
    acc = correct / len(x_all)
    print(f"top-1 accuracy: {acc:.4f} ({correct}/{len(x_all)})")
    return acc


def run_cifar(argv):
    sub = argv.pop(0)
    if sub == "train":
        cfg = argv.pop(0)
        weights = argv.pop(0) if argv and not argv[0].startswith("-") \
            else None
        return train_cifar(cfg, weights, argv)
    if sub == "test":
        return test_cifar(argv.pop(0), argv.pop(0), argv)
    raise SystemExit(f"unknown cifar subcommand {sub}")


__all__ = ["run_cifar", "train_cifar", "test_cifar", "load_cifar_dir"]
