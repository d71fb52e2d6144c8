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


CIFAR_LABELS = ("airplane", "automobile", "bird", "cat", "deer",
                "dog", "frog", "horse", "ship", "truck")


def _batched_forward(cfg: str, weights):
    import jax
    import jax.numpy as jnp
    from ..graph.compiler import build_forward
    spec = parse_network_cfg(cfg)
    if weights:
        params, _ = load_weights(spec, weights)
    else:
        from ..io.weights import init_params
        params = init_params(spec)
    params = jax.tree.map(jnp.asarray, params)
    return spec, params, jax.jit(lambda p, x: build_forward(spec)(p, x)[0])


def _predict_all(fwd, params, x_all, bs=500):
    import jax.numpy as jnp
    outs = []
    for i in range(0, len(x_all), bs):
        outs.append(np.asarray(fwd(params, jnp.asarray(x_all[i:i + bs]))))
    return np.concatenate(outs).reshape(len(x_all), -1)


def test_cifar_multi(cfg: str, weights: str, argv):
    """test_cifar_multi (cifar.c:115-146): image + horizontal-flip
    prediction sum. The reference runs 2 batch-1 forwards per image;
    here both orientations go through batched dispatches."""
    data_dir = find_value(argv, "-data", "data/cifar")
    _, params, fwd = _batched_forward(cfg, weights)
    x_all, y_all = load_cifar_dir(data_dir, train=False)
    pred = _predict_all(fwd, params, x_all) + \
        _predict_all(fwd, params, x_all[:, :, ::-1, :])
    hit = (pred.argmax(1) == y_all.argmax(1))
    running = np.cumsum(hit) / np.arange(1, len(hit) + 1)
    for i in range(0, len(hit), max(len(hit) // 10, 1)):
        print(f"{i:4d}: {100. * running[i]:.2f}%")
    acc = float(running[-1])
    print(f"multi top-1: {acc:.4f}")
    return acc


def _csv_ensemble(cfg, weights, argv, *, train: bool):
    """test_cifar_csv/csvtrain (cifar.c:191-244): predict, predict the
    flipped set, average — then, bug-for-bug with the reference, write
    and score `pred` (the HALF-SCALED unflipped matrix): the C code
    calls matrix_add_matrix(pred, pred2) which accumulates into pred2
    and prints pred, so the flip ensemble is computed and discarded."""
    import sys
    data_dir = find_value(argv, "-data", "data/cifar")
    _, params, fwd = _batched_forward(cfg, weights)
    x_all, y_all = load_cifar_dir(data_dir, train=train)
    pred = _predict_all(fwd, params, x_all) * .5
    pred2 = _predict_all(fwd, params, x_all[:, :, ::-1, :]) * .5
    pred2 = pred2 + pred    # ensemble lives in pred2, unused (quirk)
    for row in pred:
        print(",".join(f"{v:.17g}" for v in row))
    acc = float((pred.argmax(1) == y_all.argmax(1)).mean())
    print(f"Accuracy: {acc:f}", file=sys.stderr)
    return acc


def test_cifar_csv(cfg, weights, argv):
    return _csv_ensemble(cfg, weights, argv, train=False)


def test_cifar_csvtrain(cfg, weights, argv):
    return _csv_ensemble(cfg, weights, argv, train=True)


def eval_cifar_csv(argv):
    """eval_cifar_csv (cifar.c:246-257): score a saved prediction CSV
    (e.g. an ensemble average) against the test labels."""
    import sys
    data_dir = find_value(argv, "-data", "data/cifar")
    csv = find_value(argv, "-csv", "results/combined.csv")
    _, y_all = load_cifar_dir(data_dir, train=False)
    pred = np.loadtxt(csv, delimiter=",", ndmin=2)
    print(f"{pred.shape[0]} {pred.shape[1]}", file=sys.stderr)
    acc = float((pred.argmax(1) == y_all[:len(pred)].argmax(1)).mean())
    print(f"Accuracy: {acc:f}", file=sys.stderr)
    return acc


def extract_cifar(argv):
    """extract_cifar (cifar.c:169-189): dump train/test batches as
    image files named <index>_<label> (ppm here, png in the
    reference)."""
    from tools.synth_dataset import write_ppm
    data_dir = find_value(argv, "-data", "data/cifar")
    out_dir = find_value(argv, "-out", data_dir)
    written = []
    for split, train in (("train", True), ("test", False)):
        x_all, y_all = load_cifar_dir(data_dir, train=train)
        d = os.path.join(out_dir, split)
        os.makedirs(d, exist_ok=True)
        for i, (x, y) in enumerate(zip(x_all, y_all)):
            name = os.path.join(
                d, f"{i}_{CIFAR_LABELS[int(y.argmax())]}.ppm")
            write_ppm(name, (np.clip(x, 0, 1) * 255).astype(np.uint8))
            written.append(name)
    print(f"extracted {len(written)} images -> {out_dir}")
    return written


def train_cifar_distill(cfg: str, weights, argv):
    """train_cifar_distill (cifar.c:59-113): soft-target training —
    truth = .9 * ensemble CSV + .1 * one-hot."""
    from ..train.trainer import Trainer
    data_dir = find_value(argv, "-data", "data/cifar")
    csv = find_value(argv, "-csv", "results/ensemble.csv")
    spec = parse_network_cfg(cfg)
    params = None
    if weights:
        params, _ = load_weights(spec, weights)
    trainer = Trainer(spec, params=params)
    x_all, y_all = load_cifar_dir(data_dir, train=True)
    soft = np.loadtxt(csv, delimiter=",", ndmin=2).astype(np.float32)
    w = 0.9
    y_all = w * soft[:len(y_all)] + (1. - w) * y_all
    outer = trainer.outer_batch
    rng = np.random.default_rng(0)
    max_batches = spec.net.max_batches or 5000
    avg = None
    backup = find_value(argv, "-backup", "backup")
    os.makedirs(backup, exist_ok=True)
    base = os.path.splitext(os.path.basename(cfg))[0]
    losses = []
    while True:
        i = int(trainer.state.seen) // outer + 1
        if i > max_batches:
            break
        idx = rng.integers(0, len(x_all), outer)
        m = trainer.step(x_all[idx], y_all[idx])
        loss = float(m["loss"]) / outer
        losses.append(loss)
        avg = loss if avg is None else avg * .95 + loss * .05
        if i % 20 == 0:
            print(f"{i}: loss {loss:.5f} avg {avg:.5f} "
                  f"lr {float(m['lr']):.5f}")
    ckpt.export_weights(os.path.join(backup, f"{base}.weights"),
                        spec, trainer.state)
    return losses


def run_cifar(argv):
    sub = argv.pop(0)
    if sub == "train":
        cfg = argv.pop(0)
        weights = argv.pop(0) if argv and not argv[0].startswith("-") \
            else None
        return train_cifar(cfg, weights, argv)
    if sub == "distill":
        cfg = argv.pop(0)
        weights = argv.pop(0) if argv and not argv[0].startswith("-") \
            else None
        return train_cifar_distill(cfg, weights, argv)
    if sub == "extract":
        return extract_cifar(argv)
    if sub == "eval":
        return eval_cifar_csv(argv)
    if sub in ("test", "multi", "csv", "csvtrain"):
        cfg = argv.pop(0)
        weights = argv.pop(0) if argv and not argv[0].startswith("-") \
            else None
        fn = {"test": test_cifar, "multi": test_cifar_multi,
              "csv": test_cifar_csv,
              "csvtrain": test_cifar_csvtrain}[sub]
        return fn(cfg, weights, argv)
    raise SystemExit(f"unknown cifar subcommand {sub}")


__all__ = ["run_cifar", "train_cifar", "test_cifar", "load_cifar_dir",
           "test_cifar_multi", "test_cifar_csv", "test_cifar_csvtrain",
           "eval_cifar_csv", "extract_cifar", "train_cifar_distill",
           "CIFAR_LABELS"]
