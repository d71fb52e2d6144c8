"""Classifier application: train / valid / predict.

Mirrors run_classifier (src_yolo2/classifier.c:1124-1178):
  classifier train <data> <cfg> [weights]
  classifier valid <data> <cfg> <weights>          (top-1/top-k)
  classifier predict <data> <cfg> <weights> <image>
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..config import read_data_cfg, read_names
from ..graph.spec import parse_network_cfg
from ..io.weights import load_weights
from ..io import checkpoint as ckpt
from .cli import find_value, find_arg


def train_classifier(data_cfg: str, cfg: str, weights: str | None,
                     argv: list[str]):
    """train_classifier (classifier.c:38-150)."""
    from ..data.loader import ClassificationLoader
    from ..train.trainer import Trainer

    options = read_data_cfg(data_cfg)
    train_list = options.get("train", "data/train.list")
    backup_dir = options.get("backup", "backup")
    labels = read_names(options["labels"]) if "labels" in options else \
        read_names(options["names"])
    os.makedirs(backup_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(cfg))[0]

    spec = parse_network_cfg(cfg)
    params = None
    seen = 0
    if weights:
        params, seen = load_weights(spec, weights)
    trainer = Trainer(spec, params=params)
    if weights and not find_arg(argv, "-clear"):
        import jax.numpy as jnp
        trainer.state.seen = jnp.asarray(int(seen))

    outer = trainer.outer_batch
    loader = ClassificationLoader(
        train_list, labels, w=spec.net.w, h=spec.net.h, batch=outer,
        min_crop=spec.net.min_crop, max_crop=spec.net.max_crop,
        angle=spec.net.angle, aspect=spec.net.aspect, hue=spec.net.hue,
        saturation=spec.net.saturation, exposure=spec.net.exposure)

    max_batches = spec.net.max_batches or 10000
    avg_loss = None
    while True:
        i = int(trainer.state.seen) // outer + 1
        if i > max_batches:
            break
        x, y = loader.next_batch()
        t0 = time.time()
        m = trainer.step(x, y)
        loss = float(m["loss"]) / outer
        avg_loss = loss if avg_loss is None else avg_loss * .9 + loss * .1
        print(f"{i}: {loss:.6f}, {avg_loss:.6f} avg, "
              f"{float(m['lr']):.6f} rate, {time.time()-t0:.3f} s")
        if i % 100 == 0:   # classifier.c:135-145 .backup cadence
            ckpt.export_weights(
                os.path.join(backup_dir, f"{base}.backup"), spec,
                trainer.state)
    ckpt.export_weights(
        os.path.join(backup_dir, f"{base}.weights"), spec, trainer.state)


def validate_classifier(data_cfg: str, cfg: str, weights: str,
                        argv: list[str]):
    """validate_classifier_single semantics (classifier.c:417-470):
    letterboxed single-crop top-1/top-k over the valid list."""
    from ..infer.classifier import Classifier
    from ..ops.image import load_image_rgb

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/valid.list")
    labels = read_names(options["labels"]) if "labels" in options else \
        read_names(options["names"])
    topk = find_value(argv, "-topk", int(options.get("top", 5)), int)
    clf = Classifier(cfg, weights, names=labels)

    with open(valid_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    top1 = topn = 0
    for k, path in enumerate(paths):
        truth = next((i for i, n in enumerate(labels) if n in path), 0)
        pred = clf.predict(load_image_rgb(path))
        order = np.argsort(-pred)[:topk]
        top1 += int(order[0] == truth)
        topn += int(truth in order)
        if (k + 1) % 100 == 0:
            print(f"{k+1}: top1 {top1/(k+1):.4f} top{topk} "
                  f"{topn/(k+1):.4f}")
    n = max(len(paths), 1)
    print(f"top1: {top1/n:.4f}, top{topk}: {topn/n:.4f}")
    return top1 / n, topn / n


def predict_classifier(data_cfg: str, cfg: str, weights: str, image: str,
                       argv: list[str]):
    """predict_classifier (classifier.c:676-760)."""
    from ..infer.classifier import Classifier
    from ..ops.image import load_image_rgb
    options = read_data_cfg(data_cfg) if data_cfg else {}
    labels = None
    if "names" in options:
        labels = read_names(options["names"])
    elif "labels" in options:
        labels = read_names(options["labels"])
    clf = Classifier(cfg, weights, names=labels)
    for idx, p, name in clf.predict_topk(load_image_rgb(image),
                                         k=int(options.get("top", 5))):
        print(f"{name or idx}: {p:.6f}")


def run_classifier(argv: list[str]):
    sub = argv.pop(0)
    if sub == "predict":
        return predict_classifier(argv[0], argv[1], argv[2], argv[3],
                                  argv[4:])
    data_cfg, cfg = argv[0], argv[1]
    weights = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
        else None
    rest = argv[3:] if weights else argv[2:]
    if sub == "train":
        return train_classifier(data_cfg, cfg, weights, rest)
    if sub == "valid":
        return validate_classifier(data_cfg, cfg, weights, rest)
    if sub in ("valid_multi", "validmulti"):
        return validate_classifier_multi(data_cfg, cfg, weights, rest)
    raise SystemExit(f"unknown classifier subcommand {sub}")


def validate_classifier_multi(data_cfg: str, cfg: str, weights: str,
                              argv: list[str]):
    """validate_classifier_multi (classifier.c:472-534): average
    predictions over multiple scales + horizontal flips."""
    import numpy as np
    import jax.numpy as jnp
    from ..infer.classifier import Classifier
    from ..ops.image import load_image_rgb, resize_image_np

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/valid.list")
    labels = read_names(options["labels"]) if "labels" in options else \
        read_names(options["names"])
    topk = find_value(argv, "-topk", int(options.get("top", 5)), int)
    clf = Classifier(cfg, weights, names=labels)
    base = clf.spec.net.w
    scales = [int(base * s) for s in (1.0, 1.15, 1.3)]

    with open(valid_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    top1 = topn = 0
    for k, path in enumerate(paths):
        truth = next((i for i, n in enumerate(labels) if n in path), 0)
        img = load_image_rgb(path)
        pred = None
        for s in scales:
            # classifier.c:512-519: resize to scale, predict image and
            # its horizontal flip, accumulate
            r = resize_image_np(img, s, s)
            r = resize_image_np(r, base, base)
            for flip in (False, True):
                v = r[:, ::-1, :] if flip else r
                import jax
                p = np.asarray(clf._predict(
                    clf.params, jnp.asarray(v[None])))[0]
                pred = p if pred is None else pred + p
        order = np.argsort(-pred)[:topk]
        top1 += int(order[0] == truth)
        topn += int(truth in order)
    n = max(len(paths), 1)
    print(f"multi-crop top1: {top1/n:.4f}, top{topk}: {topn/n:.4f}")
    return top1 / n, topn / n
