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
    if sub == "try":
        # classifier.c:1164: try <data> <cfg> <weights> <image> [layer]
        rest = argv[4:]
        if rest and not rest[0].startswith("-"):
            rest = ["-layer", rest[0]] + rest[1:]
        return try_classifier(argv[0], argv[1], argv[2], argv[3], rest)
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
    if sub in ("valid_crop", "validcrop"):
        return validate_classifier_crop(data_cfg, cfg, weights, rest)
    if sub in ("valid_full", "validfull"):
        return validate_classifier_full(data_cfg, cfg, weights, rest)
    if sub in ("valid_10", "valid10"):
        return validate_classifier_10(data_cfg, cfg, weights, rest)
    if sub == "test":
        return test_classifier(data_cfg, cfg, weights, rest)
    if sub == "label":
        return label_classifier(data_cfg, cfg, weights, rest)
    if sub == "demo":
        return demo_classifier(data_cfg, cfg, weights, rest)
    if sub == "threat":
        return threat_classifier(data_cfg, cfg, weights, rest)
    if sub == "gun":
        return gun_classifier(data_cfg, cfg, weights, rest)
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


def _class_of_path(path: str, labels) -> int:
    return next((i for i, n in enumerate(labels) if n in path), -1)


def validate_classifier_crop(data_cfg: str, cfg: str, weights: str,
                             argv: list[str]):
    """validate_classifier_crop (classifier.c:269-334): batched
    plain-resize evaluation (OLD_CLASSIFICATION_DATA) in ~1000-image
    splits with running top-1/top-k averages — the TPU-native form is
    one jitted batched forward per split instead of network_accuracies'
    per-row loop."""
    import jax
    import jax.numpy as jnp
    from ..graph.compiler import build_forward
    from ..ops.image import load_image_rgb, resize_image_np

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/train.list")
    labels = read_names(options["labels"]) if "labels" in options else \
        read_names(options["names"])
    topk = find_value(argv, "-topk", int(options.get("top", 1)), int)
    batch = find_value(argv, "-batch", 64, int)

    spec = parse_network_cfg(cfg)
    params, _ = load_weights(spec, weights)
    params = jax.tree.map(jnp.asarray, params)
    fwd = jax.jit(lambda p, x: build_forward(spec)(p, x)[0])

    with open(valid_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    m = len(paths)
    splits = max(m // 1000, 1)
    avg_acc = avg_topk = 0.0
    done = 0
    for s in range(splits):
        part = paths[s * m // splits:(s + 1) * m // splits]
        acc1 = acck = 0
        for off in range(0, len(part), batch):
            chunk = part[off:off + batch]
            x = np.stack([resize_image_np(load_image_rgb(p),
                                          spec.net.w, spec.net.h)
                          for p in chunk])
            pred = np.asarray(fwd(params, jnp.asarray(x)))
            pred = pred.reshape(len(chunk), -1)[:, :len(labels)]
            order = np.argsort(-pred, axis=1)[:, :topk]
            truth = np.array([_class_of_path(p, labels) for p in chunk])
            acc1 += int((order[:, 0] == truth).sum())
            acck += int((order == truth[:, None]).any(axis=1).sum())
        avg_acc += acc1 / max(len(part), 1)
        avg_topk += acck / max(len(part), 1)
        done += 1
        print(f"{done}: top 1: {avg_acc/done:f}, top {topk}: "
              f"{avg_topk/done:f}, {len(part)} images")
    return avg_acc / max(done, 1), avg_topk / max(done, 1)


def validate_classifier_full(data_cfg: str, cfg: str, weights: str,
                             argv: list[str]):
    """validate_classifier_full (classifier.c:408-467): per-image
    fully-convolutional evaluation — resize the short side to net.w,
    resize_network to the image dims (here: static-shape recompile per
    resolution bucket, cached), global-pool head keeps outputs =
    classes."""
    import jax
    import jax.numpy as jnp
    from ..graph.compiler import build_forward
    from ..ops.image import load_image_rgb, resize_image_np

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/train.list")
    labels = read_names(options["labels"]) if "labels" in options else \
        read_names(options["names"])
    topk = find_value(argv, "-topk", int(options.get("top", 1)), int)

    spec = parse_network_cfg(cfg)
    params, _ = load_weights(spec, weights)
    params = jax.tree.map(jnp.asarray, params)
    size = spec.net.w
    fwd_cache: dict[tuple[int, int], object] = {}

    def fwd_for(w: int, h: int):
        if (w, h) not in fwd_cache:
            rspec = spec.resize(w, h)
            f = build_forward(rspec)
            fwd_cache[(w, h)] = jax.jit(lambda p, x: f(p, x)[0])
        return fwd_cache[(w, h)]

    with open(valid_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    avg_acc = avg_topk = 0.0
    for i, path in enumerate(paths):
        truth = _class_of_path(path, labels)
        img = load_image_rgb(path)
        ih, iw = img.shape[:2]
        # resize_min (image.c): short side -> net.w, keep aspect;
        # bucket to multiples of 32 so the compile cache stays small
        scale = size / min(iw, ih)
        nw = max(32, int(round(iw * scale / 32)) * 32)
        nh = max(32, int(round(ih * scale / 32)) * 32)
        x = resize_image_np(img, nw, nh)[None]
        pred = np.asarray(fwd_for(nw, nh)(params, jnp.asarray(x)))
        pred = pred.reshape(-1)[:len(labels)]
        order = np.argsort(-pred)[:topk]
        avg_acc += int(order[0] == truth)
        avg_topk += int(truth in order)
        print(f"{i}: top 1: {avg_acc/(i+1):f}, top {topk}: "
              f"{avg_topk/(i+1):f}")
    n = max(len(paths), 1)
    return avg_acc / n, avg_topk / n


def _demo_frames(argv: list[str]):
    """Frame source for the camera demos: -file <dir|glob|image>."""
    import glob as _glob
    from ..ops.image import load_image_rgb
    src = find_value(argv, "-file", None)
    if src is None:
        raise SystemExit("no camera here: pass -file <dir-or-glob> "
                         "of frames")
    if os.path.isdir(src):
        paths = sorted(_glob.glob(os.path.join(src, "*")))
    else:
        paths = sorted(_glob.glob(src)) or [src]
    for p in paths:
        yield load_image_rgb(p)


def threat_classifier(data_cfg: str, cfg: str, weights: str,
                      argv: list[str], frames=None, out=None):
    """threat_classifier (classifier.c:844-975): rolling threat meter
    over a frame stream — threat = 0.2*curr + 0.8*prev with curr =
    0.6*p[1] + p[2]; the reference's on-frame meter becomes a text
    gauge with the same .57/.97 warning thresholds."""
    import sys as _sys
    import jax.numpy as jnp
    from ..infer.classifier import Classifier
    out = out or _sys.stdout
    options = read_data_cfg(data_cfg) if data_cfg else {}
    labels = read_names(options["names"]) if "names" in options else None
    top = int(options.get("top", 1))
    clf = Classifier(cfg, weights, names=labels)
    threat, roll = 0.0, 0.2
    history = []
    for img in (frames if frames is not None else _demo_frames(argv)):
        pred = clf.predict(img)
        curr = float(pred[1] * .6 + pred[2]) if len(pred) > 2 else \
            float(pred.max())
        threat = roll * curr + (1 - roll) * threat
        gauge = "#" * int(threat * 40)
        warn = " !!!" if threat > .97 else (" !" if threat > .57 else "")
        out.write(f"threat {threat:5.2f} |{gauge:<40}|{warn}\n")
        order = np.argsort(-pred)[:top]
        for ix in order:
            name = labels[ix] if labels and ix < len(labels) else str(ix)
            out.write(f"{100*pred[ix]:.1f}%: {name}\n")
        history.append(threat)
    return history


# gun_classifier's hardcoded ImageNet-22k "threatening" category ids
# (classifier.c:977: bad_cats[])
BAD_CATS = (218, 539, 540, 1213, 1501, 1742, 1911, 2415, 4348, 19223,
            368, 369, 370, 1133, 1200, 1306, 2122, 2301, 2537, 2823,
            3179, 3596, 3639, 4489, 5107, 5140, 5289, 6240, 6631, 6762,
            7048, 7171, 7969, 7984, 7989, 8824, 8927, 9915, 10270,
            10448, 13401, 15205, 18358, 18894, 18895, 19249, 19697)


def gun_classifier(data_cfg: str, cfg: str, weights: str,
                   argv: list[str], frames=None, out=None):
    """gun_classifier (classifier.c:977-1054): flags a frame when any
    bad-category probability exceeds 0.01."""
    import sys as _sys
    from ..infer.classifier import Classifier
    out = out or _sys.stdout
    options = read_data_cfg(data_cfg) if data_cfg else {}
    labels = read_names(options["names"]) if "names" in options else None
    clf = Classifier(cfg, weights, names=labels)
    flagged = []
    for k, img in enumerate(frames if frames is not None
                            else _demo_frames(argv)):
        pred = clf.predict(img)
        cats = [i for i in BAD_CATS if i < len(pred) and pred[i] > .01]
        if cats:
            out.write("Threat Detected!\n")
            for i in cats:
                name = labels[i] if labels and i < len(labels) else str(i)
                out.write(f"{name}\n")
        else:
            out.write("Scanning...\n")
        flagged.append(bool(cats))
    return flagged


def validate_classifier_10(data_cfg: str, cfg: str, weights: str,
                           argv: list[str]):
    """validate_classifier_10 (classifier.c:336-404): 10-crop eval —
    stretch-load at (w+32, h+32), 4 corner + 1 center crops of the
    image and its horizontal flip, predictions summed. The reference
    runs 10 batch-1 forwards per image; here the 10 crops go through
    ONE batched device dispatch."""
    import jax.numpy as jnp
    from ..infer.classifier import Classifier
    from ..ops.image import load_image_rgb, resize_image_np, crop_image_np

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/train.list")
    labels = read_names(options["labels"]) if "labels" in options else \
        read_names(options["names"])
    topk = find_value(argv, "-topk", int(options.get("top", 1)), int)
    clf = Classifier(cfg, weights, names=labels)
    w, h, shift = clf.spec.net.w, clf.spec.net.h, 32

    with open(valid_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    avg_acc = avg_topk = 0.0
    for i, path in enumerate(paths):
        truth = _class_of_path(path, labels)
        im = resize_image_np(load_image_rgb(path), w + shift, h + shift)
        corners = [(-shift, -shift), (shift, -shift), (0, 0),
                   (-shift, shift), (shift, shift)]
        crops = [crop_image_np(im, dx, dy, w, h) for dx, dy in corners]
        flipped = im[:, ::-1, :]
        crops += [crop_image_np(flipped, dx, dy, w, h)
                  for dx, dy in corners]
        pred = np.asarray(clf._predict(
            clf.params, jnp.asarray(np.stack(crops))))
        pred = pred.reshape(10, -1)[:, :len(labels)].sum(axis=0)
        order = np.argsort(-pred)[:topk]
        avg_acc += int(order[0] == truth)
        avg_topk += int(truth in order)
        print(f"{i}: top 1: {avg_acc/(i+1):f}, top {topk}: "
              f"{avg_topk/(i+1):f}")
    n = max(len(paths), 1)
    return avg_acc / n, avg_topk / n


# try_classifier's hardcoded ImageNet stats (classifier.c:629-630)
_TRY_MEAN = np.array([0.48263312050943, 0.45230225481413,
                      0.40099074308742], np.float32)
_TRY_STD = np.array([0.22590347483426, 0.22120921437787,
                     0.22103996251583], np.float32)


def try_classifier(data_cfg: str, cfg: str, weights: str, image: str,
                   argv: list[str], out=None):
    """try_classifier (classifier.c:595-675): debug mode — resize_min
    256, center-crop 224 at the reference's off-by-one offset,
    normalize with hardcoded ImageNet mean/std, print layer
    `-layer N`'s BN rolling stats and activations, then top-k."""
    import sys as _sys
    import jax
    import jax.numpy as jnp
    from ..graph.compiler import build_forward
    from ..ops.image import load_image_rgb, resize_min_np, crop_image_np
    from ..graph import spec as S

    out = out or _sys.stdout
    layer_num = find_value(argv, "-layer", -1, int)
    options = read_data_cfg(data_cfg) if data_cfg else {}
    names = read_names(options["names"]) if "names" in options else (
        read_names(options["labels"]) if "labels" in options else None)
    top = find_value(argv, "-topk", int(options.get("top", 1)), int)

    spec = parse_network_cfg(cfg)
    params, _ = load_weights(spec, weights) if weights else (None, 0)
    if params is None:
        from ..io.weights import init_params
        params = init_params(spec)
    fwd = jax.jit(lambda p, x: build_forward(spec)(p, x, keep_all=True))

    r = resize_min_np(load_image_rgb(image), 256)
    ih, iw = r.shape[:2]
    im = crop_image_np(r, (iw - 224 - 1) // 2 + 1,
                       (ih - 224 - 1) // 2 + 1, 224, 224)
    im = (im - _TRY_MEAN) / (_TRY_STD + 1e-6)     # normalize_cpu eps
    pred, aux = fwd(params, jnp.asarray(im[None]))
    pred = np.asarray(pred).reshape(-1)

    if 0 <= layer_num < len(spec.layers):
        lp = params[layer_num] if layer_num < len(params) else None
        if isinstance(spec.layers[layer_num], S.ConvSpec) and lp and \
                "rolling_mean" in lp:
            for mu, var, sc in zip(np.asarray(lp["rolling_mean"]),
                                   np.asarray(lp["rolling_variance"]),
                                   np.asarray(lp["scales"])):
                out.write(f"{mu:f} {var:f} {sc:f}\n")
        act = aux["outputs"].get(layer_num)
        if act is not None:
            for v in np.asarray(act).reshape(-1):
                out.write(f"{v:f}\n")
    for ix in np.argsort(-pred)[:top]:
        name = names[ix] if names and ix < len(names) else str(ix)
        out.write(f"{name}: {pred[ix]:f}\n")
    return pred


def test_classifier(data_cfg: str, cfg: str, weights: str,
                    argv: list[str], out=None):
    """test_classifier (classifier.c:771-842): batched plain-resize
    forward over the `test` list, one TSV row per image
    (path\\tpred...). The reference's prefetch thread + per-row
    network_predict_data become one jitted batched forward per chunk."""
    import sys as _sys
    import jax
    import jax.numpy as jnp
    from ..graph.compiler import build_forward
    from ..ops.image import load_image_rgb, resize_image_np

    out = out or _sys.stdout
    options = read_data_cfg(data_cfg)
    test_list = options.get("test", "data/test.list")
    batch = find_value(argv, "-batch", 0, int) or None

    spec = parse_network_cfg(cfg)
    if weights:
        params, _ = load_weights(spec, weights)
    else:
        from ..io.weights import init_params
        params = init_params(spec)
    params = jax.tree.map(jnp.asarray, params)
    fwd = jax.jit(lambda p, x: build_forward(spec)(p, x)[0])
    batch = batch or max(spec.net.batch, 1)

    with open(test_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    for off in range(0, len(paths), batch):
        chunk = paths[off:off + batch]
        x = np.stack([resize_image_np(load_image_rgb(p),
                                      spec.net.w, spec.net.h)
                      for p in chunk])
        pred = np.asarray(fwd(params, jnp.asarray(x)))
        pred = pred.reshape(len(chunk), -1)
        for p, row in zip(chunk, pred):
            out.write(p + "".join(f"\t{v:g}" for v in row) + "\n")
    return len(paths)


def label_classifier(data_cfg: str, cfg: str, weights: str,
                     argv: list[str], out=None):
    """label_classifier (classifier.c:732-769): print the argmax label
    name for each image in the `test` list (resize_min + center crop)."""
    import sys as _sys
    import jax.numpy as jnp
    from ..infer.classifier import Classifier
    from ..ops.image import load_image_rgb, resize_min_np, crop_image_np

    out = out or _sys.stdout
    options = read_data_cfg(data_cfg)
    label_list = options.get("names", options.get("labels"))
    test_list = options.get("test", "data/train.list")
    labels = read_names(label_list)
    clf = Classifier(cfg, weights, names=labels)
    w, h = clf.spec.net.w, clf.spec.net.h

    with open(test_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    picked = []
    for path in paths:
        r = resize_min_np(load_image_rgb(path), w)
        ih, iw = r.shape[:2]
        crop = crop_image_np(r, (iw - w) // 2, (ih - h) // 2, w, h)
        pred = np.asarray(clf._predict(
            clf.params, jnp.asarray(crop[None]))).reshape(-1)
        ind = int(np.argmax(pred[:len(labels)]))
        out.write(labels[ind] + "\n")
        picked.append(labels[ind])
    return picked


def demo_classifier(data_cfg: str, cfg: str, weights: str,
                    argv: list[str], frames=None, out=None):
    """demo_classifier (classifier.c:1056-1122): streaming top-k over
    frames (here: -file dir/glob instead of a webcam) with an FPS
    readout."""
    import sys as _sys
    import time as _time
    import jax.numpy as jnp
    from ..infer.classifier import Classifier
    from ..ops.image import resize_image_np

    out = out or _sys.stdout
    options = read_data_cfg(data_cfg) if data_cfg else {}
    names = read_names(options["names"]) if "names" in options else None
    top = find_value(argv, "-topk", int(options.get("top", 1)), int)
    clf = Classifier(cfg, weights, names=names)
    w, h = clf.spec.net.w, clf.spec.net.h
    fps = 0.0
    results = []
    for img in (frames if frames is not None else _demo_frames(argv)):
        t0 = _time.time()
        x = resize_image_np(img, w, h)
        pred = np.asarray(clf._predict(
            clf.params, jnp.asarray(x[None]))).reshape(-1)
        dt = max(_time.time() - t0, 1e-6)
        fps = 0.9 * fps + 0.1 / dt if fps else 1 / dt
        out.write(f"FPS:{fps:.0f}\n")
        order = np.argsort(-pred)[:top]
        for ix in order:
            name = names[ix] if names and ix < len(names) else str(ix)
            out.write(f"{100*pred[ix]:.1f}%: {name}\n")
        results.append(int(order[0]))
    return results
