"""Detector application: train / valid / recall loops.

Mirrors run_detector (src_yolo2/detector.c:600-651):
  detector train <data> <cfg> [weights] [-resume ckpt]
  detector valid <data> <cfg> <weights> [-out prefix]
  detector recall <data> <cfg> <weights>
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

from ..config import read_data_cfg, read_names
from ..graph.spec import parse_network_cfg, RegionSpec
from ..io.weights import load_weights, init_params
from ..io import checkpoint as ckpt
from .cli import find_value, find_arg


MULTI_SCALE_DIMS = [320 + 32 * i for i in range(10)]   # detector.c:95-99


def train_detector(data_cfg: str, cfg: str, weights: str | None,
                   argv: list[str]):
    """train_detector (detector.c:25-168): double-buffered loader,
    multi-scale every 10 batches when region.random, checkpoints."""
    from ..data.loader import DetectionLoader
    from ..train.trainer import Trainer

    options = read_data_cfg(data_cfg)
    train_list = options.get("train", "data/train.list")
    backup_dir = options.get("backup", "backup")
    classes = int(options.get("classes", 20))
    os.makedirs(backup_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(cfg))[0]

    spec = parse_network_cfg(cfg)
    region = spec.layers[-1]
    assert isinstance(region, RegionSpec)
    params = None
    if weights:
        params, seen = load_weights(spec, weights)
    # -bf16: the TPU production training mode — bf16 compute (MXU
    # native; f32 BN stats/updates unchanged) + the phase-split fused
    # leading pair when the geometry fits (graph/compiler gates it;
    # kernels/phase_train.py — measured 3,349 img/s / 35.5% MFU vs
    # 2,490 f32 on tiny-yolo-416 B=128, PARITY r5 lever matrix).
    # Default stays f32 for bit-parity with the reference trainer.
    bf16 = find_arg(argv, "-bf16")
    import jax.numpy as _jnp
    trainer = Trainer(spec, params=params,
                      compute_dtype=_jnp.bfloat16 if bf16 else None,
                      phase_train=bool(bf16))
    clear = find_arg(argv, "-clear")
    if weights and not clear:
        import jax.numpy as jnp
        trainer.state.seen = jnp.asarray(int(seen))
    resume = find_value(argv, "-resume", None)
    if resume:
        trainer.state = ckpt.load_train_state(resume, trainer.state)

    max_batches = spec.net.max_batches or 10000
    outer = trainer.outer_batch
    # -device-aug: host decodes only; crop/resize/flip/HSV run as ONE
    # jitted batch program (data/device_aug.py — the host numpy
    # pipeline is ~25 img/s/core at 416px vs 4.4k img/s on device)
    device_aug = find_arg(argv, "-device-aug")
    # -packed <prefix>: train from a packed raw-u8 record file
    # (data/packed.py — decode paid once at prep time; mmap gather +
    # device augmentation at train time). -decoder process: GIL-free
    # ProcessPool JPEG decode for the file-list path.
    packed = find_value(argv, "-packed", None)
    decoder = find_value(argv, "-decoder", "thread")
    if packed:
        from ..data.packed import PackedDetectionLoader
        loader = PackedDetectionLoader(
            packed, w=spec.net.w, h=spec.net.h, batch=outer,
            jitter=region.jitter, hue=spec.net.hue,
            saturation=spec.net.saturation, exposure=spec.net.exposure)
    else:
        loader = DetectionLoader(
            train_list, w=spec.net.w, h=spec.net.h, batch=outer,
            classes=classes, jitter=region.jitter,
            hue=spec.net.hue, saturation=spec.net.saturation,
            exposure=spec.net.exposure, device_augment=device_aug,
            decoder=decoder)

    avg_loss = None
    dims = (spec.net.h, spec.net.w)
    rng = np.random.default_rng(7)
    while True:
        i = int(trainer.state.seen) // (outer) + 1
        if i > max_batches:
            break
        # multi-scale resize every 10 batches (detector.c:91-109)
        if region.random and i % 10 == 1:
            d = int(rng.choice(MULTI_SCALE_DIMS))
            dims = (d, d)
            loader.set_dims(d, d)
            print(f"Resizing: {d}x{d}")
        t0 = time.time()
        x, truth = loader.next_batch()
        load_t = time.time() - t0
        t0 = time.time()
        m = trainer.step(x, truth)
        loss = float(m["loss"]) / outer
        avg_loss = loss if avg_loss is None else avg_loss * 0.9 + loss * 0.1
        print(f"{i}: {loss:.6f}, {avg_loss:.6f} avg, "
              f"{float(m['lr']):.6f} rate, {time.time()-t0:.3f} s, "
              f"{load_t:.3f} load, {int(trainer.state.seen)} images")
        if ckpt.should_checkpoint(i):
            path = ckpt.checkpoint_name(backup_dir, base, i)
            ckpt.export_weights(path, spec, trainer.state)
            ckpt.save_train_state(
                os.path.join(backup_dir, f"{base}.state.npz"),
                trainer.state)
    ckpt.export_weights(
        ckpt.checkpoint_name(backup_dir, base, 0, final=True),
        spec, trainer.state)


def validate_detector(data_cfg: str, cfg: str, weights: str,
                      argv: list[str]):
    """validate_detector (detector.c:244-369): run the valid list, write
    per-class VOC detection files (comp4_det_test_<cls>.txt)."""
    from ..infer.detector import Detector
    from ..ops.image import load_image_rgb
    from ..eval.voc import voc_det_lines

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/valid.list")
    names = read_names(options["names"]) if "names" in options else None
    prefix = find_value(argv, "-out", "comp4_det_test_")
    outdir = find_value(argv, "-outdir", "results")
    os.makedirs(outdir, exist_ok=True)
    thresh = find_value(argv, "-thresh", 0.005, float)
    nms = find_value(argv, "-nms", 0.45, float)
    use_int8 = find_arg(argv, "-int8")
    use_qhead = find_arg(argv, "-qhead")   # int8 head conv too

    with open(valid_list) as f:
        all_paths = [l.strip() for l in f if l.strip()]
    calib = None
    if use_int8:
        # int8 serving validation: calibrate activation scales on the
        # first few validation images (infer/quant.py); v2 valid uses
        # plain resize, not letterbox (detector.c:483)
        from ..ops.image import resize_image_np
        net = parse_network_cfg(cfg).net
        calib = np.stack([
            resize_image_np(load_image_rgb(p), net.w, net.h)
            for p in all_paths[:8]])
    det = Detector(cfg, weights, names=names, int8_calib=calib,
                   quantize_head=use_qhead)
    classes = det.region.classes
    if names is None:
        names = [str(i) for i in range(classes)]
    files = {n: open(os.path.join(outdir, f"{prefix}{n}.txt"), "w")
             for n in names}
    paths = all_paths
    t0 = time.time()
    for k, path in enumerate(paths):
        img = load_image_rgb(path)
        ih, iw = img.shape[:2]
        image_id = os.path.splitext(os.path.basename(path))[0]
        import jax.numpy as jnp
        from ..ops import boxes as B
        x = det.preprocess(img)[None]
        boxes, probs = det.predict_batch(jnp.asarray(x), thresh=thresh)
        boxes = np.asarray(boxes[0])
        probs = np.asarray(probs[0])
        if nms > 0:
            # exact NMS: valid is offline and scored on the whole
            # low-confidence tail (thresh .005), so the top-k
            # truncation the latency path uses would drop real lines;
            # nms_sort_exact keeps memory O(N^2) even for yolo9000's
            # 9418 classes (full-k top-k would need a (C,N,N) tensor)
            probs = np.asarray(B.nms_sort_exact(
                jnp.asarray(boxes), jnp.asarray(probs), nms))
        for name, lines in voc_det_lines(image_id, boxes, probs, names,
                                         iw, ih).items():
            for line in lines:
                files[name].write(line + "\n")
        if (k + 1) % 100 == 0:
            print(f"{k+1}/{len(paths)}", file=sys.stderr)
    for f in files.values():
        f.close()
    print(f"Total Detection Time: {time.time()-t0:.6f} Seconds")


def validate_recall(data_cfg: str, cfg: str, weights: str,
                    argv: list[str]):
    """validate_detector_recall (detector.c:371-450)."""
    from ..infer.detector import Detector
    from ..ops.image import load_image_rgb
    from ..data.loader import read_boxes, label_path_for
    from ..eval.voc import proposal_recall
    import jax.numpy as jnp

    options = read_data_cfg(data_cfg)
    valid_list = options.get("valid", "data/valid.list")
    thresh = find_value(argv, "-thresh", 0.24, float)
    det = Detector(cfg, weights)
    with open(valid_list) as f:
        paths = [l.strip() for l in f if l.strip()]
    all_boxes, all_obj, all_gt = [], [], []
    for path in paths:
        img = load_image_rgb(path)
        x = det.preprocess(img)[None]
        boxes, probs = det.predict_batch(jnp.asarray(x))
        all_boxes.append(np.asarray(boxes[0]))
        all_obj.append(np.asarray(probs[0]).max(axis=1))
        labels = read_boxes(label_path_for(path))
        all_gt.append(labels[:, 1:5] if len(labels) else
                      np.zeros((0, 4), np.float32))
    r = proposal_recall(all_boxes, all_obj, all_gt, thresh=thresh)
    print(f"RPs/Img: {r['proposals']/max(len(paths),1):.2f}  "
          f"IOU: {100*r['avg_iou']:.2f}%  "
          f"Recall: {100*r['recall']:.2f}%")
    return r


def demo_detector(cfg: str, weights: str, argv: list[str]):
    """detector demo (demo.c:118-252): fetch/detect overlap + 3-frame
    smoothing over an image-directory source (-frames), a real video
    file (-video; demo.c:57's cvCaptureFromFile analog — PIL
    multi-frame containers in-process, anything else via an ffmpeg
    rawvideo pipe), or a LIVE camera (-cam <index>; demo.c:57's
    cvCaptureFromCAM analog via an ffmpeg v4l2 pipe)."""
    from ..infer.detector import Detector
    from ..robot.frame_source import (ImageDirectorySource,
                                      VideoFileSource, V4L2FrameSource)
    from .demo_app import StreamingDemo
    video = find_value(argv, "-video", None)
    cam = find_value(argv, "-cam", None)
    pattern = find_value(argv, "-frames", "frames/*.ppm")
    names_file = find_value(argv, "-names", None)
    names = read_names(names_file) if names_file else None
    thresh = find_value(argv, "-thresh", 0.24, float)
    out_dir = find_value(argv, "-outdir", None)
    det = Detector(cfg, weights, names=names)
    source = (V4L2FrameSource(f"/dev/video{int(cam)}") if cam is not None
              else VideoFileSource(video) if video
              else ImageDirectorySource(pattern))
    demo = StreamingDemo(det, source, thresh=thresh, out_dir=out_dir)

    def show(r):
        labels = ", ".join(f"{d.name or d.class_id}:{d.prob:.2f}"
                           for d in r["detections"])
        print(f"FPS:{r['fps']:.1f}  {labels}")

    return demo.run(on_result=show)


def run_detector(argv: list[str]):
    sub = argv.pop(0)
    if sub == "demo":
        return demo_detector(argv[1], argv[2], argv[3:])
    data_cfg, cfg = argv[0], argv[1]
    weights = argv[2] if len(argv) > 2 and not argv[2].startswith("-") \
        else None
    rest = argv[3:] if weights else argv[2:]
    if sub == "train":
        return train_detector(data_cfg, cfg, weights, rest)
    if sub == "valid":
        return validate_detector(data_cfg, cfg, weights, rest)
    if sub == "recall":
        return validate_recall(data_cfg, cfg, weights, rest)
    raise SystemExit(f"unknown detector subcommand {sub}")
