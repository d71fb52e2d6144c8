#!/usr/bin/env python
"""Dataset-prep sidecar helpers — the analogs of the reference's shell
scripts (scripts/dice_label.sh, scripts/imagenet_label.sh,
scripts/gen_tactic.sh). voc_label.py has its own module
(tools/voc_label.py).

  python tools/dataset_prep.py dice  <video1> ... [-out images] [-val 1000]
  python tools/dataset_prep.py inet  <val_xml_dir> <imgs_dir> [-out labelled]
  python tools/dataset_prep.py tactic <cfg> <weights>   (< goal.txt)
"""

from __future__ import annotations

import os
import re
import sys


def dice_label(videos, out_dir: str = "images", n_val: int = 1000,
               size: int = 100, seed: int = 0):
    """dice_label.sh: extract frames from faceN videos, center-crop to
    size x size, shuffle a validation split, write train/val lists.
    Frame decode goes through VideoFileSource (PIL containers
    in-process, mp4/avi via the ffmpeg rawvideo pipe when present)."""
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sr_object_detection_tpu.robot.frame_source import VideoFileSource
    from sr_object_detection_tpu.ops.image import (resize_min_np,
                                                   crop_image_np)
    from tools.synth_dataset import write_ppm

    orig = os.path.join(out_dir, "orig")
    for d in (orig, os.path.join(out_dir, "train"),
              os.path.join(out_dir, "val")):
        os.makedirs(d, exist_ok=True)
    paths = []
    for k, video in enumerate(videos, start=1):
        src = VideoFileSource(video)
        i = 0
        while True:
            f = src.next()
            if f is None:
                break
            i += 1
            img = f.color.astype(np.float32) / 255.0
            # mogrify -resize NxN^ -gravity center -crop NxN+0+0
            r = resize_min_np(img, size)
            ih, iw = r.shape[:2]
            c = crop_image_np(r, (iw - size) // 2, (ih - size) // 2,
                              size, size)
            p = os.path.join(orig, f"face{k}_{i:06d}.jpg.ppm")
            write_ppm(p, (np.clip(c, 0, 1) * 255).astype(np.uint8))
            paths.append(p)
    rng = np.random.default_rng(seed)
    rng.shuffle(paths)
    val, train = paths[:n_val], paths[n_val:]
    moved = {}
    for split, group in (("val", val), ("train", train)):
        outs = []
        for p in group:
            t = p.replace(f"{os.sep}orig{os.sep}", f"{os.sep}{split}{os.sep}")
            os.replace(p, t)
            outs.append(os.path.abspath(t))
        with open(os.path.join(out_dir, "..",
                               f"dice.{split}.list"), "w") as f:
            f.write("\n".join(outs) + "\n")
        moved[split] = outs
    print(f"dice: {len(moved['train'])} train / {len(moved['val'])} val")
    return moved


def imagenet_label(xml_dir: str, imgs_dir: str,
                   out_dir: str = "labelled",
                   list_path: str = "inet.val.list"):
    """imagenet_label.sh: read the first <name> of each val XML, link
    the image as <stem>.<label>.JPEG under labelled/, write the list."""
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for fn in sorted(os.listdir(xml_dir)):
        if not fn.endswith(".xml"):
            continue
        with open(os.path.join(xml_dir, fn)) as f:
            m = re.search(r"<name>([^<]*)</name>", f.read())
        if not m:
            continue
        label = m.group(1)
        stem = os.path.splitext(fn)[0]
        src = os.path.join(imgs_dir, stem + ".JPEG")
        dst = os.path.join(out_dir, f"{stem}.{label}.JPEG")
        if os.path.exists(src) and not os.path.exists(dst):
            try:
                os.symlink(os.path.abspath(src), dst)
            except OSError:
                import shutil
                shutil.copy(src, dst)
        if os.path.exists(dst):
            outs.append(os.path.abspath(dst))
    with open(list_path, "w") as f:
        f.write("\n".join(outs) + "\n")
    print(f"imagenet: {len(outs)} labelled links -> {list_path}")
    return outs


def gen_tactic(cfg: str, weights: str, argv=()):
    """gen_tactic.sh: `darknet rnn generatetactic cfg weights` with the
    goal text on stdin."""
    from sr_object_detection_tpu.apps.rnn_app import generate_tactic_rnn
    return generate_tactic_rnn(cfg, weights, list(argv))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__, file=sys.stderr)
        return 2
    cmd = argv.pop(0)
    if cmd == "dice":
        out = "images"
        n_val = 1000
        if "-out" in argv:
            i = argv.index("-out")
            out = argv[i + 1]
            del argv[i:i + 2]
        if "-val" in argv:
            i = argv.index("-val")
            n_val = int(argv[i + 1])
            del argv[i:i + 2]
        dice_label(argv, out_dir=out, n_val=n_val)
    elif cmd == "inet":
        imagenet_label(argv[0], argv[1],
                       *(argv[2:3] or ["labelled"]))
    elif cmd == "tactic":
        gen_tactic(argv[0], argv[1], argv[2:])
    else:
        print(f"unknown command {cmd}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
