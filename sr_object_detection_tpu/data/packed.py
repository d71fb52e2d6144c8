"""Packed raw-u8 dataset: the production from-disk training format.

The reference trains from JPEG files decoded on loader pthreads
(src_yolo2/data.c:717-798). JPEG decode is the intrinsic host cost of
that design — measured here at ~75 img/s/core (PIL, 500x375 VOC-scale
frames), orders of magnitude under the TPU step rate, so a
decode-per-epoch pipeline is host-bound on any realistic core count
per chip. The reference itself ships the answer for its CIFAR path: a
RAW fixed-size record file read straight into memory
(src_yolo2/data.c:948 load_cifar10_data). This module is that idea at
detection scale:

  * ``pack_detection_dataset`` — one-time prep (the decode cost paid
    ONCE, off the training critical path): decode every image, resize
    to a fixed storage resolution with the darknet two-pass bilinear
    (ops/image.py), store as flat u8 NHWC records + an (N, boxes, 5)
    f32 label tensor + a JSON header.
  * ``PackedDetectionLoader`` — training-time reader: mmaps the record
    file, gathers a random batch (a memcpy, no decode), draws the same
    per-image augmentation parameters as the JPEG loader, and feeds the
    batched on-device augmentation program (data/device_aug.py). Labels
    need no correction at pack time (relative coords are resize
    invariant); the crop/flip correction happens per batch exactly like
    data.c:handle in correct_boxes.

Storage resolution: choose >= the largest training resolution (e.g.
448 or 608 for multi-scale to 608). The jitter crop then sources from
the stored frame — same distribution semantics as cropping the
original, with the stored frame standing in as the "original" (one
extra fixed resample per image, paid at pack time).

Record layout (prefix.imgs): N * SH * SW * 3 bytes, row-major u8 RGB.
Labels (prefix.labs): N * boxes * 5 f32 [cls, cx, cy, w, h] relative.
Header (prefix.json): {"n", "h", "w", "c", "boxes", "version"}.
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import pathlib
from typing import Iterator, Optional

import numpy as np

from .loader import label_path_for, read_boxes

_VERSION = 1


def pack_detection_dataset(list_file_or_paths, out_prefix: str, *,
                           store_w: int = 448, store_h: int = 448,
                           boxes: int = 30, workers: int = 8,
                           quiet: bool = False) -> dict:
    """One-time prep: decode + fixed-resize every image into the packed
    record file. Returns the header dict."""
    from ..ops.image import load_image_u8, resize_image_np

    if isinstance(list_file_or_paths, (str, pathlib.Path)):
        with open(list_file_or_paths) as f:
            paths = [l.strip() for l in f if l.strip()]
    else:
        paths = list(list_file_or_paths)
    if not paths:
        raise ValueError("empty image list")

    n = len(paths)
    hdr = {"n": n, "h": store_h, "w": store_w, "c": 3, "boxes": boxes,
           "version": _VERSION}
    rec = store_h * store_w * 3
    labs = np.zeros((n, boxes, 5), np.float32)

    def _one(path):
        im = load_image_u8(path)
        if im.shape[:2] != (store_h, store_w):
            # darknet two-pass bilinear in the u8 value domain,
            # rounded back to u8 (<= 0.5/255 quantization per px,
            # paid once at pack time)
            im = np.clip(resize_image_np(im.astype(np.float32),
                                         store_w, store_h) + 0.5,
                         0, 255).astype(np.uint8)
        lab = read_boxes(label_path_for(path))
        return im, lab

    with open(out_prefix + ".imgs", "wb") as f, \
            cf.ThreadPoolExecutor(max_workers=workers) as pool:
        for i, (im, lab) in enumerate(pool.map(_one, paths)):
            assert im.shape == (store_h, store_w, 3) and im.dtype == np.uint8
            f.write(im.tobytes())
            for k, row in enumerate(lab[:boxes]):
                # row: [cls, cx, cy, w, h] relative (read_boxes order)
                labs[i, k] = row
            if not quiet and (i + 1) % 500 == 0:
                print(f"packed {i + 1}/{n}")
    labs.tofile(out_prefix + ".labs")
    with open(out_prefix + ".json", "w") as f:
        json.dump(hdr, f)
    assert os.path.getsize(out_prefix + ".imgs") == n * rec
    return hdr


class PackedDetectionLoader:
    """Training-time reader over a packed dataset: mmap gather + device
    augmentation. Drop-in for DetectionLoader (same next_batch/__iter__
    contract, device_augment always on — that is the point).

    Supports the same multi-host sharding contract as DetectionLoader
    (process p of n reads records [N*p/n, N*(p+1)/n) — get_data_part,
    src_yolo2/data.c:1128)."""

    def __init__(self, prefix: str, *, w: int, h: int, batch: int,
                 jitter: float = 0.2, hue: float = 0.1,
                 saturation: float = 1.5, exposure: float = 1.5,
                 augment: bool = True, seed: int = 0,
                 precision: str = "fast",
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        with open(prefix + ".json") as f:
            self.hdr = json.load(f)
        n, sh, sw = self.hdr["n"], self.hdr["h"], self.hdr["w"]
        self.boxes = self.hdr["boxes"]
        self.imgs = np.memmap(prefix + ".imgs", dtype=np.uint8,
                              mode="r", shape=(n, sh, sw, 3))
        self.labs = np.memmap(prefix + ".labs", dtype=np.float32,
                              mode="r", shape=(n, self.boxes, 5))
        # multi-host shard (get_data_part analog) as an index range —
        # the mmap itself is cheap to keep whole
        from .loader import DetectionLoader
        idx = DetectionLoader._shard_paths(
            list(range(n)), process_index=process_index,
            process_count=process_count)
        self.lo, self.hi = (idx[0], idx[-1] + 1) if idx else (0, 0)
        if self.hi <= self.lo:
            raise ValueError("empty shard")
        self.w, self.h, self.batch = w, h, batch
        # "fast" = bf16 MXU resample (device_aug precision note): the
        # production from-disk default — augmentation noise scale,
        # keeps the aug program off the train step's critical path
        self.precision = precision
        self.aug = dict(jitter=jitter, hue=hue, saturation=saturation,
                        exposure=exposure, augment=augment)
        self.rng = np.random.default_rng(seed)
        self._augmenters: dict = {}
        # single prefetch thread: the host side of a batch (gather +
        # param draw + box correction) overlaps the device step, like
        # the reference's load_thread double buffer (detector.c:86-113)
        self.pool = cf.ThreadPoolExecutor(max_workers=1)
        self._pending = self.pool.submit(self._host_batch)

    def set_dims(self, w: int, h: int):
        """Multi-scale hook (detector.c:91-109)."""
        self.w, self.h = w, h

    def _augmenter(self, w: int, h: int):
        from . import device_aug as DA
        key = (w, h)
        if key not in self._augmenters:
            # bf16 aug output: the bf16 train step casts its input
            # first anyway, so casting at aug write is bit-identical
            # end-to-end and halves the step's input read
            import jax.numpy as jnp
            self._augmenters[key] = DA.DeviceAugmenter(
                w, h, precision=self.precision,
                out_dtype=jnp.bfloat16)
        return self._augmenters[key]

    def _host_batch_cpu(self):
        """The HOST side of one batch: record gather (memcpy out of
        the page cache), aug param draw, label correction. No device
        work — exposed separately so the host pipeline's sustainable
        rate can be measured in isolation from the deployment's
        host->device transport (bench.py from-disk rows)."""
        from . import device_aug as DA
        from . import augment as A
        # capture the target dims ONCE: set_dims (multi-scale) can fire
        # from the main thread mid-flight; a single read keeps the
        # batch internally consistent and the dims tag truthful, so the
        # next_batch redraw check actually catches the resize
        w, h = self.w, self.h
        aug = self._augmenter(w, h)
        sh, sw = self.hdr["h"], self.hdr["w"]
        idx = self.rng.integers(self.lo, self.hi, size=self.batch)
        canvas = np.ascontiguousarray(self.imgs[idx])
        truth = np.zeros((self.batch, self.boxes, 5), np.float32)
        cols: dict = {}
        for b, i in enumerate(idx):
            params, (dx, dy, isx, isy, flip) = DA.draw_params(
                self.rng, sh, sw, **self.aug)
            for k, v in aug.coeffs(params).items():
                cols.setdefault(k, []).append(v)
            labels = np.asarray(self.labs[i])
            labels = labels[labels[:, 3] > 0]        # stored padding
            if len(labels):
                labels = labels.copy()
                self.rng.shuffle(labels)
                labels = A.correct_boxes(labels, dx, dy, isx, isy, flip)
                kept = 0
                for row in labels[:self.boxes]:
                    if row[3] < 0.01 or row[4] < 0.01:
                        continue
                    truth[b, kept] = [row[1], row[2], row[3], row[4],
                                      row[0]]
                    kept += 1
        arrays = {k: np.stack(v) for k, v in cols.items()}
        return aug, canvas, arrays, truth, (w, h)

    def _host_batch(self):
        """One batch end-to-end from the prefetch thread: the host side
        (_host_batch_cpu) plus the device dispatch itself (canvas
        upload + jitted augmentation) — enqueueing from the prefetch
        thread overlaps the host->device transfer with the main
        thread's train step (JAX dispatch is thread-safe)."""
        aug, canvas, arrays, truth, dims = self._host_batch_cpu()
        x = aug(canvas, arrays)
        return x, truth, dims

    def next_batch(self):
        """(x NHWC float32 on device, truth (B,boxes,5)); prefetches."""
        x, truth, (w, h) = self._pending.result()
        self._pending = self.pool.submit(self._host_batch)
        if (w, h) != (self.w, self.h):     # resized mid-flight: redraw
            x, truth, _ = self._host_batch()
        return x, truth

    def __iter__(self) -> Iterator:
        while True:
            yield self.next_batch()


__all__ = ["pack_detection_dataset", "PackedDetectionLoader"]
