"""Host-side input pipelines: detection / classification / CIFAR.

The async analog of the reference's producer-thread loaders
(src_yolo2/data.c:664-798: load_data spawns a pthread fanning out to N
workers, the train loop double-buffers). Here a ThreadPoolExecutor
prefetches the next batch while the device trains on the current one —
same overlap contract, composable with jax dispatch.

Truth layouts match the reference:
  * detection: (B, 30, 5) [x, y, w, h, id] relative (data.c:295-332);
  * classification: one-hot (B, classes);
  * label paths derive from image paths via the find_replace chain
    (data.c:295-305: images->labels, JPEGImages->labels, ext->.txt).
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import pathlib
from typing import Iterator, Optional, Sequence

import numpy as np

from ..ops.image import load_image_rgb, resize_image_np, letterbox_image_np
from . import augment as A


def label_path_for(image_path: str) -> str:
    """data.c fill_truth_detection's find_replace chain."""
    p = image_path
    for a, b in (("images", "labels"), ("JPEGImages", "labels"),
                 ("raw", "labels")):
        p = p.replace(a, b, 1) if a in p else p
    root, _ = os.path.splitext(p)
    return root + ".txt"


def read_boxes(label_path: str) -> np.ndarray:
    """(N, 5) [id, x, y, w, h]; missing file -> empty (the reference
    calls file_error and aborts; a loader should skip instead)."""
    if not os.path.exists(label_path):
        return np.zeros((0, 5), np.float32)
    rows = []
    with open(label_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 5:
                rows.append([float(v) for v in parts[:5]])
    if not rows:
        return np.zeros((0, 5), np.float32)
    return np.asarray(rows, np.float32)


def load_detection_sample(path: str, rng: np.random.Generator, *,
                          w: int, h: int, boxes: int, jitter: float,
                          hue: float, saturation: float, exposure: float,
                          augment: bool = True):
    """One (image, truth) pair with the reference's jitter-crop pipeline
    (load_data_detection, data.c:664-716)."""
    orig = load_image_rgb(path)
    oh, ow = orig.shape[:2]

    if augment:
        dw, dh = int(ow * jitter), int(oh * jitter)
        pleft = int(rng.uniform(-dw, dw))
        pright = int(rng.uniform(-dw, dw))
        ptop = int(rng.uniform(-dh, dh))
        pbot = int(rng.uniform(-dh, dh))
        swidth = ow - pleft - pright
        sheight = oh - ptop - pbot
        sx = swidth / ow
        sy = sheight / oh
        flip = bool(rng.integers(0, 2))
        cropped = A.crop_image(orig, pleft, ptop, swidth, sheight)
        dx = (pleft / ow) / sx
        dy = (ptop / oh) / sy
        sized = resize_image_np(cropped, w, h)
        if flip:
            sized = A.flip_horizontal(sized)
        sized = A.random_distort_image(sized, rng, hue, saturation,
                                       exposure)
    else:
        sized = resize_image_np(orig, w, h)
        dx = dy = 0.0
        sx = sy = 1.0
        flip = False

    labels = read_boxes(label_path_for(path))
    if len(labels):
        rng.shuffle(labels)         # randomize_boxes (data.c:161-170)
        labels = A.correct_boxes(labels, dx, dy, 1.0 / sx, 1.0 / sy, flip)
    truth = np.zeros((boxes, 5), np.float32)
    kept = 0
    for row in labels[:boxes]:
        cid, x, y, bw, bh = row
        if bw < 0.01 or bh < 0.01:   # data.c:322 skips slivers
            continue
        truth[kept] = [x, y, bw, bh, cid]
        kept += 1
    return sized, truth


def _decode_sample(p: str):
    """Decode one frame + its label file (module-level so it pickles
    into ProcessPoolExecutor workers — the decoder="process" path)."""
    from ..ops.image import load_image_u8
    return load_image_u8(p), read_boxes(label_path_for(p))


class DetectionLoader:
    """Prefetching detection batch loader (analog of load_data +
    load_threads double-buffering, data.c:717-798 + detector.c:86-113).
    """

    def __init__(self, list_file_or_paths, *, w: int, h: int,
                 batch: int, classes: int, boxes: int = 30,
                 jitter: float = 0.2, hue: float = 0.1,
                 saturation: float = 1.5, exposure: float = 1.5,
                 augment: bool = True, seed: int = 0, workers: int = 8,
                 device_augment: bool = False, decoder: str = "thread",
                 process_index: int | None = None,
                 process_count: int | None = None):
        if isinstance(list_file_or_paths, (str, pathlib.Path)):
            with open(list_file_or_paths) as f:
                self.paths = [l.strip() for l in f if l.strip()]
        else:
            self.paths = list(list_file_or_paths)
        # multi-host: each process loads only its own dataset slice —
        # the get_data_part analog (src_yolo2/data.c:1128); defaults to
        # the ambient jax process coordinates so a multi-process
        # trainer shards automatically, and stays a no-op single-process
        self.paths = self._shard_paths(self.paths,
                                       process_index=process_index,
                                       process_count=process_count)
        if not self.paths:
            raise ValueError("empty image list")
        self.w, self.h = w, h
        self.batch = batch
        self.boxes = boxes
        self.classes = classes
        self.aug = dict(jitter=jitter, hue=hue, saturation=saturation,
                        exposure=exposure, augment=augment)
        self.rng = np.random.default_rng(seed)
        # decoder="process": sidestep the GIL for the JPEG decode (the
        # loader-pthread fan-out of data.c:717-798 scaled to real
        # cores). PIL decode holds the GIL for most of its time, so
        # thread workers collapse to ~1 core; process workers scale
        # with os.cpu_count(). Costs one pickle round-trip per frame
        # (~0.5 MB u8) — worth it whenever cpu_count > 1.
        if decoder == "process":
            # spawn, not fork: the parent has usually initialized JAX
            # by now, and fork()ing a multithreaded JAX process can
            # deadlock the child (JAX emits a RuntimeWarning for
            # exactly this). Workers only decode JPEGs — they don't
            # need the parent's state, so spawn costs one interpreter
            # start per worker and nothing else.
            import multiprocessing
            self.pool: cf.Executor = cf.ProcessPoolExecutor(
                max_workers=min(workers, os.cpu_count() or 1),
                mp_context=multiprocessing.get_context("spawn"))
        else:
            self.pool = cf.ThreadPoolExecutor(max_workers=workers)
        self._pending: Optional[list] = None
        # device_augment: the host only decodes (threads) and draws the
        # aug params; crop/resize/flip/HSV run as ONE jitted batch
        # program (data/device_aug.py) — the host numpy pipeline
        # measures ~25 img/s/core at 416px, 100x below the training
        # step, so per-image host augmentation is the input bound
        self.device_augment = device_augment
        self._augmenters: dict = {}
        self._submit()

    @staticmethod
    def _shard_paths(paths, *, process_index=None, process_count=None):
        """get_data_part row arithmetic (data.c:1128) over the path
        list: process p of n owns [N*p/n, N*(p+1)/n)."""
        if process_count is None:
            import jax
            process_count = jax.process_count()
            process_index = jax.process_index()
        if process_count <= 1:
            return paths
        n = len(paths)
        return paths[n * process_index // process_count:
                     n * (process_index + 1) // process_count]

    def set_dims(self, w: int, h: int):
        """Multi-scale resize hook (detector.c:91-109): subsequent
        batches load at the new static resolution."""
        self.w, self.h = w, h

    def _submit(self):
        picks = [self.paths[self.rng.integers(0, len(self.paths))]
                 for _ in range(self.batch)]
        if self.device_augment:
            self._pending = [self.pool.submit(_decode_sample, p)
                             for p in picks]
            return
        seeds = self.rng.integers(0, 2**63, size=self.batch)
        w, h = self.w, self.h
        self._pending = [
            self.pool.submit(
                load_detection_sample, p,
                np.random.default_rng(int(s)),
                w=w, h=h, boxes=self.boxes, **self.aug)
            for p, s in zip(picks, seeds)
        ]

    def next_batch(self):
        """Returns (x NHWC float32, truth (B,30,5)); prefetches the next."""
        results = [f.result() for f in self._pending]
        self._submit()
        if self.device_augment:
            return self._device_batch(results)
        x = np.stack([r[0] for r in results])
        t = np.stack([r[1] for r in results])
        return x, t

    def _device_batch(self, results):
        from . import device_aug as DA
        key = (self.w, self.h)
        if key not in self._augmenters:
            self._augmenters[key] = DA.DeviceAugmenter(self.w, self.h)
        aug = self._augmenters[key]
        imgs = [r[0] for r in results]
        hmax = DA._bucket(max(im.shape[0] for im in imgs))
        wmax = DA._bucket(max(im.shape[1] for im in imgs))
        canvas = np.zeros((len(imgs), hmax, wmax, 3), np.uint8)
        cols: dict = {}
        truth = np.zeros((len(imgs), self.boxes, 5), np.float32)
        for b, (im, labels) in enumerate(results):
            oh, ow = im.shape[:2]
            canvas[b, :oh, :ow] = im
            params, (dx, dy, isx, isy, flip) = DA.draw_params(
                self.rng, oh, ow, jitter=self.aug["jitter"],
                hue=self.aug["hue"],
                saturation=self.aug["saturation"],
                exposure=self.aug["exposure"],
                augment=self.aug["augment"])
            for k, v in aug.coeffs(params).items():
                cols.setdefault(k, []).append(v)
            if len(labels):
                labels = labels.copy()
                self.rng.shuffle(labels)
                labels = A.correct_boxes(labels, dx, dy, isx, isy,
                                         flip)
                kept = 0
                for row in labels[:self.boxes]:
                    if row[3] < 0.01 or row[4] < 0.01:
                        continue
                    truth[b, kept] = [row[1], row[2], row[3], row[4],
                                      row[0]]
                    kept += 1
        arrays = {k: np.stack(v) for k, v in cols.items()}
        x = aug(canvas, arrays)
        return x, truth

    def __iter__(self) -> Iterator:
        while True:
            yield self.next_batch()


def load_classification_sample(path: str, rng: np.random.Generator, *,
                               w: int, h: int, min_crop: int,
                               max_crop: int, angle: float, aspect: float,
                               hue: float, saturation: float,
                               exposure: float, augment: bool = True):
    """load_data_augment's random_augment_image semantics
    (data.c:870-905, image.c random_augment_image): random square crop
    of side in [min_crop, max_crop] at random position, resized to
    (w, h), flip + HSV distort."""
    orig = load_image_rgb(path)
    oh, ow = orig.shape[:2]
    if augment:
        mn = min(ow, oh)
        lo = min(min_crop, mn)
        hi = min(max_crop, mn)
        side = int(rng.uniform(lo, max(hi, lo + 1)))
        dx = int(rng.uniform(0, max(ow - side, 1)))
        dy = int(rng.uniform(0, max(oh - side, 1)))
        crop = A.crop_image(orig, dx, dy, side, side)
        sized = resize_image_np(crop, w, h)
        if rng.integers(0, 2):
            sized = A.flip_horizontal(sized)
        sized = A.random_distort_image(sized, rng, hue, saturation,
                                       exposure)
    else:
        sized = letterbox_image_np(orig, w, h)
    return sized


class ClassificationLoader:
    """Labelled-by-path classification loader (data.c fill_truth:
    class id found by substring match of the label name in the path)."""

    def __init__(self, list_file_or_paths, labels: Sequence[str], *,
                 w: int, h: int, batch: int,
                 min_crop: Optional[int] = None,
                 max_crop: Optional[int] = None,
                 angle: float = 0.0, aspect: float = 1.0,
                 hue: float = 0.0, saturation: float = 1.0,
                 exposure: float = 1.0, augment: bool = True,
                 seed: int = 0, workers: int = 8,
                 device_augment: bool = False,
                 process_index: int | None = None,
                 process_count: int | None = None):
        if isinstance(list_file_or_paths, (str, pathlib.Path)):
            with open(list_file_or_paths) as f:
                self.paths = [l.strip() for l in f if l.strip()]
        else:
            self.paths = list(list_file_or_paths)
        self.paths = DetectionLoader._shard_paths(
            self.paths, process_index=process_index,
            process_count=process_count)
        self.labels = list(labels)
        self.w, self.h, self.batch = w, h, batch
        self.aug = dict(min_crop=min_crop or w, max_crop=max_crop or 2 * w,
                        angle=angle, aspect=aspect, hue=hue,
                        saturation=saturation, exposure=exposure,
                        augment=augment)
        self.rng = np.random.default_rng(seed)
        self.pool = cf.ThreadPoolExecutor(max_workers=workers)
        # device_augment (training only): the square crop is a
        # swidth==sheight jitter crop, so it rides the SAME batched
        # program as detection (data/device_aug.py)
        self.device_augment = device_augment and augment
        self._augmenter = None
        self._pending = None
        self._submit()

    def class_of(self, path: str) -> int:
        for i, name in enumerate(self.labels):
            if name in path:
                return i
        return 0

    def _submit(self):
        picks = [self.paths[self.rng.integers(0, len(self.paths))]
                 for _ in range(self.batch)]
        self._picks = picks
        if self.device_augment:
            from ..ops.image import load_image_u8
            self._pending = [self.pool.submit(load_image_u8, p)
                             for p in picks]
            return
        seeds = self.rng.integers(0, 2**63, size=self.batch)
        self._pending = [
            self.pool.submit(load_classification_sample, p,
                             np.random.default_rng(int(s)),
                             w=self.w, h=self.h, **self.aug)
            for p, s in zip(picks, seeds)
        ]

    def next_batch(self):
        imgs = [f.result() for f in self._pending]
        picks = self._picks
        self._submit()
        if self.device_augment:
            x = self._device_batch(imgs)
        else:
            x = np.stack(imgs)
        y = np.zeros((self.batch, len(self.labels)), np.float32)
        for i, p in enumerate(picks):
            y[i, self.class_of(p)] = 1.0
        return x, y

    def _device_batch(self, imgs):
        """random_augment_image (image.c) as per-image square-crop
        params into the shared batched augment program."""
        from . import device_aug as DA
        if self._augmenter is None or                 self._augmenter.w != self.w or self._augmenter.h != self.h:
            self._augmenter = DA.DeviceAugmenter(self.w, self.h)
        aug = self._augmenter
        hmax = DA._bucket(max(im.shape[0] for im in imgs))
        wmax = DA._bucket(max(im.shape[1] for im in imgs))
        canvas = np.zeros((len(imgs), hmax, wmax, 3), np.uint8)
        cols: dict = {}
        rng = self.rng
        for b, im in enumerate(imgs):
            oh, ow = im.shape[:2]
            canvas[b, :oh, :ow] = im
            mn = min(ow, oh)
            lo = min(self.aug["min_crop"], mn)
            hi = min(self.aug["max_crop"], mn)
            side = int(rng.uniform(lo, max(hi, lo + 1)))
            dx = int(rng.uniform(0, max(ow - side, 1)))
            dy = int(rng.uniform(0, max(oh - side, 1)))
            params = dict(
                oh=oh, ow=ow, pleft=dx, ptop=dy, swidth=side,
                sheight=side, flip=bool(rng.integers(0, 2)),
                dhue=float(rng.uniform(-self.aug["hue"],
                                       self.aug["hue"])),
                dsat=float(A.rand_scale(rng, self.aug["saturation"])),
                dexp=float(A.rand_scale(rng, self.aug["exposure"])))
            params["do_distort"] = not (
                params["dhue"] == 0 and params["dsat"] == 1
                and params["dexp"] == 1)
            for k, v in aug.coeffs(params).items():
                cols.setdefault(k, []).append(v)
        return aug(canvas, {k: np.stack(v) for k, v in cols.items()})


def load_cifar10_batch(path: str):
    """CIFAR-10 binary batch reader (data.c:948-976): records of
    1 label byte + 3072 CHW pixel bytes; pixels /255."""
    raw = np.fromfile(path, dtype=np.uint8).reshape(-1, 3073)
    labels = raw[:, 0].astype(np.int32)
    imgs = raw[:, 1:].reshape(-1, 3, 32, 32).astype(np.float32) / 255.0
    x = np.transpose(imgs, (0, 2, 3, 1)).copy()   # NHWC
    y = np.zeros((len(labels), 10), np.float32)
    y[np.arange(len(labels)), labels] = 1.0
    return x, y


__all__ = ["DetectionLoader", "ClassificationLoader",
           "load_detection_sample", "load_classification_sample",
           "load_cifar10_batch", "read_boxes", "label_path_for"]


SECRET_NUM = -1234.0   # darknet's masked-truth sentinel


def fill_hierarchy(truth: np.ndarray, tree) -> np.ndarray:
    """Hierarchical classification truth (data.c fill_hierarchy:401-431):
    set every ancestor of the labelled class(es) to 1, then mask every
    sibling group containing NO positive with SECRET_NUM so the masked
    SSE cost ignores those groups.

    truth: (C,) one-hot-ish float; tree: io.tree.WordTree."""
    t = truth.copy()
    parent = np.asarray(tree.parent)
    for j in np.nonzero(t > 0)[0]:
        p = parent[j]
        while p >= 0:
            t[p] = 1.0
            p = parent[p]
    offsets = np.asarray(tree.group_offset)
    sizes = np.asarray(tree.group_size)
    for off, size in zip(offsets, sizes):
        if size and not (t[off:off + size] > 0).any():
            t[off:off + size] = SECRET_NUM
    return t
