"""Streaming detection demo: fetch/detect overlap + temporal smoothing.

Mirrors the reference's webcam demo (src_yolo2/demo.c:118-252): a fetch
thread pulls+preprocesses the next frame while the device detects the
current one, and predictions are averaged over a 3-frame ring
(mean_arrays smoothing, demo.c:79-81) before decode+NMS.
"""

from __future__ import annotations

import collections
import threading
import time
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..ops import boxes as B
from ..robot.frame_source import FrameSource


FRAMES = 3   # demo.c:30


class StreamingDemo:
    def __init__(self, detector, source: FrameSource, *,
                 thresh: float = 0.24, nms: float = 0.4,
                 names=None, out_dir: Optional[str] = None):
        self.det = detector
        self.source = source
        self.thresh = thresh
        self.nms = nms
        self.names = names
        self.out_dir = out_dir   # write annotated frames (demo OSD analog)
        self.ring = collections.deque(maxlen=FRAMES)
        self.fps = 0.0

    def _fetch(self, out):
        f = self.source.next()
        if f is None:
            out["frame"] = None
            return
        img = f.color.astype(np.float32) / 255.0
        out["frame"] = f
        out["x"] = self.det.preprocess(img)[None]

    def run(self, max_frames: int = 0, on_result=None):
        results = []
        pending: dict = {}
        self._fetch(pending)
        n = 0
        while pending.get("frame") is not None:
            cur = pending
            pending = {}
            # overlap: fetch the next frame while the device detects
            t = threading.Thread(target=self._fetch, args=(pending,))
            t.start()
            t0 = time.perf_counter()

            # tree-without-map models gate on objectness>thresh INSIDE
            # the decode (region_layer.c:365) — the thresh must reach
            # predict_batch there; plain models keep raw products so
            # the 3-frame average matches demo.c (average, then gate)
            kw = {}
            if (getattr(self.det, "tree", None) is not None
                    and getattr(self.det, "class_map", None) is None):
                kw["thresh"] = self.thresh
            boxes, probs = self.det.predict_batch(jnp.asarray(cur["x"]),
                                                  **kw)
            self.ring.append((np.asarray(boxes[0]), np.asarray(probs[0])))
            # 3-frame prediction average (demo.c mean_arrays)
            avg_probs = np.mean([p for _, p in self.ring], axis=0)
            avg_boxes = np.mean([b for b, _ in self.ring], axis=0)
            probs_np = np.where(avg_probs > self.thresh, avg_probs, 0.0)
            if self.nms > 0:
                probs_np = np.asarray(B.nms_sort_topk(
                    jnp.asarray(avg_boxes), jnp.asarray(probs_np),
                    self.nms))
            dets = self.det._collect(avg_boxes, probs_np, self.thresh)
            dt = time.perf_counter() - t0
            self.fps = 0.9 * self.fps + 0.1 * (1.0 / max(dt, 1e-6)) \
                if self.fps else 1.0 / max(dt, 1e-6)

            r = {"detections": dets, "fps": self.fps,
                 "timestamp": cur["frame"].timestamp}
            if self.out_dir:
                import os
                from ..ops.draw import draw_detections
                from .nightmare_app import _save_ppm
                img = cur["frame"].color.astype(np.float32) / 255.0
                classes = getattr(getattr(self.det, "region", None),
                                  "classes", 20)
                _save_ppm(os.path.join(self.out_dir,
                                       f"demo_{n:05d}.ppm"),
                          draw_detections(img, dets, classes))
            results.append(r)
            if on_result:
                on_result(r)
            t.join()
            n += 1
            if max_frames and n >= max_frames:
                break
        return results


__all__ = ["StreamingDemo", "FRAMES"]
