"""End-to-end detection pipeline: preprocess -> forward -> decode -> NMS.

The TPU-native analog of the reference's ``test_detector``
(src_yolo2/detector.c:454-512) and the C++ DLL ``Detector`` class
(src_yolo2/yolo_v2_class.cpp:173-249): one jitted device program runs
resize + network + region decode + class-prob NMS; only the final
thresholded detections return to the host.

Parity notes:
  * the v2 detector path uses PLAIN resize, not letterbox
    (detector.c:483 resize_image) — letterbox is opt-in (classifier and
    v3-style pipelines);
  * probs are objectness*class, zeroed at `thresh` BEFORE NMS
    (region_layer.c:368-373), NMS zeroes per class at IoU>nms
    (box.c:249-277), and a final per-box argmax picks the reported
    class (image.c draw_detections).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import read_names, read_map
from ..graph import spec as S
from ..graph.compiler import CompiledNetwork
from ..io.weights import load_weights, init_params
from ..ops import boxes as B
from ..ops import image as I


@dataclasses.dataclass
class Detection:
    box: tuple[float, float, float, float]   # (x, y, w, h) center, relative
    class_id: int
    prob: float
    name: Optional[str] = None


class Detector:
    """Load a cfg+weights pair and run single/batched detection."""

    def __init__(self, cfg_path: str, weights_path: Optional[str] = None,
                 *, names: Optional[Sequence[str]] = None,
                 compute_dtype=None, letterbox: bool = False,
                 map_path: Optional[str] = None,
                 nms_topk: int = 128, int8_calib=None,
                 presplit: bool = False, quantize_head: bool = False):
        self.spec = S.parse_network_cfg(cfg_path)
        self.compiled = CompiledNetwork(self.spec, compute_dtype=compute_dtype)
        if weights_path:
            self.params, self.seen = load_weights(self.spec, weights_path)
        else:
            self.params, self.seen = init_params(self.spec), 0
        self.params = jax.tree.map(jnp.asarray, self.params)
        if presplit:
            # serving fast path: fold BN, lane-align the head, and take
            # the pre-split (fields, cls) contract — removes the flat-
            # output relayout passes (ops.boxes.region_activate_split).
            # The decode below consumes the split tensors directly.
            import dataclasses
            from .engine import fold_params_for_inference, \
                align_region_head
            params_f, fspec = fold_params_for_inference(
                self.spec, self.params,
                jnp.float32 if compute_dtype is None else compute_dtype)
            fspec, params_f = align_region_head(fspec, params_f,
                                                min_classes=1)
            last = fspec.layers[-1]
            if isinstance(last, S.RegionSpec) and last.head_block:
                fspec = S.NetworkSpec(
                    net=fspec.net,
                    layers=(*fspec.layers[:-1],
                            dataclasses.replace(last, presplit=True)),
                    cfg_path=fspec.cfg_path)
                self.params = jax.tree.map(jnp.asarray, params_f)
                self.compiled = CompiledNetwork(
                    fspec, compute_dtype=compute_dtype)
        if int8_calib is not None:
            self.quantize(int8_calib, quantize_head=quantize_head)
        self.names = list(names) if names else None
        self.letterbox = letterbox
        self.nms_topk = nms_topk

        region = self.spec.layers[-1]
        if not isinstance(region, S.RegionSpec):
            raise ValueError("Detector requires a [region] final layer")
        self.region = region
        self.tree = self.compiled.trees.get(len(self.spec.layers) - 1)
        self.class_map = read_map(map_path) if map_path else None

        self._predict = jax.jit(partial(self._predict_impl, train=False))

    # ------------------------------------------------------------------
    def quantize(self, calib_x, *, quantize_head: bool = False,
                 region_dtype=None):
        """Swap the forward for the int8 program IN PLACE, calibrated on
        ``calib_x`` (preprocessed NHWC f32 sample batch). Reuses the
        already-loaded params — no second weights read — and keeps every
        constructor setting (names/letterbox/nms_topk). Decode is
        unchanged: by default the head conv and region stay in float;
        ``quantize_head=True`` runs the head conv in int8 too and
        ``region_dtype=jnp.bfloat16`` runs the region decode in bf16
        (the yolo9000 serving levers — see infer/quant.py)."""
        from .quant import QuantizedForwardShim
        self.compiled = QuantizedForwardShim(
            self.spec, self.params, calib_x, self.compiled.trees,
            quantize_head=quantize_head, region_dtype=region_dtype)
        if hasattr(self, "_predict"):   # re-trace over the new forward
            self._predict = jax.jit(partial(self._predict_impl,
                                            train=False))

    # ------------------------------------------------------------------
    def _predict_impl(self, params, x, thresh, *, train=False):
        """x: (B, net_h, net_w, 3) preprocessed; thresh: scalar (traced).
        Returns (boxes, probs): boxes (B, N, 4) relative; probs
        (B, N, classes) with get_region_boxes' thresholding applied."""
        out, _ = self.compiled.forward(params, x)
        r = self.region
        if isinstance(out, tuple):
            # pre-split contract: fields (B,H,W,A,coords+1) with
            # logistic obj in the last slot, cls already softmaxed
            fields, cls = out
            fields = fields.astype(jnp.float32)
            cls = cls.astype(jnp.float32)
            boxes = B.decode_region_boxes(
                fields, np.asarray(r.anchors).reshape(r.n, 2),
                img_w=1.0, img_h=1.0)
            obj = fields[..., r.coords]
        else:
            nf = r.coords + r.classes + 1
            # host contract is f32 regardless of the decode dtype
            # (region_dtype=bf16 serving); no-op when already f32
            acts = out.astype(jnp.float32).reshape(
                x.shape[0], r.h, r.w, r.n, nf)
            boxes = B.decode_region_boxes(
                acts, np.asarray(r.anchors).reshape(r.n, 2),
                img_w=1.0, img_h=1.0)
            obj = acts[..., 4]
            cls = acts[..., 5:]
        if self.tree is not None:
            cls = B.hierarchy_multiply(cls, self.tree.parent)
        if r.classfix == -1:
            obj = jnp.where(obj < 0.5, 0.0, obj)
        if self.tree is not None and self.class_map is None:
            # no-map tree branch (region_layer.c:357-366): probs are the
            # deepest-confident PATH PROBABILITY, gated on objectness >
            # thresh — NOT objectness*prob thresholded on the product.
            cls = _hierarchy_walk(cls)
            probs = jnp.where(obj[..., None] > thresh, cls, 0.0)
        else:
            if self.tree is not None:
                cls = cls[..., jnp.asarray(self.class_map)]
            probs = obj[..., None] * cls
            probs = jnp.where(probs > thresh, probs, 0.0)
        b = x.shape[0]
        return boxes.reshape(b, -1, 4), probs.reshape(b, -1, probs.shape[-1])

    def predict_batch(self, x_nhwc, thresh: float = 0.0):
        """Raw device prediction on preprocessed input. thresh applies
        get_region_boxes' zeroing (a no-op at the default 0.0 for the
        plain/map branches; REQUIRED for the tree-without-map branch
        whose gate is objectness > thresh)."""
        return self._predict(self.params, x_nhwc,
                             jnp.asarray(thresh, jnp.float32))

    # ------------------------------------------------------------------
    def preprocess(self, image_hwc: np.ndarray) -> np.ndarray:
        h, w = self.spec.net.h, self.spec.net.w
        if self.letterbox:
            return I.letterbox_image_np(image_hwc, w, h)
        return I.resize_image_np(image_hwc, w, h)

    def detect(self, image_hwc: np.ndarray, *, thresh: float = 0.24,
               nms: float = 0.4, hier_thresh: float = 0.5
               ) -> list[Detection]:
        """Full single-image pipeline (test_detector semantics:
        thresh .24 default, nms .4 — detector.c:455,466)."""
        x = self.preprocess(image_hwc)[None]
        boxes, probs = self.predict_batch(jnp.asarray(x), thresh=thresh)
        boxes = np.asarray(boxes[0])
        probs = np.asarray(probs[0])
        if nms > 0:
            probs = np.asarray(B.nms_sort_topk(
                jnp.asarray(boxes), jnp.asarray(probs), nms,
                k=min(self.nms_topk, probs.shape[0])))
        return self._collect(boxes, probs, thresh)

    def _collect(self, boxes, probs, thresh) -> list[Detection]:
        dets = []
        cls = probs.argmax(axis=1)
        p = probs[np.arange(len(cls)), cls]
        for i in np.nonzero(p > thresh)[0]:
            name = None
            if self.names:
                name = self.names[int(cls[i])]
            dets.append(Detection(
                box=tuple(float(v) for v in boxes[i]),
                class_id=int(cls[i]), prob=float(p[i]), name=name))
        dets.sort(key=lambda d: -d.prob)
        return dets


def _hierarchy_walk(path_probs):
    """get_region_boxes' deepest-confident-node walk
    (region_layer.c:356-366): scanning classes from last to first, keep
    only the first (highest-index) class whose path-prob > .5; zero all
    others. If none exceeds .5 everything is zeroed."""
    c = path_probs.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, path_probs.shape,
                                   path_probs.ndim - 1)
    masked = jnp.where(path_probs > 0.5, idx, -1)
    top = jnp.max(masked, axis=-1, keepdims=True)
    return jnp.where(idx == top, path_probs, 0.0)


__all__ = ["Detector", "Detection"]
