"""Classification inference pipeline.

Analog of predict_classifier (src_yolo2/classifier.c:676-760): letterbox
preprocess, forward, optional hierarchy path products, top-k. Note the
classifier path letterboxes (classifier.c:709) where the detector plain-
resizes — preserved here.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import spec as S
from ..graph.compiler import CompiledNetwork
from ..io.weights import load_weights, init_params
from ..ops import boxes as B
from ..ops import image as I


class Classifier:
    def __init__(self, cfg_path: str, weights_path: Optional[str] = None,
                 *, names: Optional[Sequence[str]] = None,
                 compute_dtype=None, int8_calib=None):
        self.spec = S.parse_network_cfg(cfg_path)
        self.compiled = CompiledNetwork(self.spec, compute_dtype=compute_dtype)
        if weights_path:
            self.params, self.seen = load_weights(self.spec, weights_path)
        else:
            self.params, self.seen = init_params(self.spec), 0
        self.params = jax.tree.map(jnp.asarray, self.params)
        if int8_calib is not None:
            # int8 trunk + float tail (avgpool/softmax) — see
            # infer/quant.py; hierarchy decode below is unchanged
            from .quant import QuantizedForwardShim
            self.compiled = QuantizedForwardShim(
                self.spec, self.params, int8_calib, self.compiled.trees)
        self.names = list(names) if names else None
        # hierarchy comes from a [softmax] tree= (parser.c: net.hierarchy)
        self.tree = None
        for i, l in enumerate(self.spec.layers):
            if isinstance(l, S.SoftmaxSpec) and i in self.compiled.trees:
                self.tree = self.compiled.trees[i]
        self._predict = jax.jit(self._predict_impl)

    def _predict_impl(self, params, x):
        out, _ = self.compiled.forward(params, x)
        if out.ndim == 4:
            out = out.reshape(out.shape[0], -1)
        if self.tree is not None:
            # predict_classifier applies hierarchy_predictions with
            # only_leaves=0 (classifier.c:717)
            out = B.hierarchy_multiply(out, self.tree.parent)
        return out

    def preprocess(self, image_hwc: np.ndarray) -> np.ndarray:
        return I.letterbox_image_np(
            image_hwc, self.spec.net.w, self.spec.net.h)

    def predict(self, image_hwc: np.ndarray) -> np.ndarray:
        x = self.preprocess(image_hwc)[None]
        return np.asarray(self._predict(self.params, jnp.asarray(x)))[0]

    def predict_topk(self, image_hwc: np.ndarray, k: int = 5):
        p = self.predict(image_hwc)
        idx = np.argsort(-p)[:k]
        return [(int(i), float(p[i]),
                 self.names[int(i)] if self.names else None) for i in idx]


__all__ = ["Classifier"]
