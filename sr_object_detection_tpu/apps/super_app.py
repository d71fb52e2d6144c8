"""super: single-image super-resolution (src_yolo2/super.c:1-131).

  super <cfg> <weights> <image> [-out path]

The reference's super-resolution net ends in a deconvolutional layer;
forward the image and save the upscaled output.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.spec import parse_network_cfg
from ..graph.compiler import build_forward
from ..io.weights import load_weights
from ..ops.image import load_image_rgb
from .cli import find_value


def super_resolve(cfg: str, weights: str, image_path: str) -> np.ndarray:
    spec = parse_network_cfg(cfg)
    im = load_image_rgb(image_path)
    # recompile the graph at the image's own resolution (super.c resizes
    # the net to the input: resize_network(&net, im.w, im.h))
    spec = spec.resize(im.shape[1], im.shape[0])
    params, _ = load_weights(spec, weights)
    params = jax.tree.map(jnp.asarray, params)
    fwd = build_forward(spec)
    out, _ = fwd(params, jnp.asarray(im)[None])
    out = np.asarray(out)[0]
    return np.clip(out, 0, 1)


def run_super(argv):
    cfg, weights, image = argv[0], argv[1], argv[2]
    out_path = find_value(argv, "-out", None) or (
        os.path.splitext(image)[0] + "_super.ppm")
    out = super_resolve(cfg, weights, image)
    from .nightmare_app import _save_ppm
    _save_ppm(out_path, out)
    print(f"wrote {out_path} ({out.shape[1]}x{out.shape[0]})")


__all__ = ["super_resolve", "run_super"]
