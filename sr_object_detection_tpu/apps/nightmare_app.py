"""nightmare: deep-dream gradient ascent on layer activations.

Mirrors run_nightmare (src_yolo2/nightmare.c:228-308): repeatedly
maximize ||layer activations||^2 wrt the input image at multiple
octaves. The reference hand-rolls the backward pass per octave
(optimize_picture:60-100); here it is one jax.grad.

CLI: sr-detect nightmare <cfg> <weights> <image> <layer>
     [-rounds n] [-iters n] [-range r] [-octaves o] [-rate lr]
     [-thresh t] [-zoom z] [-rotate deg]
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.spec import parse_network_cfg
from ..graph.compiler import build_forward
from ..io.weights import load_weights
from ..ops.image import resize_image, load_image_rgb
from .cli import find_value


def make_dream_step(spec, layer_index: int):
    fwd = build_forward(spec)

    def objective(params, x):
        _, aux = fwd(params, x, keep_all=True)
        act = aux["outputs"][layer_index]
        return 0.5 * jnp.sum(jnp.square(act))

    grad = jax.jit(jax.grad(objective, argnums=1))
    return grad


def nightmare(cfg: str, weights: str, image_path: str, layer: int, *,
              rounds: int = 1, iters: int = 10, octaves: int = 4,
              rate: float = 0.05, thresh: float = 1.0, out_dir: str = ".",
              seed: int = 0) -> np.ndarray:
    spec = parse_network_cfg(cfg)
    params, _ = load_weights(spec, weights)
    params = jax.tree.map(jnp.asarray, params)

    im = load_image_rgb(image_path)
    base_h = spec.net.h
    base_w = spec.net.w
    rng = np.random.default_rng(seed)

    out = None
    for r in range(rounds):
        for octave in range(octaves, 0, -1):
            scale = 1.0 / (1.3 ** (octave - 1))
            w = max(int(base_w * scale) // 2 * 2, 32)
            h = max(int(base_h * scale) // 2 * 2, 32)
            oct_spec = spec.resize(w, h)
            grad = make_dream_step(oct_spec, layer)
            x = np.asarray(resize_image(jnp.asarray(im), w, h))[None]
            x = jnp.asarray(x)
            for it in range(iters):
                g = grad(params, x)
                gn = jnp.mean(jnp.abs(g)) + 1e-8
                x = x + rate * g / gn          # normalized ascent
                x = jnp.clip(x, 0.0, 1.0)
            im = np.asarray(resize_image(x[0], im.shape[1], im.shape[0]))
            im = np.clip(im, 0, 1)
        out = im
        base = os.path.splitext(os.path.basename(image_path))[0]
        _save_ppm(os.path.join(
            out_dir, f"{base}_nightmare_l{layer}_r{r}.ppm"), out)
    return out


def _save_ppm(path: str, im: np.ndarray):
    with open(path, "wb") as f:
        h, w = im.shape[:2]
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write((np.clip(im, 0, 1) * 255).astype(np.uint8).tobytes())


def run_nightmare(argv):
    cfg, weights, image, layer = argv[0], argv[1], argv[2], int(argv[3])
    rounds = find_value(argv, "-rounds", 1, int)
    iters = find_value(argv, "-iters", 10, int)
    octaves = find_value(argv, "-octaves", 4, int)
    rate = find_value(argv, "-rate", 0.05, float)
    out_dir = find_value(argv, "-out", ".", str)
    nightmare(cfg, weights, image, layer, rounds=rounds, iters=iters,
              octaves=octaves, rate=rate, out_dir=out_dir)


__all__ = ["nightmare", "run_nightmare", "make_dream_step"]
