"""Layout / graph-wiring ops: reorg, route, shortcut, dropout, flatten.

All tensors are NHWC. The reference is CHW, and one op — reorg — is
layout-*sensitive*: it reinterprets raw CHW memory. We reproduce its
exact permutation with reshapes/transposes (XLA compiles these to a
single fused copy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reorg_darknet(x, *, stride: int):
    """Exact darknet reorg for reverse=0 (the YOLOv2 passthrough).

    Derivation (blas.c:8-29 with forward=0, called from
    reorg_layer.c:83 with the layer's INPUT dims w,h,c):

      for k<c, j<h, i<w:
        out_flat[i + w*(j + h*k)] = in_flat[w2 + (w*s)*(h2 + (h*s)*c2)]
        with oc = c//s^2, c2 = k % oc, off = k // oc,
             w2 = i*s + off % s, h2 = j*s + off // s.

    Both buffers have c*h*w elements. The output buffer is then consumed
    by the next layer as a CHW tensor of shape (c*s^2, h//s, w//s) — the
    declared out_c/out_h/out_w (reorg_layer.c:21-23). So the full op is:

      1. view input CHW memory as (oc, h*s, w*s)
      2. gather to a (c, h, w) buffer per the formula above
      3. view that buffer as (c*s^2, h//s, w//s)

    We fuse the three steps with pure reshape/transpose ops and return
    NHWC of shape (b, h//s, w//s, c*s^2).
    """
    b, h, w, c = x.shape
    s = stride
    if s == 1:
        return x
    oc = c // (s * s)
    # step 1: CHW memory view as (oc, h*s, w*s)
    v = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, oc, h * s, w * s)
    # step 2: out[k=off*oc+c2, j, i] = v[c2, j*s + off//s, i*s + off%s]
    #   split v spatial dims: v (b, oc, h, s, w, s) with
    #   v2[c2, j, oy, i, ox] = v[c2, j*s+oy, i*s+ox]
    v2 = v.reshape(b, oc, h, s, w, s)
    #   out (c=off*oc+c2, j, i) -> transpose to (oy, ox, c2, j, i)
    out_chw = jnp.transpose(v2, (0, 3, 5, 1, 2, 4)).reshape(b, c, h, w)
    # step 3: reinterpret (c, h, w) memory as (c*s^2, h//s, w//s)
    out_chw = out_chw.reshape(b, c * s * s, h // s, w // s)
    return jnp.transpose(out_chw, (0, 2, 3, 1))


def reorg_reverse_darknet(x, *, stride: int):
    """Darknet reorg with reverse=1: reorg_cpu(..., forward=1).

    Inverse of :func:`reorg_darknet`: input NHWC (b, h, w, c) ->
    output NHWC (b, h*s, w*s, c//s^2). The input CHW buffer is indexed
    with its own (c, h, w) dims as the 'out' side of the forward formula.
    """
    b, h, w, c = x.shape
    s = stride
    if s == 1:
        return x
    # The reference calls reorg_cpu(input, w, h, c, ..., forward=1, output):
    #   out[w2 + w*s*(h2 + h*s*c2)] = in[i + w*(j + h*k)]
    # i.e. scatter — the exact inverse of the gather above.
    oc = c // (s * s)
    in_chw = jnp.transpose(x, (0, 3, 1, 2))           # (b, c, h, w)
    v2 = in_chw.reshape(b, s, s, oc, h, w)            # (b, oy, ox, c2, j, i)
    v = jnp.transpose(v2, (0, 3, 4, 1, 5, 2))         # (b, c2, j, oy, i, ox)
    out = v.reshape(b, oc, h * s, w * s)
    return jnp.transpose(out, (0, 2, 3, 1))


def route(tensors):
    """Channel concat of same-spatial outputs (route_layer.c:73-86).

    In CHW, per-batch concatenation of flat buffers == channel concat when
    spatial dims agree (the only case exercised by the cfgs). NHWC concat
    on the last axis is the same permutation-free op.
    """
    return jnp.concatenate(tensors, axis=-1)


def shortcut(x, from_x, activation_fn):
    """Residual add with stride/sample resampling (blas.c:57-81).

    out = x; out[...] += from_x[resampled]; activation(out).
    Handles mismatched spatial dims by integer stride (downsample the
    source) or sample (upsample into strided positions of the output) —
    and mismatched channels by adding only the first min(c1,c2).
    """
    b, h2, w2, c2 = x.shape
    _, h1, w1, c1 = from_x.shape
    stride = max(1, w1 // w2)
    sample = max(1, w2 // w1)
    minw = min(w1, w2)
    minh = min(h1, h2)
    minc = min(c1, c2)

    if stride == 1 and sample == 1 and (h1, w1, c1) == (h2, w2, c2):
        y = x + from_x
    else:
        x = jnp.asarray(x)
        add = from_x[:, :minh * stride:stride, :minw * stride:stride, :minc]
        if sample == 1:
            y = x.at[:, :minh, :minw, :minc].add(add)
        else:
            y = x.at[:, :minh * sample:sample, :minw * sample:sample, :minc].add(add)
    return activation_fn(y)


def dropout(x, rate: float, rng, *, train: bool):
    """Darknet dropout (dropout_layer.c): train-time only, scale 1/(1-p).

    At inference the layer is the identity (the parser even aliases its
    output to the previous layer's buffer — parser.c:660-665).
    """
    if not train or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def nhwc_to_flat(x):
    """Flatten NHWC -> (B, C*H*W) in darknet CHW raster order.

    Connected/softmax/cost layers in the reference consume the flat CHW
    buffer of the previous layer; parity requires the same element order.
    """
    b = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)


def flat_to_nhwc(x, h: int, w: int, c: int):
    """Inverse of :func:`nhwc_to_flat`."""
    b = x.shape[0]
    return jnp.transpose(x.reshape(b, c, h, w), (0, 2, 3, 1))


__all__ = [
    "reorg_darknet", "reorg_reverse_darknet", "route", "shortcut",
    "dropout", "nhwc_to_flat", "flat_to_nhwc",
]
