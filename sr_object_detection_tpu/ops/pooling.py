"""Pooling ops with darknet-exact geometry, NHWC.

maxpool (maxpool_layer.c:21-114): out = (in + 2*pad)//stride, window
anchored at -pad, out-of-bounds taps contribute -FLT_MAX. Implemented as
``lax.reduce_window`` with -inf padding — identical semantics because a
padded -inf tap can never win the max (every window contains >=1 valid
pixel for all geometries expressible in cfgs).

avgpool (avgpool_layer.c): global mean over H,W -> (B,1,1,C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _tiled_maxpool(x, size: int):
    b, h, w, c = x.shape
    v = x.reshape(b, h // size, size, w // size, size, c)
    return jnp.max(v, axis=(2, 4))


def _tiled_maxpool_fwd(x, size):
    return _tiled_maxpool(x, size), x


def _tiled_maxpool_bwd(size, x, g):
    """Backward routes each window's cotangent to the FIRST max tap
    (darknet's strict-> update, maxpool_layer.c:95-108) — the generic
    reduce-max gradient instead splits it between tied taps (and tie-
    count-divides), which darknet does not. The winner mask is
    recomputed from x with an exclusive prefix over the window taps in
    row-major order; the (oh,s,ow,s)->(h,w) reshapes are free in
    row-major, so the whole backward is one fused elementwise pass
    (A/B-measured against an argmax-residual variant, which hit a
    pathological u8 layout and ran 4x slower)."""
    b, h, w, c = x.shape
    v = x.reshape(b, h // size, size, w // size, size, c)
    m = jnp.max(v, axis=(2, 4), keepdims=True)
    taps = [v[:, :, i:i + 1, :, j:j + 1, :] == m
            for i in range(size) for j in range(size)]
    firsts = []
    seen = None
    for eq in taps:
        firsts.append(eq if seen is None else eq & ~seen)
        seen = eq if seen is None else seen | eq
    first = jnp.concatenate(
        [jnp.concatenate(firsts[i * size:(i + 1) * size], axis=4)
         for i in range(size)], axis=2)
    g6 = jnp.broadcast_to(g[:, :, None, :, None, :], v.shape)
    dx = jnp.where(first, g6, jnp.zeros((), g.dtype))
    return (dx.reshape(x.shape),)


_tiled_maxpool.defvjp(_tiled_maxpool_fwd, _tiled_maxpool_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _amax_maxpool(x, size: int):
    b, h, w, c = x.shape
    v = x.reshape(b, h // size, size, w // size, size, c)
    return jnp.max(v, axis=(2, 4))


def _amax_maxpool_fwd(x, size):
    """Forward saves the FIRST-max tap's row-major rank (darknet's
    strict-> tie rule, maxpool_layer.c:95-108) instead of x itself.

    Residual dtype is bf16 (values 0..size*size-1, exact): round 3
    measured a u8 rank residual hitting a pathological layout (4x
    slower); bf16 shares the activations' tiling. Residual bytes =
    pool-out size — 8x smaller than saving x.

    Why this variant exists (round 5): the reduce_window/
    select_and_scatter_add training pool materializes the full-res
    cotangent dY to HBM, which the BN+leaky backward then re-reads —
    at 208px C=32 geometry that is 2 extra passes over a 354 MB
    tensor per step. With a rank residual the backward is pure
    broadcast-compare-multiply (no select_and_scatter, no concat —
    the round-3 relayout trap), so XLA fuses pool-routing INTO the
    BN+leaky backward pass and dY never exists.
    """
    b, h, w, c = x.shape
    v = x.reshape(b, h // size, size, w // size, size, c)
    m = jnp.max(v, axis=(2, 4), keepdims=True)
    # first-max rank: smallest row-major tap index attaining the max.
    # min over taps of (rank where tap==max else BIG) — elementwise,
    # one fused pass, pooled-size output.
    big = jnp.asarray(size * size, jnp.bfloat16)
    rank = jnp.min(
        jnp.where(
            v == m,
            (jnp.arange(size, dtype=jnp.bfloat16)[:, None] * size
             + jnp.arange(size, dtype=jnp.bfloat16)[None, :]
             ).reshape(1, 1, size, 1, size, 1),
            big),
        axis=(2, 4))
    return m.reshape(b, h // size, w // size, c), (rank, x.shape)


def _amax_maxpool_bwd(size, res, g):
    rank, x_shape = res
    # dx[b, R*s+i, C*s+j, c] = g[b,R,C,c] if rank[b,R,C,c]==i*s+j.
    # Pure broadcast + compare + select: fuses with whatever consumes
    # dx (the BN backward), so neither dY nor a mask materializes.
    tap = (jnp.arange(size, dtype=jnp.bfloat16)[:, None] * size
           + jnp.arange(size, dtype=jnp.bfloat16)[None, :]
           ).reshape(1, 1, size, 1, size, 1)
    sel = rank[:, :, None, :, None, :] == tap
    dx6 = jnp.where(sel, g[:, :, None, :, None, :],
                    jnp.zeros((), g.dtype))
    return (dx6.reshape(x_shape),)


_amax_maxpool.defvjp(_amax_maxpool_fwd, _amax_maxpool_bwd)


def maxpool(x, *, size: int, stride: int, pad: int, pad_value=None,
            for_training: bool = False, train_mode: str = "rw"):
    """Darknet maxpool. x: NHWC. ``pad_value`` overrides the -inf pad
    identity for dtypes without one (the int8 path passes iinfo.min).

    ``for_training`` picks the formulation by regime (identical
    semantics every way — each backward's tie rule IS darknet's
    first-tap update, verified bit-for-bit incl. bf16 in
    tests/test_ops.py::test_reduce_window_grad_is_first_tap and
    ::test_amax_pool_backward_first_tap):
      * inference: tiled reshape+max — fuses into the producing conv's
        epilogue (reduce_window costs a full HBM round trip there);
      * training, train_mode="rw": reduce_window — its
        select_and_scatter_add backward avoids the tiled custom-vjp's
        rank-6 mask/concat relayouts (A/B on v5e tiny-yolo-416 B=128:
        2511 vs 2154 img/s, -8.4 ms of pool-zone copies per step);
      * training, train_mode="amax": first-max-rank residual — the
        backward is pure broadcast-compare, so XLA fuses pool routing
        into the BN+leaky backward and the full-res cotangent dY
        never reaches HBM (the round-5 traffic cut; falls back to
        reduce_window for geometries the tiled form can't express)."""
    h, w = x.shape[1], x.shape[2]
    out_h = (h + 2 * pad) // stride
    out_w = (w + 2 * pad) // stride
    tiled_ok = (size == stride and pad == 0
                and h % size == 0 and w % size == 0)
    if tiled_ok and not for_training:
        return _tiled_maxpool(x, size)
    if tiled_ok and for_training and train_mode == "amax":
        return _amax_maxpool(x, size)
    # right/bottom padding so the last window fits: the reference reads
    # out-of-bounds taps as -FLT_MAX (maxpool_layer.c:101-103); padding
    # with -inf reproduces that for both the -pad left offset and the
    # overhang on the right.
    pad_b = max(0, (out_h - 1) * stride + size - h - pad)
    pad_r = max(0, (out_w - 1) * stride + size - w - pad)
    y = lax.reduce_window(
        x,
        -jnp.inf if pad_value is None else pad_value,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad_b), (pad, pad_r), (0, 0)),
    )
    return y[:, :out_h, :out_w, :]


def avgpool_global(x):
    """Global average pool -> (B, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def lrn(x, *, size: int, alpha: float, beta: float, kappa: float):
    """Local response normalization across channels, quirk-exact.

    The reference (normalization_layer.c:66-96) builds the channel-window
    sum with a running-sum recurrence whose init loop adds channels
    [0, size//2) — one short of the intended [0, size//2] — while the
    removal step later subtracts channel size//2 anyway. The net closed
    form for every output channel k is:

        norms[k] = kappa + alpha * (sum_{j=max(0,k-(size-1)//2)}
                                        ^{min(c-1,k+size//2)} x[j]^2
                                    - x[size//2]^2)

    i.e. a standard clipped window sum MINUS the squared activation of
    fixed channel size//2. We reproduce that exactly; output is
    x * norms^-beta.
    """
    c = x.shape[3]
    sq = jnp.square(x)
    h1 = (size - 1) // 2   # taps behind
    h2 = size // 2         # taps ahead
    pads = [(0, 0), (0, 0), (0, 0), (h1, h2)]
    sq_p = jnp.pad(sq, pads)
    sums = lax.reduce_window(
        sq_p, 0.0, lax.add,
        window_dimensions=(1, 1, 1, size),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    if h2 < c:
        sums = sums - sq[:, :, :, h2:h2 + 1]
    norms = kappa + alpha * sums
    return x * jnp.power(norms, -beta)


__all__ = ["maxpool", "avgpool_global", "lrn"]
