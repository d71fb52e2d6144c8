"""Batch-1 fused stem: [conv3x3(s1,p1)+bias+leaky -> maxpool2x2(s2)]
pairs as single Pallas kernels, channels-first flat layout.

Why: at batch 1, XLA lays every C<128 stem activation out channel-minor
(lane-padded up to 8x for C=16) and spends ~650us/frame of tiny-yolo-416
bf16 in retile copies + (2,128)-tiled pool reduces — 61% of the 1.06 ms
frame (profiled; PARITY.md batch-1 section). The batch-minor rule that
fixes this at B=128 has no lever at B=1, and NCHW dimension numbers are
a measured wash (XLA canonicalizes conv layouts). So the batch-1
latency path owns the stem layout itself:

  * activations live channels-first and FLAT: (C, (H+4)*Wp), one image
    row per 128-aligned lane stride Wp = roundup(W+2, 128), a one-pixel
    zero border folded in (plus spare bottom rows so block reads stay
    in bounds). Lanes are image COLUMNS — always full, no channel
    padding in the minor dim.
  * per row-block: ONE dynamic-but-aligned lane slice pulls the block
    (+halo); the 9 taps are STATIC misaligned slices of that value
    (Mosaic lowers these to lane shifts; a dynamic+misaligned ds or a
    strided slice does NOT compile — probed, see PARITY.md), sublane-
    concatenated into a (9*Cin, 2R*Wp) operand, and the conv becomes
    ONE MXU dot per row-block: (Cout, 9*Cin) @ (9*Cin, 2R*Wp).
  * pooling: vertical 2:1 via static row-slice max; horizontal 2:1 via
    two 0/1 selection-matrix matmuls (even/odd columns) that also fold
    in the +1 left-border shift of the output layout — Mosaic has no
    strided lane slice, but a (R*Cout, Wp) @ (Wp, Wp2) bf16 dot with
    one-hot columns selects exactly and costs a handful of MXU passes.
  * the pooled rows are stored back in the same flat layout, so pairs
    chain with ZERO XLA ops (and zero relayouts) between them.

Reference semantics reproduced: darknet conv pad=1 'same' + leaky 0.1x
(convolutional_layer.c:435-474) and maxpool 2x2 stride 2
(maxpool_layer.c:79-114) on an even grid, where window taps never go
out of bounds, so plain max == darknet max. BN is already folded by the
caller (inference engine).

Used by LatencyEngine(fused_stem=True); exactness vs the XLA path is
pinned in tests/test_b1_stem.py (interpret mode on CPU, device on TPU).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..graph import spec as S

_INTERPRET = False          # flipped by CPU tests (Mosaic needs TPU)

_LANE = 128
_MAX_L = 16384              # lane budget per row-block operand
_PAD_ROWS = 4               # 1 top border + 1 bottom border + 2 spare


def _wp(w: int) -> int:
    return ((w + 2 + _LANE - 1) // _LANE) * _LANE


def _pick_r(h: int, wp: int) -> int:
    for r in (16, 8, 4, 2, 1):
        if (h // 2) % r == 0 and 2 * r * wp <= _MAX_L:
            return r
    return 1


def _sel_matrix(W: int, wp: int, wp2: int, parity: int):
    """(wp, wp2) one-hot: column c+1 selects conv column 2c+parity —
    the strided-lane pool select as an MXU dot, left-shifted by one so
    the result lands inside the output row's zero border."""
    e = np.zeros((wp, wp2), np.float32)
    for c in range(W // 2):
        e[2 * c + parity, c + 1] = 1.0
    return jnp.asarray(e, jnp.bfloat16)


def _pair_kernel(x_ref, w_ref, b_ref, e0_ref, e1_ref, o_ref, rhs_ref, *,
                 H, W, Cin, Cout, R):
    """One grid step: R pooled output rows = 2R conv rows.

    x_ref: (Cin, (H+4)*Wp) bf16 flat, zero borders prefilled.
    w_ref: (Cout, 9*Cin) bf16 — tap-major columns (dy,dx,ci).
    b_ref: (Cout, 1) f32.
    e0/e1_ref: (Wp, Wp2) bf16 one-hot column selectors.
    o_ref: (Cout, (H//2+4)*Wp2) bf16 flat (same convention).
    rhs_ref: (9*Cin, 2R*Wp) bf16 VMEM scratch for the tap operand.
    """
    wp = _wp(W)
    wp2 = _wp(W // 2)
    i = pl.program_id(0)
    r0 = i * 2 * R                      # first conv row of this block
    L = 2 * R * wp

    # one dynamic-but-aligned slice for the block + 2-row halo; the 9
    # taps are then STATIC misaligned slices of the value, stored into
    # scratch at sublane offsets (a store canonicalizes the slice's
    # lane-offset layout — Mosaic's concatenate cannot unify 9 distinct
    # offset layouts, measured crash; PARITY.md batch-1 section)
    blk = x_ref[:, pl.ds(pl.multiple_of(r0 * wp, wp), L + 3 * wp)]
    for t, (dy, dx) in enumerate((dy, dx) for dy in range(3)
                                 for dx in range(3)):
        rhs_ref[t * Cin:(t + 1) * Cin, :] = blk[
            :, dy * wp + dx:dy * wp + dx + L]

    y = jax.lax.dot_general(
        w_ref[...], rhs_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                # (Cout, L)
    y = y + b_ref[...]
    y = jnp.where(y > 0, y, 0.1 * y)

    # vertical 2:1 max over row pairs, all R pooled rows stacked
    a = jnp.concatenate(
        [y[:, 2 * m * wp:(2 * m + 1) * wp] for m in range(R)], axis=0)
    b = jnp.concatenate(
        [y[:, (2 * m + 1) * wp:(2 * m + 2) * wp] for m in range(R)],
        axis=0)
    v = jnp.maximum(a, b).astype(jnp.bfloat16)             # (R*Cout, wp)

    # horizontal 2:1 max via one-hot column-select dots (even/odd)
    he = jax.lax.dot_general(v, e0_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ho = jax.lax.dot_general(v, e1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    hm = jnp.maximum(he, ho).astype(o_ref.dtype)           # (R*Cout, wp2)

    for m in range(R):
        orow = pl.multiple_of((i * R + m + 1) * wp2, wp2)
        o_ref[:, pl.ds(orow, wp2)] = hm[m * Cout:(m + 1) * Cout]

    # zero the top border row once and the bottom pad rows once (the
    # one-hot selectors already zero each row's left/right borders)
    @pl.when(i == 0)
    def _():
        o_ref[:, pl.ds(0, wp2)] = jnp.zeros((Cout, wp2), o_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        tail = pl.multiple_of((H // 2 + 1) * wp2, wp2)
        o_ref[:, pl.ds(tail, 3 * wp2)] = jnp.zeros(
            (Cout, 3 * wp2), o_ref.dtype)


def _run_pair(xf, wpk, bias, *, H, W, Cin, Cout):
    wp = _wp(W)
    wp2 = _wp(W // 2)
    R = _pick_r(H, wp)
    out_shape = jax.ShapeDtypeStruct(
        (Cout, (H // 2 + _PAD_ROWS) * wp2), jnp.bfloat16)
    kern = functools.partial(_pair_kernel, H=H, W=W, Cin=Cin, Cout=Cout,
                             R=R)
    e0 = _sel_matrix(W, wp, wp2, 0)
    e1 = _sel_matrix(W, wp, wp2, 1)
    flops = 2 * H * W * Cout * 9 * Cin
    return pl.pallas_call(
        kern,
        grid=(H // 2 // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((9 * Cin, 2 * R * wp), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=int(xf.size * 2 + out_shape.size * 2)),
        interpret=_INTERPRET,
    )(xf, wpk, bias, e0, e1)


def _cpad16(c: int) -> int:
    """Round a channel count up to the 16-sublane bf16 packed tile.
    Tap-scratch stores at sublane offset t*Cin are tile-aligned only
    when Cin is a multiple of 16 — padding conv1's Cin 3->16 cut the
    kernel 38.9 -> 28.5 us/frame BUT the 5.3x-padded input paid it all
    back in pad+copy prep (wall-neutral, PARITY.md), so build_stem does
    NOT use this by default; kept for callers that already hold padded
    inputs."""
    return ((c + 15) // 16) * 16


def pack_weights(w_hwio, dtype=jnp.bfloat16, cin_pad=None):
    """HWIO (3,3,Cin,Cout) -> (Cout, 9*cin_pad), tap-major (dy,dx,ci);
    channels zero-padded to cin_pad so the padded input lanes multiply
    by zero."""
    k1, k2, cin, cout = w_hwio.shape
    assert (k1, k2) == (3, 3)
    cp = cin_pad or cin
    w = np.asarray(w_hwio, np.float32)
    if cp != cin:
        w = np.pad(w, ((0, 0), (0, 0), (0, cp - cin), (0, 0)))
    return jnp.asarray(w, dtype).reshape(9 * cp, cout).T


def to_flat(x_nhwc, W: int, cin_pad=None):
    """(1,H,W,C) -> (cin_pad, (H+4)*Wp) flat bf16 with zero borders."""
    _, H, _, C = x_nhwc.shape
    cp = cin_pad or C
    wp = _wp(W)
    xt = jnp.transpose(x_nhwc[0].astype(jnp.bfloat16), (2, 0, 1))
    xp = jnp.pad(xt, ((0, cp - C), (1, _PAD_ROWS - 1), (1, wp - 1 - W)))
    return xp.reshape(cp, (H + _PAD_ROWS) * wp)


def from_flat(of, H2: int, W2: int):
    """(C, (H2+4)*Wp2) flat -> (1, H2, W2, C) NHWC."""
    C = of.shape[0]
    wp2 = _wp(W2)
    o = of.reshape(C, H2 + _PAD_ROWS, wp2)[:, 1:1 + H2, 1:1 + W2]
    return jnp.transpose(o, (1, 2, 0))[None]


def plan_pairs(spec: S.NetworkSpec):
    """Leading [conv3x3 s1 p1 leaky (BN folded), maxpool2x2 s2 p0] pairs
    this kernel can own. Returns list of (conv_idx, pool_idx)."""
    pairs = []
    layers = spec.layers
    i = 0
    while i + 1 < len(layers):
        l, nxt = layers[i], layers[i + 1]
        if not (isinstance(l, S.ConvSpec) and l.size == 3 and l.stride == 1
                and l.pad == 1 and l.activation == "leaky"
                and not l.batch_normalize and not l.xnor and not l.binary
                and l.filters <= 128
                and isinstance(nxt, S.MaxPoolSpec) and nxt.size == 2
                and nxt.stride == 2 and nxt.pad == 0
                and l.out_h % 2 == 0 and l.out_w % 2 == 0):
            break
        pairs.append((i, i + 1))
        i += 2
    # no later layer may route/shortcut back into the fused prefix
    consumed = i
    for j in range(consumed, len(layers)):
        l = layers[j]
        if isinstance(l, S.RouteSpec) and any(k < consumed for k in l.layers):
            return []
        if isinstance(l, S.ShortcutSpec) and l.from_index < consumed:
            return []
    return pairs


def truncate_spec(spec: S.NetworkSpec, n: int) -> S.NetworkSpec:
    """spec with the first n layers removed: net geometry rebased to
    layer n's input and route/shortcut indices shifted by -n (plan_pairs
    already guarantees none point into the removed prefix)."""
    import dataclasses
    first = spec.layers[n]
    net = dataclasses.replace(spec.net, h=first.h, w=first.w, c=first.c,
                              inputs=first.h * first.w * first.c)
    out = []
    for l in spec.layers[n:]:
        if isinstance(l, S.RouteSpec):
            l = dataclasses.replace(
                l, layers=tuple(j - n for j in l.layers))
        elif isinstance(l, S.ShortcutSpec):
            l = dataclasses.replace(l, from_index=l.from_index - n)
        out.append(l)
    return S.NetworkSpec(net=net, layers=tuple(out), cfg_path=spec.cfg_path)


def build_stem(spec: S.NetworkSpec, params):
    """Returns (stem_fn, n_consumed) or (None, 0).

    stem_fn(x_nhwc_b1) -> NHWC activation after the last fused pair.
    Weights/biases are baked in (the latency engine's params are
    static for the life of the engine).
    """
    pairs = plan_pairs(spec)
    if not pairs:
        return None, 0
    packed = []
    for ci, _pi in pairs:
        l = spec.layers[ci]
        p = params[ci]
        # NOTE round-3 measured negative: padding Cin 3->16 for the
        # first pair makes the tap-scratch stores tile-aligned (kernel
        # 38.9 -> 28.5 us) but the 5.3x-padded input costs the same
        # back in pad+copy prep (+25 us) — wall-neutral, so unpadded
        # stays (PARITY.md batch-1 section).
        packed.append((
            pack_weights(p["weights"]),
            jnp.asarray(p["biases"], jnp.float32).reshape(-1, 1),
            dict(H=l.h, W=l.w, Cin=l.c, Cout=l.filters),
        ))
    last = spec.layers[pairs[-1][1]]
    out_h, out_w = last.out_h, last.out_w

    def stem_fn(x_nhwc):
        cur = to_flat(x_nhwc, packed[0][2]["W"])
        for wpk, b, dims in packed:
            cur = _run_pair(cur, wpk, b, **dims)
        return from_flat(cur, out_h, out_w)

    return stem_fn, pairs[-1][1] + 1


__all__ = ["build_stem", "plan_pairs", "pack_weights", "to_flat",
           "from_flat", "truncate_spec"]
