"""Phase-split fused TRAINING stem pair (bf16): conv3x3(s1,p1) + BN
(train mode) + bias + leaky + maxpool2x2/2 with the conv INSIDE the
Pallas kernels — the full-resolution conv activation NEVER reaches HBM,
in forward OR backward.

Reference semantics being reproduced (all already oracle-pinned by the
production chain this module is tolerance-tested against):
  * conv forward: convolutional_layer.c:435-474 (bf16 operands, f32
    accumulation, result rounded to bf16 like ops/conv.conv2d +
    conv_block's astype);
  * train batchnorm: ops/conv._bn_core_fast — single-pass shifted
    (by the gradient-stopped rolling mean) f32 moments, 1/(N-1)
    variance (blas.c:101), eps OUTSIDE the sqrt (blas.c:122),
    negative-cancellation clamp;
  * backward: the reference's HAND-WRITTEN batchnorm gradient
    (batchnorm_layer.c:74-157, eps_b=1e-5), first-max-tap pool routing
    (maxpool_layer.c:95-108) and the bf16-rounded leaky backward —
    numerics identical to kernels/fused_stem.py (same expressions),
    which is pinned against the unfused production chain.

Why this exists: the round-3 fused_stem experiment proved the
elementwise/pool/backward chain was already at XLA-fusion bandwidth at
FIXED dataflow — the only >10% lever is not materializing the conv
output at all, which the fused_stem analysis parked because an HWCN
C=3 conv recompute runs the MXU at 2.6% tile utilization. The
phase-split layout + pool-variant M-packing (kernels/phase_stem.py, the
+33% int8 serving kernel) removes exactly that wall, so the conv can be
recomputed in-kernel ~4x (stats, fwd, two backward passes) for less
than the cost of ONE materialization of the (B,416,416,16) activation.

Four passes per pair, all over the phase-split layout of
kernels/phase_stem (P=2 for a single fused pair):
  K-stats : packed tap-union dots -> bf16-round -> shifted f32
            sum/sumsq accumulated per channel (-> mean/var, rolling).
  K-fwd   : recompute dots -> x_hat -> z -> leaky -> FIRST-max 2x2
            pool across the four (row,phase) variants -> pooled bf16
            (pad-free pooled layout; nothing else is written).
  K-bwd   : ONE pass for the whole backward. Recompute + pool-route
            (first-max recomputed, fused_stem._recompute_dz semantics)
            -> dz -> per-channel sum(dz), sum(dz*x_hat) (= dbiases f32
            / dscales and the hand-written BN-backward reductions),
            PLUS the weight gradient in FACTORED form: dy = dz*c1 +
            (y-mean)*c2 + c3 is linear per out-channel, so
            dw = c1*(sum x(x)dz) + c2*(sum x(x)y - mean*sum x) +
            c3*(sum x) — the kernel accumulates the three
            lane-contracting dots [x_taps (x) (dz | y | 1)] and the
            c1/c2/c3 application happens at unpack time, OUTSIDE the
            kernel, removing the two-pass sequential dependency a
            materialized dy would need. No input gradient: a leading
            pair's input is the image (dx = zeros, DCE'd by XLA).

Used through graph/compiler.build_forward(phase_train=True) /
Trainer(phase_train=True); A/B + parity in tests/test_phase_train.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.conv import BN_EPS
from .phase_stem import (_LANE, _groups, _pack_lhs, _pack_mode, halo_pad,
                         halo_rows, to_phase)

_INTERPRET = False
_VMEM_BUDGET = 11 * 1024 * 1024
EPS_B = 1e-5                 # batchnorm_layer.c:74-115 backward eps


class Geom(NamedTuple):
    H: int
    W: int
    C: int
    Cout: int
    P: int
    WP: int
    RP: int
    WS: int
    NB: int
    NCH: int
    pack_dr: bool
    pack_pp: bool


def from_phase_np(of, H: int, W: int, C: int, P: int):
    """Pad-free phase layout (H*C, P*(W/P)*128) -> (128, H, W, C)."""
    wp = W // P
    t = of.reshape(H, C, P, wp, _LANE)
    return t.transpose(4, 0, 3, 2, 1).reshape(_LANE, H, W, C)


def to_phase_np(q_nhwc, P: int):
    """(128, H, W, C) -> pad-free phase layout (H*C, P*(W/P)*128)."""
    B, H, W, C = q_nhwc.shape
    wp = W // P
    t = q_nhwc.reshape(B, H, wp, P, C).transpose(1, 4, 3, 2, 0)
    return t.reshape(H * C, P * wp * B)


def _vmem_train(C, Cout, P, WP, RP, WS, pack_dr, pack_pp):
    PW = P * (WP + 2) * _LANE
    WSL = WS * _LANE
    NR = 4 if pack_dr else 3
    NC = 4 if pack_pp else 3
    nv = (2 if pack_dr else 1) * (2 if pack_pp else 1)
    G = 4 // nv
    KK = NR * NC * C
    x = 2 * (2 * RP * C) * PW * 2
    halo = 2 * halo_pad(C) * PW * 2
    dp = 2 * RP * Cout * WSL * 2
    outa = 2 * RP * Cout * WSL * 2
    w = G * nv * Cout * KK * 2
    rhs = KK * WSL * 2
    dyall = (2 * nv * Cout + 8) * WSL * 2
    temps = 14 * Cout * WSL * 4       # ys (4x f32) + dz/x_hat/epilogue
    return x + halo + dp + outa + w + rhs + dyall + temps


def plan_pair(H: int, W: int, C: int, Cout: int, P: int = 2):
    """Geometry for one fused training pair, or None if nothing fits.
    P=2 for a standalone pair (the phase depth a 1-pair chain needs)."""
    if W % P or H % 2 or W % 2:
        return None
    WP = W // P
    H2 = H // 2
    pack_dr, pack_pp = _pack_mode(C, Cout)
    best = None
    for rp in range(1, min(H2, 16) + 1):
        if H2 % rp or (2 * rp * C) % 8:
            continue
        for ws in [w for w in range(WP, 0, -1) if WP % w == 0]:
            if _vmem_train(C, Cout, P, WP, rp, ws,
                           pack_dr, pack_pp) <= _VMEM_BUDGET:
                if best is None or rp > best[0]:
                    best = (rp, ws)
                break
    if best is None:
        return None
    RP, WS = best
    return Geom(H, W, C, Cout, P, WP, RP, WS, H2 // RP, WP // WS,
                pack_dr, pack_pp)


# ------------------------------------------------------------ kernels

def _train_kernel(*refs, mode, C, Cout, P, WP, RP, WS, pack_dr,
                  pack_pp):
    """Grid (NB, P//2, NCH). Shared structure: stage the tap union,
    recompute the four pool-variant conv outputs (bf16-rounded f32),
    then the per-mode epilogue. kc rows (f32, (7*Cout, 1)):
    0 shift, 1 mean, 2 inv(=1/(sqrt(var)+BN_EPS)), 3 scales
    (4-6 reserved); bias_b: (Cout, 1) bf16."""
    if mode == "bwd":
        x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, o_ref, ow_ref, \
            rhs_ref, dy_ref = refs
    else:
        x_ref, h_ref, w_ref, kc_ref, bb_ref, o_ref, rhs_ref, \
            dy_ref = refs
        dp_ref = ow_ref = None
    i = pl.program_id(0)
    q = pl.program_id(1)
    mc = pl.program_id(2)
    WSL = WS * _LANE
    BW = (WP + 2) * _LANE
    NR = 4 if pack_dr else 3
    NC = 4 if pack_pp else 3
    groups = _groups(pack_dr, pack_pp)
    nv = len(groups[0][1])
    Mg = nv * Cout

    def kc(r):
        return kc_ref[r * Cout:(r + 1) * Cout, :]     # (Cout, 1) f32

    if mode in ("stats", "bwd"):
        @pl.when((i == 0) & (q == 0) & (mc == 0))
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)
            if ow_ref is not None:
                ow_ref[...] = jnp.zeros_like(ow_ref)
    if mode == "bwd":
        # constant rows for the sum(x) dot: 8 ones rows (any one column
        # of the result is sum over lanes of each staged tap row)
        dy_ref[2 * Mg:2 * Mg + 8, :] = jnp.ones((8, WSL), jnp.bfloat16)

    def row(r):
        if r < 0:
            return lambda ds: h_ref[0:C, ds]
        if r >= 2 * RP:
            return lambda ds: h_ref[C:2 * C, ds]
        return lambda ds: x_ref[r * C:(r + 1) * C, ds]

    def col_start(c):
        blk = lax.rem(c + P, P)
        dlt = lax.div(c - blk, P)
        return pl.multiple_of(
            blk * BW + (1 + dlt) * _LANE + mc * WSL, _LANE)

    def stage(rp, dr0, pp0):
        for ri in range(NR):
            r = row(2 * rp + dr0 + ri - 1)
            for ci in range(NC):
                c = 2 * q + (pp0 + ci - 1)
                rhs_ref[(ri * NC + ci) * C:(ri * NC + ci + 1) * C,
                        :] = r(pl.ds(col_start(c), WSL))

    for rp in range(RP):
        # ---- recompute the four variant conv outputs (bf16) --------
        ys = {}
        for g, ((dr0, pp0), variants) in enumerate(groups):
            stage(rp, dr0, pp0)
            y = lax.dot_general(
                w_ref[g * Mg:(g + 1) * Mg, :], rhs_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            yb = y.astype(jnp.bfloat16)
            for vi, (dr, pp) in enumerate(variants):
                ys[dr * 2 + pp] = yb[vi * Cout:(vi + 1) * Cout]

        if mode == "stats":
            s0 = s1 = None
            for k in range(4):
                xs = ys[k].astype(jnp.float32) - kc(0)
                s0 = xs if s0 is None else s0 + xs
                s1 = xs * xs if s1 is None else s1 + xs * xs
            o_ref[0:Cout, :] += s0
            o_ref[Cout:2 * Cout, :] += s1
            continue

        # ---- BN + bias + leaky per variant (fused_stem._bn_leaky) --
        mean, inv, scales = kc(1), kc(2), kc(3)
        bias = bb_ref[...]
        av, zpos, xhat, xm = {}, {}, {}, {}
        for k in range(4):
            ybf = ys[k].astype(jnp.float32)
            xm[k] = ybf - mean
            xhat[k] = xm[k] * inv
            z = (xhat[k] * scales).astype(jnp.bfloat16) + bias
            zpos[k] = z.astype(jnp.float32) > 0
            av[k] = jnp.where(zpos[k], z, jnp.bfloat16(0.1) * z)

        if mode == "fwd":
            # darknet FIRST-max pool across variants (window row-major
            # order == variant index order)
            best = av[0]
            for k in range(1, 4):
                take = av[k].astype(jnp.float32) \
                    > best.astype(jnp.float32)
                best = jnp.where(take, av[k], best)
            o_ref[rp * Cout:(rp + 1) * Cout, :] = best
            continue

        # ---- backward: first-max routing + bf16-rounded leaky bwd --
        g_ct = dp_ref[rp * Cout:(rp + 1) * Cout, :].astype(jnp.float32)
        m = av[0].astype(jnp.float32)
        for k in range(1, 4):
            m = jnp.maximum(m, av[k].astype(jnp.float32))
        dz = {}
        seen = None
        for k in range(4):
            eq = av[k].astype(jnp.float32) == m
            first = eq if seen is None else eq & jnp.logical_not(seen)
            seen = eq if seen is None else seen | eq
            da = jnp.where(first, g_ct, jnp.zeros((), jnp.float32))
            neg = (jnp.float32(0.10009765625) * da).astype(
                jnp.bfloat16).astype(jnp.float32)
            dz[k] = jnp.where(zpos[k], da, neg)

        # mode == "bwd": BN reductions + the three factored weight-
        # gradient dots in the same pass
        s0 = s1 = None
        for k in range(4):
            s0 = dz[k] if s0 is None else s0 + dz[k]
            t = dz[k] * xhat[k]
            s1 = t if s1 is None else s1 + t
        o_ref[0:Cout, :] += s0
        o_ref[Cout:2 * Cout, :] += s1
        MW = 2 * Mg + 8
        for g, ((dr0, pp0), variants) in enumerate(groups):
            for vi, (dr, pp) in enumerate(variants):
                k = dr * 2 + pp
                dy_ref[vi * Cout:(vi + 1) * Cout, :] = \
                    dz[k].astype(jnp.bfloat16)
                dy_ref[Mg + vi * Cout:Mg + (vi + 1) * Cout, :] = ys[k]
            if len(groups) > 1:
                stage(rp, dr0, pp0)     # rhs was overwritten above
            acc = lax.dot_general(
                rhs_ref[...], dy_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (KK, 2Mg+8)
            ow_ref[:, g * MW:(g + 1) * MW] += acc


def _run(mode, geom: Geom, xp, halo, wpk, kc, bias_b, dp=None):
    g = geom
    PW = g.P * (g.WP + 2) * _LANE
    WSL = g.WS * _LANE
    NR = 4 if g.pack_dr else 3
    NC = 4 if g.pack_pp else 3
    nv = (2 if g.pack_dr else 1) * (2 if g.pack_pp else 1)
    Mg = nv * g.Cout
    G = 4 // nv
    KK = NR * NC * g.C
    H2 = g.H // 2
    HP = halo_pad(g.C)
    grid = (g.NB, g.P // 2, g.NCH)

    in_specs = [
        pl.BlockSpec((2 * g.RP * g.C, PW), lambda i, q, mc: (i, 0)),
        pl.BlockSpec((HP, PW), lambda i, q, mc: (i, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # wpk
        pl.BlockSpec(memory_space=pltpu.VMEM),   # kc
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias_b
    ]
    args = [xp, halo, wpk, kc, bias_b]
    nch = g.NCH
    MW = 2 * Mg + 8
    if mode == "bwd":
        in_specs.append(pl.BlockSpec(
            (g.RP * g.Cout, WSL),
            lambda i, q, mc, _n=nch: (i, q * _n + mc)))
        args.append(dp)

    if mode == "stats":
        out_shape = jax.ShapeDtypeStruct((2 * g.Cout, WSL), jnp.float32)
        out_spec = pl.BlockSpec((2 * g.Cout, WSL),
                                lambda i, q, mc: (0, 0))
    elif mode == "fwd":
        out_shape = jax.ShapeDtypeStruct(
            (H2 * g.Cout, (g.P // 2) * g.WP * _LANE), jnp.bfloat16)
        out_spec = pl.BlockSpec(
            (g.RP * g.Cout, WSL),
            lambda i, q, mc, _n=nch: (i, q * _n + mc))
    else:  # bwd: BN reductions + the factored weight-gradient dots
        out_shape = (
            jax.ShapeDtypeStruct((2 * g.Cout, WSL), jnp.float32),
            jax.ShapeDtypeStruct((KK, G * MW), jnp.float32))
        out_spec = (
            pl.BlockSpec((2 * g.Cout, WSL), lambda i, q, mc: (0, 0)),
            pl.BlockSpec((KK, G * MW), lambda i, q, mc: (0, 0)))

    kern = functools.partial(
        _train_kernel, mode=mode, C=g.C, Cout=g.Cout, P=g.P, WP=g.WP,
        RP=g.RP, WS=g.WS, pack_dr=g.pack_dr, pack_pp=g.pack_pp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((KK, WSL), jnp.bfloat16),
                        pltpu.VMEM((MW, WSL), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3),
        interpret=_INTERPRET,
    )(*args)


# ------------------------------------------------------ the fused op

def _pack_w(w, geom: Geom):
    """Traced analog of phase_stem._pack_lhs (weights are training
    parameters, not baked constants): scatter the (3,3,C,Cout) kernel
    into the packed (G*nv*Cout, NR*NC*C) bf16 lhs."""
    g = geom
    NR = 4 if g.pack_dr else 3
    NC = 4 if g.pack_pp else 3
    groups = _groups(g.pack_dr, g.pack_pp)
    nv = len(groups[0][1])
    w9t = jnp.transpose(w.astype(jnp.bfloat16).reshape(9 * g.C, g.Cout))
    L = jnp.zeros((len(groups) * nv * g.Cout, NR * NC * g.C),
                  jnp.bfloat16)
    for gi, ((dr0, pp0), variants) in enumerate(groups):
        for vi, (dr, pp) in enumerate(variants):
            ro = (gi * nv + vi) * g.Cout
            for dy in range(3):
                for dx in range(3):
                    ri = dy + dr - dr0
                    ci = dx + pp - pp0
                    t = dy * 3 + dx
                    L = lax.dynamic_update_slice(
                        L, w9t[:, t * g.C:(t + 1) * g.C],
                        (ro, (ri * NC + ci) * g.C))
    return L


def _unpack_dw(raw, geom: Geom, mean, c1, c2, c3):
    """Assemble the weight gradient from the factored accumulator
    raw (KK, G*(2*Mg+8)): per group g and variant vi, columns
    [0:Mg) = A-block (sum x (x) dz), [Mg:2Mg) = E-block (sum x (x) y),
    column 2Mg = D (sum x). dw = c1*A + c2*(E - mean*D) + c3*D with
    c1/c2/c3/mean per OUT channel — the linearity of the hand-written
    BN backward in (dz, y, 1)."""
    g = geom
    NC = 4 if g.pack_pp else 3
    groups = _groups(g.pack_dr, g.pack_pp)
    nv = len(groups[0][1])
    Mg = nv * g.Cout
    MW = 2 * Mg + 8
    dw = jnp.zeros((3, 3, g.C, g.Cout), jnp.float32)
    for gi, ((dr0, pp0), variants) in enumerate(groups):
        base = gi * MW
        for vi, (dr, pp) in enumerate(variants):
            for dy in range(3):
                for dx in range(3):
                    ri = dy + dr - dr0
                    ci = dx + pp - pp0
                    rs = (ri * NC + ci) * g.C
                    A = raw[rs:rs + g.C,
                            base + vi * g.Cout:base + (vi + 1) * g.Cout]
                    E = raw[rs:rs + g.C,
                            base + Mg + vi * g.Cout:
                            base + Mg + (vi + 1) * g.Cout]
                    D = raw[rs:rs + g.C, base + 2 * Mg:base + 2 * Mg + 1]
                    dw = dw.at[dy, dx].add(
                        c1 * A + c2 * (E - mean * D) + c3 * D)
    return dw


def _consts(shift, mean, inv, scales, c1=None, c2=None, c3=None):
    z = jnp.zeros_like(mean)
    rows = [shift, mean, inv, scales,
            c1 if c1 is not None else z,
            c2 if c2 is not None else z,
            c3 if c3 is not None else z]
    return jnp.concatenate(
        [r.astype(jnp.float32).reshape(-1, 1) for r in rows], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair(geom: Geom, xp, w, scales, biases, shift):
    """xp: phase-split bf16 input (to_phase, padded). Returns
    (pooled phase-split PAD-FREE bf16, batch mean, batch var)."""
    out, _ = _pair_fwd(geom, xp, w, scales, biases, shift)
    return out


def _pair_fwd(geom: Geom, xp, w, scales, biases, shift):
    g = geom
    n = g.H * g.W * _LANE
    halo = halo_rows(xp, g.H, g.C, g.RP, g.NB)
    wpk = _pack_w(w, g)
    bias_b = biases.astype(jnp.bfloat16).reshape(-1, 1)
    kc0 = _consts(shift, shift, shift, scales)     # only row 0 used
    S = _run("stats", g, xp, halo, wpk, kc0, bias_b)
    sx = jnp.sum(S[0:g.Cout], axis=1)
    sxx = jnp.sum(S[g.Cout:], axis=1)
    mean = shift + sx / n
    var = jnp.maximum((sxx - jnp.square(sx) / n) / max(n - 1, 1), 0.0)
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    kc = _consts(shift, mean, inv, scales)
    pooled = _run("fwd", g, xp, halo, wpk, kc, bias_b)
    return (pooled, mean, var), (xp, w, scales, biases, mean, var)


def _pair_bwd(geom: Geom, res, gct):
    g = geom
    xp, w, scales, biases, mean, var = res
    dp = gct[0].astype(jnp.bfloat16)    # dmean/dvar ignored (like
    n = g.H * g.W * _LANE               # _bn_core / fused_stem)
    halo = halo_rows(xp, g.H, g.C, g.RP, g.NB)
    wpk = _pack_w(w, g)
    bias_b = biases.astype(jnp.bfloat16).reshape(-1, 1)
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    kc = _consts(mean, mean, inv, scales)
    S, raw = _run("bwd", g, xp, halo, wpk, kc, bias_b, dp=dp)
    dbiases = jnp.sum(S[0:g.Cout], axis=1)
    dscales = jnp.sum(S[g.Cout:], axis=1)
    # hand-written BN backward constants (batchnorm_layer.c:147-157 /
    # fused_stem._bwd — identical expressions), applied OUTSIDE the
    # kernel thanks to the factored weight gradient (see _unpack_dw)
    sum_d = scales * dbiases
    sum_dxm = scales * (jnp.sqrt(var) + BN_EPS) * dscales
    variance_delta = sum_dxm * (-0.5) * jnp.power(var + EPS_B, -1.5)
    mean_delta = sum_d * (-1.0 / jnp.sqrt(var + EPS_B))
    c1 = scales / (jnp.sqrt(var) + EPS_B)
    c2 = variance_delta * 2.0 / n
    c3 = mean_delta / n
    dw = _unpack_dw(raw, g, mean, c1, c2, c3).astype(w.dtype)
    return (jnp.zeros_like(xp), dw, dscales.astype(scales.dtype),
            dbiases.astype(biases.dtype), jnp.zeros_like(mean))


_pair.defvjp(_pair_fwd, _pair_bwd)


def supported(spec, nxt, batch: int) -> bool:
    """Eligibility mirror of the compiler's fused-pair predicate plus
    the phase-geometry constraints."""
    return (batch == _LANE
            and plan_pair(spec.h, spec.w, spec.c, spec.filters)
            is not None)


@functools.lru_cache(maxsize=32)
def _plan_cached(H, W, C, Cout):
    return plan_pair(H, W, C, Cout)


def phase_train_block(x_nhwc, params, spec):
    """One fused [conv3x3+BN+bias+leaky, maxpool2x2] training pair.

    x_nhwc: (128, H, W, C) input (any float dtype; cast bf16 like the
    production conv). Returns (pooled NHWC bf16, bn_updates dict) —
    drop-in for the conv_block + maxpool pair in train mode."""
    g = _plan_cached(spec.h, spec.w, spec.c, spec.filters)
    xp = to_phase(x_nhwc.astype(jnp.bfloat16), g.P)
    pooled_ph, mean, var = _pair(
        g, xp, params["weights"], params["scales"], params["biases"],
        lax.stop_gradient(params["rolling_mean"]))
    pooled = from_phase_np(pooled_ph, g.H // 2, g.W // 2, g.Cout,
                           g.P // 2)
    bn = {"rolling_mean": 0.9 * params["rolling_mean"] + 0.1 * mean,
          "rolling_variance":
              0.9 * params["rolling_variance"] + 0.1 * var}
    return pooled, bn


__all__ = ["phase_train_block", "plan_pair", "supported", "Geom",
           "to_phase_np", "from_phase_np"]
