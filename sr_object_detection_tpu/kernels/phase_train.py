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
                         halo_rows)

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
    # row-groups per dot (round 5): RG=2 additionally packs TWO
    # consecutive output-row-pairs into the M dimension — 8 pool
    # variants, M = 8*Cout = 128 at Cout=16, one full MXU row tile
    # instead of the half-empty 4-variant (64, K) dot. The staged tap
    # union widens from 4 to 6 input rows (K = 6*4*C). Halves the
    # MXU passes of every conv recompute.
    RG: int = 1
    # NHWC-direct pair boundary (standalone pair only — the chain
    # needs phase-layout outputs): apply writes (H2,W2,Cout,B) and
    # the bwd kernel takes the pooled cotangent in the same 4D form
    NHWC: bool = False


def _groups_rg(pack_dr: bool, pack_pp: bool, rg: int = 1):
    """Pool-variant dot groups; rg=2 extends dr over TWO row-pairs
    (dr in 0..3 = output row offset within the row-group)."""
    if rg == 2:
        assert pack_dr and pack_pp
        return [((0, 0), tuple((dr, pp) for dr in range(4)
                               for pp in range(2)))]
    return _groups(pack_dr, pack_pp)


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


def _vmem_train(C, Cout, P, WP, RP, WS, pack_dr, pack_pp, rg=1):
    PW = P * WP * _LANE
    WSL = WS * _LANE
    NR = (4 if pack_dr else 3) + 2 * (rg - 1)
    NC = 4 if pack_pp else 3
    nv = (2 if pack_dr else 1) * (2 if pack_pp else 1) * rg
    G = 4 // ((2 if pack_dr else 1) * (2 if pack_pp else 1))
    KK = NR * NC * C
    x = 2 * (2 * RP * C) * PW * 2
    halo = 2 * halo_pad(C) * PW * 2
    dp = 2 * RP * Cout * WSL * 2
    outa = 2 * RP * Cout * WSL * 2
    w = G * nv * Cout * KK * 2
    rhs = KK * WSL * 2
    dyall = (2 * nv * Cout + 8) * WSL * 2
    # ys (nv x f32) + dz/x_hat/epilogue temporaries per variant
    temps = (14 * rg) * Cout * WSL * 4
    return x + halo + dp + outa + w + rhs + dyall + temps


def plan_pair(H: int, W: int, C: int, Cout: int, P: int = 2,
              allow_rg2: bool = False):
    """Geometry for one fused training pair, or None if nothing fits.
    P=2 for a standalone pair (the phase depth a 1-pair chain needs).
    allow_rg2=True opts into RG=2 row-pair M-packing — measured
    NEGATIVE on v5e (r5 A/B: bwd pass 3.60 vs 3.23 ms; the halved dot
    count never pays for the 4->6-row tap staging), kept for A/B. The
    chain kernels' "dy"/dgrad modes are RG=1-only regardless."""
    if W % P or H % 2 or W % 2:
        return None
    WP = W // P
    H2 = H // 2
    pack_dr, pack_pp = _pack_mode(C, Cout)

    def _search(rg):
        best = None
        best_score = None
        for rp in range(1, min(H2, 16) + 1):
            if H2 % rp or (2 * rp * C) % 8 or rp % rg:
                continue
            for ws in [w for w in range(WP, 0, -1) if WP % w == 0]:
                if _vmem_train(C, Cout, P, WP, rp, ws,
                               pack_dr, pack_pp,
                               rg=rg) <= _VMEM_BUDGET:
                    # window width FIRST (WSL>=1024 keeps the dots
                    # and stores out of overhead land; the r4 profile
                    # caught RP-first picking RP=2/WS=2 at pair-2
                    # geometry, 256-lane dots ~3x slower than
                    # RP=1/WS=8), THEN rows (halo amortization), then
                    # the rest of ws. Cap 16: under the r5 gram
                    # backward WS=16 beats WS=8 by +0.5% (fewer
                    # chunk-boundary stagings now that the dots are
                    # lighter; 3417 vs 3400 back-to-back) — the old
                    # conv-recomputing bwd measured the opposite
                    # (39.95 vs 39.71 ms, cap 8 era)
                    score = (min(ws, 16), rp, ws)
                    if best_score is None or score > best_score:
                        best, best_score = (rp, ws), score
                    break
        return best

    # RG=2 gets its OWN (RP, WS) search: its VMEM footprint differs,
    # and halving the MXU tile passes of every conv recompute is worth
    # more than a wider window (both saturate the window score at 8)
    if allow_rg2 and pack_dr and pack_pp and 8 * Cout <= 128:
        b2 = _search(2)
        if b2 is not None and min(b2[1], 8) >= 8:
            RP, WS = b2
            return Geom(H, W, C, Cout, P, WP, RP, WS, H2 // RP,
                        WP // WS, pack_dr, pack_pp, 2)
    best = _search(1)
    if best is None:
        return None
    RP, WS = best
    return Geom(H, W, C, Cout, P, WP, RP, WS, H2 // RP, WP // WS,
                pack_dr, pack_pp, 1)


# ------------------------------------------------------------ kernels

def _train_kernel(*refs, mode, C, Cout, P, WP, RP, WS, pack_dr,
                  pack_pp, RG=1, dp_3d=False, with_wgrad=False,
                  dp_nhwc=False, with_amax=False):
    """Grid (NB, P//2, NCH). Shared structure: stage the tap union,
    recompute the four pool-variant conv outputs (bf16-rounded f32),
    then the per-mode epilogue. kc rows (f32, (7*Cout, 1)):
    0 shift, 1 mean, 2 inv(=1/(sqrt(var)+BN_EPS)), 3 scales,
    4-6 c1/c2/c3 (the hand-written BN-backward constants, "dy" mode
    only); bias_b: (Cout, 1) bf16.

    Modes: "stats" (shifted moments), "fwd" (pooled activation),
    "bwd" (BN reductions + FACTORED weight-gradient dots), "dy"
    (materialize the full-resolution BN-backward cotangent dy =
    dz*c1 + (y-mean)*c2 + c3, bf16, phase-major (P, H*Cout, WPL) —
    the input of the dgrad kernel; needs c1..c3, so it runs AFTER the
    "bwd" reductions)."""
    dps_ref = am_ref = z_ref = None
    if mode == "bwdg":
        # gram-factored backward: NO conv recompute — routing comes
        # from the saved fwdstats argmax, xhat/leaky-sign from the
        # saved raw pooled Z, and the sum-x(x)y wgrad term from the
        # staged-tap Gram matrix (applied to w at unpack)
        if dp_nhwc:
            x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, z_ref, \
                am_ref, o_ref, ow_ref, rhs_ref, dy_ref, dps_ref = refs
        else:
            x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, z_ref, \
                am_ref, o_ref, ow_ref, rhs_ref, dy_ref = refs
    elif mode == "bwd" and dp_nhwc:
        x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, o_ref, ow_ref, \
            rhs_ref, dy_ref, dps_ref = refs
    elif mode == "bwd":
        x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, o_ref, ow_ref, \
            rhs_ref, dy_ref = refs
    elif mode == "dy" and with_wgrad:
        x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, o_ref, ow_ref, \
            rhs_ref, dy_ref = refs
    elif mode in ("dy", "red"):
        x_ref, h_ref, w_ref, kc_ref, bb_ref, dp_ref, o_ref, \
            rhs_ref = refs
        ow_ref = dy_ref = None
    elif mode == "fwdstats" and with_amax:
        x_ref, h_ref, w_ref, kc_ref, bb_ref, o_ref, ow_ref, \
            am_ref, rhs_ref, dy_ref = refs
        dp_ref = None
    elif mode == "fwdstats":
        x_ref, h_ref, w_ref, kc_ref, bb_ref, o_ref, ow_ref, \
            rhs_ref, dy_ref = refs      # ow_ref = the stats output
        dp_ref = None
    else:
        x_ref, h_ref, w_ref, kc_ref, bb_ref, o_ref, rhs_ref, \
            dy_ref = refs
        dp_ref = ow_ref = None
    i = pl.program_id(0)
    q = pl.program_id(1)
    mc = pl.program_id(2)
    WSL = WS * _LANE
    WPL = WP * _LANE
    NCH = WP // WS
    NR = (4 if pack_dr else 3) + 2 * (RG - 1)
    NC = 4 if pack_pp else 3
    groups = _groups_rg(pack_dr, pack_pp, RG)
    nv = len(groups[0][1])
    Mg = nv * Cout

    def kc(r):
        return kc_ref[r * Cout:(r + 1) * Cout, :]     # (Cout, 1) f32

    if mode in ("stats", "bwd", "bwdg", "red", "fwdstats") \
            or (mode == "dy" and with_wgrad):
        @pl.when((i == 0) & (q == 0) & (mc == 0))
        def _():
            if mode not in ("dy", "fwdstats"):
                o_ref[...] = jnp.zeros_like(o_ref)
            if ow_ref is not None:
                ow_ref[...] = jnp.zeros_like(ow_ref)
    if mode in ("bwd", "bwdg"):
        # constant rows for the sum(x) dot: 8 ones rows (any one column
        # of the result is sum over lanes of each staged tap row)
        _ones_off = 2 * Mg if mode == "bwd" else Mg
        dy_ref[_ones_off:_ones_off + 8, :] = jnp.ones(
            (8, WSL), jnp.bfloat16)

    def row(r):
        if r < 0:
            return lambda ds: h_ref[0:C, ds]
        if r >= 2 * RP:
            return lambda ds: h_ref[C:2 * C, ds]
        return lambda ds: x_ref[r * C:(r + 1) * C, ds]

    def col_start(c):
        # PAD-FREE layout: column class c in [-1, P] reads phase block
        # (c mod P) at chunk mc*WS + c//P. Out-of-image columns are NOT
        # padded in HBM; the one boundary chunk a dlt!=0 slab drags in
        # (the neighbour phase's data, in-bounds but wrong) is zeroed
        # by stage()'s @pl.when edge patches instead.
        blk = lax.rem(c + P, P)
        dlt = lax.div(c - blk, P)
        return pl.multiple_of(
            blk * WPL + (mc * WS + dlt) * _LANE, _LANE)

    def stage(rp, dr0, pp0):
        for ri in range(NR):
            r = row(2 * rp + dr0 + ri - 1)
            for ci in range(NC):
                c = 2 * q + (pp0 + ci - 1)
                rows = slice((ri * NC + ci) * C, (ri * NC + ci + 1) * C)
                rhs_ref[rows, :] = r(pl.ds(col_start(c), WSL))
                # image-edge zero splices: c == -1 (leftmost tap of the
                # first chunk) / c == P (rightmost tap of the last)
                if pp0 + ci == 0:
                    @pl.when((q == 0) & (mc == 0))
                    def _():
                        rhs_ref[rows, 0:_LANE] = jnp.zeros(
                            (C, _LANE), rhs_ref.dtype)
                if pp0 + ci == 3:
                    @pl.when((q == P // 2 - 1) & (mc == NCH - 1))
                    def _():
                        rhs_ref[rows, WSL - _LANE:WSL] = jnp.zeros(
                            (C, _LANE), rhs_ref.dtype)

    if mode == "bwdg":
        # ---- gram-factored backward: no conv recompute ------------
        # Per pooled row: dz at the SELECTED tap only (the fwdstats
        # argmax routes exactly where the forward pooled), xhat/leaky
        # sign recomputed from the saved raw Z with the apply pass's
        # exact expressions; the one factored dot carries [dz variants
        # | ones]; the Gram dot (rhs x rhs^T) supplies sum x(x)y as
        # GR @ w at unpack time (y = conv(x) is linear in w).
        assert RG == 1 and pack_dr and pack_pp
        mean, inv, scales = kc(1), kc(2), kc(3)
        bias = bb_ref[...]
        MWG = Mg + 8
        for rp in range(RP):
            stage(rp, 0, 0)
            if dp_nhwc:
                for wv in range(WS):
                    dps_ref[:, wv * _LANE:(wv + 1) * _LANE] = \
                        dp_ref[rp, wv]
                g_ct = dps_ref[...].astype(jnp.float32)
            elif dp_3d:
                g_ct = dp_ref[0, rp * Cout:(rp + 1) * Cout,
                              :].astype(jnp.float32)
            else:
                g_ct = dp_ref[rp * Cout:(rp + 1) * Cout,
                              :].astype(jnp.float32)
            zrow = z_ref[rp * Cout:(rp + 1) * Cout, :]
            zf = zrow.astype(jnp.float32)
            xhat_sel = (zf - mean) * inv
            zb = (xhat_sel * scales).astype(jnp.bfloat16) + bias
            zpos = zb.astype(jnp.float32) > 0
            neg = (jnp.float32(0.10009765625) * g_ct).astype(
                jnp.bfloat16).astype(jnp.float32)
            dzs = jnp.where(zpos, g_ct, neg)
            o_ref[0:Cout, :] += dzs
            o_ref[Cout:2 * Cout, :] += dzs * xhat_sel
            ami = am_ref[rp * Cout:(rp + 1) * Cout, :].astype(
                jnp.int32)
            for k in range(4):
                dy_ref[k * Cout:(k + 1) * Cout, :] = jnp.where(
                    ami == k, dzs, jnp.float32(0.0)).astype(
                    jnp.bfloat16)
            acc = lax.dot_general(
                rhs_ref[...], dy_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (KK, Mg+8)
            ow_ref[:, 0:MWG] += acc
            gacc = lax.dot_general(
                rhs_ref[...], rhs_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # (KK, KK)
            ow_ref[:, MWG:MWG + NR * NC * C] += gacc
        return

    NV = 4 * RG                 # pool variants per staged dot set
    for rp in range(0, RP, RG):
        # ---- recompute the NV variant conv outputs (bf16) ----------
        # (RG=2: ONE (8*Cout, 6*NC*C) dot covers TWO output-row-pairs
        # — M fills the full 128-row MXU tile at Cout=16, halving the
        # tile passes of the 4-variant (64, 4*NC*C) form)
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
            for k in range(NV):
                xs = ys[k].astype(jnp.float32) - kc(0)
                s0 = xs if s0 is None else s0 + xs
                s1 = xs * xs if s1 is None else s1 + xs * xs
            o_ref[0:Cout, :] += s0
            o_ref[Cout:2 * Cout, :] += s1
            continue

        if mode == "fwdstats":
            # MERGED stats + pool pass (round 5): one conv recompute
            # instead of two. The batch stats the normalize needs are
            # only complete after the pass — but the 2x2 first-max
            # commutes through the per-channel monotone BN+bias+leaky
            # map (slope sign = sign(scales), known NOW), so the
            # kernel pools the RAW bf16 conv outputs (max if scale>0,
            # min if <0; scale==0 maps every tap to the same value)
            # and the bn+leaky map runs on the POOLED tensor outside,
            # where XLA fuses it into the consumer. max_k f(v_k) =
            # f(max_k v_k) holds exactly for the non-strictly
            # monotone f (bf16 rounding plateaus included).
            s0 = s1 = None
            for k in range(NV):
                xs = ys[k].astype(jnp.float32) - kc(0)
                s0 = xs if s0 is None else s0 + xs
                s1 = xs * xs if s1 is None else s1 + xs * xs
            ow_ref[0:Cout, :] += s0
            ow_ref[Cout:2 * Cout, :] += s1
            for g2 in range(RG):       # pooled row rp+g2 <- keys 4g2..
                vmax = vmin = None
                for k in range(4 * g2, 4 * g2 + 4):
                    yk = ys[k].astype(jnp.float32)
                    vmax = yk if vmax is None else jnp.maximum(vmax, yk)
                    vmin = yk if vmin is None else jnp.minimum(vmin, yk)
                zsel = jnp.where(kc(3) > 0, vmax, vmin)
                o_ref[(rp + g2) * Cout:(rp + g2 + 1) * Cout, :] = \
                    zsel.astype(jnp.bfloat16)
                if am_ref is not None:
                    # FIRST tap attaining the selected extreme
                    # (window row-major order = variant index order —
                    # the darknet first-max rule on the raw values)
                    idx = seen = None
                    for k in range(4 * g2, 4 * g2 + 4):
                        yk = ys[k].astype(jnp.float32)
                        eq = yk == zsel
                        first = eq if seen is None \
                            else eq & jnp.logical_not(seen)
                        idx = jnp.where(
                            first, jnp.int32(k - 4 * g2),
                            jnp.int32(0) if idx is None else idx)
                        seen = eq if seen is None else seen | eq
                    am_ref[(rp + g2) * Cout:(rp + g2 + 1) * Cout,
                           :] = idx.astype(jnp.int8)
            continue

        # ---- BN + bias + leaky per variant (fused_stem._bn_leaky) --
        mean, inv, scales = kc(1), kc(2), kc(3)
        bias = bb_ref[...]
        av, zpos, xhat, xm = {}, {}, {}, {}
        for k in range(NV):
            ybf = ys[k].astype(jnp.float32)
            xm[k] = ybf - mean
            xhat[k] = xm[k] * inv
            z = (xhat[k] * scales).astype(jnp.bfloat16) + bias
            zpos[k] = z.astype(jnp.float32) > 0
            av[k] = jnp.where(zpos[k], z, jnp.bfloat16(0.1) * z)

        if mode == "fwd":
            # darknet FIRST-max pool across variants (window row-major
            # order == variant index order), one pooled row per g2
            for g2 in range(RG):
                best = av[4 * g2]
                for k in range(4 * g2 + 1, 4 * g2 + 4):
                    take = av[k].astype(jnp.float32) \
                        > best.astype(jnp.float32)
                    best = jnp.where(take, av[k], best)
                o_ref[(rp + g2) * Cout:(rp + g2 + 1) * Cout, :] = best
            continue

        # ---- backward: first-max routing + bf16-rounded leaky bwd --
        dz = {}
        for g2 in range(RG):
            if dp_nhwc:
                # (RP, WS, Cout, 128) 4D cotangent block: re-lane one
                # pooled row into (Cout, WSL) via the staging scratch
                # (per-w static stores; lane offsets canonicalize)
                for wv in range(WS):
                    dps_ref[:, wv * _LANE:(wv + 1) * _LANE] = \
                        dp_ref[rp + g2, wv]
                g_ct = dps_ref[...].astype(jnp.float32)
            elif dp_3d:
                # chained-pair dp: the dgrad kernel's phase-major
                # output (P_pool, H2*Cout, WPL), block
                # (1, RP*Cout, WSL) at (q,i,mc)
                g_ct = dp_ref[0, (rp + g2) * Cout:(rp + g2 + 1) * Cout,
                              :].astype(jnp.float32)
            else:
                g_ct = dp_ref[(rp + g2) * Cout:(rp + g2 + 1) * Cout,
                              :].astype(jnp.float32)
            ks = range(4 * g2, 4 * g2 + 4)
            m = None
            for k in ks:
                a = av[k].astype(jnp.float32)
                m = a if m is None else jnp.maximum(m, a)
            seen = None
            for k in ks:
                eq = av[k].astype(jnp.float32) == m
                first = eq if seen is None else \
                    eq & jnp.logical_not(seen)
                seen = eq if seen is None else seen | eq
                da = jnp.where(first, g_ct, jnp.zeros((), jnp.float32))
                neg = (jnp.float32(0.10009765625) * da).astype(
                    jnp.bfloat16).astype(jnp.float32)
                dz[k] = jnp.where(zpos[k], da, neg)

        if mode == "dy":
            assert RG == 1, "dy mode is RG=1-only (chain kernels)"
            # materialize the full-res conv cotangent: identical f32
            # expression + bf16 round as ops/conv._bn_core_fast_bwd
            # (dx = d*c1 + xm*c2 + c3); c1..c3 computed OUTSIDE from
            # the "red"/"bwd" pass reductions (kc rows 4-6)
            c1v, c2v, c3v = kc(4), kc(5), kc(6)
            dyv = {}
            for dr in range(2):
                for pp in range(2):
                    k = dr * 2 + pp
                    dyv[k] = (dz[k] * c1v + xm[k] * c2v + c3v).astype(
                        jnp.bfloat16)
                    o_ref[pp, (2 * rp + dr) * Cout:
                          (2 * rp + dr + 1) * Cout, :] = dyv[k]
            if with_wgrad:
                # DIRECT weight gradient off the materialized dy
                # (dw = sum x (x) dy, conv wgrad exactly as production
                # computes it) — cheaper than the factored form's
                # 2*Mg+8-column dots when dy exists anyway
                for g, ((dr0, pp0), variants) in enumerate(groups):
                    for vi, (dr, pp) in enumerate(variants):
                        dy_ref[vi * Cout:(vi + 1) * Cout, :] = \
                            dyv[dr * 2 + pp]
                    if len(groups) > 1:
                        stage(rp, dr0, pp0)
                    acc = lax.dot_general(
                        rhs_ref[...], dy_ref[...],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (KK, Mg)
                    ow_ref[:, g * Mg:(g + 1) * Mg] += acc
            continue

        # modes "bwd"/"red": the BN reductions; "bwd" adds the three
        # factored weight-gradient dots in the same pass
        s0 = s1 = None
        for k in range(NV):
            s0 = dz[k] if s0 is None else s0 + dz[k]
            t = dz[k] * xhat[k]
            s1 = t if s1 is None else s1 + t
        o_ref[0:Cout, :] += s0
        o_ref[Cout:2 * Cout, :] += s1
        if mode == "red":
            continue
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


def _run(mode, geom: Geom, xp, halo, wpk, kc, bias_b, dp=None,
         dp_3d=False, with_wgrad=False, dp_nhwc=False,
         z=None, amax=None, with_amax=False):
    g = geom
    rg = getattr(g, "RG", 1)
    PW = g.P * g.WP * _LANE
    WSL = g.WS * _LANE
    NR = (4 if g.pack_dr else 3) + 2 * (rg - 1)
    NC = 4 if g.pack_pp else 3
    nv = (2 if g.pack_dr else 1) * (2 if g.pack_pp else 1) * rg
    Mg = nv * g.Cout
    G = 4 * rg // nv
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
    if mode in ("bwd", "bwdg", "dy", "red"):
        if dp_nhwc:
            # (H2, W2, Cout, B) pooled cotangent of the NHWC-direct
            # apply (standalone pair, P=2 -> q == 0 always)
            assert g.P == 2 and not dp_3d
            in_specs.append(pl.BlockSpec(
                (g.RP, g.WS, g.Cout, _LANE),
                lambda i, q, mc, _n=nch: (i, q * _n + mc, 0, 0)))
        elif dp_3d:
            in_specs.append(pl.BlockSpec(
                (1, g.RP * g.Cout, WSL),
                lambda i, q, mc: (q, i, mc)))
        else:
            in_specs.append(pl.BlockSpec(
                (g.RP * g.Cout, WSL),
                lambda i, q, mc, _n=nch: (i, q * _n + mc)))
        args.append(dp)
    if mode == "bwdg":
        # saved fwdstats raw pooled Z + argmax, same block indexing as
        # the pooled output
        in_specs.append(pl.BlockSpec(
            (g.RP * g.Cout, WSL),
            lambda i, q, mc, _n=nch: (i, q * _n + mc)))
        args.append(z)
        in_specs.append(pl.BlockSpec(
            (g.RP * g.Cout, WSL),
            lambda i, q, mc, _n=nch: (i, q * _n + mc)))
        args.append(amax)

    if mode in ("stats", "red"):
        out_shape = jax.ShapeDtypeStruct((2 * g.Cout, WSL), jnp.float32)
        out_spec = pl.BlockSpec((2 * g.Cout, WSL),
                                lambda i, q, mc: (0, 0))
    elif mode == "fwdstats":
        # (pooled raw-z extreme, shifted-moment sums[, argmax]) in ONE
        # pass — the int8 argmax map routes the gram backward exactly
        # where the forward pooled
        out_shape = [
            jax.ShapeDtypeStruct(
                (H2 * g.Cout, (g.P // 2) * g.WP * _LANE), jnp.bfloat16),
            jax.ShapeDtypeStruct((2 * g.Cout, WSL), jnp.float32)]
        out_spec = [
            pl.BlockSpec((g.RP * g.Cout, WSL),
                         lambda i, q, mc, _n=nch: (i, q * _n + mc)),
            pl.BlockSpec((2 * g.Cout, WSL), lambda i, q, mc: (0, 0))]
        if with_amax:
            out_shape.append(jax.ShapeDtypeStruct(
                (H2 * g.Cout, (g.P // 2) * g.WP * _LANE), jnp.int8))
            out_spec.append(pl.BlockSpec(
                (g.RP * g.Cout, WSL),
                lambda i, q, mc, _n=nch: (i, q * _n + mc)))
        out_shape = tuple(out_shape)
        out_spec = tuple(out_spec)
    elif mode == "bwdg":
        # BN reductions + [A-dot | ones | Gram] accumulator
        MWG = Mg + 8
        out_shape = (
            jax.ShapeDtypeStruct((2 * g.Cout, WSL), jnp.float32),
            jax.ShapeDtypeStruct((KK, G * MWG + KK), jnp.float32))
        out_spec = (
            pl.BlockSpec((2 * g.Cout, WSL), lambda i, q, mc: (0, 0)),
            pl.BlockSpec((KK, G * MWG + KK), lambda i, q, mc: (0, 0)))
    elif mode == "fwd":
        out_shape = jax.ShapeDtypeStruct(
            (H2 * g.Cout, (g.P // 2) * g.WP * _LANE), jnp.bfloat16)
        out_spec = pl.BlockSpec(
            (g.RP * g.Cout, WSL),
            lambda i, q, mc, _n=nch: (i, q * _n + mc))
    elif mode == "dy":
        # full-res dy, PHASE-MAJOR (P, H*Cout, WPL): the leading dim
        # is untiled (a (rows, WSL) tile per phase plane) so the tiny
        # P extent costs no sublane padding; the dgrad kernel fetches
        # both phase planes of a row block in one BlockSpec
        out_shape = jax.ShapeDtypeStruct(
            (g.P, g.H * g.Cout, g.WP * _LANE), jnp.bfloat16)
        out_spec = pl.BlockSpec(
            (2, 2 * g.RP * g.Cout, WSL),
            lambda i, q, mc: (q, i, mc))
        if with_wgrad:
            out_shape = (out_shape, jax.ShapeDtypeStruct(
                (KK, G * Mg), jnp.float32))
            out_spec = (out_spec, pl.BlockSpec((KK, G * Mg),
                                               lambda i, q, mc: (0, 0)))
    else:  # bwd: BN reductions + the factored weight-gradient dots
        out_shape = (
            jax.ShapeDtypeStruct((2 * g.Cout, WSL), jnp.float32),
            jax.ShapeDtypeStruct((KK, G * MW), jnp.float32))
        out_spec = (
            pl.BlockSpec((2 * g.Cout, WSL), lambda i, q, mc: (0, 0)),
            pl.BlockSpec((KK, G * MW), lambda i, q, mc: (0, 0)))

    kern = functools.partial(
        _train_kernel, mode=mode, C=g.C, Cout=g.Cout, P=g.P, WP=g.WP,
        RP=g.RP, WS=g.WS, pack_dr=g.pack_dr, pack_pp=g.pack_pp,
        RG=rg, dp_3d=dp_3d, with_wgrad=with_wgrad, dp_nhwc=dp_nhwc,
        with_amax=with_amax)
    scratch = [pltpu.VMEM((KK, WSL), jnp.bfloat16)]
    if mode == "dy" and with_wgrad:
        scratch.append(pltpu.VMEM((Mg, WSL), jnp.bfloat16))
    elif mode == "bwdg":
        scratch.append(pltpu.VMEM((Mg + 8, WSL), jnp.bfloat16))
    elif mode not in ("dy", "red"):
        scratch.append(pltpu.VMEM((MW, WSL), jnp.bfloat16))
    if dp_nhwc:
        # staging scratch: (Cout, WSL) re-lane of one pooled row's
        # 4D cotangent block (stores canonicalize lane offsets)
        scratch.append(pltpu.VMEM((g.Cout, WSL), jnp.bfloat16))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3),
        interpret=_INTERPRET,
    )(*args)


# ----------------------------------------------- pooled BN-apply pass

def _apply_kernel(z_ref, c_ref, o_ref, *, RPC, nhwc_dims=None):
    """Elementwise BN+bias+leaky on the raw pooled conv output (mode
    "fwdstats" saved it) — the EXACT per-tap expressions of mode
    "fwd": f32 xhat from the bf16 value, bf16-rounded scale multiply,
    bf16 bias add, bf16 0.1 leak. Per-row constants (row -> channel =
    row % Cout, the (H2*Cout, W2*B) pooled layout). nhwc_dims =
    (RB, Cout, CW): store the result as an (RB, CW, Cout, B) block of
    the (H2, W2, Cout, B) output — physically the {0,3,2,1}
    batch-minor NHWC layout the consumer conv wants, so from_phase
    becomes a layout-view transpose instead of two relayout copies.
    Per-w static stores; no in-kernel transpose (the (RPC, 128) ->
    (RB, Cout, 128) regroup never crosses the lane dim)."""
    c = c_ref[...]
    mean = c[0:RPC]
    inv = c[RPC:2 * RPC]
    sc = c[2 * RPC:3 * RPC]
    bi = c[3 * RPC:4 * RPC].astype(jnp.bfloat16)
    zf = z_ref[...].astype(jnp.float32)
    zb = ((zf - mean) * inv * sc).astype(jnp.bfloat16) + bi
    res = jnp.where(zb.astype(jnp.float32) > 0, zb,
                    jnp.bfloat16(0.1) * zb)
    if nhwc_dims is None:
        o_ref[...] = res
        return
    RB, Cout, CW = nhwc_dims
    for w in range(CW):
        o_ref[:, w] = res[:, w * _LANE:(w + 1) * _LANE].reshape(
            RB, Cout, _LANE)


def _apply_blocks(g: Geom):
    """(RB, RPC, CL) for the apply pass: RB h-rows x CL lanes,
    ~<=2 MB in+out. CL = cw*128 with cw | W2 (the NHWC store needs
    whole pooled-w columns; lane blocks must stay 128-aligned)."""
    H2 = g.H // 2
    W2 = (g.P // 2) * g.WP
    RB = 1
    for r in range(H2, 0, -1):
        if H2 % r == 0 and r * g.Cout <= 512:
            RB = r
            break
    RPC = RB * g.Cout
    cw = 1
    for c in sorted((d for d in range(1, W2 + 1) if W2 % d == 0),
                    reverse=True):
        if RPC * c * _LANE * 4 <= 4 * 1024 * 1024:
            cw = c
            break
    return RB, RPC, cw * _LANE


def _apply_consts(g: Geom, RB, mean, inv, scales, biases):
    cols = jnp.stack([mean.astype(jnp.float32),
                      inv.astype(jnp.float32),
                      scales.astype(jnp.float32),
                      biases.astype(jnp.float32)])       # (4, Cout)
    return jnp.tile(cols[:, None, :], (1, RB, 1)).reshape(
        4 * RB * g.Cout, 1)


def _run_apply(g: Geom, Z, mean, inv, scales, biases):
    """bn+bias+leaky over the pooled (H2*Cout, W2*B) raw-z layout,
    in-place-shaped (one read + one write of the pooled tensor; no
    conv recompute — the whole point of saving Z in "fwdstats")."""
    H2 = g.H // 2
    W2B = (g.P // 2) * g.WP * _LANE
    RB, RPC, CL = _apply_blocks(g)
    cpk = _apply_consts(g, RB, mean, inv, scales, biases)
    return pl.pallas_call(
        functools.partial(_apply_kernel, RPC=RPC),
        grid=(H2 // RB, W2B // CL),
        in_specs=[pl.BlockSpec((RPC, CL), lambda i, j: (i, j)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RPC, CL), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((H2 * g.Cout, W2B),
                                       jnp.bfloat16),
        interpret=_INTERPRET,
    )(Z, cpk)


def _run_apply_nhwc(g: Geom, Z, mean, inv, scales, biases):
    """Like _run_apply but writes (H2, W2, Cout, B) directly —
    physically the batch-minor NHWC layout, so the pair's output
    reaches the consumer conv with NO relayout copies."""
    assert g.P == 2
    H2, W2 = g.H // 2, g.W // 2
    RB, RPC, CL = _apply_blocks(g)
    CW = CL // _LANE
    cpk = _apply_consts(g, RB, mean, inv, scales, biases)
    return pl.pallas_call(
        functools.partial(_apply_kernel, RPC=RPC,
                          nhwc_dims=(RB, g.Cout, CW)),
        grid=(H2 // RB, W2 // CW),
        in_specs=[pl.BlockSpec((RPC, CL), lambda i, j: (i, j)),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RB, CW, g.Cout, _LANE),
                               lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((H2, W2, g.Cout, _LANE),
                                       jnp.bfloat16),
        interpret=_INTERPRET,
    )(Z, cpk)


# ------------------------------------------------------ the fused op

def _pack_w(w, geom: Geom):
    """Traced analog of phase_stem._pack_lhs (weights are training
    parameters, not baked constants): scatter the (3,3,C,Cout) kernel
    into the packed (G*nv*Cout, NR*NC*C) bf16 lhs."""
    g = geom
    rg = getattr(g, "RG", 1)
    NR = (4 if g.pack_dr else 3) + 2 * (rg - 1)
    NC = 4 if g.pack_pp else 3
    groups = _groups_rg(g.pack_dr, g.pack_pp, rg)
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
    groups = _groups_rg(g.pack_dr, g.pack_pp, getattr(g, "RG", 1))
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


def _unpack_dw_gram(raw, geom: Geom, mean, c1, c2, c3, w):
    """Assemble the weight gradient from the gram-factored accumulator
    raw (KK, Mg+8+KK): columns [0:Mg) = A (sum x (x) dz at the
    selected taps), column Mg = D (sum x), [Mg+8:) = GR (the staged-
    tap Gram sum x (x) x). The E-block (sum x (x) y) of the plain
    factored form is recovered as GR @ w — y = conv(x) is linear in
    w, so sum x(x)y = (sum x(x)x) @ w exactly (the only numeric
    difference vs mode "bwd" is the skipped bf16 rounding of y)."""
    g = geom
    NC = 4 if g.pack_pp else 3
    groups = _groups_rg(g.pack_dr, g.pack_pp, 1)
    assert len(groups) == 1, "bwdg requires the fully packed layout"
    (dr0, pp0), variants = groups[0]
    nv = len(variants)
    Mg = nv * g.Cout
    KK = 4 * NC * g.C
    GR = raw[:, Mg + 8:Mg + 8 + KK]          # (KK, KK)
    dw = jnp.zeros((3, 3, g.C, g.Cout), jnp.float32)
    for vi, (dr, pp) in enumerate(variants):
        # E9 = Gv @ w9 over this variant's 9 tap slots
        rows = []
        for dy in range(3):
            for dx in range(3):
                rs = ((dy + dr - dr0) * NC + (dx + pp - pp0)) * g.C
                rows.append(GR[rs:rs + g.C, :])
        Gv = jnp.concatenate(rows, axis=0)   # (9C, KK)
        cols = []
        for dy2 in range(3):
            for dx2 in range(3):
                rs2 = ((dy2 + dr - dr0) * NC
                       + (dx2 + pp - pp0)) * g.C
                cols.append(Gv[:, rs2:rs2 + g.C])
        Gvv = jnp.concatenate(cols, axis=1)  # (9C, 9C)
        E9 = Gvv @ w.astype(jnp.float32).reshape(9 * g.C, g.Cout)
        for dy in range(3):
            for dx in range(3):
                rs = ((dy + dr - dr0) * NC + (dx + pp - pp0)) * g.C
                A = raw[rs:rs + g.C, vi * g.Cout:(vi + 1) * g.Cout]
                E = E9[(dy * 3 + dx) * g.C:(dy * 3 + dx + 1) * g.C]
                D = raw[rs:rs + g.C, Mg:Mg + 1]
                dw = dw.at[dy, dx].add(
                    c1 * A + c2 * (E - mean * D) + c3 * D)
    return dw


def _unpack_dw_direct(raw, geom: Geom):
    """Assemble the DIRECT weight gradient (dw = sum x (x) dy) from
    the (KK, G*Mg) accumulator of the "dy"+wgrad pass — the plain
    tap-slot gather, no BN-backward constants (dy already carries
    them)."""
    g = geom
    NC = 4 if g.pack_pp else 3
    groups = _groups_rg(g.pack_dr, g.pack_pp, getattr(g, "RG", 1))
    nv = len(groups[0][1])
    Mg = nv * g.Cout
    dw = jnp.zeros((3, 3, g.C, g.Cout), jnp.float32)
    for gi, ((dr0, pp0), variants) in enumerate(groups):
        for vi, (dr, pp) in enumerate(variants):
            for dy in range(3):
                for dx in range(3):
                    ri = dy + dr - dr0
                    ci = dx + pp - pp0
                    rs = (ri * NC + ci) * g.C
                    dw = dw.at[dy, dx].add(
                        raw[rs:rs + g.C,
                            gi * Mg + vi * g.Cout:
                            gi * Mg + (vi + 1) * g.Cout])
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
    """xp: PAD-FREE phase-split bf16 input (to_phase_np layout).
    Returns (pooled phase-split PAD-FREE bf16, batch mean, batch var).
    A pooled output at P is directly the next pair's input at P//2 —
    a K-pair chain relayouts NOTHING between pairs."""
    out, _ = _pair_fwd(geom, xp, w, scales, biases, shift)
    return out


_FWD2 = True     # merged stats+pool forward (one conv recompute saved)
_APPLY = True    # pooled BN-apply in a Pallas pass (the XLA apply
                 # materializes f32 relayout copies — measured r5)
_BWD_GRAM = True     # gram-factored backward: fwdstats also saves the
                     # pool argmax (int8), the backward pass skips the
                     # conv recompute entirely (routing from argmax,
                     # xhat/leaky sign from saved Z, sum-x(x)y from
                     # the staged-tap Gram applied to w at unpack).
                     # Needs the fully packed variant layout; gated in
                     # _pair_fwd. Measured r5: bwd 3.22 -> 2.17 ms,
                     # step 3349 -> 3413 img/s (36.2% MFU)
_APPLY_NHWC = True   # apply writes (H2,W2,Cout,B) = batch-minor NHWC
                     # directly and the bwd kernel takes the pooled
                     # cotangent in the same 4D form — kills the
                     # from/to-phase relayout copies at the pair
                     # boundary (r5)


def _pair_fwd(geom: Geom, xp, w, scales, biases, shift):
    g = geom
    n = g.H * g.W * _LANE
    halo = halo_rows(xp, g.H, g.C, g.RP, g.NB)
    wpk = _pack_w(w, g)
    bias_b = biases.astype(jnp.bfloat16).reshape(-1, 1)
    kc0 = _consts(shift, shift, shift, scales)   # rows 0 (shift) + 3
    AM = None
    gram = (_FWD2 and _BWD_GRAM and g.pack_dr and g.pack_pp
            and getattr(g, "RG", 1) == 1)
    if gram:
        Z, S, AM = _run("fwdstats", g, xp, halo, wpk, kc0, bias_b,
                        with_amax=True)
    elif _FWD2:
        # ONE pass: shifted moments + raw-z extreme pool (mode
        # "fwdstats" — the 2x2 first-max commutes through the
        # monotone per-channel BN+bias+leaky, whose slope sign is
        # sign(scales)); the bn+leaky map then runs on the POOLED
        # tensor below with the completed batch stats — exact
        # (non-strict monotonicity, bf16 rounding plateaus included)
        # and XLA fuses it into the consumer.
        Z, S = _run("fwdstats", g, xp, halo, wpk, kc0, bias_b)
    else:
        S = _run("stats", g, xp, halo, wpk, kc0, bias_b)
    sx = jnp.sum(S[0:g.Cout], axis=1)
    sxx = jnp.sum(S[g.Cout:], axis=1)
    mean = shift + sx / n
    var = jnp.maximum((sxx - jnp.square(sx) / n) / max(n - 1, 1), 0.0)
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    if _FWD2 and _APPLY:
        # pooled-space bn+bias+leaky in a Pallas pass: one read + one
        # write of the pooled tensor — the XLA version below
        # materializes an f32 relayout copy chain (measured +2.4 ms
        # at 416, r5 profile). NHWC mode additionally writes the
        # batch-minor NHWC layout the consumer conv wants.
        if getattr(g, "NHWC", False) and g.P == 2:
            pooled = _run_apply_nhwc(g, Z, mean, inv, scales, biases)
        else:
            pooled = _run_apply(g, Z, mean, inv, scales, biases)
    elif _FWD2:
        # pooled-space bn+bias+leaky: the EXACT per-tap expressions of
        # mode "fwd" (f32 xhat from the bf16 value, bf16-rounded
        # scale, bf16 bias add, bf16 0.1 leak)
        H2 = g.H // 2
        PW2 = (g.P // 2) * g.WP * _LANE
        zf = Z.reshape(H2, g.Cout, PW2).astype(jnp.float32)
        xhat = (zf - mean[None, :, None]) * inv[None, :, None]
        zb = (xhat * scales[None, :, None]).astype(jnp.bfloat16) \
            + biases.astype(jnp.bfloat16)[None, :, None]
        pooled = jnp.where(zb.astype(jnp.float32) > 0, zb,
                           jnp.bfloat16(0.1) * zb)
        pooled = pooled.reshape(H2 * g.Cout, PW2)
    else:
        kc = _consts(shift, mean, inv, scales)
        pooled = _run("fwd", g, xp, halo, wpk, kc, bias_b)
    if gram:
        # gram backward residuals: the raw pooled Z + argmax replace
        # the backward's conv recompute
        return (pooled, mean, var), (xp, w, scales, biases, mean,
                                     var, Z, AM)
    return (pooled, mean, var), (xp, w, scales, biases, mean, var)


def _pair_grads(g: Geom, dg, xp, w, scales, biases, mean, var, gpooled,
                *, dp_3d: bool = False, want_dx: bool = False,
                z_saved=None, amax_saved=None):
    """Shared backward body: factored "bwd" pass -> (dw, dscales,
    dbiases[, dxp]). want_dx adds the "dy" materialization pass + the
    dgrad kernel (dg: DgradGeom) and returns dxp in the PHASE-MAJOR
    (P, H*C, WP*128) layout — the next-lower pair's dp_3d input."""
    dp = gpooled.astype(jnp.bfloat16)   # dmean/dvar ignored (like
    n = g.H * g.W * _LANE               # _bn_core / fused_stem)
    dp_nhwc = dp.ndim == 4              # (H2, W2, Cout, B) cotangent
                                        # of the NHWC-direct apply
    halo = halo_rows(xp, g.H, g.C, g.RP, g.NB)
    wpk = _pack_w(w, g)
    bias_b = biases.astype(jnp.bfloat16).reshape(-1, 1)
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    kc = _consts(mean, mean, inv, scales)
    gram = z_saved is not None and not want_dx
    if want_dx:
        # reductions only — the weight gradient rides the "dy" pass
        # below as a DIRECT sum x (x) dy (cheaper than the factored
        # 2*Mg+8-column dots once dy is materialized anyway)
        S = _run("red", g, xp, halo, wpk, kc, bias_b, dp=dp,
                 dp_3d=dp_3d)
    elif gram:
        S, raw = _run("bwdg", g, xp, halo, wpk, kc, bias_b, dp=dp,
                      dp_3d=dp_3d, dp_nhwc=dp_nhwc, z=z_saved,
                      amax=amax_saved)
    else:
        S, raw = _run("bwd", g, xp, halo, wpk, kc, bias_b, dp=dp,
                      dp_3d=dp_3d, dp_nhwc=dp_nhwc)
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
    if not want_dx:
        if gram:
            dw = _unpack_dw_gram(raw, g, mean, c1, c2, c3,
                                 w).astype(w.dtype)
        else:
            dw = _unpack_dw(raw, g, mean, c1, c2, c3).astype(w.dtype)
        return (dw, dscales.astype(scales.dtype),
                dbiases.astype(biases.dtype), None)
    # the input gradient: materialize the full-res conv cotangent
    # (mode "dy" — needs c1..c3, hence after the reductions) with the
    # direct weight gradient in the same pass, then the phase dgrad
    # kernel (dx = dy (*) w^T, kernels below)
    kc7 = _consts(mean, mean, inv, scales, c1, c2, c3)
    dy3, raw = _run("dy", g, xp, halo, wpk, kc7, bias_b, dp=dp,
                    dp_3d=dp_3d, with_wgrad=True)
    dw = _unpack_dw_direct(raw, g).astype(w.dtype)
    dx3 = _run_dgrad(dg, dy3, w)
    return (dw, dscales.astype(scales.dtype),
            dbiases.astype(biases.dtype), dx3)


def _pair_bwd(geom: Geom, res, gct):
    if len(res) == 8:
        xp, w, scales, biases, mean, var, Z, AM = res
    else:
        xp, w, scales, biases, mean, var = res
        Z = AM = None
    dw, ds, db, _ = _pair_grads(geom, None, xp, w, scales, biases,
                                mean, var, gct[0], z_saved=Z,
                                amax_saved=AM)
    return (jnp.zeros_like(xp), dw, ds, db, jnp.zeros_like(mean))


_pair.defvjp(_pair_fwd, _pair_bwd)


# --------------------------------------------------- phase dgrad conv
# dx = dy (*) w^T over the pad-free phase layout (P=2): structurally
# the forward conv with flipped taps, M-packed with ROW-OFFSET x PHASE
# variants instead of pool variants (RV rows x P phases x C fills the
# 128-row MXU tile at C=16). All staging offsets are STATIC — the dy
# operand arrives PHASE-MAJOR (P, H*Cout, WP*128) from mode "dy" (the
# leading dim is untiled, so P=2 costs no sublane padding) and the
# cross-chunk column taps come from two thin sidebands instead of a
# padded layout: a row halo (halo_rows) and a per-chunk-window column
# halo (_dy_side_cols), both built by XLA slice stacks.

class DgradGeom(NamedTuple):
    H: int
    WP: int
    C: int
    Cout: int
    P: int
    RV: int
    WS: int
    NB: int
    NCH: int


_VMEM_DGRAD = 10 * 1024 * 1024


def plan_dgrad(H: int, W: int, C: int, Cout: int, P: int = 2):
    """Geometry for the dgrad kernel (P=2 only), or None."""
    if P != 2 or W % P or H % 2:
        return None
    WP = W // P
    RV = max(2, min(8, 128 // (P * C)))
    RV -= RV % 2
    while RV >= 2 and H % RV:
        RV -= 2
    if RV < 2:
        return None
    HP = halo_pad(Cout)
    K = (RV + 2) * 4 * Cout
    for WS in [w for w in range(WP, 0, -1) if WP % w == 0]:
        WSL = WS * _LANE
        v = (2 * (P * RV * Cout * WSL * 2)        # dy block (dbuf)
             + 2 * (P * HP * WSL * 2)             # row halo
             + 2 * (P * RV * Cout * 2 * _LANE * 2)   # col body
             + 2 * (P * HP * 2 * _LANE * 2)       # col halo
             + 2 * (P * RV * C * WSL * 2)         # dx out
             + K * WSL * 2                        # rhs scratch
             + P * RV * C * K * 2                 # packed lhs
             + P * RV * C * WSL * 4)              # f32 dot result
        if v <= _VMEM_DGRAD:
            return DgradGeom(H, WP, C, Cout, P, RV, WS, H // RV,
                             WP // WS)
    return None


# (phase, chunk delta) of the four column-tap classes c = cs-1 in
# [-1, 2]: image col b' = j*P + c -> c=-1 is (phase 1, chunk j-1),
# c=2 is (phase 0, chunk j+1)
_DG_CSL = ((1, -1), (0, 0), (1, 0), (0, 1))


def _pack_w_dgrad(w, C: int, Cout: int, RV: int, P: int = 2):
    """Traced lhs pack: dx[a+v, class p, i] = sum_{ty,tx,o}
    dy[a+v-ty+1, class p-tx+1, o] * w[ty,tx,i,o]; variant (v,p) lands
    w[ty,tx] at (row slot v-ty+2, col slot p-tx+2)."""
    wb = w.astype(jnp.bfloat16)
    L = jnp.zeros((RV * P * C, (RV + 2) * 4 * Cout), jnp.bfloat16)
    for v in range(RV):
        for p in range(P):
            for ty in range(3):
                for tx in range(3):
                    rs = v - ty + 2
                    cs = p - tx + 2
                    L = lax.dynamic_update_slice(
                        L, wb[ty, tx],
                        ((v * P + p) * C, (rs * 4 + cs) * Cout))
    return L


def _halo_rows_3d(t3, H: int, C: int, RP: int, NB: int):
    """halo_rows over the PHASE-MAJOR 3-D layout: (P, H*C, L) ->
    (P, NB*HP, L), block i holding rows 2*RP*i-1 / 2*RP*(i+1) (zeros
    out of image). Middle-dim slices — slicing dy3[p] planes instead
    materialized TWO full copies of dy (1.08 ms at 416px, r4
    profile)."""
    P, _, Lw = t3.shape
    HP = halo_pad(C)
    zero = jnp.zeros((P, C, Lw), t3.dtype)
    zpad = (jnp.zeros((P, HP - 2 * C, Lw), t3.dtype)
            if HP > 2 * C else None)
    out = []
    for i in range(NB):
        t = 2 * RP * i - 1
        b = 2 * RP * (i + 1)
        out.append(t3[:, t * C:(t + 1) * C] if t >= 0 else zero)
        out.append(t3[:, b * C:(b + 1) * C] if b < H else zero)
        if zpad is not None:
            out.append(zpad)
    return jnp.concatenate(out, axis=1)


def _dy_side_cols(dy3, WS: int):
    """(P, H*Cout, WP*128) -> (P, H*Cout, NCH*2*128): per chunk window
    mc the two cross-window tap chunks [mc*WS-1, mc*WS+WS] per phase
    (zeros at the image edges — the kernel reads them unconditionally,
    no @pl.when patches needed)."""
    P, rows, WPL = dy3.shape
    WP = WPL // _LANE
    NCH = WP // WS
    t = dy3.reshape(P, rows, WP, _LANE)
    z = jnp.zeros((P, rows, 1, _LANE), dy3.dtype)
    cols = []
    for mc in range(NCH):
        cols.append(t[:, :, mc * WS - 1:mc * WS] if mc else z)
        r = (mc + 1) * WS
        cols.append(t[:, :, r:r + 1] if r < WP else z)
    return jnp.concatenate(cols, axis=2).reshape(P, rows,
                                                 NCH * 2 * _LANE)


def _dgrad_kernel(dy_ref, rh_ref, cb_ref, ch_ref, w_ref, o_ref,
                  rhs_ref, *, C, Cout, RV, WS, P):
    """Grid (NB, NCH). One step: RV dx rows x both phases x WS chunks.
    dy rows RV*i-1 .. RV*(i+1) come from the block (interior), the
    row-halo sideband (rs 0 / RV+1), and the column sidebands (the
    one-chunk window margins)."""
    WSL = WS * _LANE

    def body(rs, ph, sl):
        if rs == 0:
            return rh_ref[ph, 0:Cout, sl]
        if rs == RV + 1:
            return rh_ref[ph, Cout:2 * Cout, sl]
        return dy_ref[ph, (rs - 1) * Cout:rs * Cout, sl]

    def side(rs, ph, sl):
        if rs == 0:
            return ch_ref[ph, 0:Cout, sl]
        if rs == RV + 1:
            return ch_ref[ph, Cout:2 * Cout, sl]
        return cb_ref[ph, (rs - 1) * Cout:rs * Cout, sl]

    for rs in range(RV + 2):
        for cs, (ph, dj) in enumerate(_DG_CSL):
            rows = slice((rs * 4 + cs) * Cout, (rs * 4 + cs + 1) * Cout)
            if dj == 0:
                rhs_ref[rows, :] = body(rs, ph, slice(0, WSL))
            elif dj == -1:
                rhs_ref[rows, _LANE:WSL] = body(rs, ph,
                                                slice(0, WSL - _LANE))
                rhs_ref[rows, 0:_LANE] = side(rs, ph, slice(0, _LANE))
            else:
                rhs_ref[rows, 0:WSL - _LANE] = body(rs, ph,
                                                    slice(_LANE, WSL))
                rhs_ref[rows, WSL - _LANE:WSL] = side(
                    rs, ph, slice(_LANE, 2 * _LANE))
    res = lax.dot_general(w_ref[...], rhs_ref[...],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    for v in range(RV):
        for p in range(P):
            o_ref[p, v * C:(v + 1) * C, :] = res[
                (v * P + p) * C:(v * P + p + 1) * C].astype(jnp.bfloat16)


def _run_dgrad(dg: DgradGeom, dy3, w):
    """dy3: (P, H*Cout, WP*128) bf16 phase-major (mode "dy" output).
    Returns dx (P, H*C, WP*128) bf16 phase-major — consumed by the
    lower pair's "bwd"/"dy" passes via dp_3d."""
    WSL = dg.WS * _LANE
    K = (dg.RV + 2) * 4 * dg.Cout
    HP = halo_pad(dg.Cout)
    RPH = dg.RV // 2
    rh = _halo_rows_3d(dy3, dg.H, dg.Cout, RPH, dg.NB)
    thin = _dy_side_cols(dy3, dg.WS)
    ch = _halo_rows_3d(thin, dg.H, dg.Cout, RPH, dg.NB)
    wd = _pack_w_dgrad(w, dg.C, dg.Cout, dg.RV, dg.P)
    in_specs = [
        pl.BlockSpec((dg.P, dg.RV * dg.Cout, WSL),
                     lambda i, mc: (0, i, mc)),
        pl.BlockSpec((dg.P, HP, WSL), lambda i, mc: (0, i, mc)),
        pl.BlockSpec((dg.P, dg.RV * dg.Cout, 2 * _LANE),
                     lambda i, mc: (0, i, mc)),
        pl.BlockSpec((dg.P, HP, 2 * _LANE), lambda i, mc: (0, i, mc)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_shape = jax.ShapeDtypeStruct((dg.P, dg.H * dg.C, dg.WP * _LANE),
                                     jnp.bfloat16)
    out_spec = pl.BlockSpec((dg.P, dg.RV * dg.C, WSL),
                            lambda i, mc: (0, i, mc))
    kern = functools.partial(_dgrad_kernel, C=dg.C, Cout=dg.Cout,
                             RV=dg.RV, WS=dg.WS, P=dg.P)
    return pl.pallas_call(
        kern,
        grid=(dg.NB, dg.NCH),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((K, WSL), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 2),
        interpret=_INTERPRET,
    )(dy3, rh, thin, ch, wd)


# ------------------------------------------------- two-pair chain

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _chain2(g0: Geom, g1: Geom, dg: DgradGeom, xp,
            w0, s0, b0, sh0, w1, s1, b1, sh1):
    """Two fused pairs chained IN the phase layout (pair 0 at P=4,
    pair 1 at P=2): pair 0's pad-free pooled output is directly pair
    1's input — no relayout between pairs in forward or backward.
    Backward runs pair-1 grads + the dy/dgrad passes for dx, then
    pair-0 grads on the phase-major dx (dp_3d)."""
    out, _ = _chain2_fwd(g0, g1, dg, xp, w0, s0, b0, sh0,
                         w1, s1, b1, sh1)
    return out


def _chain2_fwd(g0, g1, dg, xp, w0, s0, b0, sh0, w1, s1, b1, sh1):
    (p0, m0, v0), _ = _pair_fwd(g0, xp, w0, s0, b0, sh0)
    (p1, m1, v1), _ = _pair_fwd(g1, p0, w1, s1, b1, sh1)
    res = (xp, p0, w0, s0, b0, m0, v0, w1, s1, b1, m1, v1)
    return (p1, m0, v0, m1, v1), res


def _chain2_bwd(g0, g1, dg, res, gct):
    xp, p0, w0, s0, b0, m0, v0, w1, s1, b1, m1, v1 = res
    dw1, ds1, db1, dx1 = _pair_grads(g1, dg, p0, w1, s1, b1, m1, v1,
                                     gct[0], want_dx=True)
    dw0, ds0, db0, _ = _pair_grads(g0, None, xp, w0, s0, b0, m0, v0,
                                   dx1, dp_3d=True)
    return (jnp.zeros_like(xp), dw0, ds0, db0, jnp.zeros_like(m0),
            dw1, ds1, db1, jnp.zeros_like(m1))


_chain2.defvjp(_chain2_fwd, _chain2_bwd)


def supported(spec, nxt, batch: int) -> bool:
    """Eligibility mirror of the compiler's fused-pair predicate plus
    the phase-geometry constraints."""
    return (batch == _LANE
            and plan_pair(spec.h, spec.w, spec.c, spec.filters)
            is not None)


def supported_chain(spec0, spec2, batch: int) -> bool:
    """Two-pair chain eligibility: pair 0 at P=4 + pair 1 at P=2 +
    a dgrad plan for pair 1's input gradient."""
    return (batch == _LANE
            and plan_pair(spec0.h, spec0.w, spec0.c, spec0.filters,
                          P=4) is not None
            and plan_pair(spec2.h, spec2.w, spec2.c, spec2.filters,
                          P=2) is not None
            and plan_dgrad(spec2.h, spec2.w, spec2.c, spec2.filters)
            is not None)


@functools.lru_cache(maxsize=32)
def _plan_cached(H, W, C, Cout, P=2, allow_rg2=False):
    return plan_pair(H, W, C, Cout, P, allow_rg2=allow_rg2)


@functools.lru_cache(maxsize=32)
def _plan_dgrad_cached(H, W, C, Cout):
    return plan_dgrad(H, W, C, Cout)


def phase_train_block(x_nhwc, params, spec):
    """One fused [conv3x3+BN+bias+leaky, maxpool2x2] training pair.

    x_nhwc: (128, H, W, C) input (any float dtype; cast bf16 like the
    production conv). Returns (pooled NHWC bf16, bn_updates dict) —
    drop-in for the conv_block + maxpool pair in train mode."""
    g = _plan_cached(spec.h, spec.w, spec.c, spec.filters)
    if _APPLY_NHWC and _FWD2 and _APPLY and g.P == 2:
        g = g._replace(NHWC=True)
    xp = to_phase_np(x_nhwc.astype(jnp.bfloat16), g.P)
    pooled_ph, mean, var = _pair(
        g, xp, params["weights"], params["scales"], params["biases"],
        lax.stop_gradient(params["rolling_mean"]))
    if pooled_ph.ndim == 4:
        # NHWC-direct apply output (H2, W2, Cout, B): the transpose
        # is a layout VIEW ({0,3,2,1} batch-minor NHWC), not a copy
        pooled = jnp.transpose(pooled_ph, (3, 0, 1, 2))
    else:
        pooled = from_phase_np(pooled_ph, g.H // 2, g.W // 2, g.Cout,
                               g.P // 2)
    bn = {"rolling_mean": 0.9 * params["rolling_mean"] + 0.1 * mean,
          "rolling_variance":
              0.9 * params["rolling_variance"] + 0.1 * var}
    return pooled, bn


def _bn_roll(params, mean, var):
    return {"rolling_mean": 0.9 * params["rolling_mean"] + 0.1 * mean,
            "rolling_variance":
                0.9 * params["rolling_variance"] + 0.1 * var}


def phase_train_chain2(x_nhwc, params0, spec0, params2, spec2):
    """The leading TWO fused [conv3x3+BN+bias+leaky, maxpool2x2/2]
    pairs as one phase-layout chain (pair 0 at P=4 -> pair 1 at P=2).
    Neither full-resolution conv activation reaches HBM in forward or
    backward; pair 1's input gradient flows through the dy + dgrad
    kernels back into pair 0's backward with no NHWC round trip.

    Returns (pooled NHWC bf16 after the second pool, bn0, bn2)."""
    # chain kernels ("dy"/dgrad) are RG=1-only
    g0 = _plan_cached(spec0.h, spec0.w, spec0.c, spec0.filters, 4,
                      allow_rg2=False)
    g1 = _plan_cached(spec2.h, spec2.w, spec2.c, spec2.filters, 2,
                      allow_rg2=False)
    dg = _plan_dgrad_cached(spec2.h, spec2.w, spec2.c, spec2.filters)
    xp = to_phase_np(x_nhwc.astype(jnp.bfloat16), 4)
    p1, m0, v0, m1, v1 = _chain2(
        g0, g1, dg, xp,
        params0["weights"], params0["scales"], params0["biases"],
        lax.stop_gradient(params0["rolling_mean"]),
        params2["weights"], params2["scales"], params2["biases"],
        lax.stop_gradient(params2["rolling_mean"]))
    out = from_phase_np(p1, spec2.h // 2, spec2.w // 2, spec2.filters,
                        1)
    return out, _bn_roll(params0, m0, v0), _bn_roll(params2, m1, v1)


def build_bf16_stem(spec, params, *, max_pairs: int = 4):
    """bf16 INFERENCE stem: the leading [conv3x3+bias+leaky,
    maxpool2x2/2] pairs of a BN-FOLDED spec chained through the
    pad-free phase layout, reusing the training "fwd" kernel with
    identity BN constants (mean=0, inv=1, scales=1 -> z = y + bias,
    exactly the folded chain's expressions; only the packed-dot f32
    accumulation order differs from lax.conv, ~1 bf16 ulp).

    Returns (stem_fn, n_consumed) or (None, 0); stem_fn takes the
    engine input (f32/u8 NHWC, batch 128) and returns the bf16 NHWC
    activation after the last fused pair. The serving analog of
    kernels/phase_stem.py's int8 stem (the r3 +33% headline) for the
    bf16 engine."""
    from .phase_stem import plan_pairs
    all_pairs = plan_pairs(spec, max_pairs=max_pairs)
    geoms = []
    for K in range(len(all_pairs), 0, -1):
        cand = all_pairs[:K]
        W, H = spec.layers[0].w, spec.layers[0].h
        if W % (1 << K) or H % (1 << K):
            continue
        geoms = []
        P = 1 << K
        ok = True
        for (ci, _pi) in cand:
            l = spec.layers[ci]
            g = plan_pair(l.h, l.w, l.c, l.filters, P)
            if g is None:
                ok = False
                break
            geoms.append((ci, g))
            P //= 2
        if ok:
            break
        geoms = []
    if not geoms:
        return None, 0
    lastp = spec.layers[geoms[-1][0] + 1]
    out_h, out_w, out_c = lastp.out_h, lastp.out_w, lastp.out_c

    def stem_fn(x):
        xp = to_phase_np(x.astype(jnp.bfloat16), geoms[0][1].P)
        for ci, g in geoms:
            p = params[ci]
            halo = halo_rows(xp, g.H, g.C, g.RP, g.NB)
            wpk = _pack_w(p["weights"], g)
            one = jnp.ones((g.Cout,), jnp.float32)
            zero = jnp.zeros((g.Cout,), jnp.float32)
            kc = _consts(zero, zero, one, one)
            bias_b = p["biases"].astype(jnp.bfloat16).reshape(-1, 1)
            xp = _run("fwd", g, xp, halo, wpk, kc, bias_b)
        return from_phase_np(xp, out_h, out_w, out_c,
                             geoms[-1][1].P // 2)

    return stem_fn, geoms[-1][0] + 2


__all__ = ["phase_train_block", "phase_train_chain2", "plan_pair",
           "plan_dgrad", "supported", "supported_chain", "Geom",
           "DgradGeom", "to_phase_np", "from_phase_np",
           "build_bf16_stem"]
