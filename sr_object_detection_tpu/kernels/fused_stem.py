"""Pallas TPU fused training stem: BN + bias + leaky + maxpool2x2 in HWCN.

Why this exists (measured, v5e, tiny-yolo-416 B=128 training): the first
three conv blocks cost 28 ms of the 44.9 ms device step, and every op in
them sits at its own HBM-traffic floor (PARITY.md "per-op floor audit").
XLA cannot fuse the normalize+leaky pass into the pool, nor the pool
backward + leaky backward + batchnorm backward into one pass — each is a
separate full round trip over the (B,416,416,16) activation.  This module
fuses the whole between-convs chain into three Pallas kernels so the
activation is touched the minimum number of times:

  forward:   conv (XLA, HWCN out) -> [F2: normalize+bias+leaky+pool]
  backward:  [B1: pool-route+leaky'+BN reductions] -> per-channel consts
             -> [B2: pool-route+leaky'+BN dx in one pass] -> conv wgrad
             (XLA, reads the single dx tensor)

Layout: everything runs on (H, W, C, B) "HWCN" tensors with B == 128.
This is not arbitrary — it is the LOGICAL order whose row-major layout
equals the physical layout XLA already prefers for these activations
(batch-minor {0,3,2,1}: N minor, then C, W, H — the round-3 batch-minor
rule).  Consequences, all measured on the first (C,H,W,B) attempt and
fixed by this ordering:
  * the XLA conv emits the kernel input directly — no 708 MB layout
    copy between the conv and the pallas_call (the CHWN variant paid a
    2.1 ms `copy` because Pallas requires row-major operands);
  * both pool dims (H, W) are OUTER dims of the (2, WT, CB, 128)
    blocks, so the 2x2 window max / first-tap routing are plain
    outer-dim reduces — no sublane rolls, no (2,128)-tiled views, none
    of the Mosaic relayout walls;
  * per-channel constants sit on the sublane dim (C) and broadcast
    over outer dims only.

Numerics are the production bf16 training path (ops/conv._bn_core_fast
semantics, which the f32 oracle-exact path does not use):
  * batch statistics in f32 from the bf16 conv output, shifted by the
    gradient-stopped rolling mean; 1/(N-1) variance (blas.c:101), eps
    added OUTSIDE the sqrt (blas.c:122);
  * backward is the reference's HAND-WRITTEN batchnorm gradient
    (batchnorm_layer.c:74-157: eps=1e-5 inside pow / added to the
    sqrt'd var, 1/N weighting), NOT autodiff of the forward;
  * maxpool backward routes each window's cotangent to the FIRST max
    tap in row-major window order (maxpool_layer.c:95-108), identical
    to the select_and_scatter_add rule the unfused path uses;
  * leaky gradient is (z > 0) ? 1 : 0.1 on the pre-activation, with the
    0.1 multiply rounded to bf16 like the unfused bf16 chain;
  * comparisons run in f32 (exact bf16 widening) — v5e Mosaic rejects
    bf16 compares ("Target does not support this comparison").

The f32 CPU/oracle parity path never routes through this module.

MEASURED OUTCOME (v5e, fwd+bwd scan-chained A/B vs the production
unfused chain, B=128) — a WASH, so the trainer flag defaults OFF:

    conv  3->16 @416:  14.77 ms unfused   14.77 ms fused   (1.00x)
    conv 16->32 @208:   8.83              9.34             (0.95x)
    conv 32->64 @104:   6.13              6.07             (1.01x)
    conv 64->128 @52:   4.21              4.47             (0.94x)
    full tiny-yolo-416 training step: 45.2 ms unfused vs 45.8 fused

The HWCN layout closed the first attempt's 0.73-0.84x deficit (the
CHWN variant paid a 2.1 ms relayout copy + sublane-roll VPU overhead),
i.e. these kernels now run at XLA-fusion bandwidth — which is exactly
the per-op floor audit's conclusion: at fixed dataflow (the conv
materializes y to HBM either way) there is nothing left to fuse away;
XLA's apply+leaky+pool and backward fusions were already at the
traffic floor. The only remaining >10% lever for the stem is not
materializing y at all, which requires the conv itself inside the
kernel — and a C=3 conv recompute maps to a (N,27)@(27,16) MXU matmul
at (27/128)*(16/128) utilization, ~3.7 ms per extra pass: more than
the ~2.4 ms of traffic it would save. Kept as an opt-in, oracle-pinned
artifact (tests/test_fused_stem.py) so future work starts from running
kernels, not the analysis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-6     # forward eps outside sqrt (blas.c:122)
EPS_B = 1e-5      # backward eps (batchnorm_layer.c:74-115)

# flipped to True by tests to run the kernels in interpreter mode on CPU
_INTERPRET = False


def _pick_tiles(C: int, H: int, W: int):
    """Block shape (2, WT, CB, 128): one H-pair per step, W tiled.
    Sublane dim is CB -> CB % 8 == 0 or CB == C; WT is any even divisor
    of W. Returns (CB, WT)."""
    limit = int(2 * 2 ** 20)          # f32 temp bytes per block
    cb_opts = [d for d in range(min(C, 128), 0, -1)
               if C % d == 0 and (d % 8 == 0 or d == C)]
    wt_opts = [d for d in range(W, 1, -1) if W % d == 0 and d % 2 == 0]
    if not wt_opts:
        wt_opts = [W]
    for cb in cb_opts:
        for wt in wt_opts:
            if 2 * wt * cb * 128 * 4 <= limit:
                return cb, wt
    return cb_opts[-1], wt_opts[-1]


def _supported(C: int, H: int, W: int, B: int) -> bool:
    return (B == 128 and H % 2 == 0 and W % 2 == 0 and W >= 2)


# ---------------------------------------------------------------- kernels

def _kcols(k_ref, i, dtype=jnp.float32):
    """Per-channel constant as (1, 1, CB, 128) from the lane-pre-splatted
    (8, C, 128) consts array: Mosaic cannot broadcast into sublanes and
    lanes in one op, so the kernel only slices and the consuming
    arithmetic broadcasts outer dims."""
    return k_ref[i][None, None].astype(dtype)     # (1, 1, CB, 128)


def _bn_leaky(y, k_ref):
    """Normalize + bias + leaky on a (2, WT, CB, B) block; returns
    (a, zpos, x_hat): activation (bf16), pre-activation sign (f32
    compare), normalized x_hat (f32)."""
    mean = _kcols(k_ref, 0)
    inv = _kcols(k_ref, 1)
    scales = _kcols(k_ref, 2)
    bias = _kcols(k_ref, 3, jnp.bfloat16)
    x_hat = (y.astype(jnp.float32) - mean) * inv
    z = (x_hat * scales).astype(jnp.bfloat16) + bias
    zpos = z.astype(jnp.float32) > 0
    a = jnp.where(zpos, z, jnp.bfloat16(0.1) * z)
    return a, zpos, x_hat


def _f2_kernel(y_ref, k_ref, out_ref):
    """normalize + bias + leaky + 2x2/2 maxpool on one (2,WT,CB,B) block."""
    a, _, _ = _bn_leaky(y_ref[:], k_ref)
    two, wt, cb, b = a.shape
    ar = a.reshape(2, wt // 2, 2, cb, b)
    out_ref[:] = jnp.max(ar, axis=(0, 2))[None]   # (1, WT/2, CB, B)


def _recompute_dz(y, dp, k_ref):
    """Shared backward recompute: pre-activation sign, first-tap pool
    routing of the pooled cotangent, leaky gradient. Returns (dz, x_hat)
    at full (2, WT, CB, B) resolution, dz in f32. All window structure
    lives on OUTER dims of the (2, WT/2, 2, CB, B) view."""
    a, zpos, x_hat = _bn_leaky(y, k_ref)
    two, wt, cb, b = a.shape
    ar = a.astype(jnp.float32).reshape(2, wt // 2, 2, cb, b)
    m = jnp.max(ar, axis=(0, 2), keepdims=True)
    eq = ar == m
    # first max tap in row-major window order (maxpool_layer.c:95-108):
    # rank = 2*row + col, winner = min rank among maximal taps
    rank = (2 * jax.lax.broadcasted_iota(jnp.int32, ar.shape, 0)
            + jax.lax.broadcasted_iota(jnp.int32, ar.shape, 2))
    mr = jnp.min(jnp.where(eq, rank, 4), axis=(0, 2), keepdims=True)
    first = eq & (rank == mr)
    dpb = dp.astype(jnp.float32)[:, :, None]      # (1, WT/2, 1, CB, B)
    da = jnp.where(first, dpb, jnp.zeros((), jnp.float32))
    da = da.reshape(2, wt, cb, b)
    # leaky backward: the unfused path multiplies in bf16 — reproduce
    # its rounding exactly (bf16(0.1) = 0.10009765625, product rounded)
    neg = (jnp.float32(0.10009765625) * da).astype(jnp.bfloat16) \
        .astype(jnp.float32)
    dz = jnp.where(zpos, da, neg)
    return dz, x_hat


def _b1_kernel(y_ref, dp_ref, k_ref, acc_ref):
    """Backward reductions: acc[:,0] += sum(dz), acc[:,1] += sum(dz*x_hat)
    per channel (= dbiases and dscales)."""
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dz, x_hat = _recompute_dz(y_ref[:], dp_ref[:], k_ref)
    s0 = jnp.sum(dz, axis=(0, 1))                 # (CB, B)
    s1 = jnp.sum(dz * x_hat, axis=(0, 1))
    acc_ref[:, 0:1] += jnp.sum(s0, axis=1, keepdims=True)
    acc_ref[:, 1:2] += jnp.sum(s1, axis=1, keepdims=True)


def _b2_kernel(y_ref, dp_ref, k_ref, dx_ref):
    """Backward dx in one pass: the reference's hand-written batchnorm
    gradient (batchnorm_layer.c:147-157) folded to per-channel constants
    dx = dz*c1 + (y-mean)*c2 + c3."""
    dz, _ = _recompute_dz(y_ref[:], dp_ref[:], k_ref)
    y = y_ref[:]
    mean = _kcols(k_ref, 0)
    c1 = _kcols(k_ref, 4)
    c2 = _kcols(k_ref, 5)
    c3 = _kcols(k_ref, 6)
    xm = y.astype(jnp.float32) - mean
    dx_ref[:] = (dz * c1 + xm * c2 + c3).astype(jnp.bfloat16)


# ------------------------------------------------------------- pallas glue

def _grids(C, H, W):
    CB, WT = _pick_tiles(C, H, W)
    grid = (C // CB, H // 2, W // WT)
    in_y = pl.BlockSpec((2, WT, CB, 128), lambda c, i, j: (i, j, c, 0),
                        memory_space=pltpu.VMEM)
    in_dp = pl.BlockSpec((1, WT // 2, CB, 128), lambda c, i, j: (i, j, c, 0),
                         memory_space=pltpu.VMEM)
    in_k = pl.BlockSpec((8, CB, 128), lambda c, i, j: (0, c, 0),
                        memory_space=pltpu.VMEM)
    return CB, WT, grid, in_y, in_dp, in_k


def _f2(y, k):
    H, W, C, B = y.shape
    CB, WT, grid, in_y, _, in_k = _grids(C, H, W)
    out = pl.BlockSpec((1, WT // 2, CB, 128), lambda c, i, j: (i, j, c, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _f2_kernel,
        grid=grid,
        in_specs=[in_y, in_k],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((H // 2, W // 2, C, B), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=_INTERPRET,
    )(y, k)


def _b1(y, dp, k):
    H, W, C, B = y.shape
    CB, WT, grid, in_y, in_dp, in_k = _grids(C, H, W)
    out = pl.BlockSpec((CB, 2), lambda c, i, j: (c, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _b1_kernel,
        grid=grid,
        in_specs=[in_y, in_dp, in_k],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((C, 2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=_INTERPRET,
    )(y, dp, k)


def _b2(y, dp, k):
    H, W, C, B = y.shape
    CB, WT, grid, in_y, in_dp, in_k = _grids(C, H, W)
    out = pl.BlockSpec((2, WT, CB, 128), lambda c, i, j: (i, j, c, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _b2_kernel,
        grid=grid,
        in_specs=[in_y, in_dp, in_k],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((H, W, C, B), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=_INTERPRET,
    )(y, dp, k)


# --------------------------------------------------------------- the op

def _consts(C, mean, inv, scales, biases, c1=None, c2=None, c3=None):
    rows = [mean, inv, scales, biases,
            c1 if c1 is not None else jnp.zeros_like(mean),
            c2 if c2 is not None else jnp.zeros_like(mean),
            c3 if c3 is not None else jnp.zeros_like(mean),
            jnp.zeros_like(mean)]
    k = jnp.stack([r.astype(jnp.float32) for r in rows], axis=0)
    # lane-pre-splatted (8, C, 128): see _kcols
    return jnp.broadcast_to(k[:, :, None], (8, C, 128))


def _fused_stats(y, shift):
    H, W, C, B = y.shape
    n = H * W * B
    xs = y.astype(jnp.float32) - shift[None, None, :, None]
    sx = jnp.sum(xs, axis=(0, 1, 3))
    sxx = jnp.sum(jnp.square(xs), axis=(0, 1, 3))
    mean = shift + sx / n
    # clamp like _bn_core_fast: the cancellation can round negative
    var = jnp.maximum((sxx - jnp.square(sx) / n) / max(n - 1, 1), 0.0)
    return mean, var


@jax.custom_vjp
def fused_bn_leaky_pool(y, scales, biases, shift):
    """y: (H, W, C, 128) bf16 conv output (HWCN). Returns
    (pooled (H/2, W/2, C, 128) bf16, batch mean (C,), batch var (C,)).

    Forward math == ops/conv._bn_core_fast + bias + leaky + darknet
    maxpool(2,2,0); backward == the reference hand-written chain (see
    module docstring). Cotangents of mean/var are ignored (the rolling-
    stat update is not differentiated, exactly like _bn_core)."""
    mean, var = _fused_stats(y, shift)
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    k = _consts(y.shape[2], mean, inv, scales, biases)
    pooled = _f2(y, k)
    return pooled, mean, var


def _fwd(y, scales, biases, shift):
    out = fused_bn_leaky_pool(y, scales, biases, shift)
    _, mean, var = out
    return out, (y, scales, biases, mean, var)


def _bwd(res, g):
    y, scales, biases, mean, var = res
    dp = g[0]          # (H/2, W/2, C, 128) bf16; dmean/dvar ignored
    H, W, C, B = y.shape
    n = H * W * B
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    k1 = _consts(C, mean, inv, scales, biases)
    acc = _b1(y, dp, k1)
    dbiases = acc[:, 0]
    dscales = acc[:, 1]
    sum_d = scales * dbiases
    sum_dxm = scales * (jnp.sqrt(var) + BN_EPS) * dscales
    variance_delta = sum_dxm * (-0.5) * jnp.power(var + EPS_B, -1.5)
    mean_delta = sum_d * (-1.0 / jnp.sqrt(var + EPS_B))
    c1 = scales / (jnp.sqrt(var) + EPS_B)
    c2 = variance_delta * 2.0 / n
    c3 = mean_delta / n
    k2 = _consts(C, mean, inv, scales, biases, c1, c2, c3)
    dy = _b2(y, dp, k2)
    return dy, dscales, dbiases, jnp.zeros_like(mean)


fused_bn_leaky_pool.defvjp(_fwd, _bwd)


__all__ = ["fused_bn_leaky_pool", "_supported", "_pick_tiles"]
