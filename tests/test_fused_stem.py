"""Fused training stem (kernels/fused_stem.py) vs the unfused bf16 chain.

The fused op reproduces the production bf16 path formula-for-formula
(_bn_core_fast statistics, darknet hand-written BN backward, first-tap
pool routing, leaky on the pre-activation). The only tolerated
difference is f32 summation ORDER in the batch statistics (CHWN vs NHWC
reduce order), so the tests split into:

  * transform exactness: same mean/var handed to both paths -> pooled
    output and routing must match BIT FOR BIT;
  * statistics: allclose vs batchnorm_train (order-only round-off);
  * end-to-end gradients vs the real unfused chain on a coarse value
    grid where stat round-off cannot flip a pool tap or a leaky sign.

Runs the Pallas kernels in interpreter mode on CPU (the TPU A/B is a
perf measurement, recorded in PARITY.md, not a correctness gate).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

import sr_object_detection_tpu.kernels.fused_stem as FS
from sr_object_detection_tpu.ops.conv import (batchnorm_train, bias_add,
                                              BN_EPS)
from sr_object_detection_tpu.ops.pooling import maxpool
from sr_object_detection_tpu.ops.activations import get_activation


@pytest.fixture(autouse=True)
def _interpret():
    FS._INTERPRET = True
    yield
    FS._INTERPRET = False


def unfused_chain(y_nhwc, scales, biases, shift):
    """The exact production path being replaced: _bn_core_fast + bias
    (bf16) + leaky + darknet maxpool(2,2,0), training formulation."""
    rm = shift
    rv = jnp.ones_like(shift)  # rolling var does not enter the core
    yb, _, _, mean, var, _ = batchnorm_train(y_nhwc, scales, rm, rv)
    z = bias_add(yb, biases)
    a = get_activation("leaky")(z)
    p = maxpool(a, size=2, stride=2, pad=0, for_training=True)
    return p, mean, var


def manual_transform(y_nhwc, scales, biases, mean, var):
    """The fused op's transform with FIXED mean/var (isolates the
    summation-order difference away)."""
    inv = 1.0 / (jnp.sqrt(var) + BN_EPS)
    x_hat = (y_nhwc.astype(jnp.float32) - mean) * inv
    z = (x_hat * scales).astype(jnp.bfloat16) + biases.astype(jnp.bfloat16)
    a = jnp.where(z > 0, z, jnp.bfloat16(0.1) * z)
    return maxpool(a, size=2, stride=2, pad=0, for_training=True)


def _mk(C=16, H=16, W=32, B=128, seed=0, coarse=False):
    rng = np.random.RandomState(seed)
    y = rng.normal(0, 1.5, (B, H, W, C)).astype(np.float32)
    if coarse:
        # multiples of 1/8: stat round-off (~1e-6) cannot reorder
        # distinct taps or flip a leaky sign
        y = np.round(y * 8) / 8
    # exact ties inside pool windows exercise first-tap routing
    y[:, 0:2, 0:2, :] = 0.75
    y[:, H - 2, W - 2, :] = y[:, H - 2, W - 1, :]
    y = jnp.asarray(y, jnp.bfloat16)
    scales = jnp.asarray(rng.uniform(0.5, 1.5, C), jnp.float32)
    biases = jnp.asarray(rng.uniform(-0.5, 0.5, C), jnp.float32)
    shift = jnp.asarray(rng.uniform(-0.2, 0.2, C), jnp.float32)
    if coarse:
        scales = jnp.round(scales * 8) / 8
        biases = jnp.round(biases * 8) / 8
        shift = jnp.zeros_like(shift)
    return y, scales, biases, shift


@pytest.mark.parametrize("C,H,W", [(16, 16, 32), (32, 8, 16), (8, 4, 6),
                                   (256, 4, 26)])
def test_forward_transform_bit_exact(C, H, W):
    y, scales, biases, shift = _mk(C, H, W)
    y_chwn = jnp.transpose(y, (1, 2, 3, 0))
    p_f, mean_f, var_f = FS.fused_bn_leaky_pool(y_chwn, scales, biases,
                                                shift)
    p_m = manual_transform(y, scales, biases, mean_f, var_f)
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(p_f, (3, 0, 1, 2)), np.float32),
        np.asarray(p_m, np.float32))


def test_statistics_match_bn_core():
    y, scales, biases, shift = _mk()
    y_chwn = jnp.transpose(y, (1, 2, 3, 0))
    _, mean_f, var_f = FS.fused_bn_leaky_pool(y_chwn, scales, biases, shift)
    _, mean_u, var_u = unfused_chain(y, scales, biases, shift)
    np.testing.assert_allclose(np.asarray(mean_f), np.asarray(mean_u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_u),
                               rtol=1e-5, atol=1e-5)


def test_end_to_end_matches_unfused_on_coarse_grid():
    """Forward AND all gradients vs the real unfused chain (coarse grid so
    stat round-off cannot flip routing)."""
    C, H, W = 16, 16, 32
    y, scales, biases, shift = _mk(C, H, W, coarse=True)
    y_chwn = jnp.transpose(y, (1, 2, 3, 0))

    def loss_f(y_, s_, b_):
        p, mean, var = FS.fused_bn_leaky_pool(y_, s_, b_, shift)
        return (jnp.sum(p.astype(jnp.float32) * 1.7)
                + 0.0 * jnp.sum(mean) + 0.0 * jnp.sum(var))

    def loss_u(y_, s_, b_):
        p, mean, var = unfused_chain(y_, s_, b_, shift)
        return (jnp.sum(p.astype(jnp.float32) * 1.7)
                + 0.0 * jnp.sum(mean) + 0.0 * jnp.sum(var))

    pf = FS.fused_bn_leaky_pool(y_chwn, scales, biases, shift)[0]
    pu = unfused_chain(y, scales, biases, shift)[0]
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(pf, (3, 0, 1, 2)), np.float32),
        np.asarray(pu, np.float32))

    gy_f, gs_f, gb_f = jax.grad(loss_f, argnums=(0, 1, 2))(
        y_chwn, scales, biases)
    gy_u, gs_u, gb_u = jax.grad(loss_u, argnums=(0, 1, 2))(y, scales, biases)
    np.testing.assert_allclose(np.asarray(gs_f), np.asarray(gs_u),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_u),
                               rtol=3e-5, atol=3e-5)
    gy_f_nhwc = np.asarray(jnp.transpose(gy_f, (3, 0, 1, 2)), np.float32)
    gy_u_np = np.asarray(gy_u, np.float32)
    # dy is bf16 in both paths; the BN-backward per-channel constants see
    # the stat round-off, so allow bf16-ulp-level relative differences
    np.testing.assert_allclose(gy_f_nhwc, gy_u_np, rtol=1e-2, atol=1e-3)
    # the routing PATTERN (which taps received gradient) must be identical
    np.testing.assert_array_equal(gy_f_nhwc != 0, gy_u_np != 0)


def test_tie_routing_is_first_tap():
    """All four window taps equal -> the whole cotangent lands on the
    first tap (row-major), both paths (maxpool_layer.c:95-108)."""
    C, H, W, B = 8, 4, 4, 128
    y = jnp.full((B, H, W, C), 0.5, jnp.bfloat16)
    scales = jnp.ones((C,), jnp.float32)
    biases = jnp.zeros((C,), jnp.float32)
    shift = jnp.zeros((C,), jnp.float32)
    y_chwn = jnp.transpose(y, (1, 2, 3, 0))

    gy_f = jax.grad(lambda y_: jnp.sum(
        FS.fused_bn_leaky_pool(y_, scales, biases, shift)[0]
        .astype(jnp.float32)))(y_chwn)
    gy_u = jax.grad(lambda y_: jnp.sum(
        unfused_chain(y_, scales, biases, shift)[0]
        .astype(jnp.float32)))(y)
    np.testing.assert_array_equal(
        np.asarray(jnp.transpose(gy_f, (3, 0, 1, 2)), np.float32),
        np.asarray(gy_u, np.float32))
    # routing visibility: through the FIXED-stats transform (no BN mean/var
    # spreading terms) only the first tap of each window gets gradient
    mean = jnp.full((C,), 0.5, jnp.float32)
    var = jnp.zeros((C,), jnp.float32)
    g = np.asarray(jax.grad(lambda y_: jnp.sum(
        manual_transform(y_, scales, biases, mean, var)
        .astype(jnp.float32)))(y), np.float32)
    assert g[:, 0::2, 0::2, :].all() and not g[:, 1::2, :, :].any() \
        and not g[:, :, 1::2, :].any()
