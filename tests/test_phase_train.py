"""Phase-split fused TRAINING pair (kernels/phase_train.py) vs the
production bf16 chain (ops/conv.conv_block train + ops/pooling.maxpool).

The fused pair recomputes the conv via MXU dots with a different
accumulation order than lax.conv, so outputs agree to bf16 tolerance
(not bitwise); the backward reproduces the reference hand-written BN
gradient + first-max pool routing + bf16-rounded leaky backward (same
expressions as kernels/fused_stem.py, which is pinned against the
unfused chain bit-for-bit at fixed conv output).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

import sr_object_detection_tpu.kernels.phase_train as PT
from sr_object_detection_tpu.graph import spec as S
from sr_object_detection_tpu.ops import activations as A
from sr_object_detection_tpu.ops import conv as C
from sr_object_detection_tpu.ops import pooling as P


@pytest.fixture(autouse=True)
def _interpret():
    PT._INTERPRET = True
    yield
    PT._INTERPRET = False


def _mkpair(H, W, Cin, Cout, seed=0):
    rng = np.random.RandomState(seed)
    spec = S.ConvSpec(
        index=0, h=H, w=W, c=Cin, inputs=H * W * Cin, out_h=H, out_w=W,
        out_c=Cout, outputs=H * W * Cout, size=3, stride=1, pad=1,
        filters=Cout, activation="leaky", batch_normalize=True)
    params = {
        "weights": jnp.asarray(
            rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.3),
        "biases": jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1),
        "scales": jnp.asarray(
            1.0 + 0.2 * rng.randn(Cout).astype(np.float32)),
        "rolling_mean": jnp.asarray(
            0.05 * rng.randn(Cout).astype(np.float32)),
        "rolling_variance": jnp.asarray(
            1.0 + 0.1 * rng.rand(Cout).astype(np.float32)),
    }
    x = jnp.asarray(rng.rand(128, H, W, Cin).astype(np.float32))
    return spec, params, x


def _prod_pair(x, p, spec):
    y, bn = C.conv_block(x, p, spec, A.get_activation("leaky"),
                         train=True, compute_dtype=jnp.bfloat16)
    return P.maxpool(y, size=2, stride=2, pad=0), bn


def test_forward_parity():
    spec, params, x = _mkpair(16, 16, 3, 16)
    got, bn_g = jax.jit(
        lambda v: PT.phase_train_block(v, params, spec))(x)
    ref, bn_r = jax.jit(lambda v: _prod_pair(v, params, spec))(x)
    assert got.shape == ref.shape == (128, 8, 8, 16)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)
    for k in ("rolling_mean", "rolling_variance"):
        np.testing.assert_allclose(np.asarray(bn_g[k]),
                                   np.asarray(bn_r[k]),
                                   rtol=1e-3, atol=1e-3)


def test_gradient_parity():
    spec, params, x = _mkpair(16, 16, 3, 16, seed=3)
    r = jnp.asarray(np.random.RandomState(9).randn(
        128, 8, 8, 16).astype(np.float32))

    def loss_fused(p):
        y, _ = PT.phase_train_block(x, p, spec)
        return jnp.sum(y.astype(jnp.float32) * r)

    def loss_prod(p):
        y, _ = _prod_pair(x, p, spec)
        return jnp.sum(y.astype(jnp.float32) * r)

    gf = jax.jit(jax.grad(loss_fused))(params)
    gp = jax.jit(jax.grad(loss_prod))(params)
    for k in ("weights", "scales", "biases"):
        a, b = np.asarray(gf[k]), np.asarray(gp[k])
        scale = max(1e-3, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a, b, rtol=4e-2, atol=4e-2 * scale,
                                   err_msg=k)


def test_gradient_parity_gram_bwd():
    """_BWD_GRAM: the gram-factored backward (no conv recompute —
    argmax routing + GR@w wgrad term) matches the production chain's
    gradients to the same tolerance as the recomputing backward. The
    only numeric deltas vs mode "bwd" are the skipped bf16 rounding
    of y in the E-term and raw-vs-applied first-extreme tie routing
    (measure-zero on random data)."""
    spec, params, x = _mkpair(16, 16, 3, 16, seed=3)
    r = jnp.asarray(np.random.RandomState(9).randn(
        128, 8, 8, 16).astype(np.float32))

    def loss_fused(p):
        y, _ = PT.phase_train_block(x, p, spec)
        return jnp.sum(y.astype(jnp.float32) * r)

    def loss_prod(p):
        y, _ = _prod_pair(x, p, spec)
        return jnp.sum(y.astype(jnp.float32) * r)

    old = PT._BWD_GRAM
    PT._BWD_GRAM = True
    try:
        gf = jax.jit(jax.grad(loss_fused))(params)
    finally:
        PT._BWD_GRAM = old
    gp = jax.jit(jax.grad(loss_prod))(params)
    for k in ("weights", "scales", "biases"):
        a, b = np.asarray(gf[k]), np.asarray(gp[k])
        scale = max(1e-3, float(np.max(np.abs(b))))
        np.testing.assert_allclose(a, b, rtol=4e-2, atol=4e-2 * scale,
                                   err_msg=k)


def test_trainer_integration():
    """make_train_step(phase_train=True): one step on a tiny detector,
    loss matches the unfused step to bf16 tolerance and decreases."""
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.train.trainer import (TrainState,
                                                       make_train_step)
    from sr_object_detection_tpu.train.sgd import init_velocity
    import dataclasses

    base = tiny_yolo_voc(width=32, height=32)
    spec = dataclasses.replace(
        base, net=dataclasses.replace(base.net, batch=128,
                                      subdivisions=1))
    params = jax.tree.map(jnp.asarray, init_params(spec, seed=0))
    x = jnp.asarray(np.random.RandomState(0).rand(
        128, 32, 32, 3).astype(np.float32))
    t = np.zeros((128, 30, 5), np.float32)
    t[:, 0] = [0.5, 0.5, 0.4, 0.4, 2]
    t = jnp.asarray(t)
    rng = jax.random.PRNGKey(0)

    losses = {}
    for pt in (False, True):
        st = TrainState(params, init_velocity(params), jnp.asarray(0))
        step = jax.jit(make_train_step(spec, compute_dtype=jnp.bfloat16,
                                       phase_train=pt))
        st, m1 = step(st, x, t, rng)
        _, m2 = step(st, x, t, rng)
        losses[pt] = (float(m1["loss"]), float(m2["loss"]))
    # same trajectory to bf16 tolerance, and training makes progress
    assert abs(losses[True][0] - losses[False][0]) \
        <= 0.03 * abs(losses[False][0]) + 0.05
    assert losses[True][1] < losses[True][0]


def test_forward_parity_divisor_poor_geometry():
    """The apply-pass lane blocks must stay 128-aligned with cw | W2
    (the r5 CL-halving bug crashed 608 geometry: W2=304 halves to a
    9.5-lane-tile block). W=152 -> W2=76 (divisors 1,2,4,19,38,76)
    exercises the divisor-aware chooser at Cout=32."""
    spec, params, x = _mkpair(152, 152, 3, 32, seed=5)
    from sr_object_detection_tpu.kernels.phase_train import (
        _apply_blocks, plan_pair, _LANE)
    g = plan_pair(152, 152, 3, 32)
    assert g is not None
    RB, RPC, CL = _apply_blocks(g)
    assert CL % _LANE == 0 and (76 * _LANE) % CL == 0
    got, _ = jax.jit(
        lambda v: PT.phase_train_block(v, params, spec))(x)
    ref, _ = jax.jit(lambda v: _prod_pair(v, params, spec))(x)
    assert got.shape == ref.shape == (128, 76, 76, 32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_plan_rejects_odd_geometry():
    assert PT.plan_pair(15, 16, 3, 16) is None      # odd H
    assert PT.plan_pair(416, 416, 3, 16) is not None


def _to_pm(x, P):
    """NHWC -> phase-major (P, H*C, (W/P)*B) — mode-"dy" / dgrad
    operand layout."""
    B, H, W, C = x.shape
    wp = W // P
    return jnp.transpose(x.reshape(B, H, wp, P, C),
                         (3, 1, 4, 2, 0)).reshape(P, H * C, wp * B)


def _from_pm(x, H, W, C, P):
    wp = W // P
    t = x.reshape(P, H, C, wp, 128)
    return jnp.transpose(t, (4, 1, 3, 0, 2)).reshape(128, H, W, C)


@pytest.mark.parametrize("ws", [None, 2])
def test_dgrad_kernel_vs_conv_transpose(ws):
    """_run_dgrad == XLA transposed conv to bf16 tolerance, for both
    the single-window and the multi-chunk (column sideband) paths."""
    from jax import lax
    B, H, W, Cin, Co = 128, 16, 16, 16, 32
    rng = np.random.RandomState(0)
    dy = jnp.asarray(rng.randn(B, H, W, Co).astype(np.float32)).astype(
        jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, Cin, Co).astype(np.float32) * 0.3)
    dg = PT.plan_dgrad(H, W, Cin, Co)
    if ws is not None:
        dg = dg._replace(WS=ws, NCH=dg.WP // ws)
    dx3 = jax.jit(lambda d, p: PT._run_dgrad(dg, d, p))(_to_pm(dy, 2),
                                                        w)
    dx = np.asarray(_from_pm(dx3, H, W, Cin, 2), np.float32)
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(jnp.bfloat16)
    ref = lax.conv_general_dilated(
        dy, wt, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    ref = np.asarray(ref, np.float32)
    rel = np.abs(dx - ref).max() / max(1e-6, np.abs(ref).max())
    assert rel < 2e-2, rel


def _mk2(H, W, Cin, Cout, seed):
    s, p = _mkpair(H, W, Cin, Cout, seed)[:2]
    return s, p


def test_chain2_parity():
    """Two-pair chain vs the production two-pair chain: loss, rolling
    stats, and ALL gradients — pair 0's weight gradient exercises the
    full dy+dgrad backward path."""
    s0, p0, x = _mkpair(16, 16, 3, 16, seed=0)
    s2, p2 = _mk2(8, 8, 16, 32, seed=1)
    r = jnp.asarray(np.random.RandomState(9).randn(
        128, 4, 4, 32).astype(np.float32))

    def loss_prod(ps):
        a, bn0 = _prod_pair(x, ps[0], s0)
        b, bn2 = _prod_pair(a, ps[1], s2)
        return jnp.sum(b.astype(jnp.float32) * r), (bn0, bn2)

    def loss_chain(ps):
        y, bn0, bn2 = PT.phase_train_chain2(x, ps[0], s0, ps[1], s2)
        return jnp.sum(y.astype(jnp.float32) * r), (bn0, bn2)

    (lp, bp), gp = jax.jit(
        jax.value_and_grad(loss_prod, has_aux=True))((p0, p2))
    (lf, bf), gf = jax.jit(
        jax.value_and_grad(loss_chain, has_aux=True))((p0, p2))
    assert abs(float(lp) - float(lf)) < 3e-2 * max(1.0, abs(float(lp)))
    for ba, bb in zip(bf, bp):
        for k in ("rolling_mean", "rolling_variance"):
            np.testing.assert_allclose(np.asarray(ba[k]),
                                       np.asarray(bb[k]),
                                       rtol=2e-3, atol=2e-3)
    for pi, (max_tol, mean_tol) in ((1, (9e-2, 2e-2)),
                                    (0, (9e-2, 2e-2))):
        # the packed-dot conv rounds y differently from lax.conv by 1
        # bf16 ulp on knife-edge elements, which flips first-max pool
        # ties and routes those gradient elements to a different input
        # pixel — individual elements land 2-6% off (seed sweep,
        # PARITY.md) while the MEAN error stays at bf16 noise; the
        # max tolerance covers the tie-flip tail, the mean tolerance
        # pins the absence of systematic bias
        for k in ("weights", "scales", "biases"):
            a, b = np.asarray(gf[pi][k]), np.asarray(gp[pi][k])
            sc = max(1e-3, float(np.max(np.abs(b))))
            d = np.abs(a - b) / sc
            assert d.max() < max_tol, (pi, k, d.max())
            assert d.mean() < mean_tol, (pi, k, d.mean())


def test_bf16_stem_engine_parity():
    """ThroughputEngine(phase_stem=True): bf16 INFERENCE through the
    fused phase stem == the plain bf16 engine to bf16 tolerance."""
    from sr_object_detection_tpu.infer.engine import ThroughputEngine
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.io.weights import init_params

    spec = tiny_yolo_voc(width=32, height=32)
    params = init_params(spec, seed=0)
    x = jnp.asarray(np.random.RandomState(0).rand(
        128, 32, 32, 3).astype(np.float32))
    e0 = ThroughputEngine(spec, params, batch=128)
    e1 = ThroughputEngine(spec, params, batch=128, phase_stem=True)
    assert e1.phase_stem
    a = np.asarray(e0(x), np.float32)
    b = np.asarray(e1(x), np.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=3e-2, atol=3e-2)


def test_chain2_trainer_integration():
    """make_train_step engages the chain on a 2+-pair net at batch 128
    and the loss trajectory matches the unfused step."""
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.train.trainer import (TrainState,
                                                       make_train_step)
    from sr_object_detection_tpu.train.sgd import init_velocity
    import dataclasses

    base = tiny_yolo_voc(width=32, height=32)
    spec = dataclasses.replace(
        base, net=dataclasses.replace(base.net, batch=128,
                                      subdivisions=1))
    # the chain plans on this geometry (P=4 pair 0 + P=2 pair 1)
    assert PT.supported_chain(spec.layers[0], spec.layers[2], 128)
    params = jax.tree.map(jnp.asarray, init_params(spec, seed=0))
    x = jnp.asarray(np.random.RandomState(0).rand(
        128, 32, 32, 3).astype(np.float32))
    t = np.zeros((128, 30, 5), np.float32)
    t[:, 0] = [0.5, 0.5, 0.4, 0.4, 2]
    t = jnp.asarray(t)
    rng = jax.random.PRNGKey(0)
    losses = {}
    for pt in (False, "chain"):
        st = TrainState(params, init_velocity(params), jnp.asarray(0))
        step = jax.jit(make_train_step(spec, compute_dtype=jnp.bfloat16,
                                       phase_train=pt))
        st, m1 = step(st, x, t, rng)
        _, m2 = step(st, x, t, rng)
        losses[pt] = (float(m1["loss"]), float(m2["loss"]))
    assert abs(losses["chain"][0] - losses[False][0]) \
        <= 0.03 * abs(losses[False][0]) + 0.05
    assert losses["chain"][1] < losses["chain"][0]
