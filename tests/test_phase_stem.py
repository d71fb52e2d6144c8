"""Phase-split fused int8 stem (kernels/phase_stem.py) vs the XLA int8
chain of infer/quant.py.

The kernel claims BIT-EXACTNESS: the 2x2 pool max runs on the raw s32
conv accumulators and the int8 epilogue (positive per-channel dequant,
+bias, leaky 0.1, round-clip requant) is monotone nondecreasing, so
max commutes through it. These tests pin int8-identical outputs on the
stem alone and on the full quantized engine (f32/u8 inputs, 128-batch
lane requirement, non-128 fallback).

Pallas runs in interpreter mode on CPU here; the TPU A/B perf numbers
are recorded in PARITY.md.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

import sr_object_detection_tpu.kernels.phase_stem as PS
from sr_object_detection_tpu.graph import spec as S
from sr_object_detection_tpu.infer.quant import (_conv_i8, _maxpool_q,
                                                 _requant,
                                                 quantize_for_inference)
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.models.zoo import tiny_yolo_voc


@pytest.fixture(autouse=True)
def _interpret():
    PS._INTERPRET = True
    yield
    PS._INTERPRET = False


def _synthetic_stem(H, W, Cs, seed=0):
    """Alternating conv3x3(leaky)/maxpool2x2 layers with random
    quantized params, mirroring infer.quant's per-layer contract."""
    rng = np.random.RandomState(seed)
    qparams, s_out, layers = [], {}, []
    h, w = H, W
    for i, (cin, cout) in enumerate(zip(Cs[:-1], Cs[1:])):
        w_q = rng.randint(-127, 128, (3, 3, cin, cout)).astype(np.int8)
        qparams.extend([
            {"weights": jnp.asarray(w_q),
             "dequant": jnp.asarray(
                 rng.uniform(1e-4, 2e-3, (cout,)).astype(np.float32)),
             "biases": jnp.asarray(
                 rng.uniform(-0.5, 0.5, (cout,)).astype(np.float32))},
            {}])
        s_out[2 * i] = float(rng.uniform(0.005, 0.02))
        s_out[2 * i + 1] = s_out[2 * i]
        layers.append(S.ConvSpec(
            index=2 * i, h=h, w=w, c=cin, inputs=h * w * cin, out_h=h,
            out_w=w, out_c=cout, outputs=h * w * cout, size=3, stride=1,
            pad=1, filters=cout, activation="leaky"))
        layers.append(S.MaxPoolSpec(
            index=2 * i + 1, h=h, w=w, c=cout, inputs=h * w * cout,
            out_h=h // 2, out_w=w // 2, out_c=cout,
            outputs=h * w * cout // 4, size=2, stride=2, pad=0))
        h, w = h // 2, w // 2
    spec = S.NetworkSpec(net=None, layers=tuple(layers), cfg_path=None)
    return spec, qparams, s_out


def _xla_chain(layers, qparams, s_out, in_scale, xq, n):
    if xq.dtype == jnp.uint8:
        cur = _requant(xq.astype(jnp.float32),
                       np.float32(1.0 / (255.0 * in_scale)))
    else:
        cur = _requant(xq.astype(jnp.float32), np.float32(1.0 / in_scale))
    for i, l in enumerate(layers[:n]):
        if isinstance(l, S.ConvSpec):
            y = _conv_i8(cur, qparams[i]["weights"], stride=1, pad=1)
            y = (y.astype(jnp.float32) * qparams[i]["dequant"]
                 + qparams[i]["biases"])
            y = jnp.where(y > 0, y, 0.1 * y)
            cur = _requant(y, np.float32(1.0 / s_out[i]))
        else:
            cur = _maxpool_q(cur, size=2, stride=2, pad=0)
    return cur


@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_stem_bit_exact_vs_xla_chain(dtype):
    in_scale = 1.0 / 127.0
    spec, qparams, s_out = _synthetic_stem(16, 16, [3, 16, 8])
    stem_fn, n = PS.build_phase_stem(spec, qparams, s_out, in_scale)
    assert n == 4

    rng = np.random.RandomState(1)
    x = (rng.randint(0, 256, (128, 16, 16, 3)).astype(np.uint8)
         if dtype == np.uint8
         else rng.uniform(0, 1, (128, 16, 16, 3)).astype(np.float32))
    got = np.asarray(jax.jit(stem_fn)(jnp.asarray(x)))
    ref = np.asarray(jax.jit(
        lambda v: _xla_chain(spec.layers, qparams, s_out, in_scale,
                             v, n))(jnp.asarray(x)))
    assert got.shape == ref.shape and got.dtype == np.int8
    np.testing.assert_array_equal(got, ref)


def test_stem_three_pairs_uneven_channels():
    # odd channel counts / 3 pairs: exercises the misaligned t*Cin tap
    # stores and the generic RP/NB planner
    in_scale = 1.0 / 100.0
    spec, qparams, s_out = _synthetic_stem(24, 24, [3, 5, 7, 6], seed=2)
    stem_fn, n = PS.build_phase_stem(spec, qparams, s_out, in_scale)
    assert n == 6
    x = np.random.RandomState(3).uniform(
        0, 1, (128, 24, 24, 3)).astype(np.float32)
    got = np.asarray(jax.jit(stem_fn)(jnp.asarray(x)))
    ref = np.asarray(jax.jit(
        lambda v: _xla_chain(spec.layers, qparams, s_out, in_scale,
                             v, n))(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_quantized_engine_phase_stem_exact():
    """Full engine: quantize_for_inference(phase_stem=True) output is
    bitwise identical to the plain int8 engine at batch 128, and the
    non-128 batch falls back to the XLA chain inside the same program."""
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    calib = np.random.RandomState(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)

    qn_ref = quantize_for_inference(spec, params, calib)
    qn_ps = quantize_for_inference(spec, params, calib, phase_stem=True)

    x = np.random.RandomState(1).uniform(
        0, 1, (128, 64, 64, 3)).astype(np.float32)
    out_ref = np.asarray(jax.jit(
        lambda v: qn_ref.forward(qn_ref.qparams, v))(jnp.asarray(x)))
    out_ps = np.asarray(jax.jit(
        lambda v: qn_ps.forward(qn_ps.qparams, v))(jnp.asarray(x)))
    np.testing.assert_array_equal(out_ps, out_ref)

    # batch != 128: the stem is skipped, the XLA chain runs
    x4 = x[:4]
    o4_ref = np.asarray(jax.jit(
        lambda v: qn_ref.forward(qn_ref.qparams, v))(jnp.asarray(x4)))
    o4_ps = np.asarray(jax.jit(
        lambda v: qn_ps.forward(qn_ps.qparams, v))(jnp.asarray(x4)))
    np.testing.assert_array_equal(o4_ps, o4_ref)


def test_phase_stem_planner_rejections():
    import dataclasses
    spec, _qp, _s = _synthetic_stem(16, 16, [3, 16, 8])
    # 1x1 first conv: no fusable pair
    bad = S.NetworkSpec(
        net=None,
        layers=(dataclasses.replace(spec.layers[0], size=1, pad=0),)
        + spec.layers[1:], cfg_path=None)
    assert PS.plan_pairs(bad) == []
    # a route back into the fused prefix kills the whole plan
    routed = S.NetworkSpec(
        net=None,
        layers=spec.layers + (S.RouteSpec(
            index=4, h=8, w=8, c=16, inputs=8 * 8 * 16, out_h=8,
            out_w=8, out_c=16, outputs=8 * 8 * 16, layers=(0,)),),
        cfg_path=None)
    assert PS.plan_pairs(routed) == []
    # 20px: third pair's pooled dims go odd -> planner stops at 2
    spec3, _, _ = _synthetic_stem(20, 20, [3, 4, 4, 4])
    assert len(PS.plan_pairs(spec3, max_pairs=3)) == 2


def test_column_chunking_and_prefix_truncation():
    """A tight VMEM budget forces (a) WS < WP in-kernel column chunks
    and (b) truncating the fused chain to the pairs that fit — both
    must stay bit-exact / consistent with the XLA chain."""
    in_scale = 1.0 / 127.0
    spec, qparams, s_out = _synthetic_stem(16, 16, [3, 16, 8])
    old = PS._VMEM_BUDGET
    try:
        PS._VMEM_BUDGET = 220 * 1024   # tiny: forces chunking/truncation
        stem_fn, n = PS.build_phase_stem(spec, qparams, s_out, in_scale)
        assert stem_fn is not None and n in (2, 4)
        x = np.random.RandomState(7).uniform(
            0, 1, (128, 16, 16, 3)).astype(np.float32)
        got = np.asarray(jax.jit(stem_fn)(jnp.asarray(x)))
        ref = np.asarray(jax.jit(
            lambda v: _xla_chain(spec.layers, qparams, s_out, in_scale,
                                 v, n))(jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)
    finally:
        PS._VMEM_BUDGET = old


def test_layout_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randint(-127, 128, (128, 8, 16, 3)).astype(np.int8)
    P = 4
    f = PS.to_phase(jnp.asarray(q), P)
    assert f.shape == (8 * 3, P * (16 // P + 2) * 128)
    back = np.asarray(PS.from_phase(f, 8, 16, 3, P))
    np.testing.assert_array_equal(back, q)
