"""Batch-1 fused stem (kernels/b1_stem.py) vs the XLA inference chain.

The kernel owns [conv3x3(s1,p1)+bias+leaky -> maxpool2x2/2] pairs in a
flat channels-first layout at batch 1. The math is the same bf16
conv->bias->leaky->max as the production path (conv MXU-accumulated in
f32 both ways), so the outputs must agree to bf16 resolution.

Pallas runs in interpreter mode on CPU here; the TPU A/B is a perf
measurement recorded in PARITY.md.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

import sr_object_detection_tpu.kernels.b1_stem as BS
from sr_object_detection_tpu.graph import spec as S
from sr_object_detection_tpu.graph.compiler import CompiledNetwork
from sr_object_detection_tpu.infer.engine import (LatencyEngine,
                                                  fold_params_for_inference)
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.models.zoo import CfgBuilder, tiny_yolo_voc


@pytest.fixture(autouse=True)
def _interpret():
    BS._INTERPRET = True
    yield
    BS._INTERPRET = False


def test_stem_matches_xla_chain():
    spec = tiny_yolo_voc(width=128, height=128)
    params = init_params(spec, seed=0)
    fp, fs = fold_params_for_inference(spec, params, jnp.bfloat16)

    pairs = BS.plan_pairs(fs)
    assert len(pairs) == 4          # conv16/32/64/128 + pools
    stem, n = BS.build_stem(fs, fp)
    assert n == 8

    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 1, (1, 128, 128, 3)),
        jnp.float32)
    got = np.asarray(jax.jit(stem)(x), np.float32)

    fwd = CompiledNetwork(fs, compute_dtype=jnp.bfloat16).forward
    _, aux = jax.jit(lambda p, v: fwd(p, v, keep_all=True))(fp, x)
    ref = np.asarray(aux["outputs"][n - 1], np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_latency_engine_fused_stem_end_to_end():
    spec = tiny_yolo_voc(width=128, height=128)
    params = init_params(spec, seed=0)
    base = LatencyEngine(spec, params, dtype=jnp.bfloat16)
    fused = LatencyEngine(spec, params, dtype=jnp.bfloat16,
                          fused_stem=True)
    assert fused.fused_stem
    # compare the raw network forward (post-top-k candidate ORDER is
    # tie-unstable at bf16, so engine() outputs can permute)
    x = jnp.asarray(np.random.RandomState(1).uniform(
        0, 1, (1, 128, 128, 3)), jnp.bfloat16)
    o1, _ = jax.jit(base._fwd)(base.params, x)
    o2, _ = jax.jit(fused._fwd)(fused.params, x)
    # tap-dot f32 accumulation ORDER differs from XLA's conv reduction
    # order -> 1-ulp bf16 stem diffs amplify to ~2e-4 at the head;
    # det-level acceptance is the mAP gate (test_map_parity)
    np.testing.assert_allclose(np.asarray(o1, np.float32),
                               np.asarray(o2, np.float32),
                               rtol=0, atol=1e-3)


def test_plan_rejects_non_stem_shapes():
    b = CfgBuilder()
    b.net(batch=1, width=32, height=32, channels=3)
    b.conv(16, size=3, stride=2)        # stride 2: not a fusable pair
    b.maxpool()
    b.conv(8, size=1, bn=False, act="linear", pad=1)
    spec = b.build()
    fp, fs = fold_params_for_inference(spec, init_params(spec, seed=0),
                                       jnp.bfloat16)
    assert BS.plan_pairs(fs) == []
    assert BS.build_stem(fs, fp) == (None, 0)


def test_truncate_spec_shifts_route_indices():
    from sr_object_detection_tpu.models.zoo import yolov2
    spec = yolov2(width=128, height=128)
    n = 4   # strip two (conv,pool) pairs
    sub = BS.truncate_spec(spec, n)
    assert sub.net.h == spec.layers[n].h
    assert sub.net.c == spec.layers[n].c
    for orig, moved in zip(spec.layers[n:], sub.layers):
        if isinstance(orig, S.RouteSpec):
            assert moved.layers == tuple(j - n for j in orig.layers)
        if isinstance(orig, S.ShortcutSpec):
            assert moved.from_index == orig.from_index - n


def test_best_latency_engine_measures_fused_candidate():
    """The serving-default helper must include the fused-stem engine in
    its measured candidates and carry the measurement in .selection."""
    from sr_object_detection_tpu.infer.engine import best_latency_engine
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    calib = np.random.RandomState(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    eng = best_latency_engine(spec, params, int8_calib=calib, reps=2)
    assert "bf16_ms" in eng.selection and "fused_ms" in eng.selection
    assert eng.selection["chosen"] in ("bf16", "fused", "int8")


def test_fused_stem_det_for_det():
    """Detection-level gate for the fused-stem serving default (the
    analog of the int8 mAP gate, sized for CI): over a batch of random
    frames, the thresholded detections of the fused engine must match
    the plain bf16 engine det-for-det (same classes, boxes within bf16
    noise)."""
    spec = tiny_yolo_voc(width=128, height=128)
    params = init_params(spec, seed=0)
    base = LatencyEngine(spec, params, dtype=jnp.bfloat16)
    fused = LatencyEngine(spec, params, dtype=jnp.bfloat16,
                          fused_stem=True)
    rng = np.random.RandomState(7)
    for _ in range(4):
        frame = rng.randint(0, 255, base.frame_shape, np.uint8)
        b0, p0 = (np.asarray(t, np.float32) for t in base(frame))
        b1, p1 = (np.asarray(t, np.float32) for t in fused(frame))

        def dets(bx, pr, thr=0.15):
            keep = pr.max(-1) > thr
            cls = pr.argmax(-1)[keep]
            order = np.lexsort(np.round(bx[keep], 3).T)
            return cls[order], bx[keep][order]
        c0, g0 = dets(b0, p0)
        c1, g1 = dets(b1, p1)
        assert len(c0) == len(c1)
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_allclose(g0, g1, atol=5e-3)
