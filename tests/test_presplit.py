"""Pre-split region decode contract (round-3): the engine emits
(fields, class-probs) tensors instead of the darknet-flat output —
exactness-pinned against the flat engine (which itself is pinned
det-for-det against the C oracle via tests/test_parity.py /
tests/golden/detect_tree_nomap.npz semantics, region_layer.c:328-379).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sr_object_detection_tpu.infer.engine import ThroughputEngine
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.models.zoo import tiny_yolo_voc, yolov2


def _reassemble(fields, cls):
    """Host-side darknet field order: [x,y,w,h,obj | classes]."""
    return np.concatenate([np.asarray(fields, np.float32),
                           np.asarray(cls, np.float32)], axis=-1)


def _flat_vs_presplit(spec, params, x, atol):
    flat = ThroughputEngine(spec, params, batch=x.shape[0],
                            dtype=jnp.float32)
    pre = ThroughputEngine(spec, params, batch=x.shape[0],
                           dtype=jnp.float32, presplit=True)
    assert pre.presplit, "presplit engine did not engage"
    out_flat = np.asarray(flat._run(flat.params, jnp.asarray(x)))
    fields, cls = pre._run(pre.params, jnp.asarray(x))
    region = spec.layers[-1]
    nf = region.coords + region.classes + 1
    got = _reassemble(fields, cls)
    want = out_flat.reshape(got.shape[0], region.h, region.w,
                            region.n, nf)
    np.testing.assert_allclose(got, want, atol=atol)


def test_presplit_matches_flat_tiny_yolo():
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    x = np.random.RandomState(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    # zero-padded extra head channels are exact: same conv, same math
    _flat_vs_presplit(spec, params, x, atol=1e-5)


def test_presplit_matches_flat_yolov2():
    spec = yolov2(width=96, height=96)
    params = init_params(spec, seed=1)
    x = np.random.RandomState(1).uniform(
        0, 1, (2, 96, 96, 3)).astype(np.float32)
    _flat_vs_presplit(spec, params, x, atol=1e-5)


def test_presplit_matches_flat_tree():
    """Tree head (yolo9000 structure at 64 px): grouped softmax on the
    pre-split class tensor must match the flat engine's."""
    from sr_object_detection_tpu.models.zoo import yolo9000
    spec = yolo9000(width=64, height=64,
                    tree_file="/root/reference/cfg/9k.tree",
                    map_file=None)
    from sr_object_detection_tpu.io.weights import fast_init_params
    params = fast_init_params(spec, seed=0)
    x = np.random.RandomState(2).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    _flat_vs_presplit(spec, params, x, atol=2e-5)


def test_detector_presplit_det_for_det(tmp_path):
    """Detector(presplit=True) returns the same boxes/probs as the
    standard Detector on the trained map_ab fixture (BN folding is the
    only arithmetic difference — tolerance covers it)."""
    import pathlib
    golden = pathlib.Path(__file__).parent / "golden" / "map_ab.npz"
    if not golden.exists():
        pytest.skip("map_ab golden not generated")
    g = np.load(golden)
    cfg = tmp_path / "net.cfg"
    cfg.write_text(bytes(g["cfg"]).decode())
    w = tmp_path / "w.weights"
    w.write_bytes(bytes(g["weights"]))
    from sr_object_detection_tpu.infer.detector import Detector
    d0 = Detector(str(cfg), str(w))
    d1 = Detector(str(cfg), str(w), presplit=True)
    x = np.random.RandomState(3).uniform(
        0, 1, (2, d0.spec.net.h, d0.spec.net.w, 3)).astype(np.float32)
    b0, p0 = jax.tree.map(np.asarray, d0.predict_batch(jnp.asarray(x)))
    b1, p1 = jax.tree.map(np.asarray, d1.predict_batch(jnp.asarray(x)))
    np.testing.assert_allclose(b0, b1, atol=1e-3)
    np.testing.assert_allclose(p0, p1, atol=1e-3)


def test_presplit_noop_without_region():
    """Classifier specs keep the flat contract (presplit silently off)."""
    from sr_object_detection_tpu.models.zoo import darknet19
    spec = darknet19(width=64, height=64, classes=100)
    params = init_params(spec, seed=0)
    eng = ThroughputEngine(spec, params, batch=1, dtype=jnp.float32,
                           presplit=True)
    assert not eng.presplit
    out = eng._run(eng.params, jnp.zeros((1, 64, 64, 3)))
    assert not isinstance(out, tuple)


def test_presplit_int8_matches_flat_int8():
    """int8 trunk + presplit head: same numbers as int8 flat (the
    decode-boundary and quantization optimizations stack for yolo9000
    serving)."""
    from sr_object_detection_tpu.infer.quant import (
        quantize_for_inference)
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(5)
    calib = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    q_flat = quantize_for_inference(spec, params, calib)
    q_pre = quantize_for_inference(spec, params, calib, presplit=True)
    flat = np.asarray(q_flat.forward(q_flat.qparams, jnp.asarray(x)))
    fields, cls = q_pre.forward(q_pre.qparams, jnp.asarray(x))
    region = spec.layers[-1]
    nf = region.coords + region.classes + 1
    got = _reassemble(fields, cls)
    want = flat.reshape(got.shape[0], region.h, region.w, region.n, nf)
    np.testing.assert_allclose(got, want, atol=2e-5)


def _slice_flat_cls(cls_flat, region):
    """Consumer-side contract: class probs live at
    [a*block+128 : a*block+128+classes] per anchor."""
    blk = region.head_block
    cf = np.asarray(cls_flat, np.float32)
    return np.stack([cf[..., a * blk + 128:a * blk + 128 + region.classes]
                     for a in range(region.n)], axis=3)


def _flat_vs_presplit_flat(spec, params, x, atol):
    """presplit='flat' (no 5-D class view) vs presplit=True: fields
    equal; class probs equal after the consumer slice. Not bitwise —
    the flat path uses the row max over the whole A*block row as the
    shared softmax offset (mathematically identity-equal, different
    rounding)."""
    pre = ThroughputEngine(spec, params, batch=x.shape[0],
                           dtype=jnp.float32, presplit=True)
    fla = ThroughputEngine(spec, params, batch=x.shape[0],
                           dtype=jnp.float32, presplit="flat")
    assert fla.presplit and fla.spec.layers[-1].presplit_flat
    f0, c0 = jax.tree.map(np.asarray, pre._run(pre.params,
                                               jnp.asarray(x)))
    f1, cf = fla._run(fla.params, jnp.asarray(x))
    region = fla.spec.layers[-1]
    assert np.asarray(cf).shape[-1] == region.n * region.head_block
    c1 = _slice_flat_cls(cf, region)
    np.testing.assert_allclose(np.asarray(f1), f0, atol=atol)
    np.testing.assert_allclose(c1, c0, atol=atol)


def test_presplit_flat_matches_presplit_tiny_yolo():
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    x = np.random.RandomState(6).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    _flat_vs_presplit_flat(spec, params, x, atol=1e-5)


def test_presplit_flat_matches_presplit_tree():
    """yolo9000 structure: the extended-gid flat grouped softmax (junk
    lanes masked into their own groups) must reproduce the 5-D tree
    softmax after the consumer slice."""
    from sr_object_detection_tpu.models.zoo import yolo9000
    from sr_object_detection_tpu.io.weights import fast_init_params
    spec = yolo9000(width=64, height=64,
                    tree_file="/root/reference/cfg/9k.tree",
                    map_file=None)
    params = fast_init_params(spec, seed=0)
    x = np.random.RandomState(7).uniform(
        0, 1, (1, 64, 64, 3)).astype(np.float32)
    _flat_vs_presplit_flat(spec, params, x, atol=2e-5)


def test_presplit_flat_int8_full_stack():
    """The quantized engine serves the flat contract too (int8 trunk +
    qhead + flat decode): class probs match the 5-D presplit int8
    path after the consumer slice."""
    from sr_object_detection_tpu.infer.quant import (
        quantize_for_inference)
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(8)
    calib = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    q_pre = quantize_for_inference(spec, params, calib, presplit=True,
                                   quantize_head=True)
    q_fla = quantize_for_inference(spec, params, calib, presplit="flat",
                                   quantize_head=True)
    f0, c0 = jax.tree.map(np.asarray,
                          q_pre.forward(q_pre.qparams, jnp.asarray(x)))
    f1, cf = q_fla.forward(q_fla.qparams, jnp.asarray(x))
    region = q_fla.spec.layers[-1]
    c1 = _slice_flat_cls(cf, region)
    np.testing.assert_allclose(np.asarray(f1), f0, atol=2e-5)
    np.testing.assert_allclose(c1, c0, atol=2e-5)
