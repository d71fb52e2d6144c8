"""int8 post-training-quantization path: numeric fidelity vs the f32
forward, scale propagation through pool/route/reorg, and engine wiring.

The quantization scheme is symmetric per-channel (weights) / calibrated
per-layer (activations); there is no reference counterpart (the
reference's only low-precision mode is XNOR binarization) so the oracle
here is our own f32 forward.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sr_object_detection_tpu.graph.compiler import CompiledNetwork
from sr_object_detection_tpu.infer.quant import (
    QuantizedThroughputEngine, quantize_for_inference)
from sr_object_detection_tpu.infer.engine import fold_params_for_inference
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.models.zoo import tiny_yolo_voc, yolov2


def _f32_region_out(spec, params, x):
    params_f, fspec = fold_params_for_inference(spec, params,
                                                dtype=jnp.float32)
    net = CompiledNetwork(fspec, compute_dtype=None)
    out, _ = net.forward(jax.tree.map(jnp.asarray, params_f),
                         jnp.asarray(x))
    return np.asarray(out)


def _compare(spec, params, x, *, fields_tol):
    ref = _f32_region_out(spec, params, x)
    qnet = quantize_for_inference(spec, params, x)
    got = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(x)))
    assert got.shape == ref.shape
    # region output is [row][col][anchor][(x,y,w,h,obj,cls...)] flat;
    # activated fields are bounded (logistic/softmax) so absolute error
    # is the meaningful metric
    r = spec.layers[-1]
    nf = r.coords + r.classes + 1
    reff = ref.reshape(-1, nf)
    gotf = got.reshape(-1, nf)
    err = np.abs(reff - gotf)
    # x,y (logistic), obj (logistic), classes (softmax): absolute
    for name, cols, tol in fields_tol:
        e = err[:, cols].mean()
        assert e < tol, f"{name}: mean abs err {e} >= {tol}"


def test_tiny_yolo_int8_matches_f32():
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(1)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    _compare(spec, params, x, fields_tol=[
        ("xy", [0, 1], 0.02), ("obj", [4], 0.02),
        ("cls", list(range(5, 25)), 0.01)])


def test_yolov2_route_reorg_int8():
    # yolov2 topology exercises reorg + 2-source route scale matching
    spec = yolov2(width=128, height=128)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)
    _compare(spec, params, x, fields_tol=[
        ("xy", [0, 1], 0.03), ("obj", [4], 0.03),
        ("cls", list(range(5, 85)), 0.01)])


def test_quant_scale_propagation():
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    x = np.random.RandomState(3).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32)
    qnet = quantize_for_inference(spec, params, x)
    from sr_object_detection_tpu.graph import spec as S
    for i, l in enumerate(qnet.spec.layers):
        if isinstance(l, S.MaxPoolSpec):
            # pool preserves its producer's scale exactly
            assert qnet.act_scales[i] == qnet.act_scales[i - 1]
    # head conv + region are f32-domain (scale sentinel)
    assert qnet.act_scales[len(qnet.spec.layers) - 2] == -1.0


def test_quant_engine_runs():
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    eng = QuantizedThroughputEngine(spec, params, batch=2)
    eng.warmup()
    out = np.asarray(eng(jnp.zeros((2, 64, 64, 3), jnp.float32)))
    assert np.all(np.isfinite(out))


def test_int8_map_delta(tmp_path):
    """Accuracy gate for the int8 serving mode: on the synthetic VOC
    A/B set (the BASELINE.md mAP fixture), int8 mAP stays within 0.05
    of our own f32 mAP."""
    import pathlib
    golden = pathlib.Path(__file__).parent / "golden" / "map_ab.npz"
    if not golden.exists():
        pytest.skip("map_ab golden not generated")
    g = np.load(golden)
    from tools.synth_dataset import (make_dataset, gt_corner_boxes,
                                     N_CLASSES)
    from sr_object_detection_tpu.eval.voc import mean_ap, voc_det_lines
    from sr_object_detection_tpu.infer.detector import Detector
    from sr_object_detection_tpu.ops import boxes as B
    from sr_object_detection_tpu.ops.image import load_image_rgb

    data_dir = tmp_path / "data"
    list_path, gt = make_dataset(str(data_dir), int(g["n_images"]),
                                 int(g["seed"]))
    cfg_file = tmp_path / "net.cfg"
    cfg_file.write_text(bytes(g["cfg"]).decode())
    wfile = tmp_path / "w.weights"
    wfile.write_bytes(bytes(g["weights"]))

    paths = [l.strip() for l in open(list_path) if l.strip()]
    det_f32 = Detector(str(cfg_file), str(wfile))
    calib = np.stack([det_f32.preprocess(load_image_rgb(p))
                      for p in paths[:8]])
    det_i8 = Detector(str(cfg_file), str(wfile), int8_calib=calib)

    thresh, nms = float(g["thresh"]), float(g["nms"])
    names = [str(c) for c in range(N_CLASSES)]

    def run_map(det):
        import jax.numpy as jnp
        per_class = {c: [] for c in range(N_CLASSES)}
        for path in paths:
            img = load_image_rgb(path)
            ih, iw = img.shape[:2]
            x = det.preprocess(img)[None]
            boxes, probs = det.predict_batch(jnp.asarray(x), thresh=thresh)
            boxes, probs = np.asarray(boxes[0]), np.asarray(probs[0])
            probs = np.asarray(B.nms_sort_topk(
                jnp.asarray(boxes), jnp.asarray(probs), nms, k=len(boxes)))
            lines = voc_det_lines(pathlib.Path(path).stem, boxes, probs,
                                  names, iw, ih)
            for c in range(N_CLASSES):
                for line in lines[names[c]]:
                    f = line.split()
                    per_class[c].append((f[0], *map(float, f[1:6])))
        m, _ = mean_ap(per_class, gt_corner_boxes(gt))
        return m

    map_f32 = run_map(det_f32)
    map_i8 = run_map(det_i8)
    print(f"mAP f32={map_f32:.4f} int8={map_i8:.4f}")
    assert map_f32 > 0.2          # not vacuous
    assert abs(map_i8 - map_f32) <= 0.05, (
        f"int8 mAP drifted: {map_i8:.4f} vs f32 {map_f32:.4f}")


def test_int8_latency_engine_matches_bf16_decode():
    from sr_object_detection_tpu.infer.engine import LatencyEngine
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(4)
    calib = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    frame = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    e_f = LatencyEngine(spec, params, dtype=jnp.float32)
    e_q = LatencyEngine(spec, params, int8_calib=calib)
    bf, pf = jax.tree.map(np.asarray, e_f(frame))
    bq, pq = jax.tree.map(np.asarray, e_q(frame))
    assert bf.shape == bq.shape and pf.shape == pq.shape
    # top candidate geometry agrees to quantization tolerance
    assert np.all(np.isfinite(bq)) and np.all(np.isfinite(pq))
    assert abs(float(pf.max()) - float(pq.max())) < 0.05


def test_int8_classifier_float_tail():
    """Classifier topologies (darknet19: conv trunk + avgpool + softmax)
    run an int8 trunk with a float tail; probabilities stay within
    quantization tolerance of the f32 forward."""
    from sr_object_detection_tpu.models.zoo import darknet19
    spec = darknet19(width=128, height=128, classes=100)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(5)
    x = rng.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)

    ref = _f32_region_out(spec, params, x)      # full f32 forward
    qnet = quantize_for_inference(spec, params, x)
    got = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(x)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got.sum(axis=-1), 1.0, atol=1e-2)
    assert np.abs(got - ref).mean() < 1e-3      # softmax probs
    # the trunk is genuinely quantized (int8 weights present)
    assert any("dequant" in p for p in qnet.qparams if p)


def test_uint8_input_matches_f32():
    """Raw-u8 frame input (cameras) folds /255 into the input quant;
    results match the f32 [0,1] input path to rounding tolerance."""
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(6)
    u8 = rng.randint(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    qnet = quantize_for_inference(spec, params, f32)
    out_f = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(f32)))
    out_u = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(u8)))
    # identical int8 input codes except float-rounding knife-edges
    assert np.abs(out_f - out_u).mean() < 1e-3


def test_calibration_file_roundtrip(tmp_path):
    """save_calib/load_calib: calibrate once, reuse across restarts —
    a path passed as calib_x behaves exactly like the array."""
    from sr_object_detection_tpu.infer.quant import save_calib, load_calib
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(7)
    x = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    p = str(tmp_path / "calib.npz")
    save_calib(p, x)
    np.testing.assert_array_equal(load_calib(p), x)
    q_arr = quantize_for_inference(spec, params, x)
    q_file = quantize_for_inference(spec, params, p)
    assert q_arr.act_scales == q_file.act_scales
    probe = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(q_arr.forward(q_arr.qparams, jnp.asarray(probe))),
        np.asarray(q_file.forward(q_file.qparams, jnp.asarray(probe))))


def test_input_amax_floored_for_u8_range():
    """A dim calibration batch (amax < 1) must not make full-brightness
    u8 pixels saturate the input quant: the input amax is floored at
    1.0 so code 255 maps inside the int8 range."""
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    dim = np.full((2, 64, 64, 3), 0.25, np.float32)   # amax = 0.25
    qnet = quantize_for_inference(spec, params, dim)
    bright_u8 = np.full((1, 64, 64, 3), 255, np.uint8)
    bright_f = np.ones((1, 64, 64, 3), np.float32)
    out_u = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(bright_u8)))
    out_f = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(bright_f)))
    # u8-255 and f32-1.0 agree (neither clipped relative to the other)
    assert np.abs(out_u - out_f).mean() < 1e-3


def test_quantized_head_matches_f32():
    """quantize_head=True runs the head conv in int8 (int8 x int8 ->
    int32 MXU, f32 dequant epilogue). The logits take only input/weight
    quantization error — activated fields stay within the same
    tolerance band as the trunk-only int8 path (the yolo9000 serving
    lever; mAP-gated in test_map_parity.py)."""
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(8)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = _f32_region_out(spec, params, x)
    qnet = quantize_for_inference(spec, params, x, quantize_head=True)
    got = np.asarray(qnet.forward(qnet.qparams, jnp.asarray(x)))
    assert got.shape == ref.shape
    r = spec.layers[-1]
    nf = r.coords + r.classes + 1
    err = np.abs(ref.reshape(-1, nf) - got.reshape(-1, nf))
    assert err[:, [0, 1, 4]].mean() < 0.03      # xy + obj (logistic)
    assert err[:, 5:].mean() < 0.01             # class softmax
    # the head conv is genuinely int8 (dequant epilogue present)
    head = len(qnet.spec.layers) - 2
    assert "dequant" in qnet.qparams[head]


def test_region_dtype_bf16_decode_close():
    """region_dtype=bf16 runs the [region] decode (logistic + softmax)
    in bf16 — halves the class-tensor HBM traffic at the yolo9000
    boundary. Activated outputs stay within bf16 rounding of the f32
    decode."""
    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(9)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    q_f = quantize_for_inference(spec, params, x)
    q_b = quantize_for_inference(spec, params, x,
                                 region_dtype=jnp.bfloat16)
    out_f = np.asarray(q_f.forward(q_f.qparams, jnp.asarray(x)),
                       np.float32)
    out_b = np.asarray(q_b.forward(q_b.qparams, jnp.asarray(x)),
                       np.float32)
    # bounded activations: bf16 has ~3 decimal digits
    assert np.abs(out_f - out_b).mean() < 5e-3


def test_quant_rejects_unsupported():
    from sr_object_detection_tpu.models.zoo import cifar_small
    spec = cifar_small(batch=1)
    params = init_params(spec, seed=0)
    x = np.zeros((1, spec.net.h, spec.net.w, spec.net.c), np.float32)
    with pytest.raises(NotImplementedError):
        quantize_for_inference(spec, params, x)
