"""End-to-end integration: train a detector on synthetic data until it
finds objects; yolo9000 graph with the real 9k tree; drawing; transfer."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sr_object_detection_tpu.config import parse_cfg_text
from sr_object_detection_tpu.graph import spec as S
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.models.zoo import CfgBuilder
from sr_object_detection_tpu.train.trainer import Trainer


def _toy_det_spec(batch=8):
    b = CfgBuilder()
    b.net(batch=batch, subdivisions=1, width=48, height=48, channels=3,
          learning_rate=0.002, momentum=0.9, decay=0.0005,
          policy="constant", max_batches=10000)
    b.conv(16, size=3, stride=2)
    b.conv(32, size=3, stride=2)
    b.conv(32, size=3, stride=2)
    b.conv(12, size=1, bn=False, act="linear", pad=1)
    b.section("region", anchors=(1.5, 1.5, 4, 4), bias_match=1, classes=1,
              coords=4, num=2, softmax=1, rescore=1, object_scale=5,
              noobject_scale=1, class_scale=1, coord_scale=1, thresh=.6)
    return b.build()


def _toy_batch(rng, n):
    """White squares on dark noise; one box per image."""
    x = rng.random((n, 48, 48, 3)).astype(np.float32) * 0.2
    truth = np.zeros((n, 30, 5), np.float32)
    for i in range(n):
        cx, cy = rng.uniform(0.25, 0.75, 2)
        s = rng.uniform(0.2, 0.4)
        x0, x1 = int((cx - s / 2) * 48), int((cx + s / 2) * 48)
        y0, y1 = int((cy - s / 2) * 48), int((cy + s / 2) * 48)
        x[i, y0:y1, x0:x1] = 0.95
        truth[i, 0] = [cx, cy, s, s, 0]
    return x, truth


def test_detector_training_learns_synthetic_boxes():
    spec = _toy_det_spec()
    trainer = Trainer(spec, seed=0)
    rng = np.random.default_rng(0)
    first_iou = None
    for step in range(150):
        x, t = _toy_batch(rng, 8)
        m = trainer.step(x, t)
        if step == 10:
            first_iou = float(m["avg_iou"])
    final_iou = float(m["avg_iou"])
    assert final_iou > first_iou + 0.1, (first_iou, final_iou)
    assert final_iou > 0.45, final_iou
    assert float(m["recall"]) > 0.5

    # ---- end-to-end evaluation: decode + NMS + VOC mAP on held-out
    # synthetic images (the full detector valid loop in miniature) ----
    from sr_object_detection_tpu.graph.compiler import build_forward
    from sr_object_detection_tpu.ops import boxes as B
    from sr_object_detection_tpu.eval.voc import mean_ap
    fwd = build_forward(spec)
    params = trainer.state.params
    region = spec.layers[-1]
    anchors = np.asarray(region.anchors).reshape(region.n, 2)

    eval_rng = np.random.default_rng(999)
    dets, gts = [], {}
    for img_id in range(12):
        x, t = _toy_batch(eval_rng, 1)
        out = jax.jit(lambda p, v: fwd(p, v)[0])(params, x)
        acts = np.asarray(out).reshape(1, region.h, region.w, region.n,
                                       region.classes + 5)
        boxes = np.asarray(B.decode_region_boxes(
            jnp.asarray(acts), anchors, img_w=1.0, img_h=1.0)
        ).reshape(-1, 4)
        probs = (acts[..., 4:5] * acts[..., 5:]).reshape(-1, 1)
        probs = np.where(probs > 0.2, probs, 0.0)
        probs = np.asarray(B.nms_sort_topk(
            jnp.asarray(boxes), jnp.asarray(probs), 0.45))
        key = f"im{img_id}"
        for i in np.nonzero(probs[:, 0] > 0)[0]:
            x0 = (boxes[i, 0] - boxes[i, 2] / 2) * 48
            y0 = (boxes[i, 1] - boxes[i, 3] / 2) * 48
            x1 = (boxes[i, 0] + boxes[i, 2] / 2) * 48
            y1 = (boxes[i, 1] + boxes[i, 3] / 2) * 48
            dets.append((key, float(probs[i, 0]), x0, y0, x1, y1))
        gx, gy, gw, gh = t[0, 0, :4]
        gts[key] = {"boxes": [[(gx - gw / 2) * 48, (gy - gh / 2) * 48,
                               (gx + gw / 2) * 48, (gy + gh / 2) * 48]]}
    m_ap, _ = mean_ap({"thing": dets}, {"thing": gts})
    assert m_ap > 0.5, f"synthetic mAP too low: {m_ap}"


@pytest.mark.skipif(not os.path.exists("/root/reference/cfg/9k.tree"),
                    reason="9k tree asset unavailable")
def test_yolo9000_inference_graph_with_real_tree():
    from sr_object_detection_tpu.models.zoo import yolo9000
    from sr_object_detection_tpu.graph.compiler import CompiledNetwork
    from sr_object_detection_tpu.io.tree import read_tree
    spec = yolo9000(width=160, height=160,
                    tree_file="/root/reference/cfg/9k.tree",
                    map_file="/root/reference/cfg/coco9k.map")
    tree = read_tree("/root/reference/cfg/9k.tree", pad_to=9418)
    assert tree.n == 9418   # truncated file padded to declared classes
    net = CompiledNetwork(spec)
    params = init_params(spec, seed=0)
    x = np.zeros((1, 160, 160, 3), np.float32)
    out, _ = net.forward(params, x)
    assert out.shape[1] == spec.layers[-1].outputs // \
        (spec.layers[-1].h * spec.layers[-1].w) * \
        spec.layers[-1].h * spec.layers[-1].w
    o = np.asarray(out).reshape(-1, 9418 + 5)
    # tree-grouped softmax: each sibling group sums to 1; total class
    # mass equals the number of groups
    assert np.isfinite(o).all()
    gsum = o[0, 5:].sum()
    assert abs(gsum - len(tree.group_size)) < 2.0


def test_transfer_surgery():
    from sr_object_detection_tpu.io import surgery
    spec = _toy_det_spec()
    a = init_params(spec, seed=0)
    b = init_params(spec, seed=1)
    merged, copied = surgery.transfer(a, spec, spec, b)
    assert copied >= 4
    np.testing.assert_allclose(merged[0]["weights"], a[0]["weights"])


def test_draw_detections():
    from sr_object_detection_tpu.ops.draw import draw_detections, \
        class_color
    from sr_object_detection_tpu.infer.detector import Detection
    im = np.zeros((100, 100, 3), np.float32)
    dets = [Detection((0.5, 0.5, 0.4, 0.4), 3, 0.9)]
    out = draw_detections(im, dets, classes=20)
    assert out.sum() > 0
    assert (out != im).any()
    c = class_color(3, 20)
    assert c.shape == (3,) and (c >= 0).all() and (c <= 1).all()


def test_resume_continuity(tmp_path):
    """Checkpoint/resume restores params, momentum AND the LR-schedule
    position (the reference loses velocity on restart; we keep it)."""
    from sr_object_detection_tpu.io import checkpoint as ckpt
    rng = np.random.default_rng(3)
    spec = _toy_det_spec()

    t1 = Trainer(spec, seed=0)
    batches = [_toy_batch(rng, 8) for _ in range(6)]
    for x, t in batches[:3]:
        t1.step(x, t)
    p = str(tmp_path / "state.npz")
    ckpt.save_train_state(p, t1.state)
    for x, t in batches[3:]:
        m_ref = t1.step(x, t)

    t2 = Trainer(spec, seed=0)
    t2.state = ckpt.load_train_state(p, t2.state)
    assert int(t2.state.seen) == 3 * 8
    for x, t in batches[3:]:
        m_res = t2.step(x, t)
    np.testing.assert_allclose(float(m_res["loss"]), float(m_ref["loss"]),
                               rtol=1e-4)
    a = jax.tree.map(np.asarray, t1.state.params)
    b = jax.tree.map(np.asarray, t2.state.params)
    for pa, pb in zip(a, b):
        for k in pa:
            np.testing.assert_allclose(pa[k], pb[k], rtol=1e-5, atol=1e-6)


def test_multiscale_trainer_buckets():
    """random=1 multi-scale: the trainer compiles one step per
    resolution bucket and shares state across them (detector.c:91-109 +
    resize_network analog)."""
    spec = _toy_det_spec()
    trainer = Trainer(spec, seed=0)
    rng = np.random.default_rng(0)
    x48, t48 = _toy_batch(rng, 8)
    m1 = trainer.step(x48, t48)
    # a different resolution: rebuild batch at 64px
    x64 = np.zeros((8, 64, 64, 3), np.float32)
    for i in range(8):
        x64[i, 16:48, 16:48] = x48[i][:32, :32]
    m2 = trainer.step(x64, t48)
    assert np.isfinite(float(m2["loss"]))
    # back to 48: cached step, seen keeps increasing
    m3 = trainer.step(x48, t48)
    assert int(trainer.state.seen) == 24
    assert len(trainer._steps) == 2


def test_nan_guard_skips_nonfinite_updates():
    from sr_object_detection_tpu.train.trainer import (make_train_step,
        TrainState, nan_guarded)
    from sr_object_detection_tpu.train.sgd import init_velocity
    spec = _toy_det_spec()
    params = jax.tree.map(jnp.asarray, init_params(spec, 0))
    state = TrainState(params, init_velocity(params), jnp.asarray(0))
    step = jax.jit(nan_guarded(make_train_step(spec)))
    rng = np.random.default_rng(0)
    x, t = _toy_batch(rng, 8)
    s1, m1 = step(state, x, t, jax.random.PRNGKey(0))
    assert not bool(m1["skipped_nonfinite"])
    s2, m2 = step(s1, np.full_like(x, np.nan), t, jax.random.PRNGKey(0))
    assert bool(m2["skipped_nonfinite"])
    np.testing.assert_allclose(np.asarray(s2.params[0]["weights"]),
                               np.asarray(s1.params[0]["weights"]))
