"""Vectorized TPU ops vs pure-numpy darknet oracles."""

import numpy as np
import pytest

import darknet_oracle as oracle

from sr_object_detection_tpu.ops import layout as L
from sr_object_detection_tpu.ops import pooling as P
from sr_object_detection_tpu.ops import image as I
from sr_object_detection_tpu.ops import boxes as B


def chw_to_nhwc(x):
    return np.transpose(x, (1, 2, 0))[None]


def nhwc_to_chw(x):
    return np.transpose(np.asarray(x)[0], (2, 0, 1))


def test_reorg_matches_darknet():
    rng = np.random.default_rng(0)
    w = h = 6
    c = 8
    s = 2
    x = rng.standard_normal((c, h, w)).astype(np.float32)
    # reference: forward_reorg (reverse=0) = reorg_cpu(..., forward=0),
    # output consumed as (c*s*s, h//s, w//s)
    ref_flat = oracle.reorg_cpu(x.ravel(), w, h, c, s, forward=0)
    ref = ref_flat.reshape(c * s * s, h // s, w // s)
    got = nhwc_to_chw(L.reorg_darknet(chw_to_nhwc(x), stride=s))
    np.testing.assert_allclose(got, ref, rtol=0, atol=0)


def test_reorg_reverse_matches_darknet():
    rng = np.random.default_rng(1)
    w = h = 4
    c = 16
    s = 2
    x = rng.standard_normal((c, h, w)).astype(np.float32)
    # reference: forward_reorg (reverse=1) = reorg_cpu(..., forward=1),
    # output consumed as (c//s^2, h*s, w*s)
    ref_flat = oracle.reorg_cpu(x.ravel(), w, h, c, s, forward=1)
    ref = ref_flat.reshape(c // (s * s), h * s, w * s)
    got = nhwc_to_chw(L.reorg_reverse_darknet(chw_to_nhwc(x), stride=s))
    np.testing.assert_allclose(got, ref, atol=0)


def test_reorg_yolo_shape():
    x = np.arange(1 * 26 * 26 * 64, dtype=np.float32).reshape(1, 26, 26, 64)
    y = L.reorg_darknet(x, stride=2)
    assert y.shape == (1, 13, 13, 256)
    ref_flat = oracle.reorg_cpu(
        np.transpose(x[0], (2, 0, 1)).ravel(), 26, 26, 64, 2, forward=0)
    ref = ref_flat.reshape(256, 13, 13)
    np.testing.assert_allclose(nhwc_to_chw(y), ref, atol=0)


@pytest.mark.parametrize("h,w,size,stride,pad", [
    (13, 13, 2, 1, 0),   # tiny-yolo 'same' pool
    (26, 26, 2, 2, 0),   # standard halving pool
    (9, 9, 3, 2, 1),     # padded odd pool
    (7, 7, 2, 2, 1),
])
def test_maxpool_matches_darknet(h, w, size, stride, pad):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, h, w)).astype(np.float32)
    ref = oracle.forward_maxpool(x, size, stride, pad)
    got = nhwc_to_chw(P.maxpool(chw_to_nhwc(x), size=size, stride=stride,
                                pad=pad))
    np.testing.assert_allclose(got, ref, atol=0)


@pytest.mark.parametrize("ih,iw,oh,ow", [
    (11, 17, 416, 416),
    (416, 416, 13, 13),
    (5, 5, 5, 5),
    (1, 7, 4, 4),
    (32, 48, 448, 448),
])
def test_resize_matches_darknet(ih, iw, oh, ow):
    rng = np.random.default_rng(3)
    im = rng.random((ih, iw, 3)).astype(np.float32)
    ref = oracle.resize_image(im, ow, oh)
    got = I.resize_image_np(im, ow, oh)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    got_j = np.asarray(I.resize_image(im, ow, oh))
    np.testing.assert_allclose(got_j, ref, rtol=1e-5, atol=1e-5)


def test_letterbox_geometry():
    im = np.ones((300, 400, 3), np.float32)
    out = I.letterbox_image_np(im, 416, 416)
    assert out.shape == (416, 416, 3)
    # 400x300 -> inner 416x312, vertical bands of 0.5
    assert np.all(out[:52] == 0.5)
    assert np.all(out[-52:] == 0.5)
    assert np.all(out[52:364] == 1.0)


def test_lrn_matches_darknet():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((16, 5, 5)).astype(np.float32) * 2
    ref = oracle.lrn_forward(x, size=5, alpha=1e-4, beta=0.75, kappa=1.0)
    got = nhwc_to_chw(P.lrn(chw_to_nhwc(x), size=5, alpha=1e-4, beta=0.75,
                            kappa=1.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_nms_matches_darknet():
    rng = np.random.default_rng(5)
    n, c = 60, 7
    boxes = np.stack([
        rng.uniform(0, 10, n), rng.uniform(0, 10, n),
        rng.uniform(0.5, 3, n), rng.uniform(0.5, 3, n)], axis=1
    ).astype(np.float32)
    probs = rng.uniform(0, 1, (n, c)).astype(np.float32)
    probs[probs < 0.4] = 0.0
    ref = oracle.nms_sort(boxes, probs, 0.45)
    got = np.asarray(B.nms_sort(boxes, probs, 0.45))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
    got_topk = np.asarray(B.nms_sort_topk(boxes, probs, 0.45, k=n))
    np.testing.assert_allclose(got_topk, ref, rtol=1e-6, atol=1e-6)


def test_box_iou_matches():
    a = np.array([2.0, 2.0, 2.0, 2.0], np.float32)
    b = np.array([3.0, 3.0, 2.0, 2.0], np.float32)
    got = float(B.box_iou(a, b))
    assert abs(got - 1.0 / 7.0) < 1e-6
    # disjoint
    c = np.array([10.0, 10.0, 1.0, 1.0], np.float32)
    assert float(B.box_iou(a, c)) == 0.0


def test_grouped_softmax_vs_per_group():
    rng = np.random.default_rng(6)
    sizes = [3, 5, 2, 9]
    group_ids = np.concatenate([[g] * s for g, s in enumerate(sizes)])
    x = rng.standard_normal(sum(sizes)).astype(np.float32)
    got = np.asarray(B.grouped_softmax(x[None], group_ids))[0]
    off = 0
    for s in sizes:
        np.testing.assert_allclose(
            got[off:off + s], oracle.softmax(x[off:off + s]),
            rtol=1e-5, atol=1e-6)
        off += s


def test_hierarchy_multiply_matches():
    rng = np.random.default_rng(7)
    #       0
    #      / \
    #     1   2
    #    /|   |
    #   3 4   5
    parent = np.array([-1, 0, 0, 1, 1, 2], np.int32)
    p = rng.uniform(0.1, 1.0, 6).astype(np.float32)
    ref = oracle.hierarchy_predictions(p, parent)
    got = np.asarray(B.hierarchy_multiply(p, parent))
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_pallas_nms_matches_xla_interpret():
    """Pallas NMS kernel (interpret mode on CPU) vs the XLA path."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.kernels.nms_pallas import (
        nms_sort_topk_pallas)
    rng = np.random.default_rng(5)
    n, c = 90, 7
    boxes = np.stack([rng.uniform(0, 10, n), rng.uniform(0, 10, n),
                      rng.uniform(.5, 3, n), rng.uniform(.5, 3, n)],
                     axis=1).astype(np.float32)
    probs = rng.uniform(0, 1, (n, c)).astype(np.float32)
    probs[probs < 0.4] = 0
    ref = np.asarray(B.nms_sort_topk(jnp.asarray(boxes),
                                     jnp.asarray(probs), 0.45, k=n))
    got = np.asarray(nms_sort_topk_pallas(
        jnp.asarray(boxes), jnp.asarray(probs), 0.45, k=n,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("w1,c1,w2,c2", [
    (8, 4, 8, 4),    # same dims (residual)
    (16, 4, 8, 6),   # downsample source (stride 2)
    (8, 6, 16, 4),   # upsample into strided positions (sample 2)
    (8, 8, 8, 4),    # channel mismatch
])
def test_shortcut_resampling_matches_darknet(w1, c1, w2, c2):
    rng = np.random.default_rng(8)
    frm = rng.standard_normal((c1, w1, w1)).astype(np.float32)
    base = rng.standard_normal((c2, w2, w2)).astype(np.float32)
    ref = oracle.shortcut_cpu(1, w1, w1, c1, frm.ravel(),
                              w2, w2, c2, base.ravel())
    ref = ref.reshape(c2, w2, w2)
    got = nhwc_to_chw(L.shortcut(chw_to_nhwc(base), chw_to_nhwc(frm),
                                 lambda x: x))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_tiled_maxpool_first_tap_gradient():
    """The custom-vjp tiled maxpool must route gradient to the FIRST
    max tap of each window (darknet's strict-> update,
    maxpool_layer.c:95-108) — not split it between ties like the
    generic reduce-max autodiff."""
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.ops.pooling import maxpool
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    w = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)

    def f(xx):
        return jnp.sum(maxpool(xx, size=2, stride=2, pad=0)
                       * jnp.asarray(w))
    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    ref = np.zeros_like(x)
    for b in range(2):
        for oh in range(4):
            for ow in range(4):
                for c in range(3):
                    best, bi, bj = -np.inf, 0, 0
                    for i in range(2):
                        for j in range(2):
                            v = x[b, 2 * oh + i, 2 * ow + j, c]
                            if v > best:
                                best, bi, bj = v, i, j
                    ref[b, 2 * oh + bi, 2 * ow + bj, c] += w[b, oh, ow, c]
    np.testing.assert_allclose(g, ref, atol=1e-6)
    # exact ties: all gradient to the first (row-major) tap
    gt = np.asarray(jax.grad(
        lambda xx: jnp.sum(maxpool(xx, size=2, stride=2, pad=0)))(
            jnp.ones((1, 4, 4, 1), jnp.float32)))
    assert gt.sum() == 4.0 and np.all(gt[0, 0::2, 0::2, 0] == 1.0)
    assert np.all(gt[0, 1::2, :, 0] == 0) and np.all(gt[0, :, 1::2, 0] == 0)


def test_bn_fast_core_matches_reference_core():
    """bf16 bandwidth-optimized BN core: same formulas as the f32 core
    (which is oracle-pinned), error at bf16 quantization level for both
    the forward and the hand-written backward."""
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.ops.conv import _bn_core, _bn_core_fast
    rng = np.random.default_rng(12)
    x32 = (rng.standard_normal((4, 16, 16, 8)) * 2 + 1.5).astype(np.float32)
    sc = (rng.random(8) + 0.5).astype(np.float32)
    shift = (rng.standard_normal(8) * 0.1).astype(np.float32)
    y_r, _, m_r, v_r = _bn_core(jnp.asarray(x32), jnp.asarray(sc))
    y_f, _, m_f, v_f = _bn_core_fast(
        jnp.asarray(x32, jnp.bfloat16), jnp.asarray(sc), jnp.asarray(shift))
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_r), atol=2e-3)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_r), atol=5e-3)
    assert float(jnp.max(jnp.abs(y_r - y_f.astype(jnp.float32)))) < 0.05

    gx_r, gs_r = jax.grad(
        lambda x, s: jnp.sum(jnp.sin(_bn_core(x, s)[0])), (0, 1))(
            jnp.asarray(x32), jnp.asarray(sc))
    gx_f, gs_f = jax.grad(
        lambda x, s: jnp.sum(jnp.sin(
            _bn_core_fast(x, s, jnp.asarray(shift))[0].astype(
                jnp.float32))), (0, 1))(
            jnp.asarray(x32, jnp.bfloat16), jnp.asarray(sc))
    rel = float(jnp.max(jnp.abs(gx_r - gx_f.astype(jnp.float32)))
                / (jnp.max(jnp.abs(gx_r)) + 1e-9))
    assert rel < 0.05
    rels = float(jnp.max(jnp.abs(gs_r - gs_f))
                 / (jnp.max(jnp.abs(gs_r)) + 1e-9))
    assert rels < 0.05


def test_grouped_softmax_gapped_ids_fall_back_finite():
    """Monotone-but-gapped group ids (empty group) must not hit the
    band-matmul path (1/0 -> NaN chunk); the scatter fallback handles
    them."""
    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 4)),
                    jnp.float32)
    got = np.asarray(B.grouped_softmax(x, np.array([0, 0, 2, 2])))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got[:, :2].sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(got[:, 2:].sum(-1), 1.0, rtol=1e-5)


def test_bn_fast_core_constant_channel_no_nan():
    """Near-constant channels must not produce negative variance (f32
    cancellation in the single-pass moments) and NaN through sqrt."""
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.ops.conv import _bn_core_fast
    x = jnp.full((8, 32, 32, 4), 3.0, jnp.bfloat16)
    sc = jnp.ones((4,), jnp.float32)
    shift = jnp.full((4,), -2.0, jnp.float32)   # offset from the data
    y, _, mean, var = _bn_core_fast(x, sc, shift)
    assert np.all(np.asarray(var) >= 0)
    assert np.all(np.isfinite(np.asarray(y, np.float32)))
    g = jax.grad(lambda xx: jnp.sum(
        _bn_core_fast(xx, sc, shift)[0].astype(jnp.float32)))(x)
    assert np.all(np.isfinite(np.asarray(g, np.float32)))


def test_reduce_window_grad_is_first_tap():
    """select_and_scatter_add's tie rule (the reduce_window max
    gradient) IS darknet's strict-> first-tap update
    (maxpool_layer.c:95-108): bit-for-bit equal to the tiled custom
    vjp on tie-heavy inputs, f32 and bf16. This equivalence is what
    lets training use the reduce_window formulation (ops/pooling.py
    for_training) without changing parity."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from sr_object_detection_tpu.ops.pooling import _tiled_maxpool

    def rw_pool(x, size=2):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, window_dimensions=(1, size, size, 1),
            window_strides=(1, size, size, 1),
            padding=((0, 0), (0, 0), (0, 0), (0, 0)))

    rng = np.random.RandomState(0)
    x = (rng.randint(0, 3, (2, 8, 8, 4)) * 0.5).astype(np.float32)
    g = rng.uniform(-1, 1, (2, 4, 4, 4)).astype(np.float32)
    d1 = jax.grad(lambda x: jnp.vdot(_tiled_maxpool(x, 2), g))(
        jnp.asarray(x))
    d2 = jax.grad(lambda x: jnp.vdot(rw_pool(x), g))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    xb = jnp.asarray(x, jnp.bfloat16)
    d1b = jax.grad(lambda x: jnp.vdot(
        _tiled_maxpool(x, 2).astype(jnp.float32), g))(xb)
    d2b = jax.grad(lambda x: jnp.vdot(
        rw_pool(x).astype(jnp.float32), g))(xb)
    np.testing.assert_array_equal(np.asarray(d1b), np.asarray(d2b))


def test_amax_pool_backward_first_tap():
    """The first-max-rank training pool (train_mode='amax',
    ops/pooling.py round 5) is bit-exact to the reduce_window /
    select_and_scatter formulation — forward AND backward — on
    tie-heavy inputs, f32 and bf16, sizes 2 and 4. The rank residual
    replaces saving x; the backward must route each window's cotangent
    to darknet's FIRST max tap (maxpool_layer.c:95-108)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from sr_object_detection_tpu.ops.pooling import _amax_maxpool

    def rw_pool(x, size):
        return lax.reduce_window(
            x, -jnp.inf, lax.max, window_dimensions=(1, size, size, 1),
            window_strides=(1, size, size, 1),
            padding=((0, 0), (0, 0), (0, 0), (0, 0)))

    rng = np.random.RandomState(1)
    for size in (2, 4):
        # quantized values force many exact ties inside windows
        x = (rng.randint(0, 3, (2, 8, 8, 5)) * 0.5).astype(np.float32)
        g = rng.uniform(-1, 1,
                        (2, 8 // size, 8 // size, 5)).astype(np.float32)
        for dt in (jnp.float32, jnp.bfloat16):
            xj = jnp.asarray(x, dt)
            y1 = _amax_maxpool(xj, size)
            y2 = rw_pool(xj, size)
            np.testing.assert_array_equal(np.asarray(y1),
                                          np.asarray(y2))
            d1 = jax.grad(lambda x: jnp.vdot(
                _amax_maxpool(x, size).astype(jnp.float32), g))(xj)
            d2 = jax.grad(lambda x: jnp.vdot(
                rw_pool(x, size).astype(jnp.float32), g))(xj)
            np.testing.assert_array_equal(np.asarray(d1),
                                          np.asarray(d2))


def test_train_pool_amax_loss_and_grads_match():
    """make_train_step(train_pool='amax') produces the same loss and
    parameter updates as the default reduce_window path on a small
    conv+pool net. Pool routing itself is bit-exact (the test above);
    at whole-net scale the two programs fuse differently so XLA
    reassociates the BN-backward reductions — updates agree to f32
    reduction-order noise (~1e-8), not bit-for-bit."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.train.trainer import (
        make_train_step, TrainState)
    from sr_object_detection_tpu.train.sgd import init_velocity

    base = tiny_yolo_voc()
    spec = dataclasses.replace(
        base, net=dataclasses.replace(base.net, h=64, w=64, batch=2,
                                      subdivisions=1))
    spec = spec.resize(64, 64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    t = np.zeros((2, 30, 5), np.float32)
    t[:, 0] = [0.5, 0.5, 0.4, 0.4, 3]
    states = {}
    for mode in ("rw", "amax"):
        p = jax.tree.map(jnp.asarray, params)
        st = TrainState(p, init_velocity(p), jnp.asarray(0))
        step = jax.jit(make_train_step(spec, train_pool=mode))
        for _ in range(2):
            st, m = step(st, jnp.asarray(x), jnp.asarray(t),
                         jax.random.PRNGKey(0))
        states[mode] = (st, float(m["loss"]))
    np.testing.assert_allclose(states["rw"][1], states["amax"][1],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(states["rw"][0].params),
                    jax.tree.leaves(states["amax"][0].params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-6, rtol=1e-4)
