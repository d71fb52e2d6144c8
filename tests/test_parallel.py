"""Multi-device correctness: DP sharding must not change the math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sr_object_detection_tpu.models.zoo import CfgBuilder
from sr_object_detection_tpu.parallel.mesh import make_mesh, shard_params
from sr_object_detection_tpu.train.trainer import Trainer


def _spec(batch):
    b = CfgBuilder()
    b.net(batch=batch, subdivisions=1, width=32, height=32, channels=3,
          learning_rate=0.01, momentum=0.9, decay=0.0005,
          policy="constant", max_batches=100)
    b.conv(8, size=3, stride=2)
    b.conv(12, size=1, bn=False, act="linear", pad=1)
    b.section("region", anchors=(1.2, 1.3, 3, 3), bias_match=1, classes=1,
              coords=4, num=2, softmax=1, rescore=1, object_scale=5,
              noobject_scale=1, class_scale=1, coord_scale=1, thresh=.6)
    return b.build()


def _batch(rng, n):
    x = rng.random((n, 32, 32, 3)).astype(np.float32)
    t = np.zeros((n, 30, 5), np.float32)
    t[:, 0] = [0.5, 0.5, 0.4, 0.4, 0]
    return x, t


def test_dp_training_matches_single_device():
    """8-way data-parallel training produces the same parameters as
    single-device (synchronous DP == the math of one big batch) — the
    property the reference's interval-averaged sync only approximates
    (network_kernels.cu:327-344)."""
    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(0)
    x, t = _batch(rng, 8)

    single = Trainer(_spec(8), seed=0)
    for _ in range(3):
        m1 = single.step(x, t)

    mesh = make_mesh(8, model_parallel=1)
    dp = Trainer(_spec(8), seed=0, mesh=mesh)
    with mesh:
        for _ in range(3):
            m2 = dp.step(x, t)

    p1 = jax.tree.map(np.asarray, single.state.params)
    p2 = jax.tree.map(np.asarray, dp.state.params)
    for a, b in zip(p1, p2):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-5, atol=2e-5)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-3


def test_tp_yolo9000_head_forward_mp2():
    """TP at the real target scale (parallel/mesh.py's stated
    motivation): full yolo9000 with the 28269-filter head
    (cfg/yolo9000.cfg:217-260) on an 8-device (data x model) mesh,
    mp=2. 28269 = 3*(9418+5) is odd, so the head shards ROW-parallel
    (input channels, psum over 'model'); forward must equal mp=1."""
    from sr_object_detection_tpu.graph.compiler import build_forward
    from sr_object_detection_tpu.io.weights import fast_init_params
    from sr_object_detection_tpu.models.zoo import yolo9000

    tree = "/root/reference/cfg/9k.tree"
    import os
    if not os.path.exists(tree):
        pytest.skip("9k.tree not available")
    spec = yolo9000(width=64, height=64, batch=4, tree_file=tree,
                    map_file=None)
    params = fast_init_params(spec, seed=0)
    head_idx = max((i for i, l in enumerate(spec.layers)
                    if l.kind == "conv"),
                   key=lambda i: spec.layers[i].filters)
    assert spec.layers[head_idx].filters == 28269

    fwd = build_forward(spec)
    x = np.random.default_rng(0).random((4, 64, 64, 3)).astype(np.float32)
    ref, _ = jax.jit(lambda p, x: fwd(p, x))(params, x)
    ref = np.asarray(ref)

    mesh = make_mesh(8, model_parallel=2)
    sharded = shard_params(mesh, jax.tree.map(jnp.asarray, params), spec)
    sh = sharded[head_idx]["weights"].sharding
    assert sh.spec == jax.sharding.PartitionSpec(None, None, "model",
                                                 None)
    with mesh:
        got, _ = jax.jit(lambda p, x: fwd(p, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5,
                               atol=1e-5)


def test_2d_mesh_training_step_with_9k_head():
    """One 2D (data x model) training step at the real head width: the
    28269-filter conv + region layer with the real 9418-class WordTree,
    dp=4 x mp=2 — finite loss and parameters equal to the unsharded
    step (per-step sync DP + TP change no math). Trunk kept compact so
    the test fits this host's memory bandwidth."""
    import os
    tree = "/root/reference/cfg/9k.tree"
    if not os.path.exists(tree):
        pytest.skip("9k.tree not available")
    from sr_object_detection_tpu.io.weights import fast_init_params

    def build():
        b = CfgBuilder()
        b.net(batch=4, subdivisions=1, width=32, height=32, channels=3,
              learning_rate=1e-5, momentum=0.9, decay=0.0005,
              policy="constant", max_batches=100)
        b.conv(32, size=3, stride=2)
        b.maxpool()
        b.conv(1024, size=3, stride=2)
        b.conv(28269, size=1, bn=False, act="linear", pad=1)
        b.section("region", anchors=(0.8, 0.8, 2.0, 2.0, 4.8, 4.8),
                  bias_match=1, classes=9418, coords=4, num=3, softmax=1,
                  rescore=1, object_scale=5, noobject_scale=1,
                  class_scale=1, coord_scale=1, thresh=.6, tree=tree)
        return b.build()

    rng = np.random.default_rng(0)
    x = rng.random((4, 32, 32, 3)).astype(np.float32)
    t = np.zeros((4, 30, 5), np.float32)
    t[:, 0] = [0.5, 0.5, 0.4, 0.4, 123]

    spec = build()
    params = fast_init_params(spec, seed=0)
    single = Trainer(spec, params=params, seed=0)
    m1 = single.step(x, t)
    assert np.isfinite(float(m1["loss"]))

    mesh = make_mesh(8, model_parallel=2)
    sharded_tr = Trainer(build(), params=fast_init_params(spec, seed=0),
                         seed=0, mesh=mesh)
    # the head must actually be TP-sharded in the train state
    head_idx = 3
    assert "model" in str(
        sharded_tr.state.params[head_idx]["weights"].sharding.spec)
    with mesh:
        m2 = sharded_tr.step(x, t)
    assert np.isfinite(float(m2["loss"]))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-2 * max(
        1.0, abs(float(m1["loss"])))

    p1 = jax.tree.map(np.asarray, single.state.params)
    p2 = jax.tree.map(np.asarray, sharded_tr.state.params)
    for a, b in zip(p1, p2):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=3e-5, atol=3e-5)


def test_tp_sharded_wide_conv_forward():
    """Tensor-parallel sharding of a wide conv's filters must preserve
    the forward result."""
    from sr_object_detection_tpu.graph.compiler import build_forward
    from sr_object_detection_tpu.io.weights import init_params
    b = CfgBuilder()
    b.net(batch=4, width=16, height=16, channels=3)
    b.conv(8, size=3, stride=2)
    b.conv(4096, size=1, bn=False, act="linear", pad=1)  # TP candidate
    spec = b.build()
    params = init_params(spec, seed=0)
    fwd = build_forward(spec)
    x = np.random.default_rng(0).random((4, 16, 16, 3)).astype(np.float32)
    ref, _ = jax.jit(lambda p, x: fwd(p, x))(params, x)

    mesh = make_mesh(8, model_parallel=2)
    sharded = shard_params(mesh, jax.tree.map(jnp.asarray, params), spec,
                           tp_min_filters=2048)
    # the wide conv's weights must actually be sharded over 'model'
    sh = sharded[1]["weights"].sharding
    assert "model" in str(sh.spec)
    with mesh:
        got, _ = jax.jit(lambda p, x: fwd(p, x))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_inference_engine_matches_single_device():
    """ShardedThroughputEngine: DP batch sharding (and TP on wide convs
    at mp=2) must reproduce the single-device forward exactly — the
    serving-side analog of the DP==single-device training equivalence."""
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.infer.engine import (
        ShardedThroughputEngine, ThroughputEngine)
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.parallel.mesh import make_mesh

    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 1, (8, 64, 64, 3)),
        jnp.float32)

    ref = ThroughputEngine(spec, params, batch=8, dtype=jnp.float32)
    out_ref = np.asarray(ref(x))

    for mp in (1, 2):
        mesh = make_mesh(8 if mp == 1 else 8, model_parallel=mp)
        eng = ShardedThroughputEngine(
            spec, params, mesh=mesh, batch=8, dtype=jnp.float32,
            tp_min_filters=256)
        out = np.asarray(eng(x))
        np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"mp={mp}")
        r = eng.benchmark(iters=2, warmup=1)
        assert r["images_per_sec"] > 0


def test_sharded_presplit_matches_single_device():
    """ShardedThroughputEngine presplit: multi-chip DP serving with the
    pre-split decode contract equals the single-device presplit engine
    exactly (f32)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.infer.engine import (
        ShardedThroughputEngine, ThroughputEngine)
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.parallel.mesh import make_mesh

    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    x = np.random.RandomState(0).uniform(
        0, 1, (8, 64, 64, 3)).astype(np.float32)
    mesh = make_mesh(4, model_parallel=1)
    sharded = ShardedThroughputEngine(spec, params, mesh=mesh, batch=8,
                                      dtype=jnp.float32, presplit=True)
    assert sharded.presplit
    single = ThroughputEngine(spec, params, batch=8, dtype=jnp.float32,
                              presplit=True)
    with mesh:
        fs, cs = sharded._run(sharded.params, jnp.asarray(x))
    f1, c1 = single._run(single.params, jnp.asarray(x))
    # per-device batch differs (2 vs 8) so conv accumulation order may
    # reassociate; equality is to f32 rounding, not bitwise
    np.testing.assert_allclose(np.asarray(fs), np.asarray(f1),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(c1),
                               rtol=1e-3, atol=1e-5)


def test_sharded_int8_matches_single_device():
    """Quantized engine with a mesh: DP batch sharding of the int8
    forward (weights/scales replicated, zero collectives) equals the
    single-device quantized engine. Run both plain and with the full
    yolo9000-style serving stack (presplit + int8 head + bf16 decode)."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.infer.quant import (
        QuantizedThroughputEngine)
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.parallel.mesh import make_mesh

    spec = tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.RandomState(0)
    calib = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    x = rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32)
    mesh = make_mesh(4, model_parallel=1)

    for kw in (dict(),
               dict(presplit=True, quantize_head=True,
                    region_dtype=jnp.bfloat16),
               dict(presplit="flat", quantize_head=True)):
        single = QuantizedThroughputEngine(spec, params, batch=8,
                                           calib_x=calib, **kw)
        sharded = QuantizedThroughputEngine(spec, params, batch=8,
                                            calib_x=calib, mesh=mesh,
                                            **kw)
        o1, o2 = single(jnp.asarray(x)), sharded(jnp.asarray(x))
        if not isinstance(o1, tuple):
            o1, o2 = (o1,), (o2,)
        for a, b in zip(o1, o2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-5, err_msg=f"kw={kw}")
        r = sharded.benchmark(iters=2, warmup=1)
        assert r["images_per_sec"] > 0


def test_spatial_sharded_engine_matches_single_device():
    """SpatialShardedEngine: activations sharded over image HEIGHT
    ('space' axis, composed with DP over 'data') must reproduce the
    single-device forward exactly, and the partitioned trunk must move
    shard boundaries via halo exchange (collective-permute), not by
    re-gathering input-scale tensors. The reference has no SP at all
    (SURVEY 2.5); this is the TPU-native >HBM-frame capability."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.infer.engine import ThroughputEngine
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.parallel.spatial import (
        SpatialShardedEngine, spatial_mesh)

    spec = tiny_yolo_voc(width=128, height=128)
    params = init_params(spec, seed=0)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 1, (8, 128, 128, 3)),
        jnp.float32)

    ref = ThroughputEngine(spec, params, batch=8, dtype=jnp.float32)
    out_ref = np.asarray(ref(x))

    for nd, ns in ((1, 4), (2, 4), (4, 2)):
        mesh = spatial_mesh(ns, n_data=nd)
        eng = SpatialShardedEngine(spec, params, mesh=mesh, batch=8,
                                   dtype=jnp.float32)
        out = np.asarray(eng(x))
        np.testing.assert_allclose(out, out_ref, rtol=2e-5, atol=2e-5,
                                   err_msg=f"data={nd} space={ns}")
        assert eng.compiled_trunk_is_halo_exchanged(), \
            f"no halo exchange in partitioned module (data={nd}, ns={ns})"
    r = eng.benchmark(iters=2, warmup=1)
    assert r["images_per_sec"] > 0


def test_spatial_sharding_rejects_indivisible_height():
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.parallel.spatial import (
        SpatialShardedEngine, spatial_mesh)

    spec = tiny_yolo_voc(width=96, height=96)
    params = init_params(spec, seed=0)
    with pytest.raises(ValueError, match="divisible"):
        # 96 % (2*5) != 0: shards would hold odd/unequal row counts
        SpatialShardedEngine(spec, params, mesh=spatial_mesh(5), batch=5)


def test_spatial_sharded_route_reorg_topology():
    """SP on the yolov2-style trunk: the route concat and the reorg
    space-to-depth must survive height sharding (the partitioner may
    reshard around the reorg's (h,2,w,2) reshape, but the answer must
    be exact and the trunk halo-exchanged)."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.infer.engine import ThroughputEngine
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import yolov2
    from sr_object_detection_tpu.parallel.spatial import (
        SpatialShardedEngine, spatial_mesh)

    spec = yolov2(width=128, height=128)
    params = init_params(spec, seed=0)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 1, (4, 128, 128, 3)),
        jnp.float32)
    ref = np.asarray(ThroughputEngine(spec, params, batch=4,
                                      dtype=jnp.float32)(x))
    eng = SpatialShardedEngine(spec, params,
                               mesh=spatial_mesh(4, n_data=2),
                               batch=4, dtype=jnp.float32)
    out = np.asarray(eng(x))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    assert eng.compiled_trunk_is_halo_exchanged()


def test_pipelined_engine_matches_single_device():
    """PP: layer stages on separate devices, microbatched activations
    hopping stage-to-stage, must reproduce the single-device forward
    exactly — on the chain topology and on yolov2's route/reorg trunk
    (cuts are only taken where no later layer routes back across them).
    The reference has no PP at all (SURVEY 2.5)."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.infer.engine import ThroughputEngine
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc, yolov2
    from sr_object_detection_tpu.parallel.pipeline import (
        PipelinedEngine, plan_stages)

    for mk, n_stages in ((tiny_yolo_voc, 4), (yolov2, 3)):
        spec = mk(width=128, height=128)
        params = init_params(spec, seed=0)
        x = np.random.RandomState(0).uniform(
            0, 1, (4, 128, 128, 3)).astype(np.float32)
        ref = np.asarray(ThroughputEngine(spec, params, batch=4,
                                          dtype=jnp.float32)(jnp.asarray(x)))
        eng = PipelinedEngine(spec, params,
                              devices=jax.devices()[:n_stages],
                              microbatch=2)
        out = np.asarray(eng(x))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
        devs = eng.stage_devices()
        assert len(set(map(str, devs))) == n_stages
        assert len(plan_stages(spec, n_stages)) == n_stages - 1


def test_pipelined_trainer_matches_subdivided_single_device():
    """GPipe TRAINING over PP stages: 3 stages x 2 microbatches must
    produce the same post-step parameters as the single-device trainer
    at subdivisions=2 (identical grad accumulation order, rng cadence,
    BN rolling-stat cadence). Full-remat backward; grads accumulate on
    each stage's own device. The reference has no PP (SURVEY 2.5)."""
    import dataclasses

    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.parallel.pipeline import PipelinedTrainer
    from sr_object_detection_tpu.train.sgd import init_velocity
    from sr_object_detection_tpu.train.trainer import (TrainState,
                                                       make_train_step)

    b = CfgBuilder()
    b.net(batch=4, subdivisions=2, width=32, height=32, channels=3,
          learning_rate=0.01, momentum=0.9, decay=0.0005,
          policy="constant", max_batches=100)
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=2)
    b.conv(12, size=1, bn=False, act="linear", pad=1)
    b.section("region", anchors=(1.2, 1.3, 3, 3), bias_match=1,
              classes=1, coords=4, num=2, softmax=1, rescore=1,
              object_scale=5, noobject_scale=1, class_scale=1,
              coord_scale=1, thresh=.6)
    spec = b.build()
    params = init_params(spec, seed=0)
    rng = np.random.default_rng(3)
    x, t = _batch(rng, 8)

    # single-device baseline: subdivisions=2 == 2 microbatches
    sd = dataclasses.replace(
        spec, net=dataclasses.replace(spec.net, batch=4, subdivisions=2))
    step = jax.jit(make_train_step(sd))
    state = TrainState([dict(p) for p in params],
                       init_velocity(params), jnp.asarray(0))
    key = jax.random.PRNGKey(7)
    state, m_ref = step(state, jnp.asarray(x), jnp.asarray(t), key)
    state, m_ref = step(state, jnp.asarray(x), jnp.asarray(t), key)

    pt = PipelinedTrainer(spec, params, devices=jax.devices()[:3],
                          n_micro=2)
    m = pt.step(x, t, rng=key)
    m = pt.step(x, t, rng=key)

    assert np.isfinite(m["loss"])
    np.testing.assert_allclose(m["loss"], float(m_ref["loss"]),
                               rtol=1e-5)
    got = pt.params
    for i, (pg, pr) in enumerate(zip(got, state.params)):
        for k in pr:
            np.testing.assert_allclose(
                np.asarray(pg[k]), np.asarray(pr[k]), rtol=2e-5,
                atol=2e-6, err_msg=f"layer {i} key {k}")
