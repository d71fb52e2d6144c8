"""Training parity vs the reference C oracle: N SGD steps, compare
final weights and per-step costs.

Covers: region loss deltas (incl. the softmax-as-identity class-delta
quirk), SGD+momentum+decay cadence, subdivision gradient accumulation,
train-mode batchnorm, and the straight-through classifier softmax.
"""

import pathlib
import tempfile

import numpy as np
import pytest

import jax

from sr_object_detection_tpu.config import parse_cfg_text
from sr_object_detection_tpu.graph import spec as S
from sr_object_detection_tpu.io.weights import init_params, load_weights
from sr_object_detection_tpu.train.trainer import Trainer

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _load(name):
    p = GOLDEN / f"{name}.npz"
    if not p.exists():
        pytest.skip(f"golden {name} not generated")
    return np.load(p)


def _train_and_compare(name, *, wtol, ctol, truth_kind="region"):
    g = _load(name)
    cfg_text = bytes(g["cfg"]).decode()
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    steps = int(g["steps"])
    x = np.transpose(g["x_chw"], (0, 2, 3, 1)).copy()   # NCHW->NHWC
    truth = g["truth"].astype(np.float32)

    trainer = Trainer(net, params=init_params(net, seed=int(g["seed"])))
    costs = []
    for _ in range(steps):
        m = trainer.step(x, truth)
        costs.append(float(m["loss"]))

    # reference weights after `steps` updates
    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        f.write(bytes(g["weights_after"]))
        f.flush()
        ref_params, seen = load_weights(net, f.name)
    assert seen == steps * net.net.batch * net.net.subdivisions

    mine = jax.tree.map(np.asarray, trainer.state.params)
    for i, l in enumerate(net.layers):
        if not ref_params[i]:
            continue
        for k, ref in ref_params[i].items():
            got = mine[i][k]
            np.testing.assert_allclose(
                got, ref, rtol=wtol, atol=wtol,
                err_msg=f"{name}: layer {i} ({l.kind}) param {k}")

    ref_costs = g["costs"].reshape(steps, -1).sum(axis=1)
    if truth_kind == "classifier":
        # our loss is the gradient-consistent 0.5*scale*||t-p||^2; the
        # reference displays sum((t-p)^2)
        costs = [2 * c for c in costs]
    np.testing.assert_allclose(costs, ref_costs, rtol=ctol,
                               err_msg=f"{name}: cost trajectory")


def test_train_region_no_bn():
    _train_and_compare("train_region_nobn", wtol=1e-4, ctol=1e-3)


def test_train_region_bn():
    # our BN backward reproduces darknet's hand-written gradient exactly
    # (ops/conv.py _bn_core_bwd), so the tolerance is float-level
    _train_and_compare("train_region_bn", wtol=2e-4, ctol=1e-3)


def test_train_region_classfix2():
    """classfix=2 stage-1 class delta (toward the best-IoU truth's class
    at best_iou>thresh locations, scaled by objectness,
    region_layer.c:237-240)."""
    _train_and_compare("train_region_classfix2", wtol=1e-4, ctol=1e-3)


def test_train_region_bn_subdivisions():
    """10 steps at subdivisions=4 with BN: pins the SEQUENTIAL rolling
    mean/variance cadence (one 0.9/0.1 update per micro-batch,
    batchnorm_layer.c:133-136) threaded through the scan carry."""
    _train_and_compare("train_region_bn_subdiv", wtol=2e-4, ctol=1e-3)


def test_train_classifier_subdivisions():
    _train_and_compare("train_classifier", wtol=1e-4, ctol=1e-3,
                       truth_kind="classifier")


def test_train_yolov1_detection():
    g = _load("train_yolov1")
    cfg_text = bytes(g["cfg"]).decode()
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    steps = int(g["steps"])
    x = np.transpose(g["x_chw"], (0, 2, 3, 1)).copy()
    truth = g["truth"].astype(np.float32)   # (B, side^2, 1+C+4)

    trainer = Trainer(net, params=init_params(net, seed=int(g["seed"])))
    costs = []
    for _ in range(steps):
        m = trainer.step(x, truth)
        costs.append(float(m["loss"]))

    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".weights") as f:
        f.write(bytes(g["weights_after"]))
        f.flush()
        ref_params, _ = load_weights(net, f.name)
    mine = jax.tree.map(np.asarray, trainer.state.params)
    for i, l in enumerate(net.layers):
        if not ref_params[i]:
            continue
        for k, ref in ref_params[i].items():
            np.testing.assert_allclose(
                mine[i][k], ref, rtol=1e-4, atol=1e-4,
                err_msg=f"yolov1: layer {i} ({l.kind}) param {k}")
    np.testing.assert_allclose(costs, g["costs"], rtol=1e-3)


def test_region_padding_rows_cannot_clobber_cell0():
    """Padded (all-zero) truth rows hash to (cell 0,0, anchor 0); they
    must be DROPPED from the delta scatter, not scatter a stale value —
    the reference's loop breaks at the first empty truth
    (region_layer.c:224) so a real truth assigned to (0,0,anchor0)
    keeps its deltas."""
    from sr_object_detection_tpu.train.region_loss import region_delta

    spec = S.RegionSpec(index=0, n=2, classes=3, coords=4,
                        anchors=(1.0, 1.0, 3.0, 3.0), softmax=True,
                        h=2, w=2, coord_scale=2.0, object_scale=5.0,
                        noobject_scale=1.0, class_scale=1.0)
    h = w = 2
    a, f = 2, 4 + 1 + 3
    rng = np.random.RandomState(0)
    raw = rng.randn(1, h, w, a, f).astype(np.float32)

    truth = np.zeros((1, 30, 5), np.float32)
    # real box in cell (0,0) whose w,h exactly match anchor 0 ->
    # best_n = 0: the same (b, j, i, n) the 29 padding rows map to
    truth[0, 0] = [0.2, 0.2, 0.5, 0.5, 1]

    import jax.numpy as jnp
    _, delta, _ = region_delta(jnp.asarray(raw.reshape(1, -1)),
                               jnp.asarray(truth), seen=20000, spec=spec)
    delta = np.asarray(delta).reshape(1, h, w, a, f)

    # expected assigned coord delta (delta_region_box at tj=ti=0, n=0)
    sig = 1 / (1 + np.exp(-raw[0, 0, 0, 0, 0:2]))
    tx, ty = 0.2 * w - 0, 0.2 * h - 0
    tw = np.log(0.5 * w / 1.0)
    th = np.log(0.5 * h / 1.0)
    want = spec.coord_scale * np.array([
        (tx - sig[0]) * sig[0] * (1 - sig[0]),
        (ty - sig[1]) * sig[1] * (1 - sig[1]),
        tw - raw[0, 0, 0, 0, 2],
        th - raw[0, 0, 0, 0, 3]], np.float32)
    np.testing.assert_allclose(delta[0, 0, 0, 0, 0:4], want,
                               rtol=1e-5, atol=1e-6)
    assert np.abs(want).max() > 1e-3   # the check is non-vacuous


def test_train_tree_region_yolo9000_path():
    """Hierarchical-softmax region training incl. a classification-only
    sentinel truth (the YOLO9000 co-training mechanism)."""
    _tree_train_compare("train_tree_region")


def test_train_tree_region_classfix2():
    """classfix=2 + tree: stage-1c class deltas at high-IoU cells must
    SURVIVE the stage-2 tree class scatter outside the truth's
    sibling-group path (delta_region_class tree variant only writes
    group entries, region_layer.c:108-124)."""
    _tree_train_compare("train_tree_region_classfix2")


def _tree_train_compare(name):
    g = _load(name)
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        tree_path = os.path.join(td, "mini.tree")
        with open(tree_path, "w") as f:
            f.write(bytes(g["tree"]).decode())
        cfg_text = bytes(g["cfg"]).decode().replace("{TREE}", tree_path)
        net = S.build_network_spec(parse_cfg_text(cfg_text))
        steps = int(g["steps"])
        x = np.transpose(g["x_chw"], (0, 2, 3, 1)).copy()
        truth = g["truth"].astype(np.float32)

        trainer = Trainer(net, params=init_params(net, seed=int(g["seed"])))
        costs = []
        for _ in range(steps):
            m = trainer.step(x, truth)
            costs.append(float(m["loss"]))

        with tempfile.NamedTemporaryFile(suffix=".weights") as f:
            f.write(bytes(g["weights_after"]))
            f.flush()
            ref_params, _ = load_weights(net, f.name)
    mine = jax.tree.map(np.asarray, trainer.state.params)
    for i, l in enumerate(net.layers):
        if not ref_params[i]:
            continue
        for k, ref in ref_params[i].items():
            np.testing.assert_allclose(
                mine[i][k], ref, rtol=2e-4, atol=2e-4,
                err_msg=f"tree_region: layer {i} ({l.kind}) param {k}")
    np.testing.assert_allclose(costs, g["costs"], rtol=1e-3)


def test_remat_modes_loss_identical():
    """remat=False / True / 'selective' / 'selective:2' are pure
    scheduling choices: the train step's loss must be bit-identical
    (graph/compiler.py checkpoint_name + trainer selective policy)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.io.weights import init_params
    from sr_object_detection_tpu.train.trainer import (make_train_step,
                                                       TrainState)
    from sr_object_detection_tpu.train.sgd import init_velocity
    base = tiny_yolo_voc(width=96, height=96)
    spec = dataclasses.replace(
        base, net=dataclasses.replace(base.net, batch=2, subdivisions=1))
    x = jnp.asarray(np.random.RandomState(0).uniform(
        0, 1, (2, 96, 96, 3)).astype(np.float32))
    t = np.zeros((2, 30, 5), np.float32)
    t[:, 0] = [.5, .5, .3, .3, 1]
    t = jnp.asarray(t)
    rng = jax.random.PRNGKey(0)
    losses = {}
    for mode in (False, True, "selective", "selective:2"):
        params = jax.tree.map(jnp.asarray, init_params(spec, seed=0))
        st = TrainState(params, init_velocity(params), jnp.asarray(0))
        step = jax.jit(make_train_step(spec, compute_dtype=jnp.bfloat16,
                                       remat=mode))
        for _ in range(2):
            st, m = step(st, x, t, rng)
        losses[mode] = float(m["loss"])
    vals = set(losses.values())
    assert len(vals) == 1, losses
