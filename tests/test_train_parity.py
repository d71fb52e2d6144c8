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


def test_train_tree_region_yolo9000_path():
    """Hierarchical-softmax region training incl. a classification-only
    sentinel truth (the YOLO9000 co-training mechanism)."""
    g = _load("train_tree_region")
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
