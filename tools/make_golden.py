"""Generate golden parity tensors from the reference C CPU oracle.

Builds deterministic random weights with our init (seed-stable numpy),
writes them as a darknet .weights file, runs the reference oracle binary
(compiled from /root/reference/src_yolo2 in a scratch dir) on a
deterministic input, and stores {cfg text, seed, input, output} as an
.npz under tests/golden/. The test suite then re-runs our TPU forward
from the same seed and asserts numeric parity — without ever needing the
C toolchain again.

Usage: python tools/make_golden.py <oracle_binary>
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sr_object_detection_tpu.config import parse_cfg_text
from sr_object_detection_tpu.graph import spec as S
from sr_object_detection_tpu.io.weights import init_params, save_weights

GOLDEN = REPO / "tests" / "golden"

MINI_CONV = """
[net]
batch=1
height=16
width=16
channels=3

[convolutional]
batch_normalize=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=10
size=1
stride=1
pad=1
activation=linear

[avgpool]

[softmax]
groups=1
"""

MINI_ROUTE_REORG = """
[net]
batch=1
height=16
width=16
channels=4

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[route]
layers=-2

[reorg]
stride=2

[route]
layers=-1,-3

[convolutional]
filters=8
size=1
stride=1
activation=leaky

[shortcut]
from=-4
activation=leaky
"""

MINI_REGION = """
[net]
batch=1
height=32
width=32
channels=3

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=30
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1.08,1.19, 3.42,4.41, 6.63,11.38
bias_match=1
classes=5
coords=4
num=3
softmax=1
jitter=.2
rescore=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
absolute=1
thresh=.6
"""

MINI_CONNECTED = """
[net]
batch=1
height=8
width=8
channels=3

[convolutional]
filters=6
size=3
stride=2
pad=1
activation=leaky

[connected]
output=32
activation=leaky

[dropout]
probability=.5

[connected]
output=10
activation=linear

[softmax]
groups=1
"""

MINI_LRN = """
[net]
batch=1
height=8
width=8
channels=16

[convolutional]
filters=16
size=1
stride=1
activation=relu

[lrn]
size=5
alpha=.0001
beta=.75
kappa=1

[avgpool]
"""

MINI_CROP = """
[net]
batch=1
height=16
width=16
channels=3

[crop]
crop_width=12
crop_height=12
flip=0
angle=0
saturation=1
exposure=1

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=ramp

[avgpool]
"""

CASES = {
    "mini_conv": MINI_CONV,
    "mini_route_reorg": MINI_ROUTE_REORG,
    "mini_region": MINI_REGION,
    "mini_connected": MINI_CONNECTED,
    "mini_lrn": MINI_LRN,
    "mini_crop": MINI_CROP,
}

REAL_CFGS = {
    "tiny_yolo_voc": "/root/reference/cfg/tiny-yolo-voc.cfg",
    "yolo_coco_416": "/root/reference/cfg/yolo.cfg",
}


def gen_case(name: str, cfg_text: str, oracle: str, seed: int = 0,
             dump_layers: bool = False, randomize_biases: bool = False):
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    params = init_params(net, seed=seed)
    if randomize_biases:
        brng = np.random.default_rng(seed + 9000)
        for p in params:
            if p and "biases" in p:
                p["biases"] = brng.normal(
                    0, 0.5, np.shape(p["biases"])).astype(np.float32)
    rng = np.random.default_rng(seed + 1000)
    x_chw = rng.uniform(0, 1, (net.net.c, net.net.h, net.net.w)
                        ).astype(np.float32)

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        wfile = td / "w.weights"
        save_weights(net, params, str(wfile))
        cfg_file = td / "net.cfg"
        cfg_file.write_text(cfg_text)
        (td / "in.bin").write_bytes(x_chw.tobytes())
        prefix = str(td / "layer_") if dump_layers else None
        cmd = [oracle, str(cfg_file), str(wfile), str(td / "in.bin"),
               str(td / "out.bin")]
        if prefix:
            cmd.append(prefix)
        subprocess.run(cmd, check=True, capture_output=True)
        out = np.frombuffer((td / "out.bin").read_bytes(), dtype="<f4").copy()
        layer_outs = {}
        if dump_layers:
            for i, l in enumerate(net.layers):
                p = td / f"layer_{i}.bin"
                if p.exists():
                    layer_outs[f"layer_{i}"] = np.frombuffer(
                        p.read_bytes(), dtype="<f4").copy()

    GOLDEN.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        GOLDEN / f"{name}.npz",
        cfg=np.frombuffer(cfg_text.encode(), dtype=np.uint8),
        seed=np.int64(seed),
        bias_seed=np.int64(seed + 9000 if randomize_biases else -1),
        input_chw=x_chw,
        output=out,
        **layer_outs,
    )
    print(f"{name}: output[{out.shape[0]}] "
          f"range [{out.min():.4f}, {out.max():.4f}]")


def main():
    oracle = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbuild/oracle"
    for name, cfg in CASES.items():
        gen_case(name, cfg, oracle, dump_layers=True)
    for name, path in REAL_CFGS.items():
        cfg_text = pathlib.Path(path).read_text()
        gen_case(name, cfg_text, oracle, dump_layers=False)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Training-parity goldens: N SGD steps in the reference, dump weights
# ---------------------------------------------------------------------------

TRAIN_REGION_NOBN = """
[net]
batch=2
subdivisions=1
height=32
width=32
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
max_batches=100
policy=constant

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
filters=30
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1.08,1.19, 3.42,4.41, 6.63,11.38
bias_match=1
classes=5
coords=4
num=3
softmax=1
rescore=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
"""

TRAIN_REGION_BN = TRAIN_REGION_NOBN.replace(
    "[convolutional]\nfilters=8", "[convolutional]\nbatch_normalize=1\nfilters=8"
).replace(
    "[convolutional]\nfilters=16", "[convolutional]\nbatch_normalize=1\nfilters=16")

# classfix=2: class delta toward the best-IoU truth's class at every
# location with best_iou > thresh, scaled by objectness
# (region_layer.c:237-240). thresh lowered so the branch actually fires
# with random-init predictions.
TRAIN_REGION_CLASSFIX2 = TRAIN_REGION_NOBN.replace(
    "thresh=.6", "thresh=.05\nclassfix=2")

# subdivisions>1 + BN: pins the SEQUENTIAL per-micro-batch rolling-stat
# cadence (batchnorm_layer.c:133-136) over a longer run — the rolling
# stats converge `subdivisions`x slower if only one 0.9/0.1 update is
# applied per outer batch.
TRAIN_REGION_BN_SUBDIV = TRAIN_REGION_BN.replace(
    "batch=2\nsubdivisions=1", "batch=8\nsubdivisions=4")

TRAIN_CLASSIFIER = """
[net]
batch=2
subdivisions=2
height=16
width=16
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.01
max_batches=100
policy=constant

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=10
size=1
stride=1
pad=1
activation=leaky

[avgpool]

[softmax]
groups=1

[cost]
type=sse
"""


def gen_train_case(name: str, cfg_text: str, oracle_train: str,
                   steps: int = 2, seed: int = 0, with_truth: str = "region"):
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    params = init_params(net, seed=seed)
    rng = np.random.default_rng(seed + 2000)
    outer = net.net.batch * net.net.subdivisions
    x = rng.uniform(0, 1, (outer, net.net.c, net.net.h, net.net.w)
                    ).astype(np.float32)
    if with_truth == "region":
        truths = 30 * 5
        truth = np.zeros((outer, 30, 5), np.float32)
        for b in range(outer):
            nbox = 1 + int(rng.integers(0, 3))
            for t in range(nbox):
                truth[b, t] = [rng.uniform(0.2, 0.8), rng.uniform(0.2, 0.8),
                               rng.uniform(0.05, 0.4), rng.uniform(0.05, 0.4),
                               int(rng.integers(0, 5))]
        truth_flat = truth.reshape(outer, truths)
    else:
        n_out = net.outputs
        cls = rng.integers(0, n_out, outer)
        truth_flat = np.zeros((outer, n_out), np.float32)
        truth_flat[np.arange(outer), cls] = 1.0
        truth = truth_flat

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "x.bin").write_bytes(x.tobytes())
        (td / "t.bin").write_bytes(truth_flat.astype(np.float32).tobytes())
        subprocess.run(
            [oracle_train, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "x.bin"), str(td / "t.bin"), str(steps),
             str(td / "out.weights"), str(td / "costs.bin")],
            check=True, capture_output=True)
        wout = (td / "out.weights").read_bytes()
        costs = np.frombuffer((td / "costs.bin").read_bytes(), dtype="<f4")

    GOLDEN.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        GOLDEN / f"{name}.npz",
        cfg=np.frombuffer(cfg_text.encode(), dtype=np.uint8),
        seed=np.int64(seed),
        steps=np.int64(steps),
        x_chw=x,
        truth=truth,
        weights_after=np.frombuffer(wout, dtype=np.uint8),
        costs=costs,
    )
    print(f"{name}: {steps} steps, costs={costs}")


def main_train():
    oracle_train = sys.argv[2] if len(sys.argv) > 2 else "/tmp/refbuild/oracle_train"
    gen_train_case("train_region_nobn", TRAIN_REGION_NOBN, oracle_train)
    gen_train_case("train_region_bn", TRAIN_REGION_BN, oracle_train)
    gen_train_case("train_region_bn_subdiv", TRAIN_REGION_BN_SUBDIV,
                   oracle_train, steps=10)
    gen_train_case("train_region_classfix2", TRAIN_REGION_CLASSFIX2,
                   oracle_train, steps=3)
    gen_train_case("train_classifier", TRAIN_CLASSIFIER, oracle_train,
                   with_truth="classifier")


TRAIN_YOLOV1 = """
[net]
batch=2
subdivisions=1
height=28
width=28
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.005
max_batches=100
policy=constant

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=leaky

[connected]
output=117
activation=linear

[detection]
classes=3
coords=4
rescore=1
side=3
num=2
softmax=1
sqrt=1
jitter=.2
object_scale=1
noobject_scale=.5
class_scale=1
coord_scale=5
"""


def gen_train_yolov1(oracle_train: str, steps: int = 2, seed: int = 0):
    # detection truth: side^2 cells x [is_obj, onehot(classes), x,y,w,h]
    # with x,y relative to the image but *divided by side later* — the
    # loader (fill_truth_region analog) stores cell-relative x,y
    name = "train_yolov1"
    cfg_text = TRAIN_YOLOV1
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    params = init_params(net, seed=seed)
    rng = np.random.default_rng(seed + 3000)
    det = net.layers[-1]
    outer = net.net.batch * net.net.subdivisions
    x = rng.uniform(0, 1, (outer, net.net.c, net.net.h, net.net.w)
                    ).astype(np.float32)
    side, classes, coords = det.side, det.classes, det.coords
    truth = np.zeros((outer, side * side, 1 + classes + coords), np.float32)
    for b in range(outer):
        for _ in range(2):
            cell = int(rng.integers(0, side * side))
            cls = int(rng.integers(0, classes))
            truth[b, cell, 0] = 1
            truth[b, cell, 1 + cls] = 1
            truth[b, cell, 1 + classes:] = [
                rng.uniform(0.2, 0.8) * side % 1,  # cell-relative x
                rng.uniform(0.2, 0.8) * side % 1,
                rng.uniform(0.1, 0.5), rng.uniform(0.1, 0.5)]
    truth_flat = truth.reshape(outer, -1)

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "x.bin").write_bytes(x.tobytes())
        (td / "t.bin").write_bytes(truth_flat.tobytes())
        subprocess.run(
            [oracle_train, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "x.bin"), str(td / "t.bin"), str(steps),
             str(td / "out.weights"), str(td / "costs.bin")],
            check=True, capture_output=True)
        wout = (td / "out.weights").read_bytes()
        costs = np.frombuffer((td / "costs.bin").read_bytes(), dtype="<f4")

    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(cfg_text.encode(), dtype=np.uint8),
        seed=np.int64(seed), steps=np.int64(steps),
        x_chw=x, truth=truth, weights_after=np.frombuffer(wout, np.uint8),
        costs=costs)
    print(f"{name}: costs={costs}")


TREE_TEXT = """n0 -1
n1 -1
n2 0
n3 0
n4 1
n5 2
n6 2
"""

TRAIN_TREE_REGION = """
[net]
batch=3
subdivisions=1
height=32
width=32
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
max_batches=100
policy=constant

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=16
size=3
stride=4
pad=1
activation=leaky

[convolutional]
filters=24
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1.2,1.3, 3.1,2.2
bias_match=1
classes=7
coords=4
num=2
softmax=1
rescore=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
tree={TREE}
"""


def gen_train_tree_region(oracle_train: str, steps: int = 2, seed: int = 0,
                          *, name: str = "train_tree_region",
                          classfix: int = 0):
    """classfix>0 + tree pins the interaction where a cell is BOTH
    high-IoU (stage-1c class delta toward the best truth's class,
    region_layer.c:237-240) and the assigned cell (stage-2 tree class
    delta writes only the sibling-group path, :108-124) — stage-1c
    deltas outside the path must survive."""
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        tree_path = td / "mini.tree"
        tree_path.write_text(TREE_TEXT)
        cfg_template = TRAIN_TREE_REGION
        if classfix:
            cfg_template = cfg_template.replace(
                "thresh=.6", f"thresh=.05\nclassfix={classfix}")
        cfg_text = cfg_template.replace("{TREE}", str(tree_path))
        net = S.build_network_spec(parse_cfg_text(cfg_text))
        params = init_params(net, seed=seed)
        rng = np.random.default_rng(seed + 4000)
        outer = net.net.batch * net.net.subdivisions
        x = rng.uniform(0, 1, (outer, net.net.c, net.net.h, net.net.w)
                        ).astype(np.float32)
        truth = np.zeros((outer, 30, 5), np.float32)
        # items 0-1: normal boxes with leaf classes
        truth[0, 0] = [0.4, 0.5, 0.3, 0.3, 3]
        truth[0, 1] = [0.7, 0.3, 0.2, 0.2, 6]
        truth[1, 0] = [0.5, 0.6, 0.4, 0.3, 4]
        # item 2: classification-only sentinel (x,y > 100000)
        truth[2, 0] = [999999, 999999, 999999, 999999, 5]
        truth_flat = truth.reshape(outer, 150)

        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "x.bin").write_bytes(x.tobytes())
        (td / "t.bin").write_bytes(truth_flat.tobytes())
        subprocess.run(
            [oracle_train, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "x.bin"), str(td / "t.bin"), str(steps),
             str(td / "out.weights"), str(td / "costs.bin")],
            check=True, capture_output=True)
        wout = (td / "out.weights").read_bytes()
        costs = np.frombuffer((td / "costs.bin").read_bytes(), dtype="<f4")

    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(cfg_template.encode(), dtype=np.uint8),
        tree=np.frombuffer(TREE_TEXT.encode(), dtype=np.uint8),
        seed=np.int64(seed), steps=np.int64(steps),
        x_chw=x, truth=truth, weights_after=np.frombuffer(wout, np.uint8),
        costs=costs)
    print(f"{name}: costs={costs}")


def gen_detect_case(name: str, cfg_path: str, oracle_detect: str,
                    thresh: float = 0.1, nms: float = 0.4, seed: int = 0):
    """Decode-parity golden: boxes+probs after get_region_boxes+NMS."""
    cfg_text = pathlib.Path(cfg_path).read_text()
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    params = init_params(net, seed=seed)
    rng = np.random.default_rng(seed + 5000)
    x_chw = rng.uniform(0, 1, (net.net.c, net.net.h, net.net.w)
                        ).astype(np.float32)
    region = net.layers[-1]
    n = region.h * region.w * region.n
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "in.bin").write_bytes(x_chw.tobytes())
        subprocess.run(
            [oracle_detect, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "in.bin"), str(td / "boxes.bin"),
             str(td / "probs.bin"), str(thresh), str(nms)],
            check=True, capture_output=True)
        boxes = np.frombuffer((td / "boxes.bin").read_bytes(),
                              dtype="<f4").reshape(n, 4).copy()
        probs = np.frombuffer((td / "probs.bin").read_bytes(),
                              dtype="<f4").reshape(n, region.classes).copy()
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(cfg_text.encode(), dtype=np.uint8),
        seed=np.int64(seed), thresh=np.float32(thresh),
        nms=np.float32(nms), input_chw=x_chw, boxes=boxes, probs=probs)
    nonzero = (probs > 0).sum()
    print(f"{name}: {n} boxes, {nonzero} surviving probs")


def gen_detect_tree_case(oracle_detect: str, thresh: float = 0.2,
                         nms: float = 0.4, seed: int = 0):
    """Tree-WITHOUT-map decode golden (get_region_boxes' no-map branch,
    region_layer.c:357-366): probs are the deepest-confident hierarchy
    path probability, gated on objectness > thresh — not obj*prob."""
    name = "detect_tree_nomap"
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        tree_path = td / "mini.tree"
        tree_path.write_text(TREE_TEXT)
        cfg_text = TRAIN_TREE_REGION.replace("{TREE}", str(tree_path))
        net = S.build_network_spec(parse_cfg_text(cfg_text))
        params = init_params(net, seed=seed)
        rng = np.random.default_rng(seed + 5000)
        x_chw = rng.uniform(0, 1, (net.net.c, net.net.h, net.net.w)
                            ).astype(np.float32)
        region = net.layers[-1]
        n = region.h * region.w * region.n
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "in.bin").write_bytes(x_chw.tobytes())
        subprocess.run(
            [oracle_detect, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "in.bin"), str(td / "boxes.bin"),
             str(td / "probs.bin"), str(thresh), str(nms)],
            check=True, capture_output=True)
        boxes = np.frombuffer((td / "boxes.bin").read_bytes(),
                              dtype="<f4").reshape(n, 4).copy()
        probs = np.frombuffer((td / "probs.bin").read_bytes(),
                              dtype="<f4").reshape(n, region.classes).copy()
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(TRAIN_TREE_REGION.encode(), dtype=np.uint8),
        tree=np.frombuffer(TREE_TEXT.encode(), dtype=np.uint8),
        seed=np.int64(seed), thresh=np.float32(thresh),
        nms=np.float32(nms), input_chw=x_chw, boxes=boxes, probs=probs)
    print(f"{name}: {n} boxes, {(probs > 0).sum()} surviving probs")


# ---------------------------------------------------------------------------
# mAP-parity A/B golden (BASELINE.md accuracy gate): train a small
# detector on a synthetic set, run the reference's validate_detector
# loop (via oracle_valid) on it, store weights + oracle det files.
# ---------------------------------------------------------------------------

MAP_AB_CFG = """
[net]
batch=8
subdivisions=1
height=96
width=96
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
max_batches=10000
policy=steps
steps=500,800
scales=.2,.2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=40
size=1
stride=1
pad=1
activation=linear

[region]
anchors=2.2,2.2, 3.6,2.8, 2.8,3.6, 4.8,4.8, 3.2,3.2
bias_match=1
classes=3
coords=4
num=5
softmax=1
rescore=1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
"""

MAP_AB_SEED = 7
MAP_AB_IMAGES = 24
MAP_AB_THRESH = 0.005
MAP_AB_NMS = 0.45


def _map_ab_batches(gt, list_path, net_w, net_h, batch, steps, seed):
    """Deterministic training batches from the synthetic set."""
    from sr_object_detection_tpu.ops.image import (load_image_rgb,
                                                   resize_image_np)
    paths = [l.strip() for l in open(list_path) if l.strip()]
    cache = {}
    for p in paths:
        img = load_image_rgb(p)
        cache[p] = resize_image_np(img, net_w, net_h)
    rng = np.random.default_rng(seed + 77)
    for _ in range(steps):
        idx = rng.integers(0, len(paths), batch)
        x = np.stack([cache[paths[i]] for i in idx])
        truth = np.zeros((batch, 30, 5), np.float32)
        for bi, i in enumerate(idx):
            image_id = pathlib.Path(paths[i]).stem
            t = gt[image_id][0]
            truth[bi, :len(t)] = t
        yield x.astype(np.float32), truth


def train_map_ab_weights(list_path, gt, steps: int = 400):
    """Train the small detector with OUR trainer (the weights only need
    to be *some* fixed weights; both sides then run them)."""
    from sr_object_detection_tpu.train.trainer import Trainer
    net = S.build_network_spec(parse_cfg_text(MAP_AB_CFG))
    trainer = Trainer(net, seed=MAP_AB_SEED)
    for k, (x, truth) in enumerate(_map_ab_batches(
            gt, list_path, net.net.w, net.net.h, net.net.batch, steps,
            MAP_AB_SEED)):
        m = trainer.step(x, truth)
        if (k + 1) % 100 == 0:
            print(f"  map_ab train {k+1}/{steps} loss={float(m['loss']):.3f}")
    import jax
    params = jax.tree.map(np.asarray, trainer.state.params)
    return net, params


def gen_map_ab(oracle_valid: str = "/tmp/refbuild/oracle_valid",
               steps: int = 400):
    from tools.synth_dataset import (make_dataset, gt_corner_boxes,
                                     dataset_digest, N_CLASSES)
    from sr_object_detection_tpu.eval.voc import mean_ap

    name = "map_ab"
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        data_dir = td / "data"
        list_path, gt = make_dataset(str(data_dir), MAP_AB_IMAGES,
                                     MAP_AB_SEED)
        digest = dataset_digest(str(data_dir))
        net, params = train_map_ab_weights(list_path, gt, steps)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(MAP_AB_CFG)
        results = td / "results"
        results.mkdir()
        subprocess.run(
            [oracle_valid, str(td / "net.cfg"), str(td / "w.weights"),
             list_path, str(results), str(MAP_AB_THRESH),
             str(MAP_AB_NMS)],
            check=True, capture_output=True)
        det_texts = {}
        per_class_dets = {}
        for c in range(N_CLASSES):
            text = (results / f"comp4_det_test_{c}.txt").read_text()
            det_texts[c] = text
            dets = []
            for line in text.splitlines():
                f = line.split()
                dets.append((f[0], float(f[1]), float(f[2]), float(f[3]),
                             float(f[4]), float(f[5])))
            per_class_dets[c] = dets
        oracle_map, aps = mean_ap(per_class_dets, gt_corner_boxes(gt))
        wbytes = (td / "w.weights").read_bytes()

    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(MAP_AB_CFG.encode(), dtype=np.uint8),
        weights=np.frombuffer(wbytes, dtype=np.uint8),
        digest=np.frombuffer(digest.encode(), dtype=np.uint8),
        n_images=np.int64(MAP_AB_IMAGES), seed=np.int64(MAP_AB_SEED),
        thresh=np.float32(MAP_AB_THRESH), nms=np.float32(MAP_AB_NMS),
        oracle_map=np.float64(oracle_map),
        **{f"dets_{c}": np.frombuffer(t.encode(), dtype=np.uint8)
           for c, t in det_texts.items()})
    print(f"{name}: oracle mAP={oracle_map:.4f} per-class={aps}")


MINI_LOCAL = """
[net]
batch=1
height=12
width=12
channels=3

[convolutional]
filters=6
size=3
stride=1
pad=1
activation=leaky

[local]
filters=8
size=3
stride=1
pad=1
activation=leaky

[avgpool]
"""

MINI_DECONV = """
[net]
batch=1
height=8
width=8
channels=3

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=leaky

[deconvolutional]
filters=3
size=4
stride=2
activation=logistic
"""

MINI_RNN = """
[net]
batch=4
time_steps=4
subdivisions=1
inputs=16

[rnn]
batch_normalize=0
output=12
hidden=12
activation=leaky

[rnn]
batch_normalize=0
output=12
hidden=12
activation=leaky

[connected]
output=16
activation=leaky

[softmax]
"""

MINI_GRU = """
[net]
batch=4
time_steps=4
subdivisions=1
inputs=16

[gru]
batch_normalize=0
output=12

[connected]
output=16
activation=linear
"""


def gen_flat_case(name: str, cfg_text: str, oracle: str, seed: int = 0):
    """Golden for flat-input nets (rnn/gru): input (inputs,) per item;
    the oracle runs batch = net.batch rows at once via set_batch?
    network_predict uses batch 1 — for time_steps nets set_batch_network
    (1) collapses steps; instead we keep batch as parsed and call the
    train-free forward through the oracle's predict on a single row
    repeated... Simplest: batch=net.batch rows of deterministic data and
    a custom driver is overkill — network_predict(net, X) with
    set_batch(1) gives steps=1 semantics, which still exercises the
    sublayer weights order. We write inputs for ONE row.
    """
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    params = init_params(net, seed=seed)
    rng = np.random.default_rng(seed + 7000)
    x = rng.uniform(-1, 1, net.net.inputs).astype(np.float32)
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "in.bin").write_bytes(x.tobytes())
        subprocess.run(
            [oracle, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "in.bin"), str(td / "out.bin")],
            check=True, capture_output=True)
        out = np.frombuffer((td / "out.bin").read_bytes(), dtype="<f4").copy()
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(cfg_text.encode(), dtype=np.uint8),
        seed=np.int64(seed), input_flat=x, output=out)
    print(f"{name}: out[{out.shape[0]}] range "
          f"[{out.min():.4f}, {out.max():.4f}]")


DECONV_ONLY = """
[net]
batch=1
height=8
width=8
channels=3

[deconvolutional]
filters=4
size=4
stride=2
activation=logistic
"""

CRNN_ONLY = """
[net]
batch=1
time_steps=1
subdivisions=1
height=8
width=8
channels=3

[crnn]
batch_normalize=0
output_filters=6
hidden_filters=5
activation=leaky
"""


def gen_deconv_layer(oracle_layer: str = "/tmp/refbuild/oracle_layer",
                     seed: int = 0):
    """Layer-level deconv golden. The upstream cfg path can't build a
    deconv (parser.c has no case; forward_network would call a NULL
    l.forward) — the oracle_layer driver constructs the layer directly
    via make_deconvolutional_layer."""
    name = "mini_deconv"
    net = S.build_network_spec(parse_cfg_text(DECONV_ONLY))
    l = net.layers[0]
    params = init_params(net, seed=seed)[0]
    rng = np.random.default_rng(seed + 1000)
    x_chw = rng.uniform(0, 1, (l.c, l.h, l.w)).astype(np.float32)
    # C layout: weights (c, n, size, size); ours is (s, s, c, f)
    w_c = np.transpose(params["weights"], (2, 3, 0, 1)).astype("<f4")
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.bin").write_bytes(x_chw.tobytes())
        (td / "p.bin").write_bytes(
            w_c.tobytes() + params["biases"].astype("<f4").tobytes())
        subprocess.run(
            [oracle_layer, "deconv", str(l.h), str(l.w), str(l.c),
             str(l.filters), str(l.size), str(l.stride), l.activation,
             str(td / "in.bin"), str(td / "p.bin"), str(td / "out.bin")],
            check=True, capture_output=True)
        out = np.frombuffer((td / "out.bin").read_bytes(), "<f4").copy()
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(DECONV_ONLY.encode(), dtype=np.uint8),
        seed=np.int64(seed), input_chw=x_chw, output=out)
    print(f"{name}: out[{out.shape[0]}] range "
          f"[{out.min():.4f}, {out.max():.4f}]")


def gen_crnn_layer(oracle_layer: str = "/tmp/refbuild/oracle_layer",
                   seed: int = 0):
    """Layer-level CRNN golden. Upstream forward_crnn_layer passes a
    NULL workspace to its sub-convolutions (crnn_layer.c:91 s={0}) and
    segfaults; the driver replicates the step loop with a real
    workspace so the pinned math is the reference's own."""
    name = "mini_crnn"
    net = S.build_network_spec(parse_cfg_text(CRNN_ONLY))
    l = net.layers[0]
    params = init_params(net, seed=seed)[0]
    rng = np.random.default_rng(seed + 1000)
    x_chw = rng.uniform(0, 1, (l.c, l.h, l.w)).astype(np.float32)
    blob = b""
    for sub in ("input", "self", "output"):
        p = params[sub]
        blob += np.transpose(p["weights"], (3, 2, 0, 1)).astype(
            "<f4").tobytes()
        blob += p["biases"].astype("<f4").tobytes()
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        (td / "in.bin").write_bytes(x_chw.tobytes())
        (td / "p.bin").write_bytes(blob)
        subprocess.run(
            [oracle_layer, "crnn", str(l.h), str(l.w), str(l.c),
             str(l.hidden_filters), str(l.output_filters), l.activation,
             str(td / "in.bin"), str(td / "p.bin"), str(td / "out.bin")],
            check=True, capture_output=True)
        out = np.frombuffer((td / "out.bin").read_bytes(), "<f4").copy()
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(CRNN_ONLY.encode(), dtype=np.uint8),
        seed=np.int64(seed), input_chw=x_chw, output=out)
    print(f"{name}: out[{out.shape[0]}] range "
          f"[{out.min():.4f}, {out.max():.4f}]")


MINI_CRNN = """
[net]
batch=1
time_steps=1
subdivisions=1
height=8
width=8
channels=3

[crnn]
batch_normalize=0
output_filters=6
hidden_filters=5
activation=leaky

[avgpool]
"""


MINI_XNOR = """
[net]
batch=1
height=12
width=12
channels=3

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky

[convolutional]
xnor=1
filters=8
size=3
stride=1
pad=1
activation=leaky

[avgpool]
"""


MINI_TREE_CLS = """
[net]
batch=1
height=8
width=8
channels=3

[convolutional]
filters=7
size=3
stride=2
pad=1
activation=leaky

[avgpool]

[softmax]
groups=1
tree={TREE}
"""


def gen_tree_classifier(oracle: str, seed: int = 0):
    name = "mini_tree_cls"
    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        tree_path = td / "mini.tree"
        tree_path.write_text(TREE_TEXT)
        cfg_text = MINI_TREE_CLS.replace("{TREE}", str(tree_path))
        net = S.build_network_spec(parse_cfg_text(cfg_text))
        params = init_params(net, seed=seed)
        rng = np.random.default_rng(seed + 1000)
        x_chw = rng.uniform(0, 1, (3, 8, 8)).astype(np.float32)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_text)
        (td / "in.bin").write_bytes(x_chw.tobytes())
        subprocess.run(
            [oracle, str(td / "net.cfg"), str(td / "w.weights"),
             str(td / "in.bin"), str(td / "out.bin")],
            check=True, capture_output=True)
        out = np.frombuffer((td / "out.bin").read_bytes(), dtype="<f4").copy()
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(MINI_TREE_CLS.encode(), dtype=np.uint8),
        tree=np.frombuffer(TREE_TEXT.encode(), dtype=np.uint8),
        seed=np.int64(seed), input_chw=x_chw, output=out)
    print(f"{name}: out {out}")


# ---------------------------------------------------------------------
# Round-3 mAP-gate widening: yolov2-style trunk (route/reorg/maxpool)
# and a WordTree-decode config, both A/B'd against oracle_valid
# (detector.c:244-369). VERDICT r2 item 5.
# ---------------------------------------------------------------------

MAP_AB_V2_CFG = """
[net]
batch=8
subdivisions=1
height=96
width=96
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
max_batches=10000
policy=steps
steps=500,800
scales=.2,.2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=32
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=64
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=1
filters=128
size=3
stride=1
pad=1
activation=leaky

[route]
layers=-3

[reorg]
stride=2

[route]
layers=-1,-3

[convolutional]
filters=40
size=1
stride=1
pad=1
activation=linear

[region]
anchors=2.2,2.2, 3.6,2.8, 2.8,3.6, 4.8,4.8, 3.2,3.2
bias_match=1
classes=3
coords=4
num=5
softmax=1
rescore=1
object_scale=30
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
"""

# 5-node WordTree: two roots, leaves {2,3} under n0 and {4} under n1;
# GT classes 0..2 map to leaf nodes 2..4 (class_offset=2)
MAP_AB_TREE_TEXT = "n0 -1\nn1 -1\nn2 0\nn3 0\nn4 1\n"
MAP_AB_TREE_OFFSET = 2

MAP_AB_TREE_CFG = """
[net]
batch=8
subdivisions=1
height=64
width=64
channels=3
momentum=0.9
decay=0.0005
learning_rate=0.001
max_batches=10000
policy=steps
steps=500,800
scales=.2,.2

[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
batch_normalize=1
filters=64
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=30
size=1
stride=1
pad=1
activation=linear

[region]
anchors=2.2,2.2, 3.6,2.8, 3.2,3.2
bias_match=1
classes=5
coords=4
num=3
softmax=1
rescore=1
tree=TREEFILE
thresh=.6
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
"""


def _train_map_ab_named(cfg_text, list_path, gt, steps, seed,
                        class_offset=0):
    from sr_object_detection_tpu.train.trainer import Trainer
    net = S.build_network_spec(parse_cfg_text(cfg_text))
    trainer = Trainer(net, seed=seed)
    for k, (x, truth) in enumerate(_map_ab_batches(
            gt, list_path, net.net.w, net.net.h, net.net.batch, steps,
            seed)):
        if class_offset:
            truth = truth.copy()
            has = truth[..., 2] > 0       # real boxes (w > 0)
            truth[..., 4] = np.where(has, truth[..., 4] + class_offset,
                                     truth[..., 4])
        m = trainer.step(x, truth)
        if (k + 1) % 100 == 0:
            print(f"  train {k+1}/{steps} loss={float(m['loss']):.3f}")
    import jax
    return net, jax.tree.map(np.asarray, trainer.state.params)


def gen_map_ab_named(name, cfg_text,
                     oracle_valid: str = "/tmp/refbuild/oracle_valid",
                     steps: int = 400, tree_text: str | None = None,
                     class_offset: int = 0, lr: float | None = None,
                     thresh: float | None = None):
    """Generalized gen_map_ab: train OUR weights on the synthetic set,
    run the reference validate_detector loop over them, store cfg +
    weights + oracle detections (+ tree file) for the parity test."""
    from tools.synth_dataset import (make_dataset, gt_corner_boxes,
                                     dataset_digest, N_CLASSES)
    from sr_object_detection_tpu.eval.voc import mean_ap

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        data_dir = td / "data"
        list_path, gt = make_dataset(str(data_dir), MAP_AB_IMAGES,
                                     MAP_AB_SEED)
        digest = dataset_digest(str(data_dir))
        cfg_inst = cfg_text
        if lr is not None:
            # deeper trunks (route/reorg) need a hotter LR to learn
            # objectness within a golden-generation budget
            cfg_inst = cfg_inst.replace("learning_rate=0.001",
                                        f"learning_rate={lr}")
        if tree_text is not None:
            (td / "tree.txt").write_text(tree_text)
            cfg_inst = cfg_text.replace("TREEFILE", str(td / "tree.txt"))
        net, params = _train_map_ab_named(cfg_inst, list_path, gt,
                                          steps, MAP_AB_SEED,
                                          class_offset)
        save_weights(net, params, str(td / "w.weights"))
        (td / "net.cfg").write_text(cfg_inst)
        results = td / "results"
        results.mkdir()
        use_thresh = MAP_AB_THRESH if thresh is None else thresh
        subprocess.run(
            [oracle_valid, str(td / "net.cfg"), str(td / "w.weights"),
             list_path, str(results), str(use_thresh),
             str(MAP_AB_NMS)],
            check=True, capture_output=True)
        region = net.layers[-1]
        n_out_classes = region.classes
        det_texts = {}
        per_class_dets = {}
        for c in range(N_CLASSES):
            node = c + class_offset
            text = (results / f"comp4_det_test_{node}.txt").read_text()
            det_texts[c] = text
            dets = []
            for line in text.splitlines():
                f = line.split()
                dets.append((f[0], float(f[1]), float(f[2]),
                             float(f[3]), float(f[4]), float(f[5])))
            per_class_dets[c] = dets
        oracle_map, aps = mean_ap(per_class_dets, gt_corner_boxes(gt))
        wbytes = (td / "w.weights").read_bytes()

    extra = {}
    if tree_text is not None:
        extra["tree"] = np.frombuffer(tree_text.encode(), dtype=np.uint8)
    np.savez_compressed(
        GOLDEN / name,
        cfg=np.frombuffer(cfg_text.encode(), dtype=np.uint8),
        weights=np.frombuffer(wbytes, dtype=np.uint8),
        digest=np.frombuffer(digest.encode(), dtype=np.uint8),
        n_images=np.int64(MAP_AB_IMAGES), seed=np.int64(MAP_AB_SEED),
        thresh=np.float32(MAP_AB_THRESH if thresh is None else thresh),
        nms=np.float32(MAP_AB_NMS),
        class_offset=np.int64(class_offset),
        oracle_map=np.float64(oracle_map),
        **{f"dets_{c}": np.frombuffer(t.encode(), dtype=np.uint8)
           for c, t in det_texts.items()}, **extra)
    print(f"{name}: oracle mAP={oracle_map:.4f} per-class={aps}")


def gen_map_ab_v2(oracle_valid: str = "/tmp/refbuild/oracle_valid",
                  steps: int = 2000):
    # deeper route/reorg trunk: objectness converges slowly at batch 8,
    # so train hotter (lr 3e-3, object_scale 30) and gate detections at
    # a lower threshold — the A/B tests DECODE parity, not model quality
    gen_map_ab_named("map_ab_v2", MAP_AB_V2_CFG, oracle_valid, steps,
                     lr=0.003, thresh=0.001)


def gen_map_ab_tree(oracle_valid: str = "/tmp/refbuild/oracle_valid",
                    steps: int = 400):
    gen_map_ab_named("map_ab_tree", MAP_AB_TREE_CFG, oracle_valid,
                     steps, tree_text=MAP_AB_TREE_TEXT,
                     class_offset=MAP_AB_TREE_OFFSET)
