"""The COMPLETE reference training workflow as one system test, through
the real CLI entry points (VERDICT r4 item 8):

    pack dataset -> `detector train -packed` (N steps, checkpoints)
    -> `detector valid` (comp4 det files, detector.c:244-369)
    -> tools/reval_voc.py re-score (scripts/reval_voc.py analog)
    -> mAP gate

i.e. the chain a reference user runs as
    darknet detector train voc.data cfg  (detector.c:25-168)
    darknet detector valid voc.data cfg backup/final.weights
    python scripts/reval_voc.py ...
on a synthetic single-class VOC-format set small enough for CPU.
"""

import os

import numpy as np
import pytest


TOY_CFG = """\
[net]
batch=8
subdivisions=1
width=48
height=48
channels=3
learning_rate=0.002
momentum=0.9
decay=0.0005
policy=constant
max_batches={max_batches}
hue=.05
saturation=1.2
exposure=1.2

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
filters=32
size=3
stride=2
pad=1
activation=leaky

[convolutional]
filters=12
size=1
stride=1
pad=1
activation=linear

[region]
anchors=1.5,1.5,4,4
bias_match=1
classes=1
coords=4
num=2
softmax=1
rescore=1
jitter=.1
object_scale=5
noobject_scale=1
class_scale=1
coord_scale=1
thresh=.6
random=0
"""


def _write_dataset(root, n, seed=0):
    """White squares on dark noise as PNG images + darknet txt labels
    (the images/ -> labels/ find_replace convention, data.c)."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    img_dir = root / "images"
    lab_dir = root / "labels"
    img_dir.mkdir(parents=True, exist_ok=True)
    lab_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(n):
        x = (rng.random((48, 48, 3)) * 0.2 * 255).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        s = rng.uniform(0.25, 0.4)
        x0, x1 = int((cx - s / 2) * 48), int((cx + s / 2) * 48)
        y0, y1 = int((cy - s / 2) * 48), int((cy + s / 2) * 48)
        x[y0:y1, x0:x1] = 242
        p = img_dir / f"im{i:03d}.png"
        Image.fromarray(x).save(p)
        (lab_dir / f"im{i:03d}.txt").write_text(
            f"0 {cx:.6f} {cy:.6f} {s:.6f} {s:.6f}\n")
        paths.append(str(p))
    return paths


def test_full_reference_workflow_train_valid_reval(tmp_path, capsys):
    from sr_object_detection_tpu.apps import cli
    from sr_object_detection_tpu.data.packed import pack_detection_dataset
    import tools.reval_voc as RV

    # dataset + .data config --------------------------------------------
    train_paths = _write_dataset(tmp_path / "train", 64, seed=0)
    valid_paths = _write_dataset(tmp_path / "valid", 16, seed=99)
    (tmp_path / "train.list").write_text("\n".join(train_paths) + "\n")
    (tmp_path / "valid.list").write_text("\n".join(valid_paths) + "\n")
    (tmp_path / "obj.names").write_text("thing\n")
    backup = tmp_path / "backup"
    (tmp_path / "obj.data").write_text(
        f"classes = 1\n"
        f"train = {tmp_path / 'train.list'}\n"
        f"valid = {tmp_path / 'valid.list'}\n"
        f"names = {tmp_path / 'obj.names'}\n"
        f"backup = {backup}\n")
    cfg = tmp_path / "toy-det.cfg"
    cfg.write_text(TOY_CFG.format(max_batches=150))

    # one-time pack (decode paid off the training path, data/packed.py)
    prefix = str(tmp_path / "train_packed")
    hdr = pack_detection_dataset(train_paths, prefix, store_w=48,
                                 store_h=48, quiet=True)
    assert hdr["n"] == 64

    # train through the CLI (detector.c:25-168 analog) ------------------
    cli.main(["detector", "train", str(tmp_path / "obj.data"),
              str(cfg), "-packed", prefix])
    final = backup / "toy-det_final.weights"
    assert final.exists(), os.listdir(backup)
    # checkpoints + native train state were written along the way
    assert (backup / "toy-det.state.npz").exists()

    # valid through the CLI (detector.c:244-369 analog) -----------------
    results = tmp_path / "results"
    cli.main(["detector", "valid", str(tmp_path / "obj.data"),
              str(cfg), str(final), "-outdir", str(results)])
    det_file = results / "comp4_det_test_thing.txt"
    assert det_file.exists()
    assert len(det_file.read_text().splitlines()) > 0, \
        "valid wrote no detections"

    # re-score the saved det files (scripts/reval_voc.py analog) --------
    m_ap = RV.main([str(results),
                    "--classes", str(tmp_path / "obj.names"),
                    "--labels", str(tmp_path / "valid" / "labels"),
                    "--image-list", str(tmp_path / "valid.list")])
    out = capsys.readouterr().out
    assert "Mean AP" in out
    # the workflow gate: 150 steps on an easy synthetic task must
    # produce a detector that actually finds the squares (the API-level
    # twin of this chain reaches ~0.5+ — test_e2e.py)
    assert m_ap > 0.3, f"workflow mAP too low: {m_ap}"


def test_cli_train_bf16_flag(tmp_path):
    """-bf16: the TPU production training mode through the CLI
    (bf16 compute + phase_train, gated to B=128 geometry inside the
    compiler — at this toy batch it exercises the bf16 trainer path
    end-to-end and writes checkpoints like the f32 default)."""
    from sr_object_detection_tpu.apps import cli

    train_paths = _write_dataset(tmp_path / "train", 16, seed=3)
    (tmp_path / "train.list").write_text("\n".join(train_paths) + "\n")
    (tmp_path / "obj.names").write_text("thing\n")
    backup = tmp_path / "backup"
    (tmp_path / "obj.data").write_text(
        f"classes = 1\n"
        f"train = {tmp_path / 'train.list'}\n"
        f"names = {tmp_path / 'obj.names'}\n"
        f"backup = {backup}\n")
    cfg = tmp_path / "toy-det.cfg"
    cfg.write_text(TOY_CFG.format(max_batches=3))

    cli.main(["detector", "train", str(tmp_path / "obj.data"),
              str(cfg), "-bf16"])
    assert (backup / "toy-det_final.weights").exists()
