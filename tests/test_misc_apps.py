"""Misc app tests: v1 decode, truth packing, A/B weight averaging."""

import numpy as np

import jax
import jax.numpy as jnp

from sr_object_detection_tpu.apps.misc_apps import (
    decode_detection_boxes, fill_truth_region_np, _int_to_alphanum)
from sr_object_detection_tpu.graph.spec import DetectionSpec


def _det_spec(side=3, classes=3, n=2):
    return DetectionSpec(index=0, side=side, classes=classes, n=n,
                         coords=4, sqrt=True)


def test_v1_decode_geometry():
    spec = _det_spec()
    s2 = spec.side ** 2
    out = np.zeros(s2 * (spec.classes + spec.n * 5), np.float32)
    # put one confident box in cell (row 1, col 2), box slot 0
    cell = 1 * spec.side + 2
    out[s2 * spec.classes + cell * spec.n + 0] = 0.9          # objectness
    box_off = s2 * (spec.classes + spec.n) + (cell * spec.n) * 4
    out[box_off:box_off + 4] = [0.5, 0.5, 0.6, 0.4]           # x,y,sqrt w,h
    out[cell * spec.classes + 1] = 1.0                        # class 1
    boxes, probs = decode_detection_boxes(out, spec)
    i = cell * spec.n
    assert abs(boxes[i, 0] - (2 + 0.5) / 3) < 1e-6
    assert abs(boxes[i, 1] - (1 + 0.5) / 3) < 1e-6
    assert abs(boxes[i, 2] - 0.36) < 1e-6                     # sqrt undone
    assert abs(probs[i, 1] - 0.9) < 1e-6


def test_fill_truth_region_grid():
    labels = np.array([[2, 0.5, 0.5, 0.3, 0.4],
                       [1, 0.9, 0.1, 0.2, 0.2]], np.float32)
    t = fill_truth_region_np(labels, side=3, classes=3)
    c1 = 1 * 3 + 1   # (0.5,0.5) -> col 1, row 1
    assert t[c1, 0] == 1 and t[c1, 1 + 2] == 1
    np.testing.assert_allclose(t[c1, 4:], [0.5, 0.5, 0.3, 0.4], atol=1e-6)
    c2 = 0 * 3 + 2   # (0.9,0.1) -> col 2, row 0
    assert t[c2, 0] == 1 and t[c2, 1 + 1] == 1


def test_alphanum_mapping():
    assert _int_to_alphanum(0) == "0"
    assert _int_to_alphanum(9) == "9"
    assert _int_to_alphanum(10) == "a"
    assert _int_to_alphanum(35) == "z"
    assert _int_to_alphanum(36) == "."


def test_periodic_weight_average_matches_reference_semantics():
    """sync_nets averages full replicas (network_kernels.cu:279-344)."""
    from sr_object_detection_tpu.parallel.mesh import \
        periodic_weight_average
    a = [{"weights": jnp.ones((2, 2)), "biases": jnp.zeros(2)}]
    b = [{"weights": 3 * jnp.ones((2, 2)), "biases": 2 * jnp.ones(2)}]
    avg = periodic_weight_average([a, b])
    np.testing.assert_allclose(np.asarray(avg[0]["weights"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg[0]["biases"]), 1.0)


def test_video_rnn_features(tmp_path):
    """rnn_vid analog: per-frame conv features for the video RNN."""
    from sr_object_detection_tpu.apps.misc_apps import VideoRNN
    from sr_object_detection_tpu.models.zoo import CfgBuilder
    import os
    b = CfgBuilder()
    b.net(batch=1, width=32, height=32, channels=3)
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=2)
    b.section("avgpool")
    cfg = os.path.join(tmp_path, "v.cfg")
    with open(cfg, "w") as f:
        f.write(b.text())
    vr = VideoRNN(cfg, feature_layer=1)
    frames = np.random.default_rng(0).random((3, 32, 32, 3)).astype(
        np.float32)
    feats = vr.features(frames)
    assert feats.shape == (3, 8 * 8 * 16)
    assert np.isfinite(feats).all()


def test_yolo_v1_training_loop(tmp_path):
    """swag/yolo/coco v1 train path: grid truth + detection loss."""
    import os
    from sr_object_detection_tpu.apps.misc_apps import run_yolo_v1
    from sr_object_detection_tpu.models.zoo import CfgBuilder
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(); lbl_dir.mkdir()
    paths = []
    for i in range(4):
        arr = rng.random((32, 32, 3)).astype(np.float32)
        p = img_dir / f"f{i}.ppm"
        h, w, _ = arr.shape
        with open(p, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (w, h))
            f.write((arr * 255).astype(np.uint8).tobytes())
        (lbl_dir / f"f{i}.txt").write_text("1 0.5 0.5 0.4 0.4\n")
        paths.append(str(p))
    (tmp_path / "train.list").write_text("\n".join(paths))
    (tmp_path / "v1.data").write_text(
        f"train={tmp_path}/train.list\nbackup={tmp_path}/backup\n")
    b = CfgBuilder()
    b.net(batch=2, width=32, height=32, channels=3, learning_rate=0.001,
          max_batches=3, policy="constant")
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=4)
    b.section("connected", output=3 * 3 * (2 * 5 + 3), activation="linear")
    b.section("detection", classes=3, coords=4, side=3, num=2, softmax=1,
              sqrt=1, rescore=1, coord_scale=5, noobject_scale=.5)
    cfg = tmp_path / "v1.cfg"
    cfg.write_text(b.text())
    trainer = run_yolo_v1(str(tmp_path / "v1.data"), str(cfg), None, [],
                          classes=3)
    assert int(trainer.state.seen) == 3 * 2


def test_best_3d_shift_and_extract_voxel(tmp_path):
    """extract_voxel (voxel.c:15-49): stereo stream alignment by
    binary-search vertical shift + fixed-disparity crops."""
    from sr_object_detection_tpu.apps.misc_apps import (
        best_3d_shift_r, extract_voxel)
    # smooth vertical gradient: the reference's binary search assumes
    # distance is unimodal in the shift (true for natural images)
    g = np.linspace(0, 1, 60, dtype=np.float32)[:, None, None]
    base = np.broadcast_to(g, (60, 40, 3)).copy()
    base += np.linspace(0, .2, 40, dtype=np.float32)[None, :, None]
    base = np.clip(base, 0, 1)
    shift_true = 3
    right = np.roll(base, shift_true, axis=0)
    # b shifted DOWN by 3 -> crop of b at dy=+3 matches a
    s = best_3d_shift_r(base, right, -6, 6)
    assert s == shift_true
    ld = tmp_path / "l"
    rd = tmp_path / "r"
    ld.mkdir(), rd.mkdir()
    from tools.synth_dataset import write_ppm
    for i in range(3):
        write_ppm(str(ld / f"f{i}.ppm"),
                  (base * 255).astype(np.uint8))
        write_ppm(str(rd / f"f{i}.ppm"),
                  (right * 255).astype(np.uint8))
    out = extract_voxel(str(ld), str(rd),
                        str(tmp_path / "vox"),
                        ["-w", "20", "-h", "30", "-xoff", "4"])
    assert len(out) == 6
    import os
    assert all(os.path.exists(p) for p in out)
    # aligned crops: the shifted right crop matches the left crop
    from sr_object_detection_tpu.ops.image import load_image_rgb
    l0 = load_image_rgb(out[0])
    r0 = load_image_rgb(out[1])
    assert l0.shape == r0.shape == (30, 20, 3)


def test_generate_vid_rnn(tmp_path):
    """generate_vid_rnn (rnn_vid.c:154-198): extractor-primed feature
    RNN free-run with feature-space image reconstruction."""
    from sr_object_detection_tpu.apps.misc_apps import generate_vid_rnn
    from tools.synth_dataset import write_ppm
    rng = np.random.default_rng(1)
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(4):
        write_ppm(str(frames / f"f{i}.ppm"),
                  rng.integers(0, 255, (12, 12, 3)).astype(np.uint8))
    ext_cfg = tmp_path / "ext.cfg"
    ext_cfg.write_text("""[net]
batch=1
height=12
width=12
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0001

[convolutional]
filters=4
size=3
stride=2
pad=1
activation=leaky

[connected]
output=16
activation=logistic
""")
    rnn_cfg = tmp_path / "vrnn.cfg"
    rnn_cfg.write_text("""[net]
batch=1
inputs=16
time_steps=1
learning_rate=0.01
momentum=0.9
decay=0.0001

[rnn]
output=16
hidden=8
activation=leaky
batch_normalize=1
""")
    outs = generate_vid_rnn(
        str(rnn_cfg), None,
        ["-extractor", str(ext_cfg), "-frames",
         str(frames / "*.ppm"), "-n", "2", "-gen", "2",
         "-recon-iters", "3", "-out", str(tmp_path / "gen")])
    assert len(outs) == 2
    import os
    names = sorted(os.listdir(tmp_path / "gen"))
    # 2 primes x (feat,next) + 2 generated
    assert names == ["feat0.ppm", "feat1.ppm", "new0.ppm", "new1.ppm",
                     "next0.ppm", "next1.ppm"]
    assert all(o.shape == (12, 12, 3) for o in outs)
    assert all(np.isfinite(o).all() for o in outs)


def _v1_setup(tmp_path, classes=3):
    """Tiny v1 net + image list + labels for test/valid/recall/demo."""
    import os
    from sr_object_detection_tpu.models.zoo import CfgBuilder
    rng = np.random.default_rng(2)
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(exist_ok=True)
    lbl_dir.mkdir(exist_ok=True)
    paths = []
    for i in range(3):
        arr = rng.random((40, 48, 3)).astype(np.float32)
        p = img_dir / f"pic_{i:03d}.ppm"
        with open(p, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (48, 40))
            f.write((arr * 255).astype(np.uint8).tobytes())
        (lbl_dir / f"pic_{i:03d}.txt").write_text("1 0.5 0.5 0.4 0.4\n")
        paths.append(str(p))
    lst = tmp_path / "test.list"
    lst.write_text("\n".join(paths) + "\n")
    b = CfgBuilder()
    b.net(batch=1, width=32, height=32, channels=3,
          learning_rate=0.001, policy="constant")
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=4)
    b.section("connected", output=3 * 3 * (2 * 5 + classes),
              activation="linear")
    b.section("detection", classes=classes, coords=4, side=3, num=2,
              softmax=1, sqrt=1, rescore=1)
    cfg = tmp_path / "v1.cfg"
    cfg.write_text(b.text())
    return str(cfg), str(lst), paths


def test_v1_test_valid_recall_demo(tmp_path, capsys):
    """yolo.c:116-339 / coco.c valid writers: the v1 inference modes."""
    import os
    from sr_object_detection_tpu.apps import yolo_v1_app as V1
    cfg, lst, paths = _v1_setup(tmp_path)
    names = ["a", "b", "c"]
    # test: single image + drawn output
    out_img = tmp_path / "pred.ppm"
    dets = V1.test_yolo_v1(cfg, None, paths[0],
                           ["-thresh", "0.0", "-out", str(out_img)],
                           names=names)
    assert os.path.exists(out_img)
    # valid (VOC writer): per-class files with 6-field lines
    V1.validate_yolo_v1(cfg, None,
                        ["-list", lst, "-out", str(tmp_path / "res")],
                        names=names)
    f0 = tmp_path / "res" / "comp4_det_test_a.txt"
    assert f0.exists()
    lines = [l.split() for l in f0.read_text().strip().splitlines()]
    assert all(len(l) == 6 for l in lines)
    assert {l[0] for l in lines} <= {"pic_000", "pic_001", "pic_002"}
    # valid (COCO json): records carry dataset category ids
    V1.validate_yolo_v1(cfg, None,
                        ["-list", lst, "-out", str(tmp_path / "resc")],
                        names=names, coco=True)
    import json
    recs = json.loads((tmp_path / "resc" /
                       "coco_results.json").read_text())
    assert recs and all(r["category_id"] in V1.COCO_IDS[:3]
                        for r in recs)
    assert {r["image_id"] for r in recs} == {0, 1, 2}
    # recall: objectness-channel proposals vs labels
    capsys.readouterr()
    r = V1.validate_yolo_v1_recall(cfg, None, ["-list", lst])
    assert r["total"] == 3
    assert "RPs/Img" in capsys.readouterr().out
    # demo: streaming over the image dir
    res = V1.demo_yolo_v1(cfg, None,
                          ["-frames", str(tmp_path / "images" / "*.ppm"),
                           "-thresh", "0.0"], names=names)
    assert len(res) == 3 and res[-1]["fps"] > 0
