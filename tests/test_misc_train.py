"""Misc-app training loops (captcha/tag/writing/compare/vid-rnn) and
the classifier valid_crop/valid_full/threat/gun modes."""

import os

import numpy as np
import pytest

from sr_object_detection_tpu.apps import misc_train as MT


def _write_ppm(path, img01):
    from tools.synth_dataset import write_ppm
    write_ppm(str(path), (np.clip(img01, 0, 1) * 255).astype(np.uint8))


def _toy_cfg(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


CLS_CFG = """\
[net]
batch=4
subdivisions=1
height=16
width=16
channels={ch}
learning_rate=0.05
momentum=0.9
decay=0.0001
policy=constant
max_batches=50

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky
batch_normalize=1

[avgpool]

[connected]
output={out}
activation=logistic

[cost]
type=masked
"""


def test_fix_data_captcha_mask():
    """fix_data_captcha (captcha.c:5-27): solved mode masks unlabeled
    pairs with SECRET_NUM and keeps only the 'absent' slot of
    double-hot pairs."""
    y = np.array([[1, 0, 0, 0],
                  [1, 1, 0, 1]], np.float32)
    m = MT.fix_data_captcha(y, mask=True)
    np.testing.assert_array_equal(m[0], [1, 0, MT.SECRET_NUM,
                                         MT.SECRET_NUM])
    np.testing.assert_array_equal(m[1], [0, 1, MT.SECRET_NUM,
                                         MT.SECRET_NUM])
    u = MT.fix_data_captcha(y, mask=False)
    np.testing.assert_array_equal(u[:, 1], [0, 0])   # complement slot
    np.testing.assert_array_equal(u[:, 3], [1, 1])   # j empty -> 1


def _image_set(tmp_path, names, n_per=6, seed=0):
    """Images whose mean brightness correlates with the class (so a
    toy net can learn) and whose paths contain the class name."""
    rng = np.random.default_rng(seed)
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    paths = []
    for ci, name in enumerate(names):
        level = (ci + 1) / (len(names) + 1)
        for k in range(n_per):
            img = np.full((16, 16, 3), level, np.float32) \
                + rng.normal(0, .05, (16, 16, 3))
            p = d / f"{name}_{k}.ppm"
            _write_ppm(p, img)
            paths.append(str(p))
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst), paths


def test_train_captcha(tmp_path):
    # labels come in (present, absent) pairs within the label list
    # (fix_data_captcha pairs slots 2i/2i+1) — len(labels) == net out
    names = ["ax", "ay", "bx", "by"]
    lst, _ = _image_set(tmp_path, names)
    labels = tmp_path / "labels.list"
    labels.write_text("\n".join(names) + "\n")
    cfg = _toy_cfg(tmp_path, "cap.cfg", CLS_CFG.format(ch=3, out=4))
    losses = MT.train_captcha(
        cfg, None, ["-list", lst, "-labels", str(labels),
                    "-backup", str(tmp_path / "bk")], max_batches=25)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert (tmp_path / "bk" / "cap.weights").exists()


def test_load_tags_and_train_tag(tmp_path):
    lst, paths = _image_set(tmp_path, ["thing"], n_per=8)
    labdir = tmp_path / "labels"
    labdir.mkdir()
    # tag files via the imgs->labels, _iconl.jpeg->.txt chain; our
    # paths are .ppm so name them accordingly
    for i, p in enumerate(paths):
        t = p.replace("imgs", "labels")
        os.makedirs(os.path.dirname(t), exist_ok=True)
        open(t.replace(".ppm", ".ppm"), "w")  # ensure dir
    # use the documented chain exactly: rename sample to _iconl.jpeg
    tag_paths = []
    for i, p in enumerate(paths):
        np_path = p.replace(".ppm", "_iconl.jpeg.ppm")
        os.rename(p, np_path)       # keep a loadable image
        tag_paths.append(np_path)
        lab = np_path.replace("imgs", "labels").replace(
            "_iconl.jpeg", ".txt")
        with open(lab, "w") as f:
            f.write(f"{i % 4}\n")
    y = MT.load_tags(tag_paths[2], 8)
    assert y[2] == 1.0 and y.sum() == 1.0
    lst2 = tmp_path / "tags.list"
    lst2.write_text("\n".join(tag_paths) + "\n")
    cfg = _toy_cfg(tmp_path, "tag.cfg", CLS_CFG.format(ch=3, out=8))
    losses = MT.train_tag(cfg, None,
                          ["-list", str(lst2),
                           "-backup", str(tmp_path / "bk")],
                          max_batches=10)
    assert np.all(np.isfinite(losses)) and len(losses) == 10


WRITING_CFG = """\
[net]
batch=4
subdivisions=1
height=16
width=16
channels=3
learning_rate=0.05
momentum=0.9
decay=0.0001
policy=constant
max_batches=50

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky
batch_normalize=1

[convolutional]
filters=1
size=3
stride=1
pad=1
activation=logistic

[cost]
type=masked
"""


def test_train_writing(tmp_path):
    """writing: pixel-wise grayscale targets from '-label.png' partner
    files at the net's output resolution (data.c:800-813)."""
    rng = np.random.default_rng(1)
    d = tmp_path / "figs"
    d.mkdir()
    paths = []
    for k in range(8):
        img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        # target: thresholded luma of the input (learnable identity-ish)
        label = (img.mean(-1) > 0.5).astype(np.float32)
        p = d / f"fig{k}.png.ppm"     # find_replace works on '.png'
        _write_ppm(p, img)
        _write_ppm(str(p).replace(".png", "-label.png"),
                   np.repeat(label[..., None], 3, -1))
        paths.append(str(p))
    lst = tmp_path / "figures.list"
    lst.write_text("\n".join(paths) + "\n")
    cfg = _toy_cfg(tmp_path, "writing.cfg", WRITING_CFG)
    losses = MT.train_writing(cfg, None,
                              ["-list", str(lst),
                               "-backup", str(tmp_path / "bk")],
                              max_batches=25)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_compare(tmp_path):
    """compare: 6-channel pair input, 2*classes win/lose/masked truth
    (data.c:547-609)."""
    rng = np.random.default_rng(2)
    d = tmp_path / "imgs"
    d.mkdir()
    ld = tmp_path / "labels"
    ld.mkdir()
    paths = []
    for k in range(12):
        img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        p = d / f"im{k}.jpg.ppm"      # 'jpg'->'txt' chain intact
        _write_ppm(p, img)
        lab = str(p).replace("imgs", "labels").replace("jpg", "txt")
        with open(lab, "w") as f:
            f.write(f"0 {rng.uniform(0, 1):.3f}\n")
        paths.append(str(p))
    lst = tmp_path / "compare.list"
    lst.write_text("\n".join(paths) + "\n")
    cfg = _toy_cfg(tmp_path, "cmp.cfg", CLS_CFG.format(ch=6, out=4))
    losses = MT.train_compare(cfg, None,
                              ["-list", str(lst), "-classes", "2",
                               "-backup", str(tmp_path / "bk")],
                              max_batches=8)
    assert np.all(np.isfinite(losses)) and len(losses) == 8


def test_compare_labels_masking(tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    for n, iou in (("a", 0.9), ("b", 0.1)):
        _write_ppm(d / f"{n}.jpg.ppm", np.zeros((4, 4, 3)))
        lab = tmp_path / "labels"
        lab.mkdir(exist_ok=True)
        with open(str(d / f"{n}.jpg.ppm").replace("imgs", "labels")
                  .replace("jpg", "txt"), "w") as f:
            f.write(f"0 {iou}\n")
    y = MT.load_compare_labels(str(d / "a.jpg.ppm"),
                               str(d / "b.jpg.ppm"), 2)
    np.testing.assert_array_equal(y[:2], [1.0, 0.0])       # a wins
    assert y[2] == MT.SECRET_NUM and y[3] == MT.SECRET_NUM  # no label


RNN_CFG = """\
[net]
batch=8
subdivisions=1
time_steps=4
height=1
width=1
channels=8
learning_rate=0.02
momentum=0.9
decay=0.0001
policy=constant
max_batches=50

[rnn]
output=16
hidden=16
activation=tanh
batch_normalize=0

[connected]
output=8
activation=linear

[cost]
type=masked
"""

EXT_CFG = """\
[net]
batch=5
subdivisions=1
height=16
width=16
channels=3
learning_rate=0.01
momentum=0.9
decay=0.0001

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky

[avgpool]
"""


def test_train_vid_rnn(tmp_path):
    """vid-rnn: extractor features over frame directories, RNN learns
    feats[t] -> feats[t+1] (rnn_vid.c:24-146)."""
    rng = np.random.default_rng(3)
    vids = []
    for v in range(2):
        d = tmp_path / f"vid{v}"
        d.mkdir()
        base = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
        for t in range(10):
            # smooth temporal drift so features are predictable
            frame = np.clip(base + 0.03 * t, 0, 1)
            _write_ppm(d / f"f{t:03d}.ppm", frame)
        vids.append(str(d))
    lst = tmp_path / "vids.list"
    lst.write_text("\n".join(vids) + "\n")
    ext_cfg = _toy_cfg(tmp_path, "ext.cfg", EXT_CFG)
    rnn_cfg = _toy_cfg(tmp_path, "vrnn.cfg", RNN_CFG)
    losses = MT.train_vid_rnn(
        rnn_cfg, None,
        ["-list", str(lst), "-extractor", ext_cfg,
         "-backup", str(tmp_path / "bk")], max_batches=12)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


# ---------------------------------------------------------------------
# classifier valid_crop / valid_full / threat / gun
# ---------------------------------------------------------------------

def _classifier_setup(tmp_path):
    from sr_object_detection_tpu.apps import misc_train as _
    names = ["dark", "lite"]
    lst, paths = _image_set(tmp_path, names, n_per=5, seed=7)
    data_cfg = tmp_path / "d.data"
    labels = tmp_path / "labels.list"
    labels.write_text("\n".join(names) + "\n")
    data_cfg.write_text(f"valid={lst}\nlabels={labels}\n"
                        f"names={labels}\ntop=2\n")
    cfg = _toy_cfg(tmp_path, "cls.cfg", CLS_CFG.format(ch=3, out=2))
    # train briefly so accuracy is meaningful
    from sr_object_detection_tpu.apps.classifier_app import \
        train_classifier
    bdir = tmp_path / "bk"
    d2 = tmp_path / "t.data"
    d2.write_text(f"train={lst}\nlabels={labels}\nbackup={bdir}\n")
    import dataclasses
    from sr_object_detection_tpu.graph.spec import parse_network_cfg
    from sr_object_detection_tpu.train.trainer import Trainer
    from sr_object_detection_tpu.io import checkpoint as ckpt
    from sr_object_detection_tpu.data.loader import ClassificationLoader
    spec = parse_network_cfg(cfg)
    trainer = Trainer(spec)
    loader = ClassificationLoader(lst, names, w=16, h=16,
                                  batch=trainer.outer_batch,
                                  augment=False)
    for _i in range(40):
        x, y = loader.next_batch()
        trainer.step(x, y)
    bdir.mkdir(exist_ok=True)
    wfile = bdir / "cls.weights"
    ckpt.export_weights(str(wfile), spec, trainer.state)
    return str(data_cfg), cfg, str(wfile), names


def test_validate_classifier_crop_and_full(tmp_path):
    from sr_object_detection_tpu.apps.classifier_app import (
        validate_classifier_crop, validate_classifier_full)
    data_cfg, cfg, wfile, names = _classifier_setup(tmp_path)
    top1c, topkc = validate_classifier_crop(data_cfg, cfg, wfile, [])
    top1f, topkf = validate_classifier_full(data_cfg, cfg, wfile, [])
    # trained on brightness: both modes should beat chance clearly
    assert top1c > 0.7 and top1f > 0.7
    assert topkc == 1.0 and topkf == 1.0      # top-2 of 2 classes


def test_threat_and_gun_demos(tmp_path):
    from sr_object_detection_tpu.apps.classifier_app import (
        threat_classifier, gun_classifier)
    import io
    data_cfg, cfg, wfile, names = _classifier_setup(tmp_path)
    rng = np.random.default_rng(9)
    frames = [rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
              for _ in range(4)]
    out = io.StringIO()
    hist = threat_classifier(data_cfg, cfg, wfile, [], frames=frames,
                             out=out)
    assert len(hist) == 4 and all(0 <= t <= 1.001 for t in hist)
    assert "threat" in out.getvalue()
    out2 = io.StringIO()
    flags = gun_classifier(data_cfg, cfg, wfile, [], frames=frames,
                           out=out2)
    # toy net has 2 outputs; no BAD_CATS index fits -> never flagged
    assert flags == [False] * 4
    assert "Scanning..." in out2.getvalue()


def test_train_and_validate_dice(tmp_path):
    """train_dice/validate_dice (dice.c:7-67): path-substring truth
    over the six face labels, top-1/top-2 val accuracy."""
    lst, _ = _image_set(tmp_path, MT.DICE_LABELS)
    cfg = _toy_cfg(tmp_path, "dice.cfg", CLS_CFG.format(ch=3, out=6))
    losses = MT.train_dice(
        cfg, None, ["-list", lst, "-backup", str(tmp_path / "bk")],
        max_batches=40)
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    wfile = tmp_path / "bk" / "dice.weights"
    assert wfile.exists()
    acc1, acc2 = MT.validate_dice(cfg, str(wfile), ["-list", lst])
    # brightness-separable toy set: top-1 must beat chance, top-2
    # dominates top-1 by construction (network_accuracies contract)
    assert acc2 >= acc1 > 1.0 / 6.0


def test_dice_lr_step_override(tmp_path):
    """dice.c:38 mutates learning_rate *= .1 every 100 iters regardless
    of cfg policy — train_dice realizes it as step(100, .1)."""
    from sr_object_detection_tpu.train.sgd import learning_rate_py
    from sr_object_detection_tpu.graph.spec import parse_network_cfg
    import dataclasses
    cfg = _toy_cfg(tmp_path, "d2.cfg", CLS_CFG.format(ch=3, out=6))
    spec = parse_network_cfg(cfg)
    net = dataclasses.replace(spec.net, policy="step", step=100,
                              scale=0.1)
    assert abs(learning_rate_py(net, 99) - net.learning_rate) < 1e-9
    assert abs(learning_rate_py(net, 100) - net.learning_rate * .1) \
        < 1e-9
    assert abs(learning_rate_py(net, 250) - net.learning_rate * .01) \
        < 1e-9


# ---------------------------------------------------------------------
# compare eval/ranking modes (compare_app)
# ---------------------------------------------------------------------

def _compare_set(tmp_path, n=12, classes=2, seed=3):
    """Pair-comparison set: image brightness encodes quality; labels
    give class-0 IoU = brightness so order is learnable/checkable."""
    rng = np.random.default_rng(seed)
    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    ld = tmp_path / "labels"
    ld.mkdir(exist_ok=True)
    paths = []
    for k in range(n):
        q = (k + 1) / (n + 1)
        img = np.full((16, 16, 3), q, np.float32)
        p = d / f"im{k}.jpg.ppm"
        _write_ppm(p, img)
        lab = str(p).replace("imgs", "labels").replace("jpg", "txt")
        with open(lab, "w") as f:
            f.write(f"0 {q:.4f}\n")
        paths.append(str(p))
    lst = tmp_path / "cmp.list"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst), paths


def test_validate_compare(tmp_path, capsys):
    """validate_compare (compare.c:83-146): pairwise order accuracy
    over differing class slots, streamed in 10 splits."""
    from sr_object_detection_tpu.apps import compare_app as CA
    lst, _ = _compare_set(tmp_path)
    cfg = _toy_cfg(tmp_path, "cmp.cfg", CLS_CFG.format(ch=6, out=4))
    acc = CA.validate_compare(cfg, None, ["-list", lst, "-classes", "2"])
    assert 0.0 <= acc <= 1.0
    out = capsys.readouterr().out
    assert "Acc:" in out


def test_sort_master(tmp_path, capsys):
    """SortMaster3000 (compare.c:228-262): net-as-comparator sort
    returns a permutation of the list."""
    from sr_object_detection_tpu.apps import compare_app as CA
    lst, paths = _compare_set(tmp_path, n=6)
    cfg = _toy_cfg(tmp_path, "cmp.cfg", CLS_CFG.format(ch=6, out=16))
    out = CA.sort_master(cfg, None, ["-list", lst, "-class", "7"])
    assert sorted(out) == sorted(paths)
    assert "compares" in capsys.readouterr().out


def test_battle_royale(tmp_path):
    """BattleRoyaleWithCheese (compare.c:264-341): elo tournament —
    per-class survivor logs exist, elos move off 1500, total elo is
    conserved per class (zero-sum updates)."""
    from sr_object_detection_tpu.apps import compare_app as CA
    lst, paths = _compare_set(tmp_path, n=16)
    cfg = _toy_cfg(tmp_path, "cmp.cfg", CLS_CFG.format(ch=6, out=4))
    elos = CA.battle_royale(
        cfg, None, ["-list", lst, "-classes", "2"],
        rng=np.random.default_rng(0), all_rounds=2, class_rounds=2,
        out_dir=str(tmp_path / "results"))
    assert elos.shape == (16, 2)
    assert np.any(elos != 1500.0)
    np.testing.assert_allclose(elos.sum(axis=0), 1500.0 * 16,
                               atol=1e-6)
    for c in range(2):
        log = tmp_path / "results" / f"battle_{c}.log"
        assert log.exists()
        lines = log.read_text().strip().splitlines()
        # field: 16 -> 8 (half) -> 6 -> 4 (9/10 shrinks, even-rounded)
        assert len(lines) == 4
        for line in lines:
            p, elo = line.rsplit(" ", 1)
            assert p in paths and float(elo) != 0


def test_validate_classifier_10(tmp_path):
    """10-crop eval (classifier.c:336-404): corner/center crops of the
    image + flip, summed — one batched dispatch per image."""
    from sr_object_detection_tpu.apps.classifier_app import \
        validate_classifier_10
    data_cfg, cfg, wfile, names = _classifier_setup(tmp_path)
    top1, topk = validate_classifier_10(data_cfg, cfg, wfile, [])
    assert top1 > 0.7
    assert topk == 1.0


def test_test_and_label_classifier(tmp_path):
    """test (classifier.c:771): TSV rows of raw predictions over the
    `test` list; label (classifier.c:732): argmax label names."""
    import io
    from sr_object_detection_tpu.apps.classifier_app import (
        test_classifier, label_classifier)
    data_cfg, cfg, wfile, names = _classifier_setup(tmp_path)
    # reuse the valid list as the test list
    opts = dict(l.split("=", 1) for l in
                open(data_cfg).read().strip().splitlines())
    with open(data_cfg, "a") as f:
        f.write(f"test={opts['valid']}\n")
    out = io.StringIO()
    n = test_classifier(data_cfg, cfg, wfile, [], out=out)
    rows = out.getvalue().strip().splitlines()
    assert len(rows) == n == 10
    for r in rows:
        parts = r.split("\t")
        assert parts[0].endswith(".ppm") and len(parts) == 3  # 2 classes
        float(parts[1]), float(parts[2])
    out2 = io.StringIO()
    picked = label_classifier(data_cfg, cfg, wfile, [], out=out2)
    assert len(picked) == 10 and set(picked) <= set(names)
    # trained on brightness: most labels should match the path's class
    paths = [l.strip() for l in open(opts["valid"])]
    hits = sum(1 for p, lab in zip(paths, picked) if lab in p)
    assert hits >= 7


def test_demo_classifier(tmp_path):
    import io
    from sr_object_detection_tpu.apps.classifier_app import \
        demo_classifier
    data_cfg, cfg, wfile, names = _classifier_setup(tmp_path)
    rng = np.random.default_rng(4)
    frames = [rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
              for _ in range(3)]
    out = io.StringIO()
    res = demo_classifier(data_cfg, cfg, wfile, [], frames=frames,
                          out=out)
    assert len(res) == 3
    assert "FPS:" in out.getvalue() and "%:" in out.getvalue()


def test_try_classifier(tmp_path):
    """try (classifier.c:595-675): 256->224 center-crop debug forward
    printing the target layer's BN rolling stats + activations."""
    import io
    from sr_object_detection_tpu.apps.classifier_app import \
        try_classifier
    names = ["a", "b"]
    labels = tmp_path / "labels.list"
    labels.write_text("\n".join(names) + "\n")
    data_cfg = tmp_path / "d.data"
    data_cfg.write_text(f"names={labels}\ntop=2\n")
    cfg = _toy_cfg(tmp_path, "t224.cfg", CLS_CFG.format(ch=3, out=2)
                   .replace("height=16", "height=224")
                   .replace("width=16", "width=224"))
    img = tmp_path / "x.ppm"
    _write_ppm(img, np.random.default_rng(1).uniform(
        0, 1, (300, 260, 3)).astype(np.float32))
    out = io.StringIO()
    pred = try_classifier(str(data_cfg), cfg, None, str(img),
                          ["-layer", "0"], out=out)
    assert pred.shape[-1] >= 2 and np.all(np.isfinite(pred))
    text = out.getvalue().strip().splitlines()
    # 8 BN stat rows + 8*112*112 activations + 2 top-k lines
    assert len(text) == 8 + 8 * 112 * 112 + 2


# ---------------------------------------------------------------------
# super / voxel train, captcha test/valid
# ---------------------------------------------------------------------

SUPER_CFG = """\
[net]
batch=2
subdivisions=1
height=8
width=8
channels=3
learning_rate=0.02
momentum=0.9
decay=0.0001
policy=constant
max_batches=20

[convolutional]
filters=8
size=3
stride=1
pad=1
activation=leaky
batch_normalize=1

[deconvolutional]
filters=3
size=2
stride=2
activation=logistic

[cost]
type=sse
"""


def test_train_super_and_voxel_alias(tmp_path):
    """train_super (super.c:10) / train_voxel (voxel.c:51, identical):
    y = random (w*scale, h*scale) crop, x = its downsample."""
    rng = np.random.default_rng(5)
    d = tmp_path / "imgs"
    d.mkdir()
    paths = []
    for k in range(6):
        img = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
        p = d / f"im{k}.ppm"
        _write_ppm(p, img)
        paths.append(str(p))
    lst = tmp_path / "super.list"
    lst.write_text("\n".join(paths) + "\n")
    cfg = _toy_cfg(tmp_path, "sup.cfg", SUPER_CFG)
    losses = MT.train_super(cfg, None,
                            ["-list", str(lst), "-scale", "2",
                             "-backup", str(tmp_path / "bk")],
                            max_batches=20)
    assert np.all(np.isfinite(losses)) and len(losses) == 20
    # learnable: output should approach the upscaled input
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert MT.train_voxel is MT.train_super


def test_captcha_test_and_valid(tmp_path, capsys):
    """test_captcha (captcha.c:98): all labels sorted by score;
    valid_captcha (captcha.c:138): 'truth, preds...' rows with
    last-substring-match truth (the reference scan does not break)."""
    import io
    names = ["aa", "bb", "cc", "dd"]
    lst, paths = _image_set(tmp_path, names, n_per=2)
    labels = tmp_path / "labels.list"
    labels.write_text("\n".join(names) + "\n")
    cfg = _toy_cfg(tmp_path, "cap.cfg", CLS_CFG.format(ch=3, out=4))
    out = io.StringIO()
    pred = MT.test_captcha(cfg, None, paths[0],
                           ["-labels", str(labels)], out=out)
    assert pred.shape[-1] == 4
    line = out.getvalue().strip()
    assert line.count(",") == 3
    # sorted descending by score
    scores = [float(t.split()[1]) for t in line.split(", ")]
    assert scores == sorted(scores, reverse=True)
    out2 = io.StringIO()
    rows = MT.valid_captcha(cfg, None,
                            ["-list", lst, "-labels", str(labels)],
                            out=out2)
    assert len(rows) == 8
    truths = [t for t, _ in rows]
    assert truths == [0, 0, 1, 1, 2, 2, 3, 3]
    # last-match semantics: a path containing two labels picks the
    # later label index
    trick = tmp_path / "imgs" / "aa_bb_x.ppm"
    _write_ppm(trick, np.full((16, 16, 3), .5))
    lst2 = tmp_path / "trick.list"
    lst2.write_text(str(trick) + "\n")
    rows2 = MT.valid_captcha(cfg, None,
                             ["-list", str(lst2),
                              "-labels", str(labels)])
    assert rows2[0][0] == 1
