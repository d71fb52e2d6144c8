"""Data pipeline, eval, surgery, checkpoint, CLI and app tests."""

import os
import pathlib
import tempfile

import numpy as np
import pytest

import darknet_oracle as oracle

from sr_object_detection_tpu.data import augment as A
from sr_object_detection_tpu.data import loader as D
from sr_object_detection_tpu.eval import voc as V
from sr_object_detection_tpu.io import surgery, checkpoint as ckpt
from sr_object_detection_tpu.io.weights import init_params, load_weights, \
    save_weights
from sr_object_detection_tpu.models import zoo


# --------------------------------------------------------------- augment


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    im = rng.random((16, 16, 3)).astype(np.float32)
    back = A.hsv_to_rgb(A.rgb_to_hsv(im))
    np.testing.assert_allclose(back, im, atol=1e-5)


def test_distort_identity():
    rng = np.random.default_rng(1)
    im = rng.random((8, 8, 3)).astype(np.float32)
    out = A.distort_image(im, 0.0, 1.0, 1.0)
    np.testing.assert_allclose(out, im, atol=1e-5)


def test_crop_image_edge_clamp():
    im = np.arange(4 * 4 * 3, dtype=np.float32).reshape(4, 4, 3)
    out = A.crop_image(im, -2, -2, 4, 4)
    assert out.shape == (4, 4, 3)
    np.testing.assert_allclose(out[0, 0], im[0, 0])  # clamped corner
    np.testing.assert_allclose(out[3, 3], im[1, 1])


def test_correct_boxes_flip():
    boxes = np.array([[3, 0.25, 0.5, 0.2, 0.4]], np.float32)
    out = A.correct_boxes(boxes, 0.0, 0.0, 1.0, 1.0, flip=True)
    assert abs(out[0, 1] - 0.75) < 1e-6
    assert abs(out[0, 3] - 0.2) < 1e-6


def test_label_path_derivation():
    assert D.label_path_for("/d/JPEGImages/a.jpg") == "/d/labels/a.txt"
    assert D.label_path_for("/d/images/b.png") == "/d/labels/b.txt"


# ----------------------------------------------------------- detection io


def _write_ppm(path, arr):
    h, w, _ = arr.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write((arr * 255).astype(np.uint8).tobytes())


def test_detection_loader_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    paths = []
    for i in range(4):
        arr = rng.random((48, 64, 3)).astype(np.float32)
        p = img_dir / f"im{i}.ppm"
        _write_ppm(p, arr)
        (lbl_dir / f"im{i}.txt").write_text("1 0.5 0.5 0.4 0.4\n")
        paths.append(str(p))
    loader = D.DetectionLoader(paths, w=64, h=64, batch=2, classes=5,
                               seed=0)
    x, t = loader.next_batch()
    assert x.shape == (2, 64, 64, 3)
    assert t.shape == (2, 30, 5)
    assert (x >= 0).all() and (x <= 1).all()
    # at least one truth box should survive the jitter crop
    assert (t[:, :, 2] > 0).any()


def test_cifar_reader(tmp_path):
    rng = np.random.default_rng(0)
    rec = np.zeros((10, 3073), np.uint8)
    rec[:, 0] = np.arange(10)
    rec[:, 1:] = rng.integers(0, 255, (10, 3072))
    p = tmp_path / "data_batch_1.bin"
    rec.tofile(p)
    x, y = D.load_cifar10_batch(str(p))
    assert x.shape == (10, 32, 32, 3)
    assert y.shape == (10, 10)
    assert (y.sum(axis=1) == 1).all()
    assert x.max() <= 1.0


# ------------------------------------------------------------------ eval


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(V.voc_ap(rec, prec) - 1.0) < 1e-6
    assert abs(V.voc_ap(rec, prec, use_07_metric=True) - 1.0) < 1e-6


def test_eval_class_basic():
    gt = {"img1": {"boxes": [[10, 10, 50, 50]]},
          "img2": {"boxes": [[20, 20, 60, 60]]}}
    dets = [("img1", 0.9, 12, 12, 48, 48),      # hit
            ("img2", 0.8, 100, 100, 140, 140),  # miss
            ("img2", 0.7, 22, 22, 58, 58)]      # hit
    r = V.eval_class(dets, gt)
    assert r.npos == 2
    assert abs(r.recall[-1] - 1.0) < 1e-6
    assert 0.5 < r.ap <= 1.0


def test_mean_ap_with_nms_pipeline():
    m, aps = V.mean_ap({"cat": [("i", 0.9, 0, 0, 10, 10)]},
                       {"cat": {"i": {"boxes": [[0, 0, 10, 10]]}},
                        "dog": {"i": {"boxes": [[5, 5, 15, 15]]}}})
    assert set(aps) == {"cat", "dog"}
    assert aps["cat"] > 0.99 and aps["dog"] == 0.0


# --------------------------------------------------------------- surgery


def test_partial_and_reload(tmp_path):
    spec = zoo.tiny_yolo_voc(width=96, height=96)
    params = init_params(spec, seed=0)
    out = str(tmp_path / "part.weights")
    surgery.partial(spec, params, out, cutoff=3)
    loaded, seen = load_weights(spec, out, cutoff=3)
    assert seen == 0
    np.testing.assert_allclose(loaded[0]["weights"], params[0]["weights"])
    assert not loaded[5]


def test_weights_roundtrip_bitexact(tmp_path):
    spec = zoo.tiny_yolo_voc(width=96, height=96)
    params = init_params(spec, seed=1)
    p1 = str(tmp_path / "a.weights")
    save_weights(spec, params, p1, seen=12345)
    loaded, seen = load_weights(spec, p1)
    assert seen == 12345
    p2 = str(tmp_path / "b.weights")
    save_weights(spec, loaded, p2, seen=seen)
    assert pathlib.Path(p1).read_bytes() == pathlib.Path(p2).read_bytes()


def test_xnor_binary_weights_pack_roundtrip():
    """Bit-packed XNOR conv weights (parser.c:737-766 / :933-961, dead
    code upstream): pack -> unpack reconstructs sign(w) * mean(|w|) per
    filter, with the reference's size//8 truncation quirk (trailing
    size%8 weights dropped)."""
    import io as _io
    from sr_object_detection_tpu.graph import spec as S
    from sr_object_detection_tpu.io.weights import (
        pack_binary_conv, unpack_binary_conv, WeightsReader)
    rng = np.random.default_rng(0)
    # c*size*size = 3*3*3 = 27 -> 3 bytes of bits + 3 dropped weights
    spec = S.ConvSpec(index=0, filters=4, size=3, c=3,
                      batch_normalize=True)
    p = {"weights": rng.normal(0, 0.1, (3, 3, 3, 4)).astype(np.float32),
         "biases": rng.normal(0, 1, 4).astype(np.float32),
         "scales": np.ones(4, np.float32),
         "rolling_mean": np.zeros(4, np.float32),
         "rolling_variance": np.ones(4, np.float32)}
    blob = pack_binary_conv(p, batch_normalize=True)
    got = unpack_binary_conv(WeightsReader(_io.BytesIO(blob)), spec,
                             batch_normalize=True)
    np.testing.assert_array_equal(got["biases"], p["biases"])
    w = p["weights"]
    flat = np.transpose(w, (3, 2, 0, 1)).reshape(4, 27)
    gflat = np.transpose(got["weights"], (3, 2, 0, 1)).reshape(4, 27)
    mean = np.mean(np.abs(flat), axis=1, keepdims=True)
    want = np.where(flat > 0, mean, -mean).astype(np.float32)
    np.testing.assert_allclose(gflat[:, :24], want[:, :24], rtol=1e-6)
    np.testing.assert_array_equal(gflat[:, 24:], 0)   # truncation quirk


def test_denormalize_preserves_inference():
    import jax.numpy as jnp
    from sr_object_detection_tpu.graph.compiler import build_forward
    spec = zoo.tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=2)
    rng = np.random.default_rng(0)
    for p, l in zip(params, spec.layers):
        if p and "rolling_variance" in p:
            p["rolling_variance"] = rng.uniform(
                0.5, 2, p["rolling_variance"].shape).astype(np.float32)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    ref, _ = build_forward(spec)(params, x)
    np_, nspec = surgery.denormalize_net(params, spec)
    got, _ = build_forward(nspec)(np_, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_rgbgr_swaps_first_conv():
    spec = zoo.tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    swapped = surgery.rgbgr_net(params, spec)
    np.testing.assert_allclose(swapped[0]["weights"][:, :, 0, :],
                               params[0]["weights"][:, :, 2, :])


# ------------------------------------------------------------ checkpoint


def test_train_state_roundtrip(tmp_path):
    from sr_object_detection_tpu.train.trainer import Trainer
    spec = zoo.tiny_yolo_voc(width=64, height=64)
    tr = Trainer(spec, seed=0)
    x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    t = np.zeros((1, 30, 5), np.float32)
    t[0, 0] = [0.5, 0.5, 0.3, 0.3, 1]
    tr.step(x, t)
    p = str(tmp_path / "state.npz")
    ckpt.save_train_state(p, tr.state)
    restored = ckpt.load_train_state(p, tr.state)
    assert int(restored.seen) == int(tr.state.seen)
    a = np.asarray(tr.state.params[0]["weights"])
    b = np.asarray(restored.params[0]["weights"])
    np.testing.assert_allclose(a, b)
    assert ckpt.should_checkpoint(100)
    assert not ckpt.should_checkpoint(150)
    assert ckpt.should_checkpoint(2000)


# ------------------------------------------------------------------- cli


def test_cli_ops_and_visualize(tmp_path, capsys):
    from sr_object_detection_tpu.apps import cli
    from sr_object_detection_tpu.models.zoo import CfgBuilder
    b = CfgBuilder()
    b.net(batch=1, width=32, height=32, channels=3)
    b.conv(8)
    b.section("avgpool")
    cfg = tmp_path / "t.cfg"
    cfg.write_text(b.text())
    cli.main(["ops", str(cfg)])
    out = capsys.readouterr().out
    assert "Floating Point Operations" in out
    cli.main(["visualize", str(cfg)])
    out = capsys.readouterr().out
    assert "conv" in out and "avgpool" in out


# ------------------------------------------------------------- char rnn


def test_char_rnn_sampler_and_stream(tmp_path):
    from sr_object_detection_tpu.apps.rnn_app import (CharRNNSampler,
                                                      CharStream)
    spec = zoo.char_rnn(hidden=32, time_steps=4, batch=2)
    params = init_params(spec, seed=0)
    sampler = CharRNNSampler(spec, params)
    text = sampler.generate(b"ab", 16, temperature=1.0)
    assert len(text) == 18

    stream = CharStream(b"hello world, hello tpu!" * 8, batch=2, steps=4)
    x, y = stream.next_batch()
    assert x.shape == (8, 256) and y.shape == (8, 256)
    assert (x.sum(axis=1) == 1).all()


def test_char_rnn_training_reduces_loss(tmp_path):
    from sr_object_detection_tpu.train.trainer import Trainer
    from sr_object_detection_tpu.apps.rnn_app import CharStream
    spec = zoo.char_rnn(hidden=64, time_steps=8, batch=4)
    tr = Trainer(spec, seed=0)
    stream = CharStream(b"abcabcabcabc" * 50, batch=4, steps=8, seed=0)
    losses = []
    for _ in range(30):
        x, y = stream.next_batch()
        m = tr.step(x, y)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_adam_update_semantics():
    """Darknet adam (convolutional_kernels.cu:260-272): first step with
    zero moments reduces to w - rate*(1-B1)*g_hat/(sqrt((1-B2)g^2)+eps)
    with bias correction."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.train.sgd import adam_update
    w = jnp.ones(4)
    g = jnp.asarray([1.0, -2.0, 0.5, 0.0])
    m = jnp.zeros(4)
    v = jnp.zeros(4)
    lr, batch, b1, b2, eps = 0.01, 2, 0.9, 0.999, 1e-6
    nw, nm, nv = adam_update(w, g, m, v, lr=lr, batch_size=batch,
                             b1=b1, b2=b2, eps=eps, decay=0.0, t=1)
    gd = np.asarray(g)
    exp_m = (1 - b1) * gd
    exp_v = (1 - b2) * gd ** 2
    rate = lr / batch * np.sqrt(1 - b2) / (1 - b1)
    exp_w = np.asarray(w) - rate * exp_m / (np.sqrt(exp_v) + eps)
    np.testing.assert_allclose(np.asarray(nm), exp_m, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nv), exp_v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(nw), exp_w, rtol=1e-6)


def test_adam_weights_roundtrip(tmp_path):
    """adam=1 checkpoints carry m/v arrays (parser.c:787-791)."""
    from sr_object_detection_tpu.config import parse_cfg_text
    from sr_object_detection_tpu.graph import spec as S
    cfg = """
[net]
batch=1
height=8
width=8
channels=3
adam=1

[convolutional]
filters=4
size=3
stride=1
pad=1
activation=leaky
"""
    net = S.build_network_spec(parse_cfg_text(cfg))
    assert net.layers[0].adam
    params = init_params(net, seed=0)
    rng = np.random.default_rng(0)
    num = 4 * 3 * 3 * 3
    params[0]["adam_m"] = rng.normal(0, 1, num).astype(np.float32)
    params[0]["adam_v"] = rng.uniform(0, 1, num).astype(np.float32)
    p = str(tmp_path / "adam.weights")
    save_weights(net, params, p, seen=7)
    loaded, seen = load_weights(net, p)
    np.testing.assert_allclose(loaded[0]["adam_m"], params[0]["adam_m"])
    np.testing.assert_allclose(loaded[0]["adam_v"], params[0]["adam_v"])
    np.testing.assert_allclose(loaded[0]["weights"], params[0]["weights"])


def test_fill_hierarchy_masking(tmp_path):
    """9k-classifier truth: ancestor path set, empty groups masked with
    SECRET_NUM (data.c:401-431); the masked SSE cost then ignores them
    (cost_layer.c:75-80)."""
    from sr_object_detection_tpu.io.tree import read_tree
    from sr_object_detection_tpu.data.loader import (fill_hierarchy,
                                                     SECRET_NUM)
    tree_file = tmp_path / "t.tree"
    #      0  1      (roots, group 0)
    #    2 3 (p=0)   (group 1)
    #    4   (p=1)   (group 2)
    #    5 6 (p=3)   (group 3)
    tree_file.write_text(
        "a -1\nb -1\nc 0\nd 0\ne 1\nf 3\ng 3\n")
    tree = read_tree(str(tree_file))
    truth = np.zeros(7, np.float32)
    truth[5] = 1.0                     # leaf 'f'
    t = fill_hierarchy(truth, tree)
    assert t[5] == 1 and t[3] == 1 and t[0] == 1     # ancestor path
    assert t[1] == 0 and t[2] == 0 and t[6] == 0     # siblings stay 0
    assert t[4] == SECRET_NUM                         # empty group masked

    # the masked cost must ignore SECRET_NUM entries
    import jax.numpy as jnp
    from sr_object_detection_tpu.graph.compiler import _cost_forward
    from sr_object_detection_tpu.graph.spec import CostSpec
    spec = CostSpec(index=0, cost_type="masked", scale=1.0)
    pred = jnp.asarray([[0.5] * 7])
    cost = float(_cost_forward(pred, jnp.asarray(t)[None], spec))
    # only non-masked entries contribute: positions 0..3,5,6
    expected = sum((v - 0.5) ** 2 for v in [1, 0, 0, 1, 1, 0])
    assert abs(cost - expected) < 1e-5


def test_reset_normalize_preserves_inference():
    """'reset' surgery (darknet.c:206-232): BN folded into weights,
    stats reset to identity, graph structure kept."""
    import jax.numpy as jnp
    from sr_object_detection_tpu.graph.compiler import build_forward
    spec = zoo.tiny_yolo_voc(width=64, height=64)
    params = init_params(spec, seed=0)
    rng = np.random.default_rng(0)
    for p in params:
        if p and "rolling_variance" in p:
            p["rolling_variance"] = rng.uniform(
                0.5, 2, p["rolling_variance"].shape).astype(np.float32)
            p["rolling_mean"] = rng.normal(
                0, 0.5, p["rolling_mean"].shape).astype(np.float32)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    ref, _ = build_forward(spec)(params, x)
    reset = surgery.reset_normalize_net(params, spec)
    got, _ = build_forward(spec)(reset, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    assert np.allclose(reset[0]["scales"], 1.0)


def test_composite_3d_and_imtest(tmp_path):
    from sr_object_detection_tpu.apps.misc_apps import composite_3d, imtest
    rng = np.random.default_rng(0)
    a = rng.random((40, 40, 3)).astype(np.float32)
    b = np.roll(a, 3, axis=0)
    pa, pb = tmp_path / "a.ppm", tmp_path / "b.ppm"
    for p, im in ((pa, a), (pb, b)):
        with open(p, "wb") as f:
            f.write(b"P6\n40 40\n255\n" if False else
                    bytes(f"P6\n40 40\n255\n", "ascii"))
            f.write((im * 255).astype(np.uint8).tobytes())
    out = composite_3d(str(pa), str(pb), str(tmp_path / "o.ppm"))
    assert out.shape == (40, 40, 3)
    outs = imtest(str(pa), str(tmp_path))
    assert len(outs) == 7


def test_lr_policies_traced_vs_host():
    """get_current_rate (network.c:48-79): the jittable schedule must
    match the host-side exact version across policies and batch nums."""
    import dataclasses
    import jax
    from sr_object_detection_tpu.graph.spec import NetSpec
    from sr_object_detection_tpu.train.sgd import (learning_rate,
                                                   learning_rate_py)
    base = NetSpec(learning_rate=0.1, max_batches=1000, burn_in=100)
    cases = [
        dataclasses.replace(base, policy="constant"),
        dataclasses.replace(base, policy="step", step=100, scale=0.5),
        dataclasses.replace(base, policy="steps", steps=(100, 400),
                            scales=(0.1, 0.1)),
        dataclasses.replace(base, policy="exp", gamma=0.999),
        dataclasses.replace(base, policy="poly", power=4.0),
        dataclasses.replace(base, policy="sigmoid", gamma=0.01, step=500),
    ]
    for net in cases:
        f = jax.jit(lambda bn, net=net: learning_rate(net, bn))
        for bn in (0, 1, 50, 99, 100, 101, 399, 400, 500, 999):
            traced = float(f(bn))
            host = learning_rate_py(net, bn)
            # traced math is float32; host is float64
            assert abs(traced - host) < 1e-4 * max(host, 1e-9) + 1e-7, (
                net.policy, bn, traced, host)


def _rnn_cfg_file(tmp_path, hidden=32):
    from sr_object_detection_tpu.models.zoo import CfgBuilder
    b = CfgBuilder()
    b.net(subdivisions=1, inputs=256, batch=2, momentum=0.9,
          decay=0.001, time_steps=4, learning_rate=0.1,
          policy="constant", max_batches=10)
    b.section("rnn", batch_normalize=1, output=hidden, hidden=hidden,
              activation="leaky")
    b.section("connected", output=256, activation="leaky")
    b.section("softmax")
    b.section("cost", type="sse")
    p = tmp_path / "rnn.cfg"
    p.write_text(b.text())
    return str(p)


def test_vec_char_rnn(tmp_path):
    """vec mode (rnn.c:420-466): per line, state reset + seed + line +
    ' ' -> first layer's activations as a CSV row."""
    import io
    from sr_object_detection_tpu.apps.rnn_app import vec_char_rnn
    cfg = _rnn_cfg_file(tmp_path)
    out = io.StringIO()
    vecs = vec_char_rnn(cfg, None, ["-seed", "x"],
                        lines=["hello", "world", "hello"], out=out)
    assert len(vecs) == 3 and vecs[0].shape == (32,)
    # state is reset per line: identical lines embed identically
    np.testing.assert_allclose(vecs[0], vecs[2], rtol=1e-6)
    assert not np.allclose(vecs[0], vecs[1])
    rows = out.getvalue().strip().splitlines()
    assert rows[0].startswith("hello,") and len(rows) == 3


def test_valid_and_generate_tactic_rnn(tmp_path):
    """validtactic (rnn.c:327): perplexity only inside '>>'-gated
    spans; generatetactic (rnn.c:282): stream-primed sampling stopping
    at '.\\n'."""
    import io
    from sr_object_detection_tpu.apps.rnn_app import (
        valid_tactic_rnn, generate_tactic_rnn)
    cfg = _rnn_cfg_file(tmp_path)
    txt = tmp_path / "tactics.txt"
    txt.write_text("preamble >>e4 e5.\nmore >>d4 d5.\n")
    out = io.StringIO()
    last = valid_tactic_rnn(cfg, None, str(txt), [], out=out)
    assert last is not None and last[0] > 0
    body = out.getvalue()
    assert "Word Perplexity" in body
    # counted only in-tactic chars: words == 3 (1 + two '>>')
    assert body.strip().splitlines()[-1].split()[1] == "3"
    out2 = io.StringIO()
    text = generate_tactic_rnn(cfg, None, ["-len", "20"],
                               prime=b">>e4 ", out=out2)
    assert len(text) <= 20
    assert out2.getvalue().endswith("\n")


# ------------------------------------------------------- sidecar prep


def test_dataset_prep_imagenet_and_dice(tmp_path, monkeypatch):
    """dice_label.sh / imagenet_label.sh analogs
    (tools/dataset_prep.py)."""
    import sys as _sys
    import os as _os
    _sys.path.insert(0, str(tmp_path.parents[0]))
    from tools import dataset_prep as DP
    from tools.synth_dataset import write_ppm
    # imagenet: xml <name> -> labelled symlink + list
    xml = tmp_path / "val"
    imgs = tmp_path / "imgs"
    xml.mkdir(), imgs.mkdir()
    for i, lab in enumerate(["n01", "n02"]):
        (xml / f"v{i}.xml").write_text(
            f"<annotation><object><name>{lab}</name></object>"
            "</annotation>")
        write_ppm(str(imgs / f"v{i}.JPEG"),
                  np.zeros((4, 4, 3), np.uint8))
    monkeypatch.chdir(tmp_path)
    outs = DP.imagenet_label(str(xml), str(imgs),
                             out_dir=str(tmp_path / "labelled"),
                             list_path=str(tmp_path / "inet.val.list"))
    assert len(outs) == 2
    assert outs[0].endswith("v0.n01.JPEG")
    assert (tmp_path / "inet.val.list").read_text().count("\n") == 2
    # dice: frames from an animated container, center-crop, split
    try:
        from PIL import Image
    except ImportError:
        import pytest
        pytest.skip("PIL needed for the gif video container")
    rng = np.random.default_rng(0)
    gif = tmp_path / "Face1.gif"
    frames = [Image.fromarray(rng.integers(0, 255, (30, 40, 3))
                              .astype(np.uint8)) for _ in range(4)]
    frames[0].save(gif, save_all=True, append_images=frames[1:])
    moved = DP.dice_label([str(gif)], out_dir=str(tmp_path / "images"),
                          n_val=1, size=8)
    assert len(moved["val"]) == 1 and len(moved["train"]) == 3
    from sr_object_detection_tpu.ops.image import load_image_rgb
    assert load_image_rgb(moved["train"][0]).shape == (8, 8, 3)


def test_reval_voc_tool(tmp_path, capsys):
    """tools/reval_voc.py (scripts/reval_voc.py + voc_eval.py analog):
    score saved comp4 files against XML or darknet-txt ground truth."""
    from tools import reval_voc as RV
    res = tmp_path / "results"
    res.mkdir()
    # 2 images, class 'cat': one perfect detection, one miss
    (res / "comp4_det_test_cat.txt").write_text(
        "im0 0.9 10 10 50 50\n"
        "im1 0.8 200 200 240 240\n")
    (res / "comp4_det_test_dog.txt").write_text("")
    names = tmp_path / "names.txt"
    names.write_text("cat\ndog\n")
    ann = tmp_path / "ann"
    ann.mkdir()
    (ann / "im0.xml").write_text(
        "<annotation><object><name>cat</name><bndbox>"
        "<xmin>10</xmin><ymin>10</ymin><xmax>50</xmax><ymax>50</ymax>"
        "</bndbox></object></annotation>")
    (ann / "im1.xml").write_text(
        "<annotation><object><name>cat</name><bndbox>"
        "<xmin>0</xmin><ymin>0</ymin><xmax>30</xmax><ymax>30</ymax>"
        "</bndbox></object>"
        "<object><name>dog</name><bndbox>"
        "<xmin>5</xmin><ymin>5</ymin><xmax>20</xmax><ymax>20</ymax>"
        "</bndbox></object></annotation>")
    m = RV.main([str(res), "--classes", str(names),
                 "--annotations", str(ann)])
    out = capsys.readouterr().out
    assert "AP for cat" in out and "Mean AP" in out
    # cat: 1 TP of 2 gt at conf .9, 1 FP -> AP 0.5; dog: no dets -> 0
    assert abs(m - 0.25) < 1e-6


def test_voc_label_tool(tmp_path):
    """tools/voc_label.py (scripts/voc_label.py analog): VOC XML ->
    darknet txt labels, values hand-computed from the reference's
    convert() — plain midpoint (NO -1 pixel offset), difficult and
    unknown-class objects dropped."""
    from tools import voc_label as VL
    devkit = tmp_path / "VOCdevkit"
    main = devkit / "VOC2007" / "ImageSets" / "Main"
    ann = devkit / "VOC2007" / "Annotations"
    main.mkdir(parents=True)
    ann.mkdir(parents=True)
    (main / "train.txt").write_text("000001\n")
    (ann / "000001.xml").write_text(
        "<annotation><size><width>200</width><height>100</height>"
        "</size>"
        "<object><name>cat</name><difficult>0</difficult><bndbox>"
        "<xmin>20</xmin><xmax>60</xmax><ymin>10</ymin><ymax>50</ymax>"
        "</bndbox></object>"
        "<object><name>cat</name><difficult>1</difficult><bndbox>"
        "<xmin>0</xmin><xmax>10</xmax><ymin>0</ymin><ymax>10</ymax>"
        "</bndbox></object>"
        "<object><name>unicorn</name><difficult>0</difficult><bndbox>"
        "<xmin>0</xmin><xmax>10</xmax><ymin>0</ymin><ymax>10</ymax>"
        "</bndbox></object></annotation>")
    import sys
    argv, sys.argv = sys.argv, ["voc_label", str(devkit),
                                "--sets", "2007:train"]
    try:
        VL.main()
    finally:
        sys.argv = argv
    lines = (devkit / "VOC2007" / "labels" / "000001.txt") \
        .read_text().strip().splitlines()
    assert len(lines) == 1          # difficult + unknown dropped
    vals = lines[0].split()
    assert vals[0] == str(VL.VOC_CLASSES.index("cat"))
    # reference convert((200,100),(20,60,10,50)):
    #   x=(20+60)/2 /200 = 0.2   y=(10+50)/2 /100 = 0.3
    #   w=40/200 = 0.2           h=40/100 = 0.4
    np.testing.assert_allclose(
        [float(v) for v in vals[1:]], [0.2, 0.3, 0.2, 0.4], atol=1e-6)
    lst = (devkit / "2007_train.txt").read_text().strip()
    assert lst.endswith("000001.jpg")
