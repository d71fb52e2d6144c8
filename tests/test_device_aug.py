"""Device-batched augmentation vs the host pipeline: same params must
give the same pixels (data/device_aug.py vs data/augment.py+ops/image),
and the device-augment loader must produce valid batches."""

import numpy as np
import pytest

from sr_object_detection_tpu.data import augment as A
from sr_object_detection_tpu.data import device_aug as DA
from sr_object_detection_tpu.ops.image import resize_image_np


def _host_pipeline(img_u8, p, w, h):
    im = img_u8.astype(np.float32) / 255.0
    crop = A.crop_image(im, p["pleft"], p["ptop"], p["swidth"],
                        p["sheight"])
    sized = resize_image_np(crop, w, h)
    if p["flip"]:
        sized = A.flip_horizontal(sized)
    if p["do_distort"]:
        sized = A.distort_image(sized, p["dhue"], p["dsat"], p["dexp"])
    return sized


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_device_matches_host(seed):
    rng = np.random.default_rng(seed)
    w = h = 64
    imgs = []
    params = []
    for k in range(4):
        oh = int(rng.integers(40, 120))
        ow = int(rng.integers(40, 120))
        imgs.append(rng.integers(0, 255, (oh, ow, 3)).astype(np.uint8))
        p, _ = DA.draw_params(rng, oh, ow, jitter=0.3, hue=0.1,
                              saturation=1.5, exposure=1.5)
        params.append(p)
    hmax = DA._bucket(max(im.shape[0] for im in imgs))
    wmax = DA._bucket(max(im.shape[1] for im in imgs))
    canvas = np.zeros((4, hmax, wmax, 3), np.uint8)
    for b, im in enumerate(imgs):
        canvas[b, :im.shape[0], :im.shape[1]] = im
    aug = DA.DeviceAugmenter(w, h)
    coefs = [aug.coeffs(p) for p in params]
    cols = {k: np.stack([c[k] for c in coefs]) for k in coefs[0]}
    out = np.asarray(aug(canvas, cols))
    assert out.shape == (4, h, w, 3)
    for b in range(4):
        ref = _host_pipeline(imgs[b], params[b], w, h)
        np.testing.assert_allclose(out[b], ref, atol=2e-6,
                                   err_msg=f"image {b}")


def test_device_no_augment_is_plain_resize():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (50, 70, 3)).astype(np.uint8)
    p, xf = DA.draw_params(rng, 50, 70, jitter=0.3, hue=0.1,
                           saturation=1.5, exposure=1.5, augment=False)
    assert xf == (0.0, 0.0, 1.0, 1.0, False)
    canvas = np.zeros((1, 128, 128, 3), np.uint8)
    canvas[0, :50, :70] = img
    aug = DA.DeviceAugmenter(32, 32)
    cols = {k: np.stack([v]) for k, v in aug.coeffs(p).items()}
    out = np.asarray(aug(canvas, cols))[0]
    ref = resize_image_np(img.astype(np.float32) / 255.0, 32, 32)
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_device_augment_loader(tmp_path):
    from sr_object_detection_tpu.data.loader import DetectionLoader
    from tools.synth_dataset import write_ppm
    rng = np.random.default_rng(0)
    d = tmp_path / "images"
    ld = tmp_path / "labels"
    d.mkdir(), ld.mkdir()
    paths = []
    for i in range(6):
        write_ppm(str(d / f"f{i}.ppm"),
                  rng.integers(0, 255, (60 + 4 * i, 80, 3))
                  .astype(np.uint8))
        (ld / f"f{i}.txt").write_text("1 0.5 0.5 0.4 0.4\n")
        paths.append(str(d / f"f{i}.ppm"))
    lst = tmp_path / "l.list"
    lst.write_text("\n".join(paths) + "\n")
    loader = DetectionLoader(str(lst), w=64, h=64, batch=8, classes=20,
                             device_augment=True)
    x, t = loader.next_batch()
    x = np.asarray(x)
    assert x.shape == (8, 64, 64, 3) and t.shape == (8, 30, 5)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    # some truth rows survive the jitter crop
    assert (t[:, :, 2] > 0).any()
    # multi-scale hook recompiles at the new static shape
    loader.set_dims(96, 96)
    x2, _ = loader.next_batch()
    assert np.asarray(x2).shape == (8, 96, 96, 3)


def test_device_augment_classification_loader(tmp_path):
    from sr_object_detection_tpu.data.loader import ClassificationLoader
    from tools.synth_dataset import write_ppm
    rng = np.random.default_rng(1)
    d = tmp_path / "imgs"
    d.mkdir()
    paths = []
    for ci, name in enumerate(["dark", "lite"]):
        for k in range(3):
            img = (np.full((40, 48, 3), (ci + 1) / 3) * 255).astype(
                np.uint8)
            p = d / f"{name}_{k}.ppm"
            write_ppm(str(p), img)
            paths.append(str(p))
    lst = tmp_path / "l.list"
    lst.write_text("\n".join(paths) + "\n")
    loader = ClassificationLoader(str(lst), ["dark", "lite"], w=32,
                                  h=32, batch=4, device_augment=True)
    x, y = loader.next_batch()
    x = np.asarray(x)
    assert x.shape == (4, 32, 32, 3) and y.shape == (4, 2)
    assert (y.sum(axis=1) == 1).all()
    assert 0.0 <= float(x.min()) and float(x.max()) <= 1.0
    # brightness survives augmentation: class means stay ordered
    dark = x[y[:, 0] == 1]
    lite = x[y[:, 1] == 1]
    if len(dark) and len(lite):
        assert dark.mean() < lite.mean()


def test_matmul_resample_matches_gather():
    """The MXU one-hot-matmul resample (TPU default) must reproduce
    the gather path (and through it the host pipeline) to f32
    rounding."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (90, 110, 3)).astype(np.uint8)
    canvas = np.zeros((1, 128, 128, 3), np.uint8)
    canvas[0, :90, :110] = img
    p, _ = DA.draw_params(rng, 90, 110, jitter=.3, hue=.1,
                          saturation=1.5, exposure=1.5)
    outs = {}
    for mode in ("gather", "matmul"):
        aug = DA.DeviceAugmenter(64, 64, resample=mode)
        cols = {k: np.stack([v]) for k, v in aug.coeffs(p).items()}
        outs[mode] = np.asarray(aug(canvas, cols))[0]
    np.testing.assert_allclose(outs["gather"], outs["matmul"],
                               atol=2e-6)
    ref = _host_pipeline(img, p, 64, 64)
    np.testing.assert_allclose(outs["matmul"], ref, atol=2e-6)
