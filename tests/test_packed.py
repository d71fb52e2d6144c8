"""Packed raw-u8 dataset (data/packed.py): pack-time parity with the
darknet resize, loader batch contract, multi-host sharding, and the
ProcessPool decoder option."""

import json
import os

import numpy as np
import pytest

from sr_object_detection_tpu.data.packed import (PackedDetectionLoader,
                                                 pack_detection_dataset)
from sr_object_detection_tpu.ops.image import resize_image_np
from tools.synth_dataset import write_ppm


def _make_dataset(tmp_path, n=6, labeled=True):
    rng = np.random.default_rng(0)
    d = tmp_path / "images"
    ld = tmp_path / "labels"
    d.mkdir(exist_ok=True), ld.mkdir(exist_ok=True)
    paths, raws = [], []
    for i in range(n):
        im = rng.integers(0, 255, (60 + 4 * i, 80, 3)).astype(np.uint8)
        write_ppm(str(d / f"f{i}.ppm"), im)
        if labeled:
            (ld / f"f{i}.txt").write_text(
                f"{i % 3} 0.5 0.5 0.4 0.4\n2 0.25 0.25 0.2 0.2\n")
        paths.append(str(d / f"f{i}.ppm"))
        raws.append(im)
    return paths, raws


def test_pack_and_readback(tmp_path):
    paths, raws = _make_dataset(tmp_path)
    prefix = str(tmp_path / "packed")
    hdr = pack_detection_dataset(paths, prefix, store_w=64, store_h=48,
                                 quiet=True)
    assert hdr == json.load(open(prefix + ".json"))
    assert hdr["n"] == 6 and (hdr["h"], hdr["w"]) == (48, 64)
    assert os.path.getsize(prefix + ".imgs") == 6 * 48 * 64 * 3
    imgs = np.fromfile(prefix + ".imgs", np.uint8).reshape(6, 48, 64, 3)
    labs = np.fromfile(prefix + ".labs", np.float32).reshape(6, 30, 5)
    for i in range(6):
        # stored frame == darknet two-pass bilinear of the original,
        # rounded to u8
        want = np.clip(resize_image_np(raws[i].astype(np.float32),
                                       64, 48) + 0.5, 0, 255
                       ).astype(np.uint8)
        np.testing.assert_array_equal(imgs[i], want)
        # labels stored verbatim ([cls, cx, cy, w, h] relative)
        np.testing.assert_allclose(labs[i, 0], [i % 3, .5, .5, .4, .4])
        np.testing.assert_allclose(labs[i, 1], [2, .25, .25, .2, .2])
        assert (labs[i, 2:] == 0).all()


def test_packed_loader_batches(tmp_path):
    paths, _ = _make_dataset(tmp_path)
    prefix = str(tmp_path / "packed")
    pack_detection_dataset(paths, prefix, store_w=64, store_h=64,
                           quiet=True)
    loader = PackedDetectionLoader(prefix, w=64, h=64, batch=8, seed=1)
    x, t = loader.next_batch()
    x = np.asarray(x)
    assert x.shape == (8, 64, 64, 3) and t.shape == (8, 30, 5)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    assert (t[:, :, 2] > 0).any()     # boxes survive the jitter crop
    # multi-scale hook
    loader.set_dims(96, 96)
    x2, _ = loader.next_batch()
    assert np.asarray(x2).shape == (8, 96, 96, 3)


def test_packed_loader_no_augment_is_plain_resize(tmp_path):
    """augment=False: output b == stored frame resized to (w,h) / 255
    — the packed path composes with device_aug exactly like the JPEG
    loader."""
    paths, _ = _make_dataset(tmp_path)
    prefix = str(tmp_path / "packed")
    pack_detection_dataset(paths, prefix, store_w=72, store_h=56,
                           quiet=True)
    loader = PackedDetectionLoader(prefix, w=64, h=48, batch=4,
                                   augment=False, seed=0)
    idx = loader.rng.bit_generator.state  # noqa: F841 (determinism doc)
    x, t = loader.next_batch()
    x = np.asarray(x)
    imgs = np.fromfile(prefix + ".imgs", np.uint8).reshape(6, 56, 72, 3)
    # reproduce the index draw with the same seed
    rng = np.random.default_rng(0)
    picks = rng.integers(0, 6, size=4)
    for b, i in enumerate(picks):
        want = resize_image_np(imgs[i].astype(np.float32) / 255.0,
                               64, 48)
        # the loader casts at aug write (bf16 — the train step's own
        # input cast moved upstream, r5); compare at the bf16 contract
        import jax.numpy as jnp
        want = np.asarray(jnp.asarray(want, jnp.bfloat16), np.float32)
        np.testing.assert_allclose(x[b].astype(np.float32), want,
                                   atol=3e-6)
        # truth: both stored labels pass through un-jittered (order is
        # shuffled like the reference's fill_truth_detection)
        assert sorted(t[b, :2, 4].tolist()) == sorted([i % 3, 2.0])


def test_packed_loader_process_sharding(tmp_path):
    paths, _ = _make_dataset(tmp_path, n=7)
    prefix = str(tmp_path / "packed")
    pack_detection_dataset(paths, prefix, store_w=64, store_h=64,
                           quiet=True)
    l0 = PackedDetectionLoader(prefix, w=64, h=64, batch=4,
                               process_index=0, process_count=2)
    l1 = PackedDetectionLoader(prefix, w=64, h=64, batch=4,
                               process_index=1, process_count=2)
    assert (l0.lo, l0.hi) == (0, 3)       # 7*1//2 = 3
    assert (l1.lo, l1.hi) == (3, 7)


def test_detection_loader_process_decoder(tmp_path):
    """decoder='process' (ProcessPool JPEG decode) produces the same
    batch contract as the thread decoder — and spawns its workers
    (fork()ing a JAX-initialized parent can deadlock the child; the
    pool must use the spawn start method, loader.py)."""
    import warnings
    paths, _ = _make_dataset(tmp_path)
    loader = None
    try:
        from sr_object_detection_tpu.data.loader import DetectionLoader
        with warnings.catch_warnings():
            # any os.fork()-under-threads RuntimeWarning is the bug
            warnings.filterwarnings(
                "error", message=".*fork.*", category=RuntimeWarning)
            loader = DetectionLoader(paths, w=64, h=64, batch=4,
                                     classes=20, device_augment=True,
                                     decoder="process", workers=2)
            x, t = loader.next_batch()
        assert np.asarray(x).shape == (4, 64, 64, 3)
        assert t.shape == (4, 30, 5)
    finally:
        if loader is not None:
            loader.pool.shutdown(cancel_futures=True)
