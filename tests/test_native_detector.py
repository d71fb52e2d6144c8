"""C++-callable detection API (native/include/sr_detector.h) driven
end-to-end through ctypes: the pipe backend spawns the real inference
worker (infer/serve.py) and the native side does threshold+NMS+bbox
conversion+tracking — the analog of the reference DLL's Detector
(yolo_v2_class.hpp:42-146) with the network on the JAX engine."""

import ctypes
import os
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
LIB = REPO / "native" / "build" / "libsr_robot.so"
GOLDEN = pathlib.Path(__file__).parent / "golden"


class srBBox(ctypes.Structure):
    _fields_ = [("x", ctypes.c_float), ("y", ctypes.c_float),
                ("w", ctypes.c_float), ("h", ctypes.c_float),
                ("prob", ctypes.c_float), ("obj_id", ctypes.c_uint32),
                ("track_id", ctypes.c_uint32)]


def _lib():
    if not LIB.exists():
        pytest.skip("native library not built (make -C native)")
    lib = ctypes.CDLL(str(LIB))
    lib.sr_detector_create_pipe.restype = ctypes.c_void_p
    lib.sr_detector_create_pipe.argtypes = [
        ctypes.POINTER(ctypes.c_char_p)]
    lib.sr_detector_detect.restype = ctypes.c_int
    lib.sr_detector_detect.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(srBBox), ctypes.c_int]
    lib.sr_detector_tracking.restype = ctypes.c_int
    lib.sr_detector_tracking.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(srBBox), ctypes.c_int,
        ctypes.c_int]
    lib.sr_detector_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("sr_detector_net_width", "sr_detector_net_height",
               "sr_detector_classes"):
        getattr(lib, fn).restype = ctypes.c_int
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    return lib


def test_pipe_backend_end_to_end(tmp_path):
    g_path = GOLDEN / "map_ab.npz"
    if not g_path.exists():
        pytest.skip("map_ab golden not generated")
    g = np.load(g_path)
    cfg = tmp_path / "net.cfg"
    cfg.write_text(bytes(g["cfg"]).decode())
    weights = tmp_path / "w.weights"
    weights.write_bytes(bytes(g["weights"]))

    lib = _lib()
    argv = [sys.executable, "-m", "sr_object_detection_tpu.infer.serve",
            str(cfg), str(weights), "--cpu"]
    c_argv = (ctypes.c_char_p * (len(argv) + 1))(
        *[a.encode() for a in argv], None)
    det = lib.sr_detector_create_pipe(c_argv)
    assert det, "pipe handshake failed"
    try:
        assert lib.sr_detector_net_width(det) == 96
        assert lib.sr_detector_classes(det) == 3

        # image from the same synthetic distribution the model learned
        from tools.synth_dataset import make_image
        rng = np.random.default_rng(0)   # class-1 image the model is
                                         # confident on (prob ~0.32)
        img, truth = make_image(rng, 160, 120, max_boxes=1)
        x = (img.astype(np.float32) / 255.0).ravel()
        out = (srBBox * 32)()
        n = lib.sr_detector_detect(
            det, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            160, 120, 3, 0.24, 0.4, out, 32)
        assert n >= 1, "trained detector found nothing on easy synth"
        best = max(range(n), key=lambda i: out[i].prob)
        # detection overlaps the ground-truth rectangle (pixel coords)
        t = truth[0]
        gx = t[0] * 160 - t[2] * 160 / 2
        bb = out[best]
        assert abs(bb.x - gx) < 40
        assert int(bb.obj_id) == int(t[4])

        # tracking ids persist across frames
        n1 = lib.sr_detector_tracking(det, out, n, 6)
        tid = out[0].track_id
        assert tid >= 1
        for i in range(n):
            out[i].track_id = 0
        lib.sr_detector_tracking(det, out, n, 6)
        assert out[0].track_id == tid
    finally:
        lib.sr_detector_destroy(det)


def test_pipe_backend_int8(tmp_path):
    """serve --int8: the worker quantizes on the first client frame;
    the native API sees the same protocol and sane detections."""
    g_path = GOLDEN / "map_ab.npz"
    if not g_path.exists():
        pytest.skip("map_ab golden not generated")
    g = np.load(g_path)
    cfg = tmp_path / "net.cfg"
    cfg.write_text(bytes(g["cfg"]).decode())
    weights = tmp_path / "w.weights"
    weights.write_bytes(bytes(g["weights"]))

    lib = _lib()
    argv = [sys.executable, "-m", "sr_object_detection_tpu.infer.serve",
            str(cfg), str(weights), "--cpu", "--int8"]
    c_argv = (ctypes.c_char_p * (len(argv) + 1))(
        *[a.encode() for a in argv], None)
    det = lib.sr_detector_create_pipe(c_argv)
    assert det, "pipe handshake failed"
    try:
        from tools.synth_dataset import make_image
        rng = np.random.default_rng(0)
        img, truth = make_image(rng, 160, 120, max_boxes=1)
        x = (img.astype(np.float32) / 255.0).ravel()
        out = (srBBox * 32)()
        n = lib.sr_detector_detect(
            det, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            160, 120, 3, 0.24, 0.4, out, 32)
        assert n >= 1, "int8 worker found nothing on easy synth"
        best = max(range(n), key=lambda i: out[i].prob)
        assert int(out[best].obj_id) == int(truth[0][4])
    finally:
        lib.sr_detector_destroy(det)
