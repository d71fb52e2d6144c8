"""Shared-text-file detection exchange (speech-api variant,
KinectUtil_speech_api.cpp:320-407 / KinectUtil.cpp:318-377): round-trip
format, sentence phrasing, and the full robot pipeline running with NO
model in-process."""

import threading
import time

import numpy as np

from sr_object_detection_tpu.infer.detector import Detection
from sr_object_detection_tpu.robot.file_protocol import (
    FileProtocolDetector, read_detection_txt, write_detection_txt,
    write_speech_txt)


def _det(x, y, w, h, cls, prob=0.9, name=None):
    return Detection(box=(x, y, w, h), class_id=cls, prob=prob, name=name)


def test_detection_txt_roundtrip(tmp_path):
    p = str(tmp_path / "test.txt")
    dets = [_det(0.5, 0.5, 0.2, 0.3, 1, 0.87, "cup"),
            _det(0.25, 0.75, 0.1, 0.1, 0, 0.55, "bottle")]
    write_detection_txt(p, dets, 640, 480)
    got = read_detection_txt(p, 640, 480)
    assert len(got) == 2
    for a, b in zip(dets, got):
        assert b.class_id == a.class_id and b.name == a.name
        assert abs(b.prob - a.prob) < 1e-3
        np.testing.assert_allclose(b.box, a.box, atol=1e-3)
    # reader deletes the file (read_infor_from_txt's remove())
    import os
    assert not os.path.exists(p)
    # empty/missing file -> [] after timeout, not a hang
    assert read_detection_txt(p, 640, 480, timeout=0.05) == []


def test_detection_txt_format_exact(tmp_path):
    """The on-disk shape the C reader consumes: objNumber line, then
    per object a separator + exactly 7 'key = value' lines with
    'name = ' parsed at offset 7."""
    p = str(tmp_path / "test.txt")
    write_detection_txt(p, [_det(0.5, 0.5, 0.2, 0.2, 3, name="mug")],
                        100, 100)
    lines = open(p).read().splitlines()
    assert lines[0] == "objNumber = 1"
    assert lines[1].startswith("object")
    keys = [l.split(" = ")[0] for l in lines[2:9]]
    assert keys == ["x", "y", "w", "h", "name", "prob", "objClass"]
    name_line = lines[6]
    assert name_line[:7] == "name = " and name_line[7:] == "mug"


def test_speech_sentences(tmp_path):
    p = str(tmp_path / "Objects.txt")
    assert write_speech_txt(p, []) == "there is nothing in this room!"
    assert write_speech_txt(p, ["cup"]) == "i can see cup."
    assert write_speech_txt(p, ["cup", "tv"]) == \
        "there are many things in this room. i can see cup and tv."
    s = write_speech_txt(p, ["cup", "tv", "cup", "chair"])
    assert s == ("there are many things in this room. i can see cup, "
                 "tv and chair.")
    assert open(p).read() == s


def test_pipeline_with_no_model(tmp_path):
    """RobotPerception end-to-end with detections from another
    'process' via the shared file — the speech-api deployment shape."""
    from sr_object_detection_tpu.robot.frame_source import (
        SyntheticRGBDSource)
    from sr_object_detection_tpu.robot.pipeline import RobotPerception

    p = str(tmp_path / "test.txt")
    stop = threading.Event()

    def producer():
        # an external detector announcing the synthetic red box
        while not stop.is_set():
            write_detection_txt(
                p, [_det(0.35, 0.4, 0.2, 0.2, 0, 0.9)], 96, 96)
            time.sleep(0.002)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        pipe = RobotPerception(FileProtocolDetector(p, timeout=2.0),
                               names=["redbox", "greenbox"],
                               detect_every=1)
        src = SyntheticRGBDSource(n_frames=10)
        results = pipe.run(src)
    finally:
        stop.set()
        t.join(timeout=2)
    assert len(results) == 10
    assert any(d["class_id"] == 0 for r in results
               for d in r["detections"])
    assert any(o["name"] == "redbox" for r in results
               for o in r["objects"])
