"""Native robot runtime tests: object memory, KCF, plane RANSAC,
localization, full pipeline with a fake detector."""

import numpy as np
import pytest

native = pytest.importorskip(
    "sr_object_detection_tpu.robot.native")
from sr_object_detection_tpu.robot.frame_source import (
    SyntheticRGBDSource, RawRGBDSource, RGBDFrame)
from sr_object_detection_tpu.robot.pipeline import (
    RobotPerception, NLWriter, IPCSink)


def _det(x, y, w=0.1, h=0.1, cls=0, prob=0.9, cam=(0, 0, 0)):
    return {"box": (x, y, w, h), "prob": prob, "class_id": cls,
            "cam": cam, "body_id": -1}


def test_object_memory_vote_and_reminder():
    om = native.ObjectMemory(appear=3, disappear=2)
    # object must appear 3 frames before becoming stable
    for i in range(2):
        om.update([_det(0.5, 0.5)])
        assert len(om.objects()) == 0
    om.update([_det(0.5, 0.5)])
    objs = om.objects()
    assert len(objs) == 1
    # vanishing beyond the disappear threshold produces a reminder
    for _ in range(4):
        om.update([])
    rem = om.reminders()
    assert len(rem) == 1
    assert abs(rem[0]["box"][0] - 0.5) < 0.05
    assert len(om.objects()) == 0


def test_object_memory_box_ema_smoothing():
    om = native.ObjectMemory(appear=1, disappear=5, ema=0.8)
    om.update([_det(0.50, 0.50, w=0.2, h=0.2)])
    om.update([_det(0.55, 0.50, w=0.2, h=0.2)])   # jitters right
    x = om.objects()[0]["box"][0]
    assert 0.505 < x < 0.52          # EMA: 0.8*0.50 + 0.2*0.55 = 0.51


def test_multitracker_ids_stable():
    mt = native.MultiTracker()
    d1 = mt.update([_det(0.3, 0.3), _det(0.7, 0.7, cls=1)], 100, 100)
    ids1 = {d["class_id"]: d["body_id"] for d in d1}
    d2 = mt.update([_det(0.31, 0.31), _det(0.69, 0.71, cls=1)], 100, 100)
    ids2 = {d["class_id"]: d["body_id"] for d in d2}
    assert ids1 == ids2
    # far-away new object gets a fresh id
    d3 = mt.update([_det(0.9, 0.1)], 100, 100)
    assert d3[0]["body_id"] not in ids1.values()


def test_localization_pinhole():
    depth = np.zeros((100, 100), np.uint16)
    depth[40:60, 40:60] = 2000    # 2m
    K = (100.0, 100.0, 50.0, 50.0)
    dets = native.localize(depth, K, [_det(0.5, 0.5, 0.2, 0.2)])
    cam = dets[0]["cam"]
    assert abs(cam[2] - 2.0) < 1e-3
    assert abs(cam[0]) < 0.02 and abs(cam[1]) < 0.02


def test_plane_ransac_finds_floor():
    rng = np.random.default_rng(0)
    n = 500
    ground = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                       np.full(n, 1.5) + rng.normal(0, 0.002, n)], axis=1)
    blob = rng.normal([0.2, 0.0, 1.0], 0.05, (60, 3))
    pts = np.concatenate([ground, blob]).astype(np.float32)
    plane, mask, inl = native.plane_ransac(pts, dist_thresh=0.02,
                                           max_iters=300, seed=1)
    assert inl > 450
    assert abs(abs(plane[2]) - 1.0) < 0.05    # normal ~ z axis
    assert mask[:n].mean() > 0.9
    assert mask[n:].mean() < 0.2


def test_remove_plane_depth():
    src = SyntheticRGBDSource()
    f = src.next()
    depth = f.depth.copy()
    table_px = int((depth == 1500).sum())
    removed = native.remove_plane(depth, f.intrinsics, dist_thresh=0.03,
                                  max_iters=300, seed=3)
    assert removed > 0.8 * table_px
    # objects at other depths survive
    assert (depth == 1000).sum() > 0


def test_fhog_shape_and_energy():
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3)).astype(np.float32)
    f = native.fhog(img, cell=4)
    assert f.shape == (16, 16, 31)
    assert np.isfinite(f).all()
    assert f.max() > 0


def test_kcf_tracks_translation():
    rng = np.random.default_rng(0)
    h, w = 120, 160
    texture = (rng.random((24, 24, 3)) * 255).astype(np.uint8)

    def frame(ox, oy):
        img = np.full((h, w, 3), 30, np.uint8)
        img[oy:oy + 24, ox:ox + 24] = texture
        return img

    t = native.KCFTracker()
    t.init(frame(40, 50), (40, 50, 24, 24))
    # move the target 2px/frame diagonally
    for i in range(1, 8):
        box = t.track(frame(40 + 2 * i, 50 + i))
    cx, cy = box[0] + box[2] / 2, box[1] + box[3] / 2
    assert abs(cx - (40 + 14 + 12)) < 6     # 40+2*7 + 12
    assert abs(cy - (50 + 7 + 12)) < 6


def test_nl_writer_sentences(tmp_path):
    nl = NLWriter(str(tmp_path / "Objects.txt"))
    assert nl.write([]) == "i can not see anything"
    assert nl.write(["cup"]) == "i can see a cup"
    s = nl.write(["cup", "bottle", "cup"])
    assert s == "i can see a cup and a bottle"
    assert (tmp_path / "Objects.txt").read_text().strip() == s


class FakeDetection:
    def __init__(self, box, cls, prob):
        self.box, self.class_id, self.prob = box, cls, prob


class FakeDetector:
    """Detects the red and green boxes of SyntheticRGBDSource."""

    def detect(self, img, thresh=0.24, nms=0.1):
        h, w = img.shape[:2]
        red = (img[..., 0] > 0.6) & (img[..., 1] < 0.3)
        green = (img[..., 1] > 0.6) & (img[..., 0] < 0.3)
        out = []
        for mask, cls in ((red, 0), (green, 1)):
            ys, xs = np.nonzero(mask)
            if len(xs) < 10:
                continue
            x0, x1 = xs.min(), xs.max()
            y0, y1 = ys.min(), ys.max()
            out.append(FakeDetection(
                ((x0 + x1) / 2 / w, (y0 + y1) / 2 / h,
                 (x1 - x0 + 1) / w, (y1 - y0 + 1) / h), cls, 0.9))
        return out


def test_full_pipeline_synthetic(tmp_path):
    msgs = []
    pipe = RobotPerception(FakeDetector(), names=["redbox", "greenbox"],
                           nl_path=str(tmp_path / "Objects.txt"),
                           ipc=lambda m: msgs.append(m),
                           detect_every=1)
    src = SyntheticRGBDSource(n_frames=12)
    results = pipe.run(src)
    assert len(results) == 12
    last = results[-1]
    names = {o["name"] for o in last["objects"]}
    assert names == {"redbox", "greenbox"}
    # localization happened (static green box at 0.8m)
    green = [o for o in last["objects"] if o["name"] == "greenbox"][0]
    assert abs(green["cam"][2] - 0.8) < 0.05
    assert "redbox" in last["sentence"] or "greenbox" in last["sentence"]
    assert msgs and msgs[-1]["type"] == "objectRecognized"


def test_pipeline_tracking_frames(tmp_path):
    pipe = RobotPerception(FakeDetector(), names=["redbox", "greenbox"],
                           detect_every=3)
    src = SyntheticRGBDSource(n_frames=9)
    results = pipe.run(src)
    # tracker-only frames still produce detections
    assert all(len(r["detections"]) >= 1 for r in results[1:])


def test_raw_rgbd_roundtrip(tmp_path):
    src = SyntheticRGBDSource(n_frames=2)
    f = src.next()
    RawRGBDSource.write_frame(str(tmp_path / "000"), f)
    rd = RawRGBDSource(str(tmp_path))
    g = rd.next()
    np.testing.assert_array_equal(g.color, f.color)
    np.testing.assert_array_equal(g.depth, f.depth)


def test_pipeline_with_real_detector(tmp_path):
    """Full robot loop with an actual jitted Detector (untrained tiny
    net) over synthetic RGB-D — exercises the production wiring end to
    end (Detector -> filters -> localization -> memory -> sinks)."""
    from sr_object_detection_tpu.models.zoo import CfgBuilder
    from sr_object_detection_tpu.infer.detector import Detector
    from sr_object_detection_tpu.robot.pipeline import RobotPerception

    b = CfgBuilder()
    b.net(batch=1, width=96, height=96, channels=3)
    b.conv(8, size=3, stride=2)
    b.conv(16, size=3, stride=2)
    b.conv(12, size=1, bn=False, act="linear", pad=1)
    b.section("region", anchors=(1.0, 1.0, 3.0, 3.0), classes=1, coords=4,
              num=2, softmax=1, thresh=.6)
    cfg = tmp_path / "tiny.cfg"
    cfg.write_text(b.text())
    det = Detector(str(cfg), None, names=["thing"])
    pipe = RobotPerception(det, names=["thing"], thresh=0.01, nms=0.1,
                           detect_every=2)
    src = SyntheticRGBDSource(n_frames=4)
    results = pipe.run(src)
    assert len(results) == 4
    # untrained net: pipeline must still run, sentences well-formed
    for r in results:
        assert r["sentence"].startswith("i can")


def test_registration_identity_cameras():
    """Aligned same-resolution cameras: color px == depth px."""
    from sr_object_detection_tpu.robot.registration import (
        CameraModel, Registration)
    cam = CameraModel(100.0, 100.0, 64.0, 64.0, 128, 128)
    reg = Registration(color=cam, depth=cam)
    depth = np.full((128, 128), 1000, np.uint16)
    px = np.array([[30.0, 40.0], [90.0, 100.0]], np.float32)
    out = reg.color_px_to_depth_px(px, depth)
    np.testing.assert_allclose(out, px, atol=0.5)
    box = reg.color_box_to_depth((0.5, 0.5, 0.2, 0.2), depth)
    np.testing.assert_allclose(box, (0.5, 0.5, 0.2, 0.2), atol=0.02)


def test_registration_baseline_shift():
    """A horizontal baseline shifts the projection by fx*t/z."""
    from sr_object_detection_tpu.robot.registration import (
        CameraModel, Registration)
    cam = CameraModel(100.0, 100.0, 64.0, 64.0, 128, 128)
    t = np.array([-0.05, 0.0, 0.0], np.float32)
    reg = Registration(color=cam, depth=cam, t_depth_to_color=t)
    depth = np.full((128, 128), 2000, np.uint16)   # 2m
    dpx = np.array([[64.0, 64.0]], np.float32)
    cpx = reg.depth_px_to_color_px(dpx, np.array([2.0], np.float32))
    # disparity = fx * |t| / z = 100*0.05/2 = 2.5 px
    assert abs(cpx[0, 0] - (64.0 - 2.5)) < 0.1
    # inverse recovers the depth pixel
    back = reg.color_px_to_depth_px(cpx, depth)
    np.testing.assert_allclose(back, dpx, atol=0.5)


def test_pipeline_action_recognition():
    """Skeleton action recognition inside the frame loop: joints
    buffered per body, classified when the body leaves the scene."""
    from sr_object_detection_tpu.robot.action import (
        ELM, ActionRecognizer, HistogramConfig, motion_histograms,
        N_JOINTS)
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_action_interaction import _make_clip

    cfg = HistogramConfig()
    xs, ys = [], []
    for label, kind in enumerate(["wave", "walk"]):
        for s in range(10):
            xs.append(motion_histograms(_make_clip(kind, seed=s), cfg))
            ys.append(label)
    model = ELM(hidden=64, seed=1).fit(np.stack(xs), np.asarray(ys), 2)
    rec = ActionRecognizer(model, ["wave", "walk"], cfg)

    pipe = RobotPerception(FakeDetector(), names=["redbox", "greenbox"],
                           action_recognizer=rec)
    clip = _make_clip("wave", seed=321)
    src = SyntheticRGBDSource(n_frames=len(clip) + 2)
    results = []
    for i, frame in enumerate(src):
        # body 7 present for the clip, then leaves
        if i < len(clip):
            frame.skeletons = {7: clip[i]}
        else:
            frame.skeletons = {}
        results.append(pipe.process(frame))
    acts = [a for r in results for a in r["actions"]]
    assert len(acts) == 1
    assert acts[0]["body_id"] == 7
    assert acts[0]["action"] == "wave"


def test_video_file_source_gif(tmp_path):
    """VideoFileSource: live video decode for the demo (demo.c:57's
    cvCaptureFromFile analog). An animated GIF is a real multi-frame
    video container PIL decodes in-process; the ffmpeg pipe handles
    mp4/avi when the binary exists."""
    import numpy as np
    from PIL import Image
    from sr_object_detection_tpu.robot.frame_source import (
        VideoFileSource)
    frames = []
    rng = np.random.default_rng(0)
    for t in range(5):
        a = np.zeros((32, 48, 3), np.uint8)
        a[:, (t * 9) % 48:(t * 9) % 48 + 6] = (255, 0, 0)  # moving bar
        frames.append(Image.fromarray(a))
    vid = tmp_path / "clip.gif"
    frames[0].save(vid, save_all=True, append_images=frames[1:],
                   duration=50, loop=0)
    src = VideoFileSource(str(vid))
    got = list(src)
    assert len(got) == 5
    assert got[0].color.shape == (32, 48, 3)
    # the moving bar actually moves between decoded frames
    assert not np.array_equal(got[0].color, got[2].color)
    # loop mode restarts
    src2 = VideoFileSource(str(vid), loop=True)
    for _ in range(7):
        assert src2.next() is not None


def test_v4l2_frame_source_mocked_device(tmp_path, monkeypatch):
    """V4L2FrameSource: the live-camera path (demo.c:57
    cvCaptureFromCAM(cam_index)). Neither /dev/video* nor ffmpeg exists
    in this environment, so the 'camera' is a fake ffmpeg executable on
    PATH that streams 3 rawvideo RGB24 frames — the source's pipe read
    loop, geometry handling, EOF and shutdown paths are the exact code
    a real `ffmpeg -f v4l2 /dev/video0` would drive."""
    import os
    import stat
    import numpy as np
    import pytest
    w, h, n = 64, 48, 3
    fake = tmp_path / "ffmpeg"
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, os\n"
        f"w,h,n = {w},{h},{n}\n"
        "out = os.fdopen(1, 'wb')\n"
        "for t in range(n):\n"
        "    out.write(bytes([t*40 % 256]) * (w*h*3))\n"
        "out.close()\n")
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setenv("PATH",
                       f"{tmp_path}{os.pathsep}" + os.environ["PATH"])
    from sr_object_detection_tpu.robot.frame_source import (
        V4L2FrameSource)
    src = V4L2FrameSource(
        width=w, height=h,
        _input_args=["-f", "lavfi", "-i", "testsrc"])
    got = list(src)
    assert len(got) == n
    assert got[0].color.shape == (h, w, 3)
    assert got[0].color.dtype == np.uint8
    # frames differ (the fake camera varies per frame)
    assert not np.array_equal(got[0].color, got[2].color)
    src.close()                               # idempotent after EOF
    # a real (absent) device fails loudly, not silently
    with pytest.raises(RuntimeError, match="no camera device"):
        V4L2FrameSource("/dev/video99")


def test_demo_runs_on_video_file(tmp_path):
    """`detector demo -video clip.gif` drives the full fetch/detect
    pipeline from a video container."""
    import numpy as np
    import pathlib
    from PIL import Image
    golden = pathlib.Path(__file__).parent / "golden" / "map_ab.npz"
    if not golden.exists():
        pytest.skip("map_ab golden not generated")
    g = np.load(golden)
    cfg = tmp_path / "net.cfg"
    cfg.write_text(bytes(g["cfg"]).decode())
    w = tmp_path / "w.weights"
    w.write_bytes(bytes(g["weights"]))
    rng = np.random.default_rng(1)
    imgs = [Image.fromarray(rng.integers(0, 255, (96, 96, 3),
                                         ).astype(np.uint8))
            for _ in range(3)]
    vid = tmp_path / "clip.gif"
    imgs[0].save(vid, save_all=True, append_images=imgs[1:], loop=0)
    from sr_object_detection_tpu.apps.detector_app import demo_detector
    results = demo_detector(str(cfg), str(w), ["-video", str(vid)])
    assert len(results) == 3   # all frames consumed through the pipeline
    assert all("fps" in r and "detections" in r for r in results)
