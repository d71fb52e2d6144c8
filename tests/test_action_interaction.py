"""Action recognition (ELM + motion histograms) and interaction tests."""

import numpy as np

from sr_object_detection_tpu.robot.action import (
    ELM, ActionRecognizer, HistogramConfig, motion_histograms,
    descriptor_size, N_JOINTS)
from sr_object_detection_tpu.robot.interaction import (
    hand_roi, associate_person, Speaker, object_reply)


def _make_clip(kind: str, t: int = 24, seed: int = 0) -> np.ndarray:
    """Synthetic skeleton clips: 'wave' moves a hand sinusoidally,
    'walk' translates the whole body, 'still' only jitters."""
    rng = np.random.default_rng(seed)
    # fixed skeleton pose (pose shouldn't be the class signal)
    base = np.random.default_rng(42).normal(
        0, 0.3, (N_JOINTS, 3)).astype(np.float32)
    base[0] = 0  # spine base at origin
    clip = np.tile(base, (t, 1, 1))
    jitter = rng.normal(0, 0.003, clip.shape).astype(np.float32)
    clip = clip + jitter
    ts = np.arange(t, dtype=np.float32)
    if kind == "wave":
        clip[:, 11, 0] += 0.4 * np.sin(ts / 2)      # hand joint x
        clip[:, 11, 1] += 0.2 * np.cos(ts / 2)
    elif kind == "walk":
        clip[:, :, 0] += (0.05 * ts)[:, None]
    return clip


def test_scene_flow_recovers_translation():
    """Block matching must recover a known integer shift, and the depth
    channel a known dz — the working replacement for the reference's
    EMPTY SceneFlow stub (Process_Kinect.cpp:3876-3879)."""
    from sr_object_detection_tpu.robot.action import scene_flow
    rng = np.random.default_rng(0)
    prev = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    cur = np.roll(prev, (2, -3), axis=(0, 1))       # content moves dy=2,dx=-3
    d_prev = np.full((96, 128), 1500.0, np.float32)
    d_cur = d_prev + 40.0
    u, v, dz = scene_flow(prev, cur, d_prev, d_cur, block=16, search=4)
    # interior blocks (roll wraps the borders) see the true motion
    assert np.median(u) == -3 and np.median(v) == 2
    np.testing.assert_allclose(dz, 40.0)


def test_scene_flow_features_and_clip_append():
    from sr_object_detection_tpu.robot.action import (
        scene_flow_features, clip_features, SCENE_FLOW_DIM)
    rng = np.random.default_rng(1)
    prev = rng.uniform(0, 255, (64, 64, 3)).astype(np.float32)
    cur = np.roll(prev, 3, axis=1)
    d = np.full((64, 64), 1000.0, np.float32)
    f = scene_flow_features(prev, cur, d, d + 10)
    assert f.shape == (SCENE_FLOW_DIM,)
    assert abs(f[SCENE_FLOW_DIM - 2] - 10.0) < 1e-4   # mean dz
    # rightward motion (angle 0) bin dominates
    assert f.argmax() == 4 or f[:8].argmax() == 4

    clip = _make_clip("walk")
    rgbd = [(prev, d), (cur, d + 10)]
    full = clip_features(clip, rgbd)
    base = clip_features(clip, None)
    assert full.shape[0] == base.shape[0] + SCENE_FLOW_DIM


def test_action_recognizer_with_scene_flow():
    from sr_object_detection_tpu.robot.action import clip_features
    rng = np.random.default_rng(2)
    cfg = HistogramConfig()
    feats, labels = [], []
    frames = [(rng.uniform(0, 255, (32, 32, 3)).astype(np.float32),
               np.full((32, 32), 900.0, np.float32)) for _ in range(3)]
    for k, kind in enumerate(("wave", "walk")):
        for s in range(6):
            feats.append(clip_features(_make_clip(kind, seed=s), frames,
                                       cfg))
            labels.append(k)
    model = ELM(hidden=64, seed=0).fit(np.stack(feats),
                                       np.asarray(labels), 2)
    rec = ActionRecognizer(model, ["wave", "walk"], cfg,
                           use_scene_flow=True)
    for t, j in enumerate(_make_clip("wave", seed=99)):
        rgb, dep = frames[t % len(frames)]
        rec.push(j, rgb=rgb, depth=dep)
    label, score = rec.flush()
    assert label == "wave"


def test_face_counter_hook():
    from sr_object_detection_tpu.robot.interaction import (
        FaceCounter, heuristic_face_count)
    img = np.zeros((96, 96, 3), np.float32)
    img[..., 2] = 0.8                               # blue background
    for cx in (24, 72):                             # two skin blobs
        yy, xx = np.mgrid[:96, :96]
        m = ((yy - 30) ** 2 + (xx - cx) ** 2) < 11 ** 2
        img[m] = [0.85, 0.6, 0.45]
    assert heuristic_face_count(img) == 2
    fc = FaceCounter()
    assert fc(img) == 2 and fc.last_count == 2
    assert fc(np.zeros((32, 32, 3), np.float32)) == 0
    # pluggable: a custom detector wins (the cascade hook point)
    fc2 = FaceCounter(detector=lambda rgb: 7)
    assert fc2(img) == 7


def test_body_part_stats():
    """Per-part pixel counts/centroids from a label map (the
    aggregation PixeltoBodyPartLabel's empty loop body was reading
    labels for, Process_Kinect.cpp:955-979)."""
    from sr_object_detection_tpu.robot.action import body_part_stats
    lab = np.zeros((10, 10), np.int32)
    lab[2:4, 2:4] = 5          # part 5: 4 px at centroid (2.5, 2.5)
    lab[7, 7] = 9              # part 9: 1 px
    mask = np.ones((10, 10), bool)
    mask[7, 7] = False         # background -> part 9 excluded
    counts, cents = body_part_stats(lab, mask, n_parts=12)
    assert counts[5] == 4 and counts[9] == 0
    np.testing.assert_allclose(cents[5], [2.5, 2.5])
    assert (cents[9] == -1).all()
    # part 0 covers the rest of the masked foreground
    assert counts[0] == mask.sum() - 4


def test_body_viz_bones_and_hand_states():
    """BodyBasics rendering analog (BodyBasics.cpp:525-607): tracked
    bones drawn, not-tracked skipped, hand circles colored by state."""
    from sr_object_detection_tpu.robot.body_viz import (
        draw_body, HAND_COLORS, HAND_L, HAND_R)
    im = np.zeros((120, 120, 3), np.float32)
    joints = np.zeros((25, 2), np.float32)
    # a simple upright pose
    joints[:] = [60, 60]
    joints[3] = [60, 15]    # head
    joints[2] = [60, 25]    # neck
    joints[20] = [60, 35]
    joints[1] = [60, 55]
    joints[0] = [60, 75]
    joints[7] = [25, 50]    # left hand
    joints[11] = [95, 50]   # right hand
    ts = np.full(25, 2)
    ts[15] = 0              # left foot not tracked -> its bone skipped
    draw_body(im, joints, ts, hand_left="open", hand_right="closed")
    # head-neck bone drawn (green-ish pixels along x=60)
    assert im[20, 60, 1] > 0.9
    # hand circles: left open=green, right closed=red
    assert np.allclose(im[50, 25], HAND_COLORS["open"])
    assert np.allclose(im[50, 95], HAND_COLORS["closed"])
    # untouched corner stays black
    assert im[0, 0].sum() == 0


def test_motion_histogram_descriptor():
    cfg = HistogramConfig()
    f = motion_histograms(_make_clip("wave"), cfg)
    assert f.shape == (descriptor_size(cfg),)
    assert np.isfinite(f).all()
    # a still clip produces near-zero joint-motion features
    f_still = motion_histograms(_make_clip("still"), cfg)
    assert f_still[-N_JOINTS:].mean() < f[-N_JOINTS:].mean()


def test_elm_learns_actions():
    cfg = HistogramConfig()
    kinds = ["wave", "walk", "still"]
    xs, ys = [], []
    for label, kind in enumerate(kinds):
        for s in range(12):
            xs.append(motion_histograms(_make_clip(kind, seed=s), cfg))
            ys.append(label)
    x = np.stack(xs)
    y = np.asarray(ys)
    model = ELM(hidden=128, seed=0).fit(x, y, n_classes=3)
    # held-out clips
    correct = 0
    for label, kind in enumerate(kinds):
        for s in range(100, 106):
            f = motion_histograms(_make_clip(kind, seed=s), cfg)
            correct += int(model.predict(f[None])[0] == label)
    assert correct >= 15  # >= 83% on 18 held-out clips


def test_action_recognizer_flush(tmp_path):
    cfg = HistogramConfig()
    xs, ys = [], []
    for label, kind in enumerate(["wave", "walk"]):
        for s in range(10):
            xs.append(motion_histograms(_make_clip(kind, seed=s), cfg))
            ys.append(label)
    model = ELM(hidden=64, seed=1).fit(np.stack(xs), np.asarray(ys), 2)
    # save/load round trip
    p = str(tmp_path / "elm.npz")
    model.save(p)
    model = ELM.load(p)
    rec = ActionRecognizer(model, ["wave", "walk"], cfg)
    for frame in _make_clip("walk", seed=200):
        rec.push(frame)
    label, score = rec.flush()
    assert label == "walk"
    assert rec.flush() is None  # buffer cleared


def test_hand_roi_clamps():
    frame = np.zeros((100, 200, 3), np.uint8)
    crop, (x0, y0) = hand_roi(frame, (5, 5), roi_size=64)
    assert crop.shape == (64, 64, 3)
    assert x0 == 0 and y0 == 0
    crop, (x0, y0) = hand_roi(frame, (195, 95), roi_size=64)
    assert (x0, y0) == (200 - 64, 100 - 64)


def test_associate_person_voting():
    body = np.full((100, 100), 255, np.uint8)
    body[20:60, 20:60] = 2         # person id 2
    det = (0.4, 0.4, 0.3, 0.3)     # overlaps the person region
    assert associate_person(det, body) == 2
    det_far = (0.9, 0.9, 0.1, 0.1)
    assert associate_person(det_far, body) == -1


def test_speaker_dedup():
    said = []
    sp = Speaker(sink=said.append)
    assert sp.speak("hello")
    assert not sp.speak("hello")     # deduplicated
    assert sp.speak("world")
    assert said == ["hello", "world"]
    assert "cup" in object_reply("cup")
    assert sp.speak_objects(["cup"])
