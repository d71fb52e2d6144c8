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
