"""The BASELINE.md accuracy gate: VOC-style mAP parity vs the darknet
CPU reference.

The golden (tools/make_golden.gen_map_ab) trained a small region
detector on a deterministic synthetic set, then ran the reference's
validate_detector loop (detector.c:244-369, via the oracle_valid
driver) over it and stored the per-class detection files. This test
regenerates the SAME images byte-for-byte (digest-guarded), runs OUR
`detector valid` flow with the stored weights, scores both sides with
the same AP math (scripts/voc_eval.py:64-200 re-derivation in
eval/voc.py), and asserts |mAP_ours - mAP_oracle| <= 0.1.
"""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _load(name):
    p = GOLDEN / f"{name}.npz"
    if not p.exists():
        pytest.skip(f"golden {name} not generated")
    return np.load(p)


def _parse_det_text(text):
    dets = []
    for line in text.splitlines():
        f = line.split()
        dets.append((f[0], float(f[1]), float(f[2]), float(f[3]),
                     float(f[4]), float(f[5])))
    return dets


def test_voc_map_parity_vs_oracle(tmp_path):
    import jax.numpy as jnp
    from tools.synth_dataset import (make_dataset, gt_corner_boxes,
                                     dataset_digest, N_CLASSES)
    from sr_object_detection_tpu.eval.voc import mean_ap, voc_det_lines
    from sr_object_detection_tpu.infer.detector import Detector
    from sr_object_detection_tpu.ops import boxes as B
    from sr_object_detection_tpu.ops.image import load_image_rgb

    g = _load("map_ab")
    data_dir = tmp_path / "data"
    list_path, gt = make_dataset(str(data_dir), int(g["n_images"]),
                                 int(g["seed"]))
    digest = dataset_digest(str(data_dir))
    assert digest == bytes(g["digest"]).decode(), \
        "synthetic dataset drifted from the one the oracle saw"

    cfg_file = tmp_path / "net.cfg"
    cfg_file.write_text(bytes(g["cfg"]).decode())
    wfile = tmp_path / "w.weights"
    wfile.write_bytes(bytes(g["weights"]))

    det = Detector(str(cfg_file), str(wfile))
    thresh, nms = float(g["thresh"]), float(g["nms"])
    names = [str(c) for c in range(N_CLASSES)]
    per_class_dets = {c: [] for c in range(N_CLASSES)}
    for path in [l.strip() for l in open(list_path) if l.strip()]:
        img = load_image_rgb(path)
        ih, iw = img.shape[:2]
        image_id = pathlib.Path(path).stem
        x = det.preprocess(img)[None]
        boxes, probs = det.predict_batch(jnp.asarray(x), thresh=thresh)
        boxes = np.asarray(boxes[0])
        probs = np.asarray(probs[0])
        probs = np.asarray(B.nms_sort_topk(
            jnp.asarray(boxes), jnp.asarray(probs), nms, k=len(boxes)))
        lines = voc_det_lines(image_id, boxes, probs, names, iw, ih)
        for c in range(N_CLASSES):
            per_class_dets[c].extend(_parse_det_text("\n".join(lines[names[c]])))

    per_class_gt = gt_corner_boxes(gt)
    our_map, our_aps = mean_ap(per_class_dets, per_class_gt)

    oracle_dets = {c: _parse_det_text(bytes(g[f"dets_{c}"]).decode())
                   for c in range(N_CLASSES)}
    oracle_map, oracle_aps = mean_ap(oracle_dets, per_class_gt)
    # stored oracle mAP must reproduce (same AP math, same inputs)
    np.testing.assert_allclose(oracle_map, float(g["oracle_map"]),
                               atol=1e-9)

    print(f"mAP ours={our_map:.4f} oracle={oracle_map:.4f} "
          f"per-class ours={our_aps} oracle={oracle_aps}")
    assert abs(our_map - oracle_map) <= 0.1, (
        f"mAP parity gate failed: ours={our_map:.4f} "
        f"oracle={oracle_map:.4f}")
    # the gate must not pass vacuously on an untrained/broken detector
    assert oracle_map > 0.2
