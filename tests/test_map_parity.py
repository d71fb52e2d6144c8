"""The BASELINE.md accuracy gate: VOC-style mAP parity vs the darknet
CPU reference, over THREE detector topologies:

  * map_ab      — plain conv trunk (round-2 gate)
  * map_ab_v2   — yolov2-style trunk: maxpool chain + route + reorg
                  passthrough (cfg/yolo.cfg structure)
  * map_ab_tree — WordTree region head: grouped softmax + the
                  no-map hierarchy decode walk (region_layer.c:348-367)

Each golden (tools/make_golden.gen_map_ab*) trained a small region
detector on a deterministic synthetic set, then ran the reference's
validate_detector loop (detector.c:244-369, via the oracle_valid
driver) over it and stored the per-class detection files. The tests
regenerate the SAME images byte-for-byte (digest-guarded), run OUR
`detector valid` flow with the stored weights, score both sides with
the same AP math (scripts/voc_eval.py:64-200 re-derivation in
eval/voc.py), and assert |mAP_ours - mAP_oracle| <= 0.1. The int8
variant quantizes the v2 topology and holds the same gate.
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


def _run_map_ab(g, tmp_path, *, int8=False, quantize_head=False,
                region_dtype=None):
    """Shared A/B harness: returns (our_map, oracle_map)."""
    import jax.numpy as jnp
    from tools.synth_dataset import (make_dataset, gt_corner_boxes,
                                     dataset_digest, N_CLASSES)
    from sr_object_detection_tpu.eval.voc import mean_ap, voc_det_lines
    from sr_object_detection_tpu.infer.detector import Detector
    from sr_object_detection_tpu.ops import boxes as B
    from sr_object_detection_tpu.ops.image import load_image_rgb

    data_dir = tmp_path / "data"
    list_path, gt = make_dataset(str(data_dir), int(g["n_images"]),
                                 int(g["seed"]))
    digest = dataset_digest(str(data_dir))
    assert digest == bytes(g["digest"]).decode(), \
        "synthetic dataset drifted from the one the oracle saw"

    cfg_text = bytes(g["cfg"]).decode()
    if "tree" in g.files:
        tree_file = tmp_path / "tree.txt"
        tree_file.write_text(bytes(g["tree"]).decode())
        cfg_text = cfg_text.replace("TREEFILE", str(tree_file))
    cfg_file = tmp_path / "net.cfg"
    cfg_file.write_text(cfg_text)
    wfile = tmp_path / "w.weights"
    wfile.write_bytes(bytes(g["weights"]))
    offset = int(g["class_offset"]) if "class_offset" in g.files else 0

    paths = [l.strip() for l in open(list_path) if l.strip()]
    det = Detector(str(cfg_file), str(wfile))
    if int8:
        calib = np.stack([det.preprocess(load_image_rgb(p))
                          for p in paths[:8]])
        det.quantize(calib, quantize_head=quantize_head,
                     region_dtype=region_dtype)
    thresh, nms = float(g["thresh"]), float(g["nms"])
    region = det.region
    node_names = [str(c) for c in range(region.classes)]
    per_class_dets = {c: [] for c in range(N_CLASSES)}
    for path in paths:
        img = load_image_rgb(path)
        ih, iw = img.shape[:2]
        image_id = pathlib.Path(path).stem
        x = det.preprocess(img)[None]
        boxes, probs = det.predict_batch(jnp.asarray(x), thresh=thresh)
        boxes = np.asarray(boxes[0])
        probs = np.asarray(probs[0])
        probs = np.asarray(B.nms_sort_topk(
            jnp.asarray(boxes), jnp.asarray(probs), nms, k=len(boxes)))
        lines = voc_det_lines(image_id, boxes, probs, node_names, iw, ih)
        for c in range(N_CLASSES):
            per_class_dets[c].extend(_parse_det_text(
                "\n".join(lines[node_names[c + offset]])))

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
    return our_map, oracle_map


@pytest.mark.parametrize("name", ["map_ab", "map_ab_v2", "map_ab_tree"])
def test_voc_map_parity_vs_oracle(name, tmp_path):
    g = _load(name)
    our_map, oracle_map = _run_map_ab(g, tmp_path)
    assert abs(our_map - oracle_map) <= 0.1, (
        f"{name}: mAP parity gate failed: ours={our_map:.4f} "
        f"oracle={oracle_map:.4f}")
    # the gate must not pass vacuously on an untrained/broken detector
    assert oracle_map > 0.2


def test_voc_map_parity_int8_v2(tmp_path):
    """int8 PTQ gate on the route/reorg topology (VERDICT r2 item 5):
    the quantized yolov2-style engine holds the same mAP gate."""
    g = _load("map_ab_v2")
    our_map, oracle_map = _run_map_ab(g, tmp_path, int8=True)
    assert abs(our_map - oracle_map) <= 0.1, (
        f"int8 v2 mAP gate failed: ours={our_map:.4f} "
        f"oracle={oracle_map:.4f}")
    assert oracle_map > 0.2


@pytest.mark.parametrize("name", ["map_ab_v2", "map_ab_tree"])
def test_voc_map_parity_int8_quantized_head(name, tmp_path):
    """int8 head-conv gate (quantize_head=True — the yolo9000 serving
    lever: the 1024->28269 head conv is ~2/3 of yolo9000's FLOPs).
    The head logits take only input/weight quantization error (no
    output requant), so the same mAP gate must hold on both the
    route/reorg and the WordTree hierarchy-decode topologies."""
    g = _load(name)
    our_map, oracle_map = _run_map_ab(g, tmp_path, int8=True,
                                      quantize_head=True)
    assert abs(our_map - oracle_map) <= 0.1, (
        f"int8 quantized-head {name} mAP gate failed: "
        f"ours={our_map:.4f} oracle={oracle_map:.4f}")
    assert oracle_map > 0.2


def test_voc_map_parity_full_serving_stack(tmp_path):
    """Gate the EXACT yolo9000 serving configuration bench.py reports:
    int8 trunk + int8 head conv + bf16 region decode, on the WordTree
    hierarchy-decode topology (measured 1699 img/s vs 1332 bf16 on the
    v5e — the bf16 decode halves the 28k-ch class-tensor write)."""
    import jax.numpy as jnp
    g = _load("map_ab_tree")
    our_map, oracle_map = _run_map_ab(
        g, tmp_path, int8=True, quantize_head=True,
        region_dtype=jnp.bfloat16)
    assert abs(our_map - oracle_map) <= 0.1, (
        f"full-stack tree mAP gate failed: ours={our_map:.4f} "
        f"oracle={oracle_map:.4f}")
    assert oracle_map > 0.2
