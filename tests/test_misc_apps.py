"""Misc app tests: v1 decode, truth packing, A/B weight averaging."""

import numpy as np

import jax
import jax.numpy as jnp

from sr_object_detection_tpu.apps.misc_apps import (
    decode_detection_boxes, fill_truth_region_np, _int_to_alphanum)
from sr_object_detection_tpu.graph.spec import DetectionSpec


def _det_spec(side=3, classes=3, n=2):
    return DetectionSpec(index=0, side=side, classes=classes, n=n,
                         coords=4, sqrt=True)


def test_v1_decode_geometry():
    spec = _det_spec()
    s2 = spec.side ** 2
    out = np.zeros(s2 * (spec.classes + spec.n * 5), np.float32)
    # put one confident box in cell (row 1, col 2), box slot 0
    cell = 1 * spec.side + 2
    out[s2 * spec.classes + cell * spec.n + 0] = 0.9          # objectness
    box_off = s2 * (spec.classes + spec.n) + (cell * spec.n) * 4
    out[box_off:box_off + 4] = [0.5, 0.5, 0.6, 0.4]           # x,y,sqrt w,h
    out[cell * spec.classes + 1] = 1.0                        # class 1
    boxes, probs = decode_detection_boxes(out, spec)
    i = cell * spec.n
    assert abs(boxes[i, 0] - (2 + 0.5) / 3) < 1e-6
    assert abs(boxes[i, 1] - (1 + 0.5) / 3) < 1e-6
    assert abs(boxes[i, 2] - 0.36) < 1e-6                     # sqrt undone
    assert abs(probs[i, 1] - 0.9) < 1e-6


def test_fill_truth_region_grid():
    labels = np.array([[2, 0.5, 0.5, 0.3, 0.4],
                       [1, 0.9, 0.1, 0.2, 0.2]], np.float32)
    t = fill_truth_region_np(labels, side=3, classes=3)
    c1 = 1 * 3 + 1   # (0.5,0.5) -> col 1, row 1
    assert t[c1, 0] == 1 and t[c1, 1 + 2] == 1
    np.testing.assert_allclose(t[c1, 4:], [0.5, 0.5, 0.3, 0.4], atol=1e-6)
    c2 = 0 * 3 + 2   # (0.9,0.1) -> col 2, row 0
    assert t[c2, 0] == 1 and t[c2, 1 + 1] == 1


def test_alphanum_mapping():
    assert _int_to_alphanum(0) == "0"
    assert _int_to_alphanum(9) == "9"
    assert _int_to_alphanum(10) == "a"
    assert _int_to_alphanum(35) == "z"
    assert _int_to_alphanum(36) == "."


def test_periodic_weight_average_matches_reference_semantics():
    """sync_nets averages full replicas (network_kernels.cu:279-344)."""
    from sr_object_detection_tpu.parallel.mesh import \
        periodic_weight_average
    a = [{"weights": jnp.ones((2, 2)), "biases": jnp.zeros(2)}]
    b = [{"weights": 3 * jnp.ones((2, 2)), "biases": 2 * jnp.ones(2)}]
    avg = periodic_weight_average([a, b])
    np.testing.assert_allclose(np.asarray(avg[0]["weights"]), 2.0)
    np.testing.assert_allclose(np.asarray(avg[0]["biases"]), 1.0)
