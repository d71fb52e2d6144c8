"""Multi-host (multi-process) distributed training on a virtual
cluster — the DCN story (SURVEY §5.8).

A 2-process jax.distributed cluster (4 virtual CPU devices each, Gloo
collectives between processes) must train EXACTLY like the 1-process
8-device mesh: same loss, same parameters. Each worker loads only its
own half of the batch via the get_data_part analog
(src_yolo2/data.c:1128) — the multi-node-without-a-cluster test SURVEY
§4 calls for."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_data_part_matches_reference():
    """data_part reproduces get_data_part's row arithmetic exactly
    (data.c:1128): disjoint, ordered, covers all rows, same bounds."""
    from sr_object_detection_tpu.parallel.distributed import data_part
    for n in (1, 7, 8, 100, 101):
        for total in (1, 2, 3, 4, 8):
            rows = []
            for part in range(total):
                s = data_part(n, part, total)
                # reference: start = n*part/total, rows = n*(part+1)/total - start
                assert s.start == n * part // total
                assert s.stop == n * (part + 1) // total
                rows.extend(range(s.start, s.stop))
            assert rows == list(range(n))


def test_two_process_training_matches_single_process():
    """2-process x 4-device virtual cluster == 1-process x 8-device:
    loss and parameters match (synchronous DP is process-count
    invariant). The single-process reference runs in THIS process on
    the same 8-CPU-device mesh the workers form together."""
    from test_parallel import _batch, _spec
    from sr_object_detection_tpu.parallel.mesh import make_mesh
    from sr_object_detection_tpu.train.trainer import Trainer

    assert len(jax.devices()) >= 8
    rng = np.random.default_rng(0)
    x, t = _batch(rng, 8)
    mesh = make_mesh(8, model_parallel=1)
    ref = Trainer(_spec(8), seed=0, mesh=mesh)
    with mesh:
        for _ in range(3):
            m = ref.step(x, t)
    ref_loss = float(m["loss"])
    ref_digest = [
        {k: float(jax.numpy.sum(jax.numpy.abs(v)))
         for k, v in p.items()} for p in ref.state.params]

    port = _free_port()
    outs = [os.path.join(HERE, f"../.pytest_dw{i}.json") for i in (0, 1)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(HERE, "distributed_worker.py"),
         str(i), "2", str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=HERE) for i in (0, 1)]
    logs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    try:
        results = [json.load(open(o)) for o in outs]
    finally:
        for o in outs:
            if os.path.exists(o):
                os.unlink(o)
    # both processes converge on the same replicated state...
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["digest"] == results[1]["digest"]
    # ...and it equals the single-process 8-device run
    assert abs(results[0]["loss"] - ref_loss) < 1e-4, \
        (results[0]["loss"], ref_loss)
    for got, want in zip(results[0]["digest"], ref_digest):
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5,
                                       err_msg=f"param digest {k}")


def test_loader_process_sharding():
    """DetectionLoader's process sharding is the get_data_part analog:
    2 processes' path lists partition the dataset disjointly in order."""
    from sr_object_detection_tpu.data.loader import DetectionLoader

    paths = [f"/nonexistent/im{i:03d}.jpg" for i in range(11)]
    seen = []
    for pid in range(2):
        ld = DetectionLoader.__new__(DetectionLoader)
        sharded = ld._shard_paths(paths, process_index=pid,
                                  process_count=2)
        seen.extend(sharded)
    assert seen == paths
