"""Worker process for the multi-host (virtual-cluster) training tests.

Each worker is one "host" of a 2-process cluster with 4 virtual CPU
devices (8 global devices — the same mesh the single-process DP
exactness test uses). It loads ONLY its own half of the global batch
(distributed.process_part — the get_data_part analog, data.c:1128),
assembles global arrays with distributed.global_batch, runs 3 Trainer
steps over the global mesh, and writes loss + a params digest to a
JSON file the test compares against the 1-process 8-device run.

Run: python tests/distributed_worker.py <pid> <nprocs> <port> <out.json>
     [n_global_devices=8]
"""

import json
import os
import sys


def main():
    pid, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              sys.argv[3], sys.argv[4])
    n_global = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    from sr_object_detection_tpu.parallel import distributed as D
    D.initialize(f"localhost:{port}", nprocs, pid,
                 local_device_count=n_global // nprocs, platform="cpu")

    import jax
    import numpy as np

    from sr_object_detection_tpu.parallel.distributed import (
        global_batch, global_mesh, process_part)
    from sr_object_detection_tpu.train.trainer import Trainer

    assert jax.process_count() == nprocs
    assert len(jax.devices()) == n_global

    # identical model + batch recipe to tests/test_parallel.py's
    # single-process DP exactness test (batch == global device count)
    from test_parallel import _batch, _spec
    rng = np.random.default_rng(0)
    B = n_global
    x, t = _batch(rng, B)

    mesh = global_mesh()
    part = process_part(B)          # this host's rows (get_data_part)
    trainer = Trainer(_spec(B), seed=0, mesh=mesh)
    with mesh:
        for _ in range(3):
            gx, gt = global_batch(mesh, x[part], t[part],
                                  global_batch_size=B)
            m = trainer.step(gx, gt)
        loss = float(m["loss"])
        # digest: sum of |params| per layer over the replicated copy
        digest = [
            {k: float(jax.numpy.sum(jax.numpy.abs(v)))
             for k, v in p.items()} for p in trainer.state.params]
    with open(out, "w") as f:
        json.dump({"pid": pid, "loss": loss, "digest": digest}, f)
    print(f"worker {pid}: loss={loss:.6f} ok", flush=True)


if __name__ == "__main__":
    main()
