#!/usr/bin/env python
"""Headline benchmark: tiny-yolo-voc 416x416 images/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = value / 5000 (the driver target from BASELINE.json).
Extra context lines go to stderr.
"""

import json
import os
import sys
import time

import jax

# persistent compilation cache: first run pays the (remote) compile,
# later runs start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
from sr_object_detection_tpu.io.weights import init_params
from sr_object_detection_tpu.infer.engine import (
    ThroughputEngine, LatencyEngine, analytic_flops)

TARGET = 5000.0  # images/sec/chip (BASELINE.json north star)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spec = tiny_yolo_voc()
    params = init_params(spec, seed=0)
    flops = analytic_flops(spec)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    print(f"analytic FLOPs/img: {flops/1e9:.2f} G", file=sys.stderr)

    eng = ThroughputEngine(spec, params, batch=batch, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    eng.warmup()
    print(f"compile+warmup: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    r = eng.benchmark(iters=30)
    ips = r["images_per_sec"]
    mfu_denom = 394e12  # v5e bf16 peak FLOPs/s
    print(f"throughput: {ips:.0f} img/s (batch {batch}), "
          f"{ips*flops/1e12:.1f} TFLOP/s, "
          f"~{100*ips*flops/mfu_denom:.0f}% of v5e bf16 peak",
          file=sys.stderr)

    try:
        lat = LatencyEngine(spec, params, dtype=jnp.bfloat16)
        lat.warmup()
        lr = lat.benchmark(iters=50)
        print(f"batch-1 latency p50={lr['p50_ms']:.2f}ms "
              f"p99={lr['p99_ms']:.2f}ms", file=sys.stderr)
    except Exception as e:  # latency path must not sink the headline
        print(f"latency bench skipped: {e}", file=sys.stderr)

    try:
        from sr_object_detection_tpu.models.zoo import yolov2
        from sr_object_detection_tpu.io.weights import init_params as ip2
        spec2 = yolov2(width=608, height=608)
        eng2 = ThroughputEngine(spec2, ip2(spec2, seed=0), batch=32,
                                dtype=jnp.bfloat16)
        eng2.warmup()
        r2 = eng2.benchmark(iters=15)
        f2 = analytic_flops(spec2)
        print(f"yolov2-coco-608: {r2['images_per_sec']:.0f} img/s "
              f"(batch 32), {r2['images_per_sec']*f2/1e12:.1f} TFLOP/s",
              file=sys.stderr)
    except Exception as e:
        print(f"yolov2-608 bench skipped: {e}", file=sys.stderr)

    try:
        import dataclasses
        from sr_object_detection_tpu.train.trainer import (
            make_train_step, TrainState)
        from sr_object_detection_tpu.train.sgd import init_velocity
        tspec = dataclasses.replace(
            spec, net=dataclasses.replace(spec.net, batch=32,
                                          subdivisions=1))
        tparams = jax.tree.map(jnp.asarray, init_params(tspec, seed=0))
        state = TrainState(tparams, init_velocity(tparams),
                           jnp.asarray(0))
        tstep = jax.jit(make_train_step(tspec, compute_dtype=jnp.bfloat16),
                        donate_argnums=(0,))
        xt = jnp.asarray(np.random.uniform(
            0, 1, (32, 416, 416, 3)).astype(np.float32))
        tt = np.zeros((32, 30, 5), np.float32)
        tt[:, 0] = [0.5, 0.5, 0.3, 0.3, 1]
        tt = jnp.asarray(tt)
        rngk = jax.random.PRNGKey(0)
        state, m = tstep(state, xt, tt, rngk)
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(5):
            state, m = tstep(state, xt, tt, rngk)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / 5
        print(f"training (bf16 region loss, batch 32): {32/dt:.0f} img/s",
              file=sys.stderr)
    except Exception as e:
        print(f"training bench skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "tiny-yolo-voc-416 images/sec/chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
