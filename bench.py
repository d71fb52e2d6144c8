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

    from sr_object_detection_tpu.utils.profiler import TPU_PEAK_FLOPS
    PEAK = TPU_PEAK_FLOPS["v5e"]   # 197e12 bf16
    PEAK_INT8 = 2 * PEAK           # 394e12 int8 (v5e doubles the MACs)

    eng = ThroughputEngine(spec, params, batch=batch, dtype=jnp.bfloat16)
    # Split XLA compile from the first execution: on this tunneled
    # axon deployment the compile is seconds (and persistently cached)
    # while the FIRST execution pays a program-load round-trip measured
    # at 20-350s across identical runs (round-5 probe; r3's "9.5s" and
    # r4's "183.4s" compile+warmup were both this tunnel variance, not
    # repo changes — see PARITY.md "Bench protocol").
    t0 = time.perf_counter()
    xz = jnp.zeros(eng.input_shape, eng.dtype)
    compiled = eng._run_sum.lower(eng.params, xz).compile()
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(compiled(eng.params, xz))  # host read = hard sync
    t_load = time.perf_counter() - t0
    print(f"compile: {t_compile:.1f}s; first-exec (tunnel program "
          f"load, deployment-variable): {t_load:.1f}s", file=sys.stderr)
    eng.warmup()
    r = eng.benchmark(iters=30)
    ips = r["images_per_sec"]
    print(f"throughput bf16: {ips:.0f} img/s (batch {batch}), "
          f"{ips*flops/1e12:.1f} TFLOP/s, "
          f"MFU {100*ips*flops/PEAK:.0f}% of v5e bf16 peak",
          file=sys.stderr)

    # bf16 phase-stem serving: MEASURED NEGATIVE (0.79x plain bf16,
    # BENCH_r04) — the int8 stem's +33% came from halving already-
    # scarce bytes; the bf16 kernel replaced an XLA chain already at
    # the traffic floor. Postmortem in PARITY.md "bf16 serving
    # phase-stem"; the flag stays opt-in and is not benched.

    # int8 serving mode (infer/quant.py): symmetric PTQ, head conv +
    # decode stay float; accuracy-gated by tests/test_quant.py::
    # test_int8_map_delta (gate: mAP within 0.05 of f32 on the A/B
    # set; measured delta +0.002). This is the headline serving
    # configuration.
    try:
        from sr_object_detection_tpu.infer.quant import (
            QuantizedThroughputEngine)
        # explicit noise calibration: fine for a throughput benchmark
        # (serving passes real frames; the engine warns otherwise)
        calib = np.random.RandomState(0).uniform(
            0, 1, (8, spec.net.h, spec.net.w, 3)).astype(np.float32)
        qeng = QuantizedThroughputEngine(spec, params, batch=batch,
                                         calib_x=calib)
        qeng.warmup()
        qr = qeng.benchmark(iters=30)
        qips = qr["images_per_sec"]
        print(f"throughput int8: {qips:.0f} img/s (batch {batch}), "
              f"{qips*flops/1e12:.1f} TFLOP/s-equiv "
              f"({qips/ips:.2f}x bf16, "
              f"{100*qips*flops/PEAK_INT8:.0f}% of v5e int8 peak)",
              file=sys.stderr)
        # HEADLINE: uint8 camera frames into the int8 engine — the /255
        # is folded into the input quant, so the device reads 1 byte/px
        # instead of 4 (the serving configuration for camera traffic)
        ur = qeng.benchmark(iters=30, input_dtype=jnp.uint8)
        uips = ur["images_per_sec"]
        print(f"throughput int8 u8-frames: {uips:.0f} img/s "
              f"(batch {batch}), {uips*flops/1e12:.1f} TFLOP/s-equiv "
              f"({uips/ips:.2f}x bf16)", file=sys.stderr)
        ips = max(ips, qips, uips)
        # HEADLINE+: phase-split fused conv+pool stem (Pallas,
        # kernels/phase_stem.py): the leading conv3x3+pool2x2 pairs run
        # as one fused int8 kernel per pair — the 2x2 max runs on the
        # raw s32 conv accumulators (monotone epilogue commutes), so
        # the full-res conv activations never touch HBM. BIT-EXACT to
        # the int8 chain (tests/test_phase_stem.py + device A/B).
        if batch == 128:
            pseng = QuantizedThroughputEngine(
                spec, params, batch=batch, calib_x=calib,
                phase_stem=True)
            pseng.warmup()
            pr = pseng.benchmark(iters=30, input_dtype=jnp.uint8)
            pips = pr["images_per_sec"]
            print(f"throughput int8 u8 phase-stem: {pips:.0f} img/s "
                  f"(batch {batch}), {pips*flops/1e12:.1f} "
                  f"TFLOP/s-equiv ({pips/max(uips,1e-9):.2f}x int8-u8, "
                  f"{100*pips*flops/PEAK_INT8:.0f}% of v5e int8 peak)",
                  file=sys.stderr)
            ips = max(ips, pips)
    except Exception as e:
        print(f"int8 bench skipped: {e}", file=sys.stderr)

    try:
        lat = LatencyEngine(spec, params, dtype=jnp.bfloat16)
        lat.warmup()
        lr = lat.benchmark(iters=50)
        dr = lat.device_benchmark(reps=200)
        print(f"batch-1 latency: tunnel-wall p50={lr['p50_ms']:.2f}ms "
              f"p99={lr['p99_ms']:.2f}ms; on-device "
              f"{dr['device_ms_per_frame']:.3f}ms/frame "
              f"(in-graph x{dr['reps']} repeat — the engine number; "
              f"wall times above are dominated by tunnel RTT)",
              file=sys.stderr)
        latf = LatencyEngine(spec, params, dtype=jnp.bfloat16,
                             fused_stem=True)
        if latf.fused_stem:
            latf.warmup()
            drf = latf.device_benchmark(reps=200)
            print(f"batch-1 on-device bf16+fused-stem: "
                  f"{drf['device_ms_per_frame']:.3f}ms/frame "
                  f"({dr['device_ms_per_frame'] / drf['device_ms_per_frame']:.2f}x"
                  f" plain bf16; Pallas b1_stem owns the conv+pool "
                  f"prefix)", file=sys.stderr)
        else:
            drf = None
        calib = np.random.uniform(0, 1, (4, spec.net.h, spec.net.w,
                                         3)).astype(np.float32)
        latq = LatencyEngine(spec, params, int8_calib=calib)
        latq.warmup()
        drq = latq.device_benchmark(reps=200)
        print(f"batch-1 on-device int8: "
              f"{drq['device_ms_per_frame']:.3f}ms/frame "
              f"({dr['device_ms_per_frame']/drq['device_ms_per_frame']:.2f}x"
              f" bf16) [RETIRED as a latency lever: B=1 is "
              f"latency-bound, int8 adds requant ops to the chain and "
              f"the stem's tap-shift VPU cost is dtype-independent — "
              f"measured only as the auto-fallback evidence; serve "
              f"bf16+fused-stem. PARITY 'Batch-1 int8: retired']",
              file=sys.stderr)
        # serving default is the measured winner, never a slower int8
        # (best_latency_engine auto-fallback; VERDICT r2 item 3)
        times = {"bf16": dr["device_ms_per_frame"],
                 "int8": drq["device_ms_per_frame"]}
        if drf is not None:
            times["bf16+fused-stem"] = drf["device_ms_per_frame"]
        chosen = min(times, key=times.get)
        print(f"batch-1 serving default: {chosen} "
              f"({times[chosen]:.3f}ms; measured winner via "
              f"best_latency_engine)", file=sys.stderr)
    except Exception as e:  # latency path must not sink the headline
        print(f"latency bench skipped: {e}", file=sys.stderr)

    try:
        from sr_object_detection_tpu.models.zoo import yolov2
        from sr_object_detection_tpu.io.weights import init_params as ip2
        spec2 = yolov2(width=608, height=608)
        params2 = ip2(spec2, seed=0)
        # batch 128, not 32: with the batch dim exactly filling the 128
        # lanes, XLA lays the C=32 stem out batch-minor instead of
        # lane-padding the channel axis 4x — measured 1099 -> 1966
        # bf16, 1622 -> 2915 int8 on the v5e (b=256 gains nothing)
        eng2 = ThroughputEngine(spec2, params2, batch=128,
                                dtype=jnp.bfloat16)
        eng2.warmup()
        r2 = eng2.benchmark(iters=8)
        f2 = analytic_flops(spec2)
        print(f"yolov2-coco-608: bf16 {r2['images_per_sec']:.0f} img/s "
              f"(batch 128), {r2['images_per_sec']*f2/1e12:.1f} TFLOP/s",
              file=sys.stderr)
        from sr_object_detection_tpu.infer.quant import (
            QuantizedThroughputEngine)
        calib2 = np.random.RandomState(0).uniform(
            0, 1, (8, spec2.net.h, spec2.net.w, 3)).astype(np.float32)
        # phase-split fused stem on the 608 trunk too (pairs that fit
        # VMEM; in-kernel WS column chunking at WP=152) — bit-exact,
        # measured 3000 -> 3194 img/s u8 (+6.5%)
        q2 = QuantizedThroughputEngine(spec2, params2, batch=128,
                                       calib_x=calib2, phase_stem=True)
        q2.warmup()
        qr2 = q2.benchmark(iters=8, input_dtype=jnp.uint8)
        print(f"yolov2-coco-608: int8 u8 phase-stem "
              f"{qr2['images_per_sec']:.0f} img/s "
              f"({qr2['images_per_sec']/r2['images_per_sec']:.2f}x bf16)",
              file=sys.stderr)
    except Exception as e:
        print(f"yolov2-608 bench skipped: {e}", file=sys.stderr)

    try:
        from sr_object_detection_tpu.models.zoo import yolo9000
        from sr_object_detection_tpu.io.weights import fast_init_params
        spec9 = yolo9000(tree_file="/root/reference/cfg/9k.tree",
                         map_file=None)
        p9 = fast_init_params(spec9, seed=0)
        # FLAT presplit decode (round 3): (fields, cls_flat) output —
        # no darknet-flat reassembly AND no 5-D class view (the A=3
        # sublane dim forced 7.5 ms of T(8,128)<->T(4,128) retile
        # copies per B=128 batch); batch 128 for the batch-minor stem
        # layout (see the yolov2 note). 1342 -> 1871 (5-D presplit)
        # -> 2250 (flat) img/s bf16.
        eng9 = ThroughputEngine(spec9, p9, batch=128,
                                dtype=jnp.bfloat16, presplit="flat")
        eng9.warmup()
        r9 = eng9.benchmark(iters=6)
        f9 = analytic_flops(spec9)
        print(f"yolo9000-416 (28269-ch head + 9k tree, flat presplit): "
              f"{r9['images_per_sec']:.0f} img/s (batch 128), "
              f"{r9['images_per_sec']*f9/1e12:.1f} TFLOP/s",
              file=sys.stderr)
        from sr_object_detection_tpu.infer.quant import (
            QuantizedThroughputEngine as _QTE)
        calib9 = np.random.RandomState(0).uniform(
            0, 1, (8, spec9.net.h, spec9.net.w, 3)).astype(np.float32)
        # full serving stack (round 3): int8 trunk + int8 head conv +
        # bf16 region decode + FLAT presplit contract. Measured (batch
        # 128): 2183 (5-D) -> 2696 img/s (flat). Decode-exactness
        # pinned vs the 5-D path (tests/test_presplit.py) which is
        # mAP-gated end-to-end (tests/test_map_parity.py::
        # test_voc_map_parity_full_serving_stack).
        # + phase-split fused stem (bit-exact; 2826 -> 2987 u8, +5.7%)
        q9 = _QTE(spec9, p9, batch=128, calib_x=calib9,
                  presplit="flat", quantize_head=True,
                  region_dtype=jnp.bfloat16, phase_stem=True)
        q9.warmup()
        qr9 = q9.benchmark(iters=6, input_dtype=jnp.uint8)
        print(f"yolo9000-416 int8 full stack (qhead+bf16-decode+"
              f"flat presplit+phase-stem): {qr9['images_per_sec']:.0f} "
              f"img/s ({qr9['images_per_sec']/r9['images_per_sec']:.2f}x "
              f"flat-bf16)", file=sys.stderr)
    except Exception as e:
        print(f"yolo9000 bench skipped: {e}", file=sys.stderr)

    def train_bench(mkspec, label, batch_t, *, iters=10, repeats=3,
                    remat=False, fast_init=False, phase_train=False,
                    input_dtype=None):
        import dataclasses
        from sr_object_detection_tpu.train.trainer import (
            make_train_step, TrainState)
        from sr_object_detection_tpu.train.sgd import init_velocity
        from sr_object_detection_tpu.utils.profiler import train_flops
        from sr_object_detection_tpu.io.weights import fast_init_params
        base = mkspec()
        tspec = dataclasses.replace(
            base, net=dataclasses.replace(base.net, batch=batch_t,
                                          subdivisions=1))
        ip = fast_init_params if fast_init else init_params
        tparams = jax.tree.map(jnp.asarray, ip(tspec, seed=0))
        state = TrainState(tparams, init_velocity(tparams), jnp.asarray(0))
        tstep = jax.jit(
            make_train_step(tspec, compute_dtype=jnp.bfloat16, remat=remat,
                            phase_train=phase_train),
            donate_argnums=(0,))
        xt = jnp.asarray(np.random.uniform(
            0, 1, (batch_t, tspec.net.h, tspec.net.w, 3)).astype(np.float32))
        if input_dtype is not None:
            # the production dataflow: device-aug casts to bf16 at aug
            # write (data/device_aug.py out_dtype), so the step reads
            # bf16 — bit-identical numerics, half the input traffic
            xt = xt.astype(input_dtype)
        tt = np.zeros((batch_t, 30, 5), np.float32)
        tt[:, 0] = [0.5, 0.5, 0.3, 0.3, 1]
        tt = jnp.asarray(tt)
        rngk = jax.random.PRNGKey(0)
        state, m = tstep(state, xt, tt, rngk)
        float(m["loss"])
        # best-of-N x iters: the protocol the round-3/4 A/B records
        # use — a single short window on a tunneled session reads low
        # (VERDICT r4 item 2: driver captured 2860 where the repo's own
        # A/B read 3081)
        dt = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = tstep(state, xt, tt, rngk)
            float(m["loss"])
            dt = min(dt, (time.perf_counter() - t0) / iters)
        tf = train_flops(tspec)            # fwd + ~2x bwd per image
        tput = batch_t / dt
        print(f"training {label} (bf16, batch {batch_t}"
              f"{', remat' if remat else ''}"
              f"{', bf16-aug input' if input_dtype is not None else ''}"
              f", best-of-{repeats}"
              f"x{iters}): {tput:.0f} img/s, "
              f"{tput*tf/1e12:.1f} TFLOP/s, "
              f"MFU {100*tput*tf/PEAK:.0f}%", file=sys.stderr)
        return tput

    try:
        # input pipeline: device-batched augmentation (the host numpy
        # pipeline is ~25 img/s/core; real training would be input-
        # bound without this — data/device_aug.py)
        from sr_object_detection_tpu.data import device_aug as DA
        rng = np.random.default_rng(0)
        cv = rng.integers(0, 255, (128, 384, 512, 3)).astype(np.uint8)
        aug = DA.DeviceAugmenter(416, 416)
        cs = [DA.draw_params(rng, 375, 500, jitter=.2, hue=.1,
                             saturation=1.5, exposure=1.5)[0]
              for _ in range(128)]
        cf = [aug.coeffs(c) for c in cs]
        cols = {k: jnp.asarray(np.stack([c[k] for c in cf]))
                for k in cf[0]}
        cj = jnp.asarray(cv)

        @jax.jit
        def _rep(c, cols):
            def body(carry, _):
                out = aug._fn(carry, cols)
                eps = (jnp.sum(out) * 0).astype(jnp.uint8)
                return carry + eps, ()
            y, _ = jax.lax.scan(body, c, None, length=20)
            return jnp.sum(y.astype(jnp.float32))

        float(_rep(cj, cols))
        t0 = time.perf_counter()
        float(_rep(cj, cols))
        adt = (time.perf_counter() - t0) / 20
        print(f"device augmentation (crop+resize+flip+HSV, "
              f"{aug.resample} resample): {128/adt:.0f} img/s "
              f"({adt*1e3:.1f} ms/batch-128)", file=sys.stderr)
    except Exception as e:
        print(f"device-aug bench skipped: {e}", file=sys.stderr)

    synth_tput = None
    try:
        # phase_train: the leading conv+pool pair trains with the conv
        # inside phase-split Pallas kernels (kernels/phase_train.py) —
        # r5 lever matrix in PARITY.md (fwdstats + Pallas apply +
        # NHWC-direct boundary; parity-tested vs the production
        # chain, tests/test_phase_train.py). bf16 input = the
        # production device-aug dataflow (aug casts at write).
        synth_tput = train_bench(tiny_yolo_voc, "tiny-yolo-416", 128,
                                 phase_train=True,
                                 input_dtype=jnp.bfloat16)
    except Exception as e:
        print(f"training bench skipped: {e}", file=sys.stderr)

    try:
        # END-TO-END training from disk (the system number, not the
        # kernel number): packed raw-u8 dataset (data/packed.py) ->
        # mmap batch gather -> prefetch-thread device dispatch (upload
        # overlaps the step) -> device augmentation (bf16 MXU
        # resample) -> the SAME phase_train step as the synthetic row.
        # Reference analog: detector.c:86-113 double-buffered
        # load_thread feeding train_network. Three rows so a reader
        # can separate framework capability from this deployment's
        # tunnel: (a) measured transport roofline, (b) the HOST side
        # of the loader in isolation, (c) the end-to-end rate as a %
        # of (a). Packed at BOTH 448 (multi-scale-capable storage)
        # and 416 (exact train res, -14% bytes when multi-scale off).
        import dataclasses
        import tempfile
        from sr_object_detection_tpu.data.packed import (
            PackedDetectionLoader)
        from sr_object_detection_tpu.train.trainer import (
            make_train_step, TrainState)
        from sr_object_detection_tpu.train.sgd import init_velocity
        from sr_object_detection_tpu.utils.profiler import train_flops
        rngd = np.random.default_rng(0)

        def make_packed(sh, sw, n=512, boxes=30):
            d = tempfile.mkdtemp(prefix=f"bench_packed_{sh}_")
            with open(d + "/pk.imgs", "wb") as f:
                for _ in range(n // 64):
                    f.write(rngd.integers(
                        0, 256, (64, sh, sw, 3),
                        dtype=np.uint8).tobytes())
            labs = np.zeros((n, boxes, 5), np.float32)
            labs[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
            labs.tofile(d + "/pk.labs")
            with open(d + "/pk.json", "w") as f:
                json.dump({"n": n, "h": sh, "w": sw, "c": 3,
                           "boxes": boxes, "version": 1}, f)
            return d + "/pk"

        # (a) transport roofline: raw u8 canvas upload rate
        up = jax.jit(lambda v: jnp.sum(v, dtype=jnp.int32))
        canvas = rngd.integers(0, 256, (128, 448, 448, 3),
                               dtype=np.uint8)
        float(up(jnp.asarray(canvas)))
        t0 = time.perf_counter()
        for i in range(4):
            canvas[0, 0, 0, 0] = i
            float(up(jnp.asarray(canvas)))
        updt = (time.perf_counter() - t0) / 4
        mbs = canvas.nbytes / 1e6 / updt
        print(f"host->device transport: {mbs:.0f} MB/s measured "
              f"(u8 canvas upload; tunneled deployment)",
              file=sys.stderr)

        base = tiny_yolo_voc()
        tspec = dataclasses.replace(
            base, net=dataclasses.replace(base.net, batch=128,
                                          subdivisions=1))
        nparams = init_params(tspec, seed=0)    # host copy: the jitted
        tf = train_flops(tspec)                 # step donates its state
        tstep = jax.jit(
            make_train_step(tspec, compute_dtype=jnp.bfloat16,
                            phase_train=True),
            donate_argnums=(0,))
        rngk = jax.random.PRNGKey(0)

        host_rate = None
        for store in (448, 416):
            prefix = make_packed(store, store)
            loader = PackedDetectionLoader(prefix, w=416, h=416,
                                           batch=128, seed=0)
            if host_rate is None:
                # (b) host-only loader rate: mmap gather + param draw
                # + label correction, NO device work — proves the host
                # side sustains more than the synthetic step rate
                loader._host_batch_cpu()              # page-cache warm
                t0 = time.perf_counter()
                for _ in range(10):
                    loader._host_batch_cpu()
                hdt = (time.perf_counter() - t0) / 10
                host_rate = 128 / hdt
                print(f"from-disk loader HOST side (mmap gather + "
                      f"param draw + label correction, {store}px): "
                      f"{host_rate:.0f} img/s "
                      f"({100*host_rate/max(synth_tput or 1, 1):.0f}% "
                      f"of the synthetic train rate)", file=sys.stderr)
            tparams = jax.tree.map(jnp.asarray, nparams)
            state = TrainState(tparams, init_velocity(tparams),
                               jnp.asarray(0))
            for _ in range(3):                       # compile + warm
                x, t = loader.next_batch()
                state, m = tstep(state, x, jnp.asarray(t), rngk)
            float(m["loss"])
            steps = 25
            t0 = time.perf_counter()
            for _ in range(steps):
                x, t = loader.next_batch()
                state, m = tstep(state, x, jnp.asarray(t), rngk)
            float(m["loss"])
            dt = (time.perf_counter() - t0) / steps
            tput = 128 / dt
            ceil = mbs * 1e6 / (store * store * 3)   # img/s at transport
            print(f"training FROM DISK tiny-yolo-416 (packed {store}px "
                  f"u8, device-aug, batch 128, {steps} steps "
                  f"sustained): {tput:.0f} img/s, "
                  f"MFU {100*tput*tf/PEAK:.0f}%, "
                  f"{100*tput/ceil:.0f}% of this deployment's "
                  f"{ceil:.0f} img/s transport roofline "
                  f"({100*tput/max(synth_tput or 1,1):.0f}% of "
                  f"synthetic)", file=sys.stderr)
            loader.pool.shutdown(cancel_futures=True)
    except Exception as e:
        print(f"from-disk training bench skipped: {e}", file=sys.stderr)

    try:
        from sr_object_detection_tpu.models.zoo import yolov2
        # B=128 + SELECTIVE remat: the remat recompute is cheaper than
        # the 4x lane-padding the C=32 stem pays at sub-128 batch
        # (293/327/360 img/s at B=48/64/128-full-remat); saving every
        # activation <= (w/2)^2 by checkpoint_name and recomputing only
        # the 608^2 conv1 output shaves the remaining remat tax:
        # measured 382 (full) -> 398 img/s (selective:2), 38% MFU, and
        # compile drops 115 -> 38 s (same-loss-pinned vs full remat)
        train_bench(lambda: yolov2(width=608, height=608),
                    "yolov2-608", 128, iters=5, remat="selective:2",
                    fast_init=True)
    except Exception as e:
        print(f"yolov2-608 training bench skipped: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "tiny-yolo-voc-416 images/sec/chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
