"""On-device A/B for the tiny-yolo-416 training step (round-5 levers).

Configs:
  A  r4 pair-1 baseline: RG=1 dots, separate stats pass (_FWD2 off)
  B  round-5 default: RG=2 row-pair M-packing + merged fwdstats pass
  C  B + make_multi_step K-step scan dispatch (amortizes the ~3.1 ms
     of per-step device idle the roofline attribution found)

Protocol: best-of-3 x 10 steps (the PARITY A/B standard). Run each
config in its OWN process (module globals pin the kernel variant):
    python tools/train_ab.py A|B|C [K]
"""
import os
import sys
import time
import dataclasses

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    cfg = argv[0] if argv else "B"
    K = int(argv[1]) if len(argv) > 1 else 8

    # lever matrix: A = r4 baseline (RG=1, split stats), B = RG=2 +
    # fwdstats, D = fwdstats + XLA apply, E = RG=2 only, H = fwdstats
    # + Pallas apply (RG=1), C/F/G = K-step scan probes
    from sr_object_detection_tpu.kernels import phase_train as PT
    if cfg in ("A", "E", "F", "G"):
        PT._FWD2 = False
    if cfg in ("B", "D"):
        PT._APPLY = False
    if cfg not in ("N", "Z", "S"):
        PT._APPLY_NHWC = False   # N = I + NHWC-direct pair boundary
    if cfg == "Z":
        PT._BWD_GRAM = True      # Z = N + gram-factored backward
    if cfg in ("A", "D", "F", "G", "H", "I", "J", "N", "Z"):
        _orig = PT.plan_pair

        def plan_pair_rg1(*a, **kw):
            kw["allow_rg2"] = False
            return _orig(*a, **kw)
        PT.plan_pair = plan_pair_rg1
    if cfg == "S":
        # forced geometry sweep: S <ws> — config I kernels with the
        # (RP=4, WS=<ws>) point instead of the heuristic's WS=8
        ws_forced = K
        _orig = PT.plan_pair

        def plan_pair_forced(*a, **kw):
            kw["allow_rg2"] = False
            g = _orig(*a, **kw)
            if g is None or g.H != 416:
                return g
            return g._replace(WS=ws_forced, NCH=g.WP // ws_forced)
        PT.plan_pair = plan_pair_forced

    import jax
    import jax.numpy as jnp
    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc
    from sr_object_detection_tpu.io.weights import fast_init_params
    from sr_object_detection_tpu.train.trainer import (
        make_train_step, make_multi_step, TrainState)
    from sr_object_detection_tpu.train.sgd import init_velocity
    from sr_object_detection_tpu.utils.profiler import train_flops

    spec = tiny_yolo_voc()
    spec = dataclasses.replace(
        spec, net=dataclasses.replace(spec.net, batch=128, subdivisions=1))
    params = jax.tree.map(jnp.asarray, fast_init_params(spec, seed=0))
    state = TrainState(params, init_velocity(params), jnp.asarray(0))

    xt = jnp.asarray(np.random.uniform(
        0, 1, (128, spec.net.h, spec.net.w, 3)).astype(np.float32))
    if cfg in ("I", "S", "N", "Z"):
        # bf16 aug-output input (the production device-aug dataflow
        # casts to bf16 at aug write; step numerics are identical)
        xt = xt.astype(jnp.bfloat16)
    tt = np.zeros((128, 30, 5), np.float32)
    tt[:, 0] = [0.5, 0.5, 0.3, 0.3, 1]
    tt = jnp.asarray(tt)
    rngk = jax.random.PRNGKey(0)
    tf = train_flops(spec)
    PEAK = 197e12

    if cfg == "J":
        # production-shaped multi-step: K DISTINCT stacked bf16
        # batches through make_multi_step (one dispatch, scan slices
        # each batch)
        mstep = jax.jit(make_multi_step(spec, compute_dtype=jnp.bfloat16,
                                        phase_train=True),
                        donate_argnums=(0,))
        xs = jax.jit(lambda k: jax.random.uniform(
            k, (K, 128, spec.net.h, spec.net.w, 3),
            jnp.bfloat16))(jax.random.PRNGKey(1))
        xs.block_until_ready()
        ts = jnp.broadcast_to(tt[None], (K,) + tt.shape)
        state, ms = mstep(state, xs, ts, rngk)
        float(ms["loss"][-1])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(max(1, 10 // K)):
                state, ms = mstep(state, xs, ts, rngk)
            float(ms["loss"][-1])
            dt = min(dt, (time.perf_counter() - t0) / (max(1, 10 // K) * K))
    elif cfg == "G":
        # pure dispatch probe: K steps in one program, SAME device-
        # resident batch (no per-step slice copy) — isolates inter-
        # program idle from the scan's input-gather cost
        import jax.lax as lax
        from sr_object_detection_tpu.train.trainer import make_train_step
        step1 = make_train_step(spec, compute_dtype=jnp.bfloat16,
                                phase_train=True)

        @jax.jit
        def gstep(state, x, t, rng):
            def body(st, _):
                st2, m = step1(st, x, t, rng)
                return st2, m["loss"]
            st, losses = lax.scan(body, state, None, length=K)
            return st, losses
        state, ls = gstep(state, xt, tt, rngk)
        float(ls[-1])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(max(1, 10 // K)):
                state, ls = gstep(state, xt, tt, rngk)
            float(ls[-1])
            dt = min(dt, (time.perf_counter() - t0) / (max(1, 10 // K) * K))
    elif cfg in ("C", "F"):
        mstep = jax.jit(make_multi_step(spec, compute_dtype=jnp.bfloat16,
                                        phase_train=True),
                        donate_argnums=(0,))
        xs = jnp.broadcast_to(xt[None], (K,) + xt.shape)
        ts = jnp.broadcast_to(tt[None], (K,) + tt.shape)
        state, ms = mstep(state, xs, ts, rngk)
        float(ms["loss"][-1])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(max(1, 10 // K)):
                state, ms = mstep(state, xs, ts, rngk)
            float(ms["loss"][-1])
            dt = min(dt, (time.perf_counter() - t0) / (max(1, 10 // K) * K))
    else:
        tstep = jax.jit(make_train_step(spec, compute_dtype=jnp.bfloat16,
                                        phase_train=True),
                        donate_argnums=(0,))
        state, m = tstep(state, xt, tt, rngk)
        float(m["loss"])
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = tstep(state, xt, tt, rngk)
            float(m["loss"])
            dt = min(dt, (time.perf_counter() - t0) / 10)

    tput = 128 / dt
    print(f"config {cfg}{f' K={K}' if cfg == 'C' else ''}: "
          f"{dt*1e3:.2f} ms/step, {tput:.0f} img/s, "
          f"MFU {100*tput*tf/PEAK:.1f}%")

    if "--profile" in sys.argv and cfg not in ("C", "F"):
        import glob
        import tempfile
        d = tempfile.mkdtemp(prefix="ab_trace_")
        jax.profiler.start_trace(d)
        for _ in range(2):
            state, m = tstep(state, xt, tt, rngk)
        float(m["loss"])
        jax.profiler.stop_trace()
        pb = glob.glob(d + "/**/*.xplane.pb", recursive=True)
        prof = jax.profiler.ProfileData.from_file(pb[0])
        tot = {}
        for plane in prof.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    tot[ev.name] = tot.get(ev.name, 0) + ev.duration_ns
        rows = sorted(tot.items(), key=lambda kv: -kv[1])
        print(f"== per-op (xplane, /2 steps) top 30 of {len(rows)} ==")
        for name, ns in rows[:30]:
            print(f"{ns/2e6:>9.3f} ms  {name[:110]}")
        print(f"device op total: {sum(tot.values())/2e6:.2f} ms/step")


if __name__ == "__main__":
    main()
