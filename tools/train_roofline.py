#!/usr/bin/env python
"""Whole-step training roofline: the arithmetic that bounds training
MFU at the production dataflow (VERDICT r4 item 1).

The per-op floor audits (PARITY.md, rounds 3-4) established that each
op in the training step sits at its own traffic floor; this tool
assembles those floors into a STEP-TIME lower bound and a
max-achievable-MFU number:

    T_bound = sum over ops of  max(bytes_op / BW, flops_op / MXU_peak)

where the op list is the production dataflow (pair-1 phase-split
kernel on the leading conv+pool pair when phase_train=True, XLA chain
elsewhere), bytes_op is the MINIMAL HBM traffic of that op assuming
perfect fusion (every tensor read/written at most once per op), and BW
is the scenario bandwidth. No schedule of this dataflow can run faster
than T_bound at the scenario's bandwidth/MXU rates, because TPU ops
serialize and each op must at least move its bytes and do its MACs.

Three scenarios are printed:
  * spec      : HBM 819 GB/s (v5e datasheet), MXU 100% peak — the
                hardware's own bound; unreachable but unarguable.
  * attained  : the best bandwidth any real fused op measured on this
                chip (~500 GB/s fused-pass, PARITY round-3 audit) and
                the best conv efficiency the 13x13 trunk measured
                (79% of bf16 peak in training) — what this XLA/chip
                combination demonstrably sustains.
  * balanced  : attained BW, 100% MXU — isolates the traffic bound.

Dataflow model per conv(+BN+leaky)(+pool) block, training, activations
bf16 (sizes: Sx = input bytes, S = conv-out bytes, P = pool-out):
  fwd : conv read Sx write S (BN stats fused into the epilogue — the
        measured-optimal form, PARITY "BN formulations") ->
        normalize+bias+leaky read S write S -> pool read S write P
  bwd : pool-route read dP + read y + write dY (select_and_scatter) ->
        leaky'+BN-backward read dY + read y + write dZ ->
        dgrad read dZ write dX (skipped on layer 1: images need no
        gradient) -> wgrad read X + read dZ
Phase-mode leading pair (kernels/phase_train.py, 3 passes):
  stats read X -> fwd+first-max read X write P -> one-pass backward
  read X + read dP (factored weight gradient: dW assembles from
  sum(x@dz), sum(x@y), sum(x) — dY never materializes)
Plus: input f32->bf16 cast, region loss (4 passes over the head), and
the SGD update (params+velocity read/write + f32 grads).

Usage:
  python tools/train_roofline.py                  # tiny-yolo-416 B=128
  python tools/train_roofline.py --model yolov2-608
  python tools/train_roofline.py --measure        # + real step timing
  python tools/train_roofline.py --profile        # + per-op xplane top

Reference semantics being bounded: the training loop of
src_yolo2/network_kernels.cu:117 (forward/backward/update) with
convolutional_layer.c:476-512 and batchnorm_layer.c:74-157 math.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PEAK = 197e12          # v5e bf16 MXU peak
SPEC_BW = 819e9        # v5e HBM datasheet bandwidth
ATT_BW = 500e9         # best measured fused-pass bandwidth (PARITY r3)
ATT_EFF = 0.79         # best measured training conv MXU efficiency


def block_ops(name, Sx, S, P, F, *, first=False, pooled=True,
              bn=True):
    """Op list (name, bytes, flops) for one XLA-chain conv block."""
    ops = [(f"{name}.conv_fwd", Sx + S, F)]
    if bn:
        ops.append((f"{name}.bn_leaky_fwd", 2 * S, 0))
    if pooled:
        ops.append((f"{name}.pool_fwd", S + P, 0))
        ops.append((f"{name}.pool_bwd", P + 2 * S, 0))
    if bn:
        ops.append((f"{name}.bn_leaky_bwd", 3 * S, 0))
    if not first:
        ops.append((f"{name}.conv_dgrad", S + Sx, F))
    ops.append((f"{name}.conv_wgrad", Sx + S, F))
    return ops


def phase_pair_ops(name, Sx, P, F):
    """Pair-1 phase-split training kernel: 3 passes, dY never
    materializes (kernels/phase_train.py)."""
    return [(f"{name}.phase_stats", Sx, 0),
            (f"{name}.phase_fwd_pool", Sx + P, F),
            (f"{name}.phase_bwd", Sx + P, 2 * F)]


def model_ops(spec, batch, *, phase_pairs=0, dsize=2, in_dsize=4):
    """Walk the NetworkSpec and emit the training-step op list.
    in_dsize=2 models the bf16 aug-output dataflow (r5 production
    default: the cast happens at aug write, so the step only reads
    the bf16 batch)."""
    from sr_object_detection_tpu.graph import spec as S

    ops = []
    layers = list(spec.layers)
    # input cast/read (f32->bf16, or a pure bf16 read at in_dsize=2)
    in_el = batch * spec.net.h * spec.net.w * spec.net.c
    ops.append(("input_cast", in_el * (in_dsize + dsize), 0))

    params_el = 0
    i = 0
    conv_i = 0
    while i < len(layers):
        l = layers[i]
        if isinstance(l, S.ConvSpec):
            conv_i += 1
            Sx = batch * l.h * l.w * l.c * dsize
            Sz = batch * l.out_h * l.out_w * l.out_c * dsize
            F = (2 * l.size * l.size * l.c * l.out_c
                 * l.out_h * l.out_w * batch)
            params_el += l.size * l.size * l.c * l.out_c + 4 * l.out_c
            pool = (layers[i + 1]
                    if i + 1 < len(layers)
                    and isinstance(layers[i + 1], S.MaxPoolSpec)
                    else None)
            if pool is not None:
                P = batch * pool.out_h * pool.out_w * pool.out_c * dsize
                i += 1
            else:
                P = Sz
            name = f"conv{conv_i}({l.c}->{l.out_c}@{l.h})"
            if conv_i <= phase_pairs and pool is not None:
                ops += phase_pair_ops(name, Sx, P, F)
            else:
                ops += block_ops(name, Sx, Sz, P, F,
                                 first=(conv_i == 1),
                                 pooled=pool is not None,
                                 bn=l.batch_normalize)
        elif isinstance(l, (S.RouteSpec, S.ReorgSpec, S.ShortcutSpec)):
            Sz = batch * l.out_h * l.out_w * l.out_c * dsize
            # fwd copy + bwd copy (reorg/route are pure data movement)
            ops.append((f"{l.kind}{l.index}", 4 * Sz, 0))
        elif isinstance(l, S.RegionSpec):
            Sz = batch * l.out_h * l.out_w * l.out_c * 4  # f32 deltas
            ops.append(("region_loss", 4 * Sz, 0))
        i += 1
    # SGD update: read params+velocity+grads (grads f32), write
    # params+velocity
    ops.append(("sgd_update",
                params_el * (4 * dsize + 4), 0))
    return ops


def bound(ops, bw, eff):
    return sum(max(b / bw, f / (eff * PEAK)) for _, b, f in ops)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny",
                    choices=["tiny", "yolov2-608"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--phase-pairs", type=int, default=None,
                    help="leading pairs on the phase kernel "
                    "(default: 1 for tiny, 0 for yolov2-608)")
    ap.add_argument("--measure", action="store_true",
                    help="run the real train step (best-of-3 x 10)")
    ap.add_argument("--profile", action="store_true",
                    help="xplane per-op top-30 of the real step")
    ap.add_argument("--bf16-input", action="store_true",
                    help="model the bf16 aug-output dataflow (the r5 "
                    "production default)")
    args = ap.parse_args()

    from sr_object_detection_tpu.models.zoo import tiny_yolo_voc, yolov2
    from sr_object_detection_tpu.utils.profiler import train_flops
    import dataclasses

    if args.model == "tiny":
        base = tiny_yolo_voc()
        phase = 1 if args.phase_pairs is None else args.phase_pairs
    else:
        base = yolov2(width=608, height=608)
        phase = 0 if args.phase_pairs is None else args.phase_pairs
    spec = dataclasses.replace(
        base, net=dataclasses.replace(base.net, batch=args.batch,
                                      subdivisions=1))
    B = args.batch
    ops = model_ops(spec, B, phase_pairs=phase,
                    in_dsize=2 if args.bf16_input else 4)
    tf = train_flops(spec) * B

    scenarios = [("spec(819GB/s,100%MXU)", SPEC_BW, 1.0),
                 ("balanced(500GB/s,100%MXU)", ATT_BW, 1.0),
                 ("attained(500GB/s,79%MXU)", ATT_BW, ATT_EFF)]

    print(f"== {args.model} B={B}, phase_pairs={phase}: per-op floors"
          f" (ms) ==")
    hdr = f"{'op':<34}{'MB':>8}{'GFLOP':>9}" + "".join(
        f"{n.split('(')[0]:>12}" for n, _, _ in scenarios)
    print(hdr)
    for name, b, f in ops:
        row = f"{name:<34}{b/1e6:>8.0f}{f/1e9:>9.1f}"
        for _, bw, eff in scenarios:
            row += f"{1e3*max(b/bw, f/(eff*PEAK)):>12.2f}"
        print(row)
    print("-" * len(hdr))
    tot_b = sum(b for _, b, _ in ops)
    tot_f = sum(f for _, _, f in ops)
    row = f"{'TOTAL':<34}{tot_b/1e6:>8.0f}{tot_f/1e9:>9.1f}"
    bounds = []
    for _, bw, eff in scenarios:
        t = bound(ops, bw, eff)
        bounds.append(t)
        row += f"{1e3*t:>12.2f}"
    print(row)
    print(f"\ntrain_flops (fwd+2x bwd accounting): {tf/1e12:.2f} "
          f"TFLOP/step; model-op flops {tot_f/1e12:.2f}")
    for (name, bw, eff), t in zip(scenarios, bounds):
        ips = B / t
        print(f"{name:<28}: step >= {1e3*t:6.2f} ms  "
              f"<= {ips:5.0f} img/s  => max MFU "
              f"{100*tf/(t*PEAK):.1f}%")

    if not (args.measure or args.profile):
        return

    import time
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from sr_object_detection_tpu.train.trainer import (
        make_train_step, TrainState)
    from sr_object_detection_tpu.train.sgd import init_velocity
    from sr_object_detection_tpu.io.weights import fast_init_params

    params = jax.tree.map(jnp.asarray, fast_init_params(spec, seed=0))
    state = TrainState(params, init_velocity(params), jnp.asarray(0))
    remat = "selective:2" if args.model == "yolov2-608" else False
    tstep = jax.jit(
        make_train_step(spec, compute_dtype=jnp.bfloat16,
                        phase_train=phase > 0, remat=remat),
        donate_argnums=(0,))
    xt = jnp.asarray(np.random.uniform(
        0, 1, (B, spec.net.h, spec.net.w, 3)).astype(np.float32))
    tt = np.zeros((B, 30, 5), np.float32)
    tt[:, 0] = [0.5, 0.5, 0.3, 0.3, 1]
    tt = jnp.asarray(tt)
    rngk = jax.random.PRNGKey(0)
    state, m = tstep(state, xt, tt, rngk)
    float(m["loss"])

    if args.measure:
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                state, m = tstep(state, xt, tt, rngk)
            float(m["loss"])
            dt = min(dt, (time.perf_counter() - t0) / 10)
        print(f"\nmeasured step: {1e3*dt:.2f} ms = {B/dt:.0f} img/s, "
              f"MFU {100*tf/(dt*PEAK):.1f}%")
        for (name, _, _), t in zip(scenarios, bounds):
            print(f"  vs {name}: {100*t/dt:.0f}% of the bound's speed"
                  f" (slack {1e3*(dt-t):.2f} ms)")

    if args.profile:
        import glob
        import tempfile
        d = tempfile.mkdtemp(prefix="roofline_trace_")
        jax.profiler.start_trace(d)
        for _ in range(2):
            state, m = tstep(state, xt, tt, rngk)
        float(m["loss"])
        jax.profiler.stop_trace()
        pb = glob.glob(d + "/**/*.xplane.pb", recursive=True)
        if not pb:
            print("no xplane captured", file=sys.stderr)
            return
        prof = jax.profiler.ProfileData.from_file(pb[0])
        tot = {}
        for plane in prof.planes:
            if "TPU" not in plane.name:
                continue
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    tot[ev.name] = (tot.get(ev.name, 0)
                                    + ev.duration_ns)
        # trace captured 2 steps
        rows = sorted(tot.items(), key=lambda kv: -kv[1])
        print(f"\n== measured per-op (xplane, 2 steps, ns/2) — "
              f"top 35 of {len(rows)} ==")
        for name, ns in rows[:35]:
            print(f"{ns/2e6:>9.3f} ms  {name[:110]}")
        print(f"device op total: {sum(tot.values())/2e6:.2f} ms/step")


if __name__ == "__main__":
    main()
