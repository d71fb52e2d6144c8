"""GEMM micro-benchmark — the MXU analog of the reference's embedded
`time_ongpu` GFLOPS timings (src_yolo2/gemm.c:232-341, shapes from
test_gpu_blas:330-338: darknet conv-as-GEMM dimensions m x k x n).

Device time is measured with an in-graph lax.scan repeat (one dispatch,
one scalar readback) so tunnel RTT doesn't pollute the numbers.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# (TA, TB, m, k, n) — test_gpu_blas's live list (gemm.c:330-338)
DARKNET_SHAPES = [
    (0, 0, 64, 75, 12544),
    (0, 0, 64, 576, 12544),
    (0, 0, 256, 2304, 784),
    (1, 1, 2304, 256, 784),
    (0, 0, 512, 4608, 196),
    (1, 1, 4608, 512, 196),
]


def time_gemm(m: int, k: int, n: int, *, dtype=jnp.bfloat16,
              ta: int = 0, tb: int = 0, reps: int = 200) -> dict:
    """GFLOPS for one (m,k)x(k,n) matmul shape (time_ongpu analog)."""
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(
        (k, m) if ta else (m, k)).astype(np.float32), dtype)
    b = jnp.asarray(rng.standard_normal(
        (n, k) if tb else (k, n)).astype(np.float32), dtype)

    @jax.jit
    def rep(a, b):
        def body(carry, _):
            aa = carry.T if ta else carry
            bb = b.T if tb else b
            c = jnp.dot(aa, bb, preferred_element_type=jnp.float32)
            # data-dependent feedback so the scan can't be hoisted
            eps = (jnp.min(jnp.abs(c)) * jnp.float32(1e-30)
                   ).astype(carry.dtype)
            return carry + eps, ()
        out, _ = jax.lax.scan(body, a, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    float(rep(a, b))                    # compile + warm
    t0 = time.perf_counter()
    float(rep(a, b))
    dt = (time.perf_counter() - t0) / reps
    flops = 2.0 * m * k * n
    return {"m": m, "k": k, "n": n, "ta": ta, "tb": tb,
            "sec": dt, "gflops": flops / dt / 1e9}


def run_gemm_bench(shapes=None, *, dtype=jnp.bfloat16, reps: int = 200):
    """Print the GFLOPS table (the `sr-detect gemm` command)."""
    rows = []
    for ta, tb, m, k, n in (shapes or DARKNET_SHAPES):
        r = time_gemm(m, k, n, dtype=dtype, ta=ta, tb=tb, reps=reps)
        rows.append(r)
        print(f"Matrix Multiplication {m}x{k} * {k}x{n}"
              f"{' (TA,TB)' if ta or tb else ''}: "
              f"{r['gflops']:.1f} GFLOP/s ({r['sec']*1e6:.1f} us/op)")
    return rows


__all__ = ["time_gemm", "run_gemm_bench", "DARKNET_SHAPES"]
