#!/usr/bin/env python
"""Round-3 measurement ladder, part C: LMVN_FUSED_CMUL=schoolbook A/B.

Hypothesis (PERFORMANCE.md round-3): Karatsuba's runtime d_re+d_im VPU
pre-add sits on the MXU critical path of the A/C-class passes (~50%
utilization); schoolbook trades +33% complex-product FLOPs for four
independent matmuls the scheduler can stream.  Measures the 256^3
headline and (unless --skip-512) the 512^3 north star, both under the
bench-default bf16_3x.

Usage:  python -u scripts/measure_r3c.py [--skip-512] [--reps N]
Appends to docs/measure_r3.out.  Serialize with other TPU processes.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "measure_r3.out")


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-512", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("LMVN_MATMUL_PRECISION", "high")

    import socket

    relay = os.environ.get("LMVN_RELAY_PROBE", "127.0.0.1:8083")
    host, port = relay.rsplit(":", 1)
    try:
        socket.create_connection((host, int(port)), timeout=10).close()
    except OSError:
        print(f"# TPU relay {relay} unreachable — aborting", flush=True)
        return

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"# measure_r3c (schoolbook cmul A/B) on {dev.platform} "
        f"t={time.time():.0f}")
    if dev.platform == "cpu":
        log("# CPU backend — aborting")
        return

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData, pad_kernel_to
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as f2

    def fetch(x):
        return float(jnp.sum(x))

    def best_of(run, reps, passes=2):
        fetch(run())
        dt = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = run()
            fetch(out)
            dt = min(dt, (time.perf_counter() - t0) / reps)
        return dt

    V, iters = 4, 10
    rng = np.random.default_rng(0)
    k1 = np.stack([gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(V)])
    k2 = np.stack([
        pad_kernel_to(np.flip(gaussian_kernel((21,) * 3, 2.0 + 0.5 * v)).copy(), (25,) * 3)
        for v in range(V)
    ])

    shape = (256, 256, 256)
    data = MultiViewData(
        views=jnp.asarray(rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)),
        kernel1=jnp.asarray(k1),
        kernel2=jnp.asarray(k2),
        weights=jnp.full((V,) + shape, 1.0 / V, jnp.float32),
    )
    psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

    def run256():
        return deconvolve_jit(psi0 + 0.0, data, num_iterations=iters,
                              lam=0.006, min_value=1e-4, algorithm="fused")

    for mode in ("schoolbook", "karatsuba"):
        os.environ["LMVN_FUSED_CMUL"] = mode
        jax.clear_caches()
        f2.make_fused_plan.cache_clear()
        dt = best_of(run256, args.reps)
        log(f"256^3 4-view cmul={mode}: {iters / dt:.2f} it/s  "
            f"(karatsuba this session: 94.1)")
    del data, psi0

    if args.skip_512:
        log("# 512^3 skipped")
        return

    shape = (512, 512, 512)
    iters2 = 5
    data = MultiViewData(
        views=jnp.asarray(rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)),
        kernel1=jnp.asarray(k1),
        kernel2=jnp.asarray(k1),
        weights=jnp.full((V,), 1.0 / V, jnp.float32),
    )
    psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

    def run512():
        return deconvolve_jit(psi0 + 0.0, data, num_iterations=iters2,
                              lam=0.006, min_value=1e-4, algorithm="fused",
                              adjoint_kernel2=True)

    for mode in ("schoolbook", "karatsuba"):
        os.environ["LMVN_FUSED_CMUL"] = mode
        jax.clear_caches()
        f2.make_fused_plan.cache_clear()
        dt = best_of(run512, 1, passes=3)
        log(f"512^3 4-view cmul={mode}: {iters2 / dt:.2f} it/s  "
            f"(karatsuba this session: 9.02 carried)")


if __name__ == "__main__":
    main()
