#!/usr/bin/env python
"""Round-3 measurement ladder, part E: re-check the 512^3 shape-gated
defaults AFTER twiddle folding (the VPU/MXU balance the old A/Bs measured
has shifted): carried vs plain chain, B=8 vs B=16 slabs.

Usage: python -u scripts/measure_r3e.py
Appends rows to docs/measure_r3.out.  Serialize with other TPU users.
"""

import functools
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
    os.environ.setdefault("LMVN_MATMUL_PRECISION", "high")
    os.environ["LMVN_FUSED_TWFOLD"] = "1"

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
    log(f"# measure_r3e on {dev.platform} ({getattr(dev, 'device_kind', '?')}) "
        f"twfold=1 t={time.time():.0f}")
    if dev.platform == "cpu":
        log("# CPU backend — aborting (hardware run required)")
        return

    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd
    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import (
        MultiViewData, pad_kernel_to,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    def fetch(x):
        return float(jnp.sum(x))

    def timed(run):
        fetch(run())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fetch(run())
            best = min(best, time.perf_counter() - t0)
        return best

    V = 4
    rng = np.random.default_rng(0)
    k1 = np.stack([gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(V)])
    k2 = np.stack([
        pad_kernel_to(np.flip(gaussian_kernel((21,) * 3, 2.0 + 0.5 * v)).copy(),
                      (25,) * 3)
        for v in range(V)
    ])
    shape = (512, 512, 512)
    data = MultiViewData(
        views=jnp.asarray(rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)),
        kernel1=jnp.asarray(k1),
        kernel2=jnp.asarray(k2),
        weights=jnp.full((V,), 1.0 / V, jnp.float32),
    )
    psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

    def rate(n_iters=3):
        def run(n):
            return deconvolve_jit(
                psi0 + 0.0, data, num_iterations=n, lam=0.006,
                min_value=1e-4, algorithm="fused",
            )

        t1 = timed(functools.partial(run, n_iters))
        t2 = timed(functools.partial(run, n_iters * 3))
        return (n_iters * 3 - n_iters) / (t2 - t1)

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--configs", default="1:8:0,0:8:0,1:16:0",
        help="comma list of carry:slab:dual triples",
    )
    cfgs = [c.split(":") for c in ap.parse_args().configs.split(",")]

    for carry, slab, dual in cfgs:
        os.environ["LMVN_FUSED_CARRY"] = carry
        os.environ["LMVN_FUSED_SLAB"] = slab
        os.environ["LMVN_FUSED_DUAL"] = dual
        jax.clear_caches()
        fd.make_fused_plan.cache_clear()
        r = rate()
        log(f"512^3 4-view twfold=1 carry={carry} slab={slab} dual={dual}: "
            f"{r:.2f} it/s  (carry=1 slab=8 dual=0 part D: 11.22)")


if __name__ == "__main__":
    main()
