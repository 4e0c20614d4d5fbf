#!/usr/bin/env python
"""Round-4 measurement ladder, part F: fold_x attribution at the
CONVOLVE level (the same standalone-convolve methodology that produced
the round-3 fold tombstone at (256,256,512): 4.97 vs 4.72 ms) — now at
the full 512^3 extent and at the 256^3 headline extent, so the part-E
step-level fold A/B (measure_r4.py) can be attributed: if fold wins the
RL step but not the bare convolve, the win is the FLOP-bound regime of
the fused A/C+epilogue passes, as the round-4 FLOP accounting predicts
(docs/PERFORMANCE.md).

Usage: python -u scripts/measure_r4b.py [--skip-512] [--skip-256]
Appends rows to docs/measure_r4.out.  Serialize with other TPU users.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "measure_r4.out")


def log(msg):
    print(msg, flush=True)
    with open(OUT, "a") as f:
        f.write(msg + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-512", action="store_true")
    ap.add_argument("--skip-256", action="store_true")
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
    log(f"# measure_r4b on {dev.platform} ({getattr(dev, 'device_kind', '?')}) "
        f"precision={os.environ['LMVN_MATMUL_PRECISION']} t={time.time():.0f}")
    if dev.platform == "cpu":
        log("# CPU backend — aborting (hardware run required)")
        return

    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    def fetch(x):
        return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))

    def timed(run):
        fetch(run())  # compile/warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fetch(run())
            best = min(best, time.perf_counter() - t0)
        return best

    prec = "bf16_3x"

    def convolve_ms(shape, fold: bool, n1=2, n2=6):
        """Two-point fit of an unrolled convolve chain (NOT scan: a long
        loop over a 512^3 pallas pass is the known relay-killer)."""
        Z, Y, X = shape
        rng = np.random.default_rng(1)
        xt = jnp.asarray(rng.gamma(2.0, 20.0, (Z, X, Y)).astype(np.float32))
        k = gaussian_kernel((21,) * 3, 2.0)
        kr, ki = fd.kernel_spectrum_fused(jnp.asarray(k), shape, precision=prec)

        def chain(a, n):
            for _ in range(n):
                a = fd.fused_convolve_transposed(
                    a, kr, ki, precision=prec, fold_x=fold
                )
            return a

        f1 = jax.jit(functools.partial(chain, n=n1))
        f2 = jax.jit(functools.partial(chain, n=n2))
        t1 = timed(lambda: f1(xt))
        t2 = timed(lambda: f2(xt))
        return (t2 - t1) / (n2 - n1) * 1e3

    for shape, skip in (((256, 256, 256), args.skip_256),
                        ((512, 512, 512), args.skip_512)):
        if skip:
            continue
        for fold in (False, True):
            ms = convolve_ms(shape, fold)
            log(f"{shape[0]}^3 convolve fold_x={int(fold)}: {ms:.2f} ms  "
                f"(r3 anchor at (256,256,512): dense 4.72, fold 4.97)")


if __name__ == "__main__":
    main()
