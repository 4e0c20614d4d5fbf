#!/usr/bin/env python
"""Round-3 measurement ladder, part B (run on the real TPU).

Follows scripts/measure_r3.py (whose session established: carried chain
92.70 it/s at 256^3 vs round-2's 96.3 plain, SLAB=16 negative again,
fold_x crashed on `lax.rev` — fixed since via the butterfly `_rev_rows`).
This part answers the remaining questions:

  1. fold_x on/off standalone convolve at X=512 (the fixed kernel).
  2. 256^3 plain chain (LMVN_FUSED_CARRY=0) at the current tree — the
     fair A/B against the 92.70 carried number.
  3. 512^3 north star, plain vs carried chain.

Usage:  python -u scripts/measure_r3b.py [--skip-512] [--reps N]
Appends rows to docs/measure_r3.out.  Serialize with any other TPU
process (CLAUDE.md quirks).
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
    log(f"# measure_r3b on {dev.platform} ({getattr(dev, 'device_kind', '?')}) "
        f"precision={os.environ['LMVN_MATMUL_PRECISION']} t={time.time():.0f}")
    if dev.platform == "cpu":
        log("# CPU backend — aborting (hardware run required)")
        return

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData, pad_kernel_to
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    def fetch(x):
        return float(jnp.sum(x))

    def best_of(run, reps, passes=2):
        fetch(run())  # compile/warm
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

    # ---- 1. fold_x on/off standalone convolve at X=512 (fixed kernel)
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_transposed,
        kernel_spectrum_fused,
    )

    cshape = (256, 256, 512)  # (Z, Y, X)
    x = jnp.asarray(rng.gamma(2.0, 20.0, cshape).astype(np.float32))
    xt = jnp.transpose(x, (0, 2, 1))
    kr, ki = kernel_spectrum_fused(jnp.asarray(k1[0]), cshape, precision="bf16_3x")
    ref = None
    for fold in (False, True):
        conv = jax.jit(lambda a, f=fold: fused_convolve_transposed(
            a, kr, ki, precision="bf16_3x", fold_x=f))

        def runc():
            return conv(xt)

        out = runc()
        if ref is None:
            ref = out
        else:
            rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
            log(f"fold_x rel err vs dense: {rel:.2e}")
        dt = best_of(runc, max(args.reps * 3, 10))
        log(f"convolve (Z,Y,X)={cshape} fold_x={fold}: {dt * 1e3:.2f} ms")
    del x, xt, kr, ki, ref

    # ---- 2. 256^3 plain chain (carry off) — fair A/B vs carried 92.70
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as f2

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

    for carry in ("0", "1"):
        os.environ["LMVN_FUSED_CARRY"] = carry
        jax.clear_caches()
        f2.make_fused_plan.cache_clear()
        dt = best_of(run256, args.reps)
        log(f"256^3 4-view carry={carry}: {iters / dt:.2f} it/s  "
            f"(carried this tree: 92.70; round-2 plain: 96.3)")
    del data, psi0

    if args.skip_512:
        log("# 512^3 skipped (--skip-512)")
        return

    # ---- 3. 512^3 north star, plain vs carried
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

    for carry in ("0", "1"):
        os.environ["LMVN_FUSED_CARRY"] = carry
        jax.clear_caches()
        f2.make_fused_plan.cache_clear()
        dt = best_of(run512, 1, passes=3)
        log(f"512^3 4-view carry={carry}: {iters2 / dt:.2f} it/s  "
            f"(round-2 plain: 9.14; verdict #2 target 12; floor ~16.4)")


if __name__ == "__main__":
    main()
