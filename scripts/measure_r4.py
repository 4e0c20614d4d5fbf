#!/usr/bin/env python
"""Round-4 measurement ladder (run on the real TPU).

Questions (round-3 verdict #1/#2/#3):

  A. HBM-floor levers A/B — per-iteration SLOPES (rate between two call
     lengths, cancels prep + tunnel dispatch) at 256^3 and 512^3 for
     the knob grid LMVN_FUSED_SPEC_BF16 x LMVN_FUSED_PRESPLIT:
     bf16 spectral intermediates halve the dominant HBM traffic;
     presplit constants remove per-grid-step VPU splits.
  B. accuracy envelope of SPEC_BF16=1 — fused convolve vs the float64
     host oracle at 256^3, and RL 2-iter divergence vs the f32-stored
     chain.
  C. serving-path preview — full-call (bench methodology) prepared vs
     per-call rate at 256^3.
  D. mesh sanity — deconvolve_sharded(algorithm='fused') on a 1x1 mesh
     at 256^3 vs the in-core fused driver (verdict #1 done-criterion:
     no per-shard regression).

Usage: python -u scripts/measure_r4.py [--skip-512] [--parts ABCD]
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
    ap.add_argument("--parts", default="ABCD")
    ap.add_argument("--combos", default=None,
                    help="comma list of spec,pre pairs, e.g. '00,10,01,11'")
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
    log(f"# measure_r4 on {dev.platform} ({getattr(dev, 'device_kind', '?')}) "
        f"precision={os.environ['LMVN_MATMUL_PRECISION']} t={time.time():.0f}")
    if dev.platform == "cpu":
        log("# CPU backend — aborting (hardware run required)")
        return

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import (
        MultiViewData, pad_kernel_to,
    )
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

    def set_knobs(spec: str, pre: str):
        os.environ["LMVN_FUSED_SPEC_BF16"] = spec
        os.environ["LMVN_FUSED_PRESPLIT"] = pre
        # the public drivers fingerprint the knobs into their jit keys;
        # clear anyway for the non-fingerprinted helpers used in part B
        jax.clear_caches()

    V = 4
    rng = np.random.default_rng(0)
    k1 = np.stack([gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(V)])
    k2 = np.stack([
        pad_kernel_to(np.flip(gaussian_kernel((21,) * 3, 2.0 + 0.5 * v)).copy(),
                      (25,) * 3)
        for v in range(V)
    ])

    def make_data(shape, scalar_w):
        return MultiViewData(
            views=jnp.asarray(
                rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)
            ),
            kernel1=jnp.asarray(k1),
            kernel2=jnp.asarray(k2),
            weights=(
                jnp.full((V,), 1.0 / V, jnp.float32)
                if scalar_w
                else jnp.full((V,) + shape, 1.0 / V, jnp.float32)
            ),
        )

    def step_rate(shape, scalar_w, n_iters, adjoint=False):
        data = make_data(shape, scalar_w)
        psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

        def run(n):
            return deconvolve_jit(
                psi0 + 0.0, data, num_iterations=n, lam=0.006,
                min_value=1e-4, algorithm="fused", adjoint_kernel2=adjoint,
            )

        t1 = timed(functools.partial(run, n_iters))
        t2 = timed(functools.partial(run, n_iters * 3))
        return (n_iters * 3 - n_iters) / (t2 - t1)

    combos = (
        [tuple(c) for c in args.combos.split(",")]
        if args.combos
        else [("0", "0"), ("1", "0"), ("0", "1"), ("1", "1")]
    )

    # ---- A. knob grid slopes
    if "A" in args.parts:
        if not args.skip_256:
            for spec, pre in combos:
                set_knobs(spec, pre)
                r = step_rate((256, 256, 256), False, 5)
                log(f"256^3 4-view spec_bf16={spec} presplit={pre}: "
                    f"{r:.2f} it/s  (r3 twfold slope baseline: 132.2)")
        if not args.skip_512:
            for spec, pre in combos:
                set_knobs(spec, pre)
                r = step_rate((512, 512, 512), True, 3)
                log(f"512^3 4-view spec_bf16={spec} presplit={pre}: "
                    f"{r:.2f} it/s  (r3: 11.22; verdict target >= 12, "
                    f"floor ~16.4)")

    # ---- B. SPEC_BF16 accuracy envelope
    if "B" in args.parts:
        from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd
        from libmultiviewnative_tpu.reference.numpy_ref import (
            np_convolve_spectrum, np_wrap_kernel,
        )

        shape = (256, 256, 256)
        x = (np.random.default_rng(3).normal(size=shape) + 3.0).astype(
            np.float32
        )
        k = gaussian_kernel((21,) * 3, 2.0)
        want = np_convolve_spectrum(
            x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
        )
        for spec in ("0", "1"):
            set_knobs(spec, "0")
            kr, ki = fd.kernel_spectrum_fused(jnp.asarray(k), shape)
            got = np.asarray(
                fd.fused_convolve_spectrum(
                    jnp.asarray(x), kr, ki, precision="bf16_3x"
                )
            )
            rel = np.abs(got - want).max() / np.abs(want).max()
            log(f"256^3 convolve rel err vs f64, spec_bf16={spec}: {rel:.2e}"
                f"  (r2 bf16_3x class: ~3e-5)")
        outs = {}
        for spec in ("0", "1"):
            set_knobs(spec, "0")
            data = make_data(shape, False)
            psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)
            outs[spec] = np.asarray(deconvolve_jit(
                psi0 + 0.0, data, num_iterations=2, lam=0.006,
                min_value=1e-4, algorithm="fused",
            ))
        rel = np.abs(outs["1"] - outs["0"]).max() / np.abs(outs["0"]).max()
        log(f"256^3 RL 2-iter spec_bf16 1-vs-0 rel: {rel:.2e}")

    # ---- C. serving-path preview (full-call methodology, like bench.py)
    if "C" in args.parts:
        from libmultiviewnative_tpu.deconv.rl import (
            deconvolve_prepared, prepare_workspace,
        )

        set_knobs(os.environ.get("LMVN_FUSED_SPEC_BF16", "0"),
                  os.environ.get("LMVN_FUSED_PRESPLIT", "0"))
        shape = (256, 256, 256)
        data = make_data(shape, False)
        psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)
        iters = 10

        def run_plain():
            return deconvolve_jit(
                psi0 + 0.0, data, num_iterations=iters, lam=0.006,
                min_value=1e-4, algorithm="auto",
            )

        prepared = prepare_workspace(data, shape, algorithm="auto")

        def run_prep():
            return deconvolve_prepared(
                psi0 + 0.0, data, prepared, num_iterations=iters,
                lam=0.006, min_value=1e-4,
            )

        tp = timed(run_plain)
        tq = timed(run_prep)
        log(f"256^3 full-call 10-iter: plain {iters/tp:.2f} it/s, "
            f"prepared {iters/tq:.2f} it/s  (slope ceiling r3: 132)")

    # ---- E. fold_x in the FULL RL chain (round-4 hypothesis: the
    #      x-stage dense matmuls are ~72% of the A/C-pass MXU FLOPs and
    #      512^3 is FLOP-bound, so the fold's halved x contraction should
    #      pay there even though it measured -5% on a standalone
    #      bandwidth-bound convolve — docs/PERFORMANCE.md fold_x
    #      tombstone).  Carried chain stays at its shape-gated default.
    if "E" in args.parts:
        for fold in ("0", "1"):
            set_knobs("0", "0")
            os.environ["LMVN_FUSED_FOLDX"] = fold
            jax.clear_caches()
            if not args.skip_256:
                r = step_rate((256, 256, 256), False, 5)
                log(f"256^3 4-view foldx={fold}: {r:.2f} it/s  "
                    f"(r4 dense-x row: 118.31)")
            if not args.skip_512:
                r = step_rate((512, 512, 512), True, 3)
                log(f"512^3 4-view foldx={fold}: {r:.2f} it/s  "
                    f"(r4 dense-x row: 11.09; verdict target >= 12)")
        os.environ["LMVN_FUSED_FOLDX"] = "0"
        jax.clear_caches()

    # ---- D. 1x1-mesh fused sanity vs in-core
    if "D" in args.parts:
        from libmultiviewnative_tpu.parallel.sharded import (
            deconvolve_sharded_jit, make_mesh, shard_workspace,
        )

        shape = (256, 256, 256)
        data = make_data(shape, True)
        psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)
        iters = 5
        mesh = make_mesh(view_parallel=1, z_parallel=1,
                         devices=np.asarray(jax.devices()[:1]))
        psi_s, data_s = shard_workspace(data, psi0, mesh)

        def run_sharded():
            return deconvolve_sharded_jit(
                psi_s + 0.0, data_s, num_iterations=iters, mesh=mesh,
                lam=0.006, min_value=1e-4, algorithm="fused",
            )

        def run_incore():
            return deconvolve_jit(
                psi0 + 0.0, data, num_iterations=iters, lam=0.006,
                min_value=1e-4, algorithm="fused",
                view_order="simultaneous",
            )

        ts = timed(run_sharded)
        ti = timed(run_incore)
        log(f"256^3 1x1-mesh fused {iters/ts:.2f} it/s vs in-core "
            f"simultaneous {iters/ti:.2f} it/s (verdict #1: no per-shard "
            f"regression)")


if __name__ == "__main__":
    main()
