#!/usr/bin/env python
"""Round-3 measurement ladder, part D (run on the real TPU).

Two questions:

  1. Twiddle folding (LMVN_FUSED_TWFOLD) A/B — full RL-step it/s at
     256^3 and 512^3 (the decision number; runs first).
  2. PER-PASS truth, incl. at 512^3 (never measured; the 256^3 table is
     in docs/PERFORMANCE.md) — Python-UNROLLED pass chains (NOT
     scan/fori_loop: a long loop over a 512^3 pallas pass is the known
     relay-killer, CLAUDE.md), two-point fit between two chain lengths
     so the tunneled host fetch and dispatch overhead cancel.

Usage: python -u scripts/measure_r3d.py [--skip-512] [--skip-passes]
       [--skip-steps] [--twfold-only 0|1]
Appends rows to docs/measure_r3.out.  Serialize with other TPU users.
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-512", action="store_true")
    ap.add_argument("--skip-passes", action="store_true")
    ap.add_argument("--skip-steps", action="store_true")
    ap.add_argument("--twfold-only", default=None, choices=("0", "1"))
    ap.add_argument(
        "--cmul", default=None, choices=("karatsuba", "schoolbook", "stacked"),
        help="set LMVN_FUSED_CMUL for every measurement (rows are labeled)",
    )
    args = ap.parse_args()

    os.environ.setdefault("LMVN_MATMUL_PRECISION", "high")
    cmul_tag = ""
    if args.cmul:
        os.environ["LMVN_FUSED_CMUL"] = args.cmul
        cmul_tag = f" cmul={args.cmul}"

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
    log(f"# measure_r3d on {dev.platform} ({getattr(dev, 'device_kind', '?')}) "
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
    twfolds = (args.twfold_only,) if args.twfold_only else ("0", "1")

    def set_twfold(v: str):
        os.environ["LMVN_FUSED_TWFOLD"] = v
        jax.clear_caches()
        fd._make_fused_plan.cache_clear()

    # ---- 1. full-step twfold A/B (methodology of measure_r3b)
    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import (
        MultiViewData, pad_kernel_to,
    )

    V = 4
    rng = np.random.default_rng(0)
    k1 = np.stack([gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(V)])
    k2 = np.stack([
        pad_kernel_to(np.flip(gaussian_kernel((21,) * 3, 2.0 + 0.5 * v)).copy(),
                      (25,) * 3)
        for v in range(V)
    ])

    def step_rate(shape, scalar_w, n_iters):
        data = MultiViewData(
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
        psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

        def run(n):
            return deconvolve_jit(
                psi0 + 0.0, data, num_iterations=n, lam=0.006,
                min_value=1e-4, algorithm="fused",
            )

        t1 = timed(functools.partial(run, n_iters))
        t2 = timed(functools.partial(run, n_iters * 3))
        return (n_iters * 3 - n_iters) / (t2 - t1)

    if not args.skip_steps:
        for tf in twfolds:
            set_twfold(tf)
            r = step_rate((256, 256, 256), False, 5)
            log(f"256^3 4-view twfold={tf}{cmul_tag}: {r:.2f} it/s  "
                f"(unfolded baseline this tree: 93.8-94.1)")
        if not args.skip_512:
            for tf in twfolds:
                set_twfold(tf)
                r = step_rate((512, 512, 512), True, 3)
                log(f"512^3 4-view twfold={tf}{cmul_tag}: {r:.2f} it/s  "
                    f"(baseline this tree: 9.00-9.02; verdict #2 target 12)")

    if args.skip_passes:
        return

    # ---- 2. per-pass truth via unrolled chains, two-point fit
    def pass_times(shape, n1=2, n2=6):
        Z, Y, X = shape
        rng2 = np.random.default_rng(1)
        xt = jnp.asarray(rng2.gamma(2.0, 20.0, (Z, X, Y)).astype(np.float32))
        k = gaussian_kernel((21,) * 3, 2.0)
        kr, ki = fd.kernel_spectrum_fused(jnp.asarray(k), shape, precision=prec)
        u0 = jax.jit(
            lambda a: fd.fused_forward_transposed(a, precision=prec)
        )(xt)

        def chain_b(u, n):
            plan = fd.make_fused_plan((Z, Y, X))
            for _ in range(n):
                u = fd._run_pass_b(u[0], u[1], kr, ki, plan, False, prec)
            return u

        def chain_ca(u, n):
            plan = fd.make_fused_plan((Z, Y, X))
            B = fd._slab(Z, X, Y)
            for _ in range(n):
                x = fd._run_pass_c(u[0], u[1], plan, B, False, prec)
                u = fd._run_pass_a(x, plan, B, False, prec)
            return u

        def chain_cqa(u, n):
            plan = fd.make_fused_plan((Z, Y, X))
            B = fd._slab(Z, X, Y)
            for _ in range(n):
                u = fd._run_pass_cqa(u[0], u[1], xt, plan, B, False, prec)
            return u

        def chain_cua(u, psi, n):
            plan = fd.make_fused_plan((Z, Y, X))
            B = fd._slab(Z, X, Y)
            for _ in range(n):
                psi, ure, uim = fd._run_pass_cua(
                    u[0], u[1], psi, jnp.float32(0.25), plan, B, 0.006,
                    1e-4, False, prec,
                )
                u = (ure, uim)
            return psi, u

        rows = []
        for name, chain in (
            ("B", chain_b), ("C+A", chain_ca), ("CQA", chain_cqa),
        ):
            # build each jitted callable ONCE (a fresh jax.jit wrapper per
            # timed call would retrace/recompile inside the timing)
            f1 = jax.jit(functools.partial(chain, n=n1))
            f2 = jax.jit(functools.partial(chain, n=n2))
            t1 = timed(lambda: f1(u0))
            t2 = timed(lambda: f2(u0))
            rows.append(f"{name}={(t2 - t1) / (n2 - n1) * 1e3:.3f}")
        g1 = jax.jit(functools.partial(chain_cua, n=n1))
        g2 = jax.jit(functools.partial(chain_cua, n=n2))
        t1 = timed(lambda: g1(u0, xt))
        t2 = timed(lambda: g2(u0, xt))
        rows.append(f"CUA={(t2 - t1) / (n2 - n1) * 1e3:.3f}")
        return rows

    for shape in [(256, 256, 256)] + ([] if args.skip_512 else [(512, 512, 512)]):
        for tf in twfolds:
            set_twfold(tf)
            rows = pass_times(shape)
            log(f"per-pass ms, {shape[0]}^3 twfold={tf}{cmul_tag}: " + " ".join(rows))


if __name__ == "__main__":
    main()
