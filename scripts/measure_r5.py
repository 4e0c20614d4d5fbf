#!/usr/bin/env python
"""Round-5 hardware measurement: split-x vs fold at the 512^3 north star.

Parts (select with --parts):
  A. 512^3 4-view RL step-level slope A/B: default (hermitian-fold x,
     the round-4 winner) vs LMVN_FUSED_SPLITX=1 (hermitian DIF-split x,
     ~1.6x fewer x-stage MXU FLOPs).  Slope via the (3, 9)-iteration
     two-point fit (per-call constants cancel), same methodology as
     measure_r4.
  B. 256-class sanity slope under splitx-ineligible shapes (default must
     be unchanged — the gate keeps X<512 on its existing mode).
  C. standalone 512-class convolve A/B (fused_convolve_transposed), for
     per-op attribution if the RL-step delta disagrees with the FLOP
     model.

Serialize with any other TPU process (CLAUDE.md quirks).  Run:
  python -u scripts/measure_r5.py 2>&1 | tee -a docs/measure_r5.out
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("LMVN_MATMUL_PRECISION", "high")  # bench opt-in

import numpy as np


def log(msg):
    print(f"[measure_r5] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="A")
    ap.add_argument("--modes", default="fold,splitx")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # relay-death guard: probe with a tiny matmul before long compiles
    import jax.numpy as jnp

    t0 = time.time()
    x = jnp.ones((256, 256))
    assert float(jnp.sum(x @ x)) > 0
    log(f"probe ok ({time.time()-t0:.1f}s), device={jax.devices()[0].platform}")

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import make_fused_plan
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    V = 4
    rng = np.random.default_rng(0)
    k1 = np.stack(
        [gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(V)]
    )

    def timed(fn, passes=3):
        float(jnp.sum(fn()))  # warmup/compile
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        return best

    def set_mode(mode):
        if mode == "fold":
            os.environ.pop("LMVN_FUSED_SPLITX", None)
            os.environ.pop("LMVN_FUSED_FOLDX", None)  # auto: fold at 512
        elif mode == "splitx":
            os.environ["LMVN_FUSED_SPLITX"] = "1"
            os.environ.pop("LMVN_FUSED_FOLDX", None)
        elif mode == "dense":
            os.environ.pop("LMVN_FUSED_SPLITX", None)
            os.environ["LMVN_FUSED_FOLDX"] = "0"
        else:
            raise ValueError(mode)
        make_fused_plan.cache_clear()

    def step_slope(shape, mode, n1=3, n2=9):
        set_mode(mode)
        data = MultiViewData(
            views=jnp.asarray(
                rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)
            ),
            kernel1=jnp.asarray(k1),
            kernel2=jnp.asarray(k1),
            weights=jnp.full((V,), 1.0 / V, jnp.float32),
        )
        psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

        def run(n):
            return deconvolve_jit(
                psi0 + 0.0, data, num_iterations=n, lam=0.006,
                min_value=1e-4, algorithm="fused", adjoint_kernel2=True,
            )

        t1 = timed(functools.partial(run, n1))
        t2 = timed(functools.partial(run, n2))
        return (n2 - n1) / (t2 - t1), t1, t2

    modes = args.modes.split(",")

    if "A" in args.parts:
        shape = (512, 512, 512)
        for mode in modes:
            log(f"A: compiling/timing 512^3 mode={mode} ...")
            s, t1, t2 = step_slope(shape, mode)
            log(
                f"A: 512^3 4-view mode={mode}: slope {s:.2f} it/s "
                f"(t3={t1:.2f}s t9={t2:.2f}s; r4 fold slope 12.12, "
                f"verdict target >= 14, post-fold MXU floor ~22.7)"
            )

    if "B" in args.parts:
        shape = (256, 256, 256)
        for mode in ("fold", "splitx"):
            s, t1, t2 = step_slope(shape, mode, n1=5, n2=15)
            log(
                f"B: 256^3 4-view mode={mode}: slope {s:.2f} it/s "
                f"(identical expected — gate keeps X=256 on dense)"
            )

    if "C" in args.parts:
        from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
            fused_convolve_transposed,
            kernel_spectrum_fused,
        )

        shape = (512, 512, 512)
        xt = jnp.asarray(
            rng.normal(size=shape).astype(np.float32) + 3.0
        )
        k = gaussian_kernel((21,) * 3, 2.0)
        for mode in modes:
            set_mode(mode)
            kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape)
            fold = mode == "fold"

            def run():
                return fused_convolve_transposed(
                    xt, kre, kim, precision="bf16_3x", fold_x=fold
                )

            t = timed(run)
            log(f"C: 512^3 standalone convolve mode={mode}: {t*1e3:.2f} ms")


if __name__ == "__main__":
    main()
