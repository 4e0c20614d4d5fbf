#!/usr/bin/env python
"""Round-5 follow-up measurements.

Parts:
  C. standalone 512-class convolve ladder (dense / fold / splitx) — the
     per-op attribution behind the RL-step slopes.  RELAY-HOSTILE (do
     not run unattended): 512^3 standalone-convolve chain compiles are
     the known relay-killer class (CLAUDE.md) — a python-unrolled
     2-chain exceeded the remote-compile upload limit, and the lax.scan
     variant broke the relay pipe after a ~25 min compile (round-5
     session).  RL-step programs (part D / measure_r5 part A) remain the
     safe and product-relevant measurement class.
  D. 256^3 splitx-vs-dense RL A/B.  HISTORICAL NOTE: this measurement
     (128.4 vs 119.3 it/s) is what moved the production gate DOWN to
     X >= 256 (commit a0af744) — the baseline arm now pins SPLITX=0 so
     re-runs still compare the two real modes.

Serialize with other TPU processes.  Run:
  python -u scripts/measure_r5b.py --parts CD 2>&1 | tee -a docs/measure_r5.out
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ.setdefault("LMVN_MATMUL_PRECISION", "high")

import numpy as np


def log(msg):
    print(f"[measure_r5b] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="D")
    args = ap.parse_args()

    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    assert float(jnp.sum(x @ x)) > 0
    log(f"probe ok, device={jax.devices()[0].platform}")

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    rng = np.random.default_rng(0)

    def timed(fn, passes=3):
        float(jnp.sum(fn()))
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            out = fn()
            float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        return best

    def set_mode(mode):
        """dense / fold / splitx via the public env knobs."""
        os.environ.pop("LMVN_FUSED_SPLITX", None)
        os.environ.pop("LMVN_FUSED_FOLDX", None)
        if mode == "dense":
            os.environ["LMVN_FUSED_SPLITX"] = "0"
            os.environ["LMVN_FUSED_FOLDX"] = "0"
        elif mode == "fold":
            os.environ["LMVN_FUSED_SPLITX"] = "0"
            os.environ["LMVN_FUSED_FOLDX"] = "1"
        elif mode == "splitx":
            os.environ["LMVN_FUSED_SPLITX"] = "1"
        fd.make_fused_plan.cache_clear()

    if "C" in args.parts:
        # standalone convolve at a 512-class shape: lax.scan chains (ONE
        # serialized body regardless of length — a python-unrolled
        # 2-chain already exceeded the relay's remote-compile upload
        # limit, and the r4 18-pass unrolled chain killed the relay
        # outright); per-convolve slope from the (4, 12)-length
        # two-point fit
        shape = (512, 512, 512)
        xt = jnp.asarray(rng.normal(size=shape).astype(np.float32) + 3.0)
        k = gaussian_kernel((21,) * 3, 2.0)
        from functools import partial as _partial

        for mode in ("dense", "fold", "splitx"):
            set_mode(mode)
            kre, kim = fd.kernel_spectrum_fused(jnp.asarray(k), shape)
            fold = mode == "fold"

            @_partial(jax.jit, static_argnames=("n",))
            def chain(v, n, kre=kre, kim=kim, fold=fold):
                def body(c, _):
                    return (
                        fd.fused_convolve_transposed(
                            c, kre, kim, precision="bf16_3x", fold_x=fold
                        ),
                        None,
                    )

                out, _ = jax.lax.scan(body, v, None, length=n)
                return out

            t4 = timed(lambda: chain(xt, 4))
            t12 = timed(lambda: chain(xt, 12))
            log(
                f"C: 512^3 convolve mode={mode}: "
                f"{(t12-t4)*1e3/8:.2f} ms/convolve (slope)"
            )

    if "D" in args.parts:
        # 256^3 RL slope with splitx force-widened to X=256
        shape = (256, 256, 256)
        V = 4
        k1 = np.stack(
            [gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(V)]
        )
        k2 = np.stack(
            [
                np.flip(gaussian_kernel((21,) * 3, 2.0 + 0.5 * v)).copy()
                for v in range(V)
            ]
        )
        data = MultiViewData(
            views=jnp.asarray(
                rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)
            ),
            kernel1=jnp.asarray(k1),
            kernel2=jnp.asarray(k2),
            weights=jnp.full((V,) + shape, 1.0 / V, jnp.float32),
        )
        psi0 = jnp.full(shape, float(jnp.mean(data.views)), jnp.float32)

        orig_elig = fd._splitx_eligible

        def slope(mode):
            if mode == "splitx-forced":
                fd._splitx_eligible = (
                    lambda x: x % 4 == 0 and (x // 4) % 16 == 0 and x >= 256
                )
                os.environ["LMVN_FUSED_SPLITX"] = "1"
            else:
                # dense-x baseline: pin splitx OFF (since a0af744 the
                # default at 256 IS splitx — 'default' would otherwise
                # measure the same program as the forced arm)
                fd._splitx_eligible = orig_elig
                os.environ["LMVN_FUSED_SPLITX"] = "0"
            fd.make_fused_plan.cache_clear()
            jax.clear_caches()

            def run(n):
                return deconvolve_jit(
                    psi0 + 0.0, data, num_iterations=n, lam=0.006,
                    min_value=1e-4, algorithm="fused",
                )

            t1 = timed(functools.partial(run, 5))
            t2 = timed(functools.partial(run, 15))
            return 10 / (t2 - t1)

        try:
            s_def = slope("dense")
            log(f"D: 256^3 4-view dense-x (SPLITX=0): slope {s_def:.2f} it/s")
            s_sx = slope("splitx-forced")
            log(
                f"D: 256^3 4-view splitx-FORCED: slope {s_sx:.2f} it/s "
                f"(gate boundary check; 256^3 sits at its HBM floor)"
            )
        finally:
            fd._splitx_eligible = orig_elig
            os.environ.pop("LMVN_FUSED_SPLITX", None)
            fd.make_fused_plan.cache_clear()


if __name__ == "__main__":
    main()
