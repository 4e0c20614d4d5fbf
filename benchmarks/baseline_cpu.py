#!/usr/bin/env python
"""Measure the CPU reference-algorithm baseline and write BENCH_baseline.json.

The reference library (FFTW/cuFFT C++) cannot be built in this image (no
FFTW/boost), so the measured stand-in for its CPU path is the SAME RL
algorithm in float32 with scipy's pocketfft using all cores — the moral
equivalent of the reference's fftw-threads path
(/root/reference/inc/fft_utils.h:155-205; workload defaults from
bench/bench_cpu_deconvolve_synthetic.cpp:55-71 scaled to the BASELINE.json
headline config: 4 views, 256^3, kernels 21^3/25^3, 10 RL iterations).

bench.py reports vs_baseline against this number.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import scipy.fft

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libmultiviewnative_tpu.reference.numpy_ref import np_wrap_kernel
from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel


def rl_cpu_f32(psi, views, k1_hats, k2_hats, weights, iters, lam, minv, workers):
    """Reference-algorithm RL in f32 with threaded pocketfft."""
    fft = lambda a: scipy.fft.rfftn(a, axes=(0, 1, 2), workers=workers)
    ifft = lambda a, s: scipy.fft.irfftn(a, s=s, axes=(0, 1, 2), workers=workers)
    shape = psi.shape
    for _ in range(iters):
        for v in range(len(views)):
            integral = ifft(fft(psi) * k1_hats[v], shape).astype(np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                integral = views[v] / integral
            integral = ifft(fft(integral) * k2_hats[v], shape).astype(np.float32)
            value = psi * integral
            if lam > 0:
                with np.errstate(invalid="ignore"):
                    value = np.where(
                        value > 0,
                        (np.sqrt(1.0 + 2.0 * lam * value) - 1.0) / lam,
                        minv,
                    ).astype(np.float32)
            else:
                value = np.where(value > 0, value, minv).astype(np.float32)
            nxt = np.where(
                np.isnan(value) | np.isinf(value), minv, np.maximum(value, minv)
            )
            psi = (weights[v] * (nxt - psi) + psi).astype(np.float32)
    return psi


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--size", type=int, default=256)
    p.add_argument("-v", "--views", type=int, default=4)
    p.add_argument("-i", "--iterations", type=int, default=10)
    p.add_argument("--workers", type=int, default=os.cpu_count())
    p.add_argument("-o", "--output", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_baseline.json"))
    args = p.parse_args()

    shape = (args.size,) * 3
    rng = np.random.default_rng(0)
    views = [
        rng.gamma(2.0, 20.0, shape).astype(np.float32) for _ in range(args.views)
    ]
    weights = [np.full(shape, 1.0 / args.views, np.float32)] * args.views
    k1 = [gaussian_kernel((21,) * 3, 2.0 + 0.5 * v) for v in range(args.views)]
    k2 = [np.flip(k).copy() for k in k1]
    k1h = [
        scipy.fft.rfftn(
            np_wrap_kernel(k, shape).astype(np.float32), workers=args.workers
        )
        for k in k1
    ]
    k2h = [
        scipy.fft.rfftn(
            np_wrap_kernel(k, shape).astype(np.float32), workers=args.workers
        )
        for k in k2
    ]
    psi0 = np.full(shape, float(np.mean(views)), np.float32)

    # warm (allocations, thread pools) with one iteration
    rl_cpu_f32(psi0.copy(), views, k1h, k2h, weights, 1, 0.006, 1e-4, args.workers)
    t0 = time.perf_counter()
    rl_cpu_f32(
        psi0.copy(), views, k1h, k2h, weights, args.iterations, 0.006, 1e-4,
        args.workers,
    )
    dt = time.perf_counter() - t0
    iters_per_sec = args.iterations / dt

    record = {
        "metric": f"rl_deconv_iters_per_sec_{args.views}view_{args.size}cubed",
        "value": round(iters_per_sec, 4),
        "unit": "iterations/s",
        "impl": f"cpu_scipy_pocketfft_f32_workers{args.workers}",
        "note": "measured stand-in for the reference FFTW-threads CPU path "
                "(reference library unbuildable here: no FFTW/boost)",
    }
    # merge into the existing file: top-level stays the headline (256^3)
    # record for backward compatibility; every measured config also lands
    # in "records" keyed by metric (bench.py looks metrics up there)
    existing = {}
    if os.path.exists(args.output):
        try:
            existing = json.load(open(args.output))
        except Exception:
            existing = {}
    records = existing.get("records", {})
    if existing.get("metric") and existing["metric"] not in records:
        records[existing["metric"]] = {
            k: existing[k] for k in ("value", "unit", "impl", "note")
            if k in existing
        }
    records[record["metric"]] = {
        k: record[k] for k in ("value", "unit", "impl", "note")
    }
    merged = dict(existing) if existing.get("metric") else dict(record)
    if record["metric"] == merged.get("metric") or not merged.get("metric"):
        merged.update(record)
    merged["records"] = records
    with open(args.output, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
