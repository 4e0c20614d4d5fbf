#!/usr/bin/env python
"""Out-of-core (streamed) deconvolution benchmark.

The rung the reference benchmarks as its interleaved mode
(bench/bench_gpu_deconvolve_synthetic.cu --mode interleaved): the volume
lives in HOST memory and flows through the device in Z-chunks with the
bounded in-flight pipeline (deconv/streamed.py).  Emits the standard
logging row plus iterations/s.

    python benchmarks/bench_streamed.py -s 512x512x512 --views 4 \
        --iterations 2 --chunk-z 64
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.common import base_parser, emit_row, setup_platform


def main():
    p = base_parser("streamed out-of-core RL deconvolve")
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--chunk-z", default="auto",
                   help="int or 'auto' (engine-friendly extended extent)")
    p.add_argument("--algorithm", default="auto",
                   choices=["fft", "dft", "direct", "auto"])
    args = p.parse_args()
    if args.chunk_z != "auto":
        args.chunk_z = int(args.chunk_z)
    setup_platform(args.platform)

    from libmultiviewnative_tpu.deconv.streamed import deconvolve_streamed
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    Z, Y, X = args.stack_dims
    V = args.views
    rng = np.random.default_rng(0)
    views = [
        rng.gamma(2.0, 20.0, (Z, Y, X)).astype(np.float32) for _ in range(V)
    ]
    k1s = [gaussian_kernel((21, 21, 21), 2.0 + 0.5 * v) for v in range(V)]
    k2s = [np.flip(k).copy() for k in k1s]
    ws = [np.full((Z, Y, X), 1.0 / V, np.float32) for _ in range(V)]
    psi0 = np.full((Z, Y, X), float(np.mean(views[0])), np.float32)

    # warmup (compiles every chunk program)
    deconvolve_streamed(
        psi0, views, k1s, k2s, ws, 1, lam=0.006, chunk_z=args.chunk_z,
        algorithm=args.algorithm,
    )
    t0 = time.perf_counter()
    deconvolve_streamed(
        psi0, views, k1s, k2s, ws, args.iterations, lam=0.006,
        chunk_z=args.chunk_z, algorithm=args.algorithm,
    )
    dt = time.perf_counter() - t0
    total_ms = 1e3 * dt
    emit_row(
        args.iterations, total_ms, (Z, Y, X),
        f"streamed_rl_{V}view_chunk{args.chunk_z}_{args.algorithm}",
    )
    print(
        f"streamed: {args.iterations / dt:.3f} iterations/s "
        f"({total_ms / args.iterations:.1f} ms/iter)"
    )


if __name__ == "__main__":
    main()
