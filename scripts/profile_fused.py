#!/usr/bin/env python
"""Capture an xplane trace of the fused 256^3 RL step and print a per-op
device-time table (verdict #5: where do the A/C-class passes stall?).

Usage: python -u scripts/profile_fused.py [--iters 10] [--logdir /tmp/xp]
Run on the real TPU; serialize with other tunnel users (CLAUDE.md).
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--logdir", default="/tmp/xplane_fused")
    ap.add_argument("--carry", default=None, help="set LMVN_FUSED_CARRY")
    args = ap.parse_args()

    os.environ.setdefault("LMVN_MATMUL_PRECISION", "high")
    if args.carry is not None:
        os.environ["LMVN_FUSED_CARRY"] = args.carry

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
    print(f"# profile_fused on {dev.platform}", flush=True)
    if dev.platform == "cpu":
        print("# CPU backend — aborting", flush=True)
        return

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData, pad_kernel_to
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    V = 4
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

    def run():
        return deconvolve_jit(psi0 + 0.0, data, num_iterations=args.iters,
                              lam=0.006, min_value=1e-4, algorithm="fused")

    float(jnp.sum(run()))  # compile/warm

    with jax.profiler.trace(args.logdir):
        float(jnp.sum(run()))

    # ---- parse the xplane dump
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(
        os.path.join(args.logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print("# no xplane dump produced", flush=True)
        return
    pd = ProfileData.from_serialized_xspace(open(paths[-1], "rb").read())
    for plane in pd.planes:
        is_device = "TPU" in plane.name or "/device" in plane.name.lower()
        total = defaultdict(float)
        count = defaultdict(int)
        tmin, tmax = float("inf"), 0.0
        for line in plane.lines:
            for ev in line.events:
                name = ev.name
                dur = ev.duration_ns / 1e6
                total[name] += dur
                count[name] += 1
                if ev.duration_ns > 0:
                    tmin = min(tmin, ev.start_ns)
                    tmax = max(tmax, ev.start_ns + ev.duration_ns)
        if not total:
            continue
        span = (tmax - tmin) / 1e6 if tmax > tmin else 0.0
        print(f"\n== plane: {plane.name}  (span {span:.2f} ms)")
        rows = sorted(total.items(), key=lambda kv: -kv[1])[:25]
        busy = sum(total.values())
        print(f"   sum of event durations: {busy:.2f} ms")
        for name, ms in rows:
            print(f"   {ms:9.3f} ms  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
