"""Shared bench plumbing: timing, dims parsing, row emission.

Replaces the reference bench scaffolding: ``split<'x'>`` dims parsing
(/root/reference/bench/synthetic_data.hpp:11-35), the program_options flags
(e.g. bench/bench_gpu_deconvolve_synthetic.cu:76-101), and the logging row
(bench/logging.hpp:9-60 — schema kept verbatim so the reference's sweep
tooling can parse our output).
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Callable, Sequence, Tuple

import numpy as np


def parse_dims(text: str) -> Tuple[int, int, int]:
    """'64x64x64' → (z, y, x) (reference split<'x'>, synthetic_data.hpp:11-35)."""
    parts = [int(t) for t in text.lower().split("x")]
    if len(parts) == 1:
        parts = parts * 3
    if len(parts) != 3:
        raise argparse.ArgumentTypeError(f"bad dims {text!r}; want ZxYxX")
    return tuple(parts)  # type: ignore[return-value]


def base_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("-s", "--stack_dims", type=parse_dims, default=(64, 64, 64),
                   help="volume dims ZxYxX (default 64x64x64)")
    p.add_argument("-r", "--repeats", type=int, default=10)
    p.add_argument("-w", "--warmup", type=int, default=1,
                   help="untimed warmup runs (compile)")
    p.add_argument("-c", "--comment", default="")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu)")
    return p


def setup_platform(platform):
    import os

    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    # persistent compilation cache (plan-store analog): reruns start hot
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return jax


def _fetch(out) -> None:
    """Force completion with a HOST FETCH.  block_until_ready alone is not
    trustworthy on tunneled/remote device platforms (observed acking before
    execution finished on this image's TPU tunnel); summing the first leaf
    on device and pulling the scalar is."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        float(jnp.sum(leaves[0]))


def time_fn(fn: Callable[[], object], repeats: int, warmup: int = 1) -> float:
    """Total wall ms for `repeats` executions (post-warmup), like the
    reference's boost timer loops around the hot section."""
    for _ in range(max(warmup, 0)):
        _fetch(fn())
    t0 = time.perf_counter()
    for _ in range(repeats):
        _fetch(fn())
    return 1e3 * (time.perf_counter() - t0)


def time_fn_net(fn: Callable[[], object], repeats: int, warmup: int = 1) -> float:
    """Per-execution ms with the per-call dispatch/fetch overhead amortized:
    all `repeats` executions are DISPATCHED asynchronously and only the last
    result is fetched.  A single PJRT device executes launches in dispatch
    order, so completion of the last implies completion of all — one RPC
    round trip total instead of one per call."""
    for _ in range(max(warmup, 1)):
        _fetch(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(repeats):
        out = fn()
    _fetch(out)
    return 1e3 * (time.perf_counter() - t0) / repeats


def emit_row(repeats: int, total_ms: float, dims: Sequence[int], comment: str) -> None:
    """Print one bench/logging.hpp-format row.  dims logged (x, y, z) as the
    reference does."""
    from libmultiviewnative_tpu.utils.logging import current_device_row

    z, y, x = dims
    print(current_device_row(repeats, total_ms, (x, y, z), comment).line())
    sys.stdout.flush()
