"""Bench tooling tests: row schema, dims parsing, ladder generator.

Parity targets: /root/reference/bench/logging.hpp:9-60 (row format),
bench/synthetic_data.hpp:11-35 (dims split), python/generate_dims.py:4-48
(anisotropic 2^n ladder)."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

from benchmarks.common import parse_dims
from benchmarks.sweep import generate_dims
from libmultiviewnative_tpu.utils.logging import BenchRow


def test_parse_dims():
    assert parse_dims("64x64x64") == (64, 64, 64)
    assert parse_dims("16x32x64") == (16, 32, 64)
    assert parse_dims("128") == (128, 128, 128)
    with pytest.raises(Exception):
        parse_dims("4x5")


def test_bench_row_schema():
    row = BenchRow(
        n_devices=1, dev_type="tpu", dev_name="TPU v5 lite", n_repeats=10,
        total_time_ms=123.456, dims=(64, 32, 16), comment="rl bench",
    ).line()
    fields = row.split()
    # n_devices dev_type dev_name n_repeats total_time_ms x y z width comment
    assert fields[0] == "1"
    assert fields[1] == "tpu"
    assert fields[2] == "TPU_v5_lite"  # spaces escaped
    assert fields[3] == "10"
    assert float(fields[4]) == pytest.approx(123.456)
    assert fields[5:8] == ["64", "32", "16"]
    assert fields[8] == "4"
    assert fields[9] == "rl_bench"


def test_generate_dims_ladder():
    ladder = generate_dims(16, 64)
    assert ladder[0] == (16, 16, 16)
    assert ladder[1] == (32, 16, 16)  # axis 0 grows first
    assert all(max(d) <= 64 for d in ladder)
    # strictly doubling total volume each step
    vols = [d[0] * d[1] * d[2] for d in ladder]
    assert all(b == 2 * a for a, b in zip(vols, vols[1:]))


def test_bench_slope_helper(monkeypatch):
    """bench._slope_config: two-point fit at (n/3, n) — the larger point
    is the shipped config (round-5: a 3n-iteration 512^3 program
    exceeded HBM where the n-iteration config fits); LMVN_BENCH_SLOPE=0
    and degenerate iteration counts return None."""
    import numpy as np

    import bench

    class _FakeJnp:
        @staticmethod
        def sum(x):
            return float(x)

    # linear cost model: t(n) = overhead + n * per_iter
    calls = []

    def run_n(n):
        calls.append(n)
        return 0.0

    # emulate timing by monkeypatching perf_counter around a deterministic
    # schedule: warmup + 2 passes per point
    times = iter(
        # n=3: two passes of (start, end) with dt=0.5+3*0.1
        [0.0, 0.8, 10.0, 10.8]
        # n=10: dt=0.5+10*0.1
        + [20.0, 21.5, 30.0, 31.5]
    )
    monkeypatch.setattr(
        bench.time, "perf_counter", lambda: next(times)
    )
    s = bench._slope_config(run_n, _FakeJnp, 10)
    # slope = (10-3)/(1.5-0.8) = 10 it/s on the synthetic cost model
    assert abs(s - 10.0) < 1e-6, s
    assert calls == [3, 3, 3, 10, 10, 10]  # warmup + 2 passes each

    monkeypatch.setenv("LMVN_BENCH_SLOPE", "0")
    assert bench._slope_config(run_n, _FakeJnp, 10) is None
    monkeypatch.delenv("LMVN_BENCH_SLOPE")
    assert bench._slope_config(run_n, _FakeJnp, 1) is None  # lo >= iters
