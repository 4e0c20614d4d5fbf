#!/usr/bin/env bash
# Host-tagged benchmark sweeps -> .data files.
# Analog of the reference's python/run_*.sh drivers (e.g. run_gpu_benches.sh):
# one row per config in the bench/logging.hpp schema.
set -euo pipefail
cd "$(dirname "$0")/.."

HOST=$(hostname -s)
OUT_DIR=${1:-sweep_results}
LIMIT=${LIMIT:-128}
REPEATS=${REPEATS:-3}
mkdir -p "$OUT_DIR"

for bench in fft convolve deconvolve; do
  out="$OUT_DIR/${HOST}_${bench}.data"
  echo "== sweep $bench -> $out"
  python benchmarks/sweep.py "$bench" --limit "$LIMIT" -r "$REPEATS" -o "$out"
done
echo "done: $(wc -l "$OUT_DIR"/*.data)"
