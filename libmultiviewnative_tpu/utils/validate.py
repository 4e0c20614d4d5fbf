"""Input validation / NaN-Inf guards.

Parity with the reference's defensive scans: ``contains_nan`` /
``contains_inf`` over workspace inputs (/root/reference/src/multiviewnative.cpp:18-58,
applied at :129-143) and the TIFF loader's NaN audit
(/root/reference/tests/tiff_fixtures.hpp:106-131).  On accelerator arrays
the scan is a jitted reduction (one pass) rather than a host loop.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..deconv.workspace import MultiViewData


@jax.jit
def _finite_report(x: jnp.ndarray):
    return jnp.isnan(x).any(), jnp.isinf(x).any()


def check_finite(x, name: str = "array", raise_on_bad: bool = False) -> List[str]:
    """Return human-readable problems (empty list = clean)."""
    has_nan, has_inf = (bool(v) for v in _finite_report(jnp.asarray(x)))
    problems = []
    if has_nan:
        problems.append(f"{name} contains NaN")
    if has_inf:
        problems.append(f"{name} contains Inf")
    if raise_on_bad and problems:
        raise ValueError("; ".join(problems))
    return problems


def validate_workspace(data: MultiViewData, raise_on_bad: bool = True) -> List[str]:
    """Audit all stacked inputs — the reference runs exactly this scan on
    image/kernel1/kernel2/weights per view before iterating
    (src/multiviewnative.cpp:129-143)."""
    problems = []
    for name in ("views", "kernel1", "kernel2", "weights"):
        problems += check_finite(getattr(data, name), name)
    if raise_on_bad and problems:
        raise ValueError("; ".join(problems))
    return problems
