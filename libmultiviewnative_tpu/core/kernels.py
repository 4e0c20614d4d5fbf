"""Elementwise Richardson-Lucy update kernels (XLA-fused path).

TPU-native equivalents of the reference's serial/OpenMP/CUDA elementwise
kernels (/root/reference/inc/cpu_kernels.h:16-254,
/root/reference/inc/cuda_kernels.cuh:14-112).  Each function is a pure jnp
expression; under jit XLA fuses the whole chain into one HBM pass, which is
the TPU answer to the reference's hand-rolled OpenMP loops.  A Pallas fused
variant lives in ``libmultiviewnative_tpu.ops.pallas.elementwise`` for cases
where we want an explicitly scheduled single-pass kernel.

Numerical semantics are kept bit-faithful to the reference, including the
NaN/Inf clamping order (see final_values below).
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_quotient(view: jnp.ndarray, integral: jnp.ndarray) -> jnp.ndarray:
    """quotient = view * (1 / integral).

    Parity: ``ser::compute_quotient`` /root/reference/inc/cpu_kernels.h:20-26
    (reciprocal-then-multiply, matching the reference's operation order).
    Division by zero yields inf here exactly as in the reference; the
    downstream clamp in final_values absorbs it.
    """
    return view * (1.0 / integral)


def final_values(
    psi: jnp.ndarray,
    integral: jnp.ndarray,
    weights: jnp.ndarray,
    min_value: float,
) -> jnp.ndarray:
    """Plain multiplicative RL update with clamping and weighted blending.

    Parity: ``ser::final_values`` /root/reference/inc/cpu_kernels.h:29-54:
        value = psi * integral
        if !(value > 0): value = minValue          # catches NaN and <= 0
        if isnan(value) or isinf(value): next = minValue
        else: next = max(value, minValue)
        psi' = weight * (next - psi) + psi
    """
    value = psi * integral
    # !(value > 0) is False for NaN -> NaN maps to min_value here already,
    # matching the C semantics of `!(value > 0.f)`.
    value = jnp.where(value > 0.0, value, min_value)
    nxt = jnp.where(
        jnp.isnan(value) | jnp.isinf(value),
        min_value,
        jnp.maximum(value, min_value),
    )
    return weights * (nxt - psi) + psi


def regularized_final_values(
    psi: jnp.ndarray,
    integral: jnp.ndarray,
    weights: jnp.ndarray,
    lam: float,
    min_value: float,
) -> jnp.ndarray:
    """Tikhonov-regularized RL update.

    Parity: ``ser::regularized_final_values``
    /root/reference/inc/cpu_kernels.h:59-90:
        value = psi * integral
        if value > 0: value = (sqrt(1 + 2*lambda*value) - 1) / lambda
        else:         value = minValue
        (then same NaN/Inf clamp and weighted blend as final_values)

    The reference evaluates ``sqrt(1. + 2. * _lambda * value)`` in double
    (C promotion) then narrows; here the transform runs in float32 — the
    f32 sqrt of the f32-rounded operand stays within the acceptance
    tolerances and keeps the TPU on the fast path.
    """
    value = psi * integral
    lam_inv = jnp.float32(1.0) / jnp.float32(lam)
    tik = lam_inv * (jnp.sqrt(1.0 + 2.0 * jnp.float32(lam) * value) - 1.0)
    value = jnp.where(value > 0.0, tik, min_value)
    nxt = jnp.where(
        jnp.isnan(value) | jnp.isinf(value),
        min_value,
        jnp.maximum(value, min_value),
    )
    return weights * (nxt - psi) + psi


def rl_update(
    psi: jnp.ndarray,
    integral: jnp.ndarray,
    weights: jnp.ndarray,
    lam: float,
    min_value: float,
) -> jnp.ndarray:
    """Dispatch between plain and Tikhonov updates on the *static* lambda.

    Parity: the branch at /root/reference/src/multiviewnative.cpp:216-227.
    ``lam`` is a Python float resolved at trace time, so each variant
    compiles to a branch-free XLA program.
    """
    if lam > 0.0:
        return regularized_final_values(psi, integral, weights, lam, min_value)
    return final_values(psi, integral, weights, min_value)
