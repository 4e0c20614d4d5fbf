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
    lam32 = jnp.asarray(lam, jnp.float32)  # float OR traced scalar
    lam_inv = jnp.float32(1.0) / lam32
    tik = lam_inv * (jnp.sqrt(1.0 + 2.0 * lam32 * value) - 1.0)
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
    lam,
    min_value,
) -> jnp.ndarray:
    """Dispatch between plain and Tikhonov updates on lambda.

    Parity: the branch at /root/reference/src/multiviewnative.cpp:216-227.
    When ``lam`` is a Python float it is resolved at trace time and each
    variant compiles to a branch-free XLA program (the historical
    contract).  When ``lam`` is a TRACED scalar (the fft/dft/direct
    drivers thread it as a runtime operand so a λ sweep reuses one
    compiled program — the reference keeps λ in the runtime workspace
    struct, /root/reference/inc/multiviewnative.h:28-35), both branches
    are computed and selected elementwise: the selected values are
    IDENTICAL to the static-λ program's (``jnp.where`` picks exact branch
    values; the unselected Tikhonov branch runs with a safe λ=1 so no
    NaN/Inf leaks through the select), and the extra VPU work is one
    sqrt-chain fused into an already bandwidth-bound elementwise pass.
    """
    if isinstance(lam, (int, float)):
        if lam > 0.0:
            return regularized_final_values(
                psi, integral, weights, lam, min_value
            )
        return final_values(psi, integral, weights, min_value)
    lam = jnp.asarray(lam, jnp.float32)
    use_tik = lam > 0.0
    safe_lam = jnp.where(use_tik, lam, jnp.float32(1.0))
    reg = regularized_final_values(
        psi, integral, weights, safe_lam, min_value
    )
    plain = final_values(psi, integral, weights, min_value)
    return jnp.where(use_tik, reg, plain)
