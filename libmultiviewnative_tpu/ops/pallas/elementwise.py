"""Pallas TPU kernels for the RL elementwise hot paths.

The reference runs three separate elementwise passes per view step —
compute_quotient, then (after the adjoint convolve) final_values /
regularized_final_values (/root/reference/inc/cpu_kernels.h:16-254,
inc/cuda_kernels.cuh:14-112) — each a full HBM round trip on its own
CUDA/OpenMP launch.  Under XLA most of this fuses already; these kernels
make the single-pass schedule EXPLICIT (one VMEM-resident pipeline per
block, VPU arithmetic) for the cases where profiling shows XLA leaving
bandwidth on the table, and serve as the template for deeper fusions.

Layout: volumes are flattened to (rows, X); the grid walks row-tiles.
Mosaic masks the ragged tail, so arbitrary volume shapes work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE = 256


def _as2d(x: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    shape = x.shape
    rows = 1
    for s in shape[:-1]:
        rows *= s
    return x.reshape(rows, shape[-1]), shape


def _row_grid(rows: int, cols: int):
    tile = min(_ROW_TILE, rows)
    grid = (pl.cdiv(rows, tile),)
    spec = pl.BlockSpec((tile, cols), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return grid, spec


def _rl_update_kernel(psi_ref, integral_ref, w_ref, out_ref, *, lam, min_value):
    """Fused final_values / regularized_final_values
    (inc/cpu_kernels.h:29-90 semantics, one pass)."""
    psi = psi_ref[:]
    value = psi * integral_ref[:]
    if lam > 0.0:
        lam_inv = jnp.float32(1.0) / jnp.float32(lam)
        transformed = lam_inv * (
            jnp.sqrt(1.0 + 2.0 * jnp.float32(lam) * value) - 1.0
        )
    else:
        transformed = value
    value = jnp.where(value > 0.0, transformed, min_value)
    nxt = jnp.where(
        jnp.isnan(value) | jnp.isinf(value),
        min_value,
        jnp.maximum(value, min_value),
    )
    out_ref[:] = w_ref[:] * (nxt - psi) + psi


@functools.partial(
    jax.jit, static_argnames=("lam", "min_value", "interpret")
)
def rl_update_pallas(
    psi: jnp.ndarray,
    integral: jnp.ndarray,
    weights: jnp.ndarray,
    lam: float = 0.0,
    min_value: float = 1e-4,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for core.kernels.rl_update as one Pallas pass."""
    psi2, shape = _as2d(psi)
    integral2, _ = _as2d(integral)
    w2, _ = _as2d(weights)
    rows, cols = psi2.shape
    grid, spec = _row_grid(rows, cols)
    out = pl.pallas_call(
        functools.partial(
            _rl_update_kernel, lam=float(lam), min_value=float(min_value)
        ),
        out_shape=jax.ShapeDtypeStruct((rows, cols), psi2.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(psi2, integral2, w2)
    return out.reshape(shape)


def _quotient_kernel(view_ref, integral_ref, out_ref):
    """out = view / integral (inc/cpu_kernels.h:20-26: reciprocal-multiply)."""
    out_ref[:] = view_ref[:] * (1.0 / integral_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def quotient_pallas(
    view: jnp.ndarray, integral: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    v2, shape = _as2d(view)
    i2, _ = _as2d(integral)
    rows, cols = v2.shape
    grid, spec = _row_grid(rows, cols)
    out = pl.pallas_call(
        _quotient_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), v2.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(v2, i2)
    return out.reshape(shape)


def _spectral_scale_kernel(xr_ref, xi_ref, kr_ref, ki_ref, or_ref, oi_ref):
    """Complex pointwise multiply on split real/imag planes — the
    modulateAndNormalize analog (/root/reference/inc/cuda_kernels.cuh:244-265;
    the 1/N scale lives in irfft here)."""
    xr, xi = xr_ref[:], xi_ref[:]
    kr, ki = kr_ref[:], ki_ref[:]
    or_ref[:] = xr * kr - xi * ki
    oi_ref[:] = xr * ki + xi * kr


@functools.partial(jax.jit, static_argnames=("interpret",))
def spectral_multiply_pallas(
    x_hat: jnp.ndarray, k_hat: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """x_hat * k_hat for complex64 spectra via split-plane VPU math
    (Mosaic has no native complex vregs)."""
    xr, shape = _as2d(jnp.real(x_hat))
    xi, _ = _as2d(jnp.imag(x_hat))
    kr, _ = _as2d(jnp.broadcast_to(jnp.real(k_hat), x_hat.shape))
    ki, _ = _as2d(jnp.broadcast_to(jnp.imag(k_hat), x_hat.shape))
    rows, cols = xr.shape
    grid, spec = _row_grid(rows, cols)
    outs = pl.pallas_call(
        _spectral_scale_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, cols), xr.dtype),
            jax.ShapeDtypeStruct((rows, cols), xr.dtype),
        ),
        grid=grid,
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec),
        interpret=interpret,
    )(xr, xi, kr, ki)
    return jax.lax.complex(outs[0], outs[1]).reshape(shape)
