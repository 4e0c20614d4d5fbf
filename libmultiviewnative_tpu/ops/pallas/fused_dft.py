"""Fused 3-pass Pallas DFT-convolve — the speed-of-light path for the RL
hot loop on shapes <= 256 per axis.

Motivation (measured, docs/PERFORMANCE.md): the einsum DFT engine is
bandwidth-bound on inter-stage HBM traffic — every axis stage materializes
full re/im volumes (~20 stage-arrays ≈ 2.7 GB per 256³ convolve).  This
kernel restructures the circular convolution into THREE grid passes whose
stages live in VMEM:

  pass A  per z-slab:   x-axis rfft  +  y-axis DFT          (read 1, write 2)
  pass B  per (y,k) tile: z-axis DFT + spectral multiply
                          + z-axis inverse                   (read 4, write 2)
  pass C  per z-slab:   y-axis inverse + x-axis irfft
                          (hermitian weights folded)         (read 2, write 1)

i.e. ~0.8 GB of HBM traffic per 256³ convolve instead of ~2.7 GB.  Every
stage is a plain 2D matmul on the MXU (contraction = the axis length).
Twiddle matrices come from the compact DFTPlan (core.dft.make_plan).

Constraints: compact-mode shapes only (max axis <= 256), f32, Z divisible
by the z-slab tile.  Use via deconvolve(algorithm="fused") or directly
:func:`fused_convolve_spectrum`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.dft import DFTPlan, make_plan

_VMEM_BUDGET = 6 * 1024 * 1024  # per-pass working set target (hw scoped: 16M,
# Mosaic double-buffers grid-mapped blocks, so keep tiles well under half)


def _pick_tile(n: int, bytes_per_unit: int, cap: int = 8) -> int:
    """Largest divisor of n, <= cap, whose tile fits the VMEM budget."""
    best = 1
    for t in range(1, cap + 1):
        if n % t == 0 and t * bytes_per_unit <= _VMEM_BUDGET:
            best = t
    return best


def _dot(a, b):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pass_a_kernel(x_ref, fcx_ref, fsx_ref, cy_ref, sy_ref, re_ref, im_ref):
    """x-rfft then y-DFT for one z-slab, as per-plane 2D matmuls (Mosaic
    layout inference rejects cross-sublane reshapes/transposes, so the slab
    loop is a static python range).  x (zt, Y, X) -> re/im (zt, Y, Kx)."""
    zt = x_ref.shape[0]
    fcx, fsx = fcx_ref[:], fsx_ref[:]
    cy, sy = cy_ref[:], sy_ref[:]
    for z in range(zt):
        xz = x_ref[z]  # (Y, X)
        re1 = _dot(xz, fcx)  # (Y, Kx)
        im1 = _dot(xz, fsx)
        re_ref[z] = _dot(cy, re1) + _dot(sy, im1)
        im_ref[z] = _dot(cy, im1) - _dot(sy, re1)


def _pass_b_kernel(
    re_ref, im_ref, kre_ref, kim_ref, cz_ref, sz_ref, ore_ref, oim_ref
):
    """z-DFT + pointwise spectral multiply + z-inverse for one y tile.
    Blocks are (Z, yt, Kx); per-row 2D matmuls over the z axis."""
    yt = re_ref.shape[1]
    inv = 1.0 / re_ref.shape[0]
    cz, sz = cz_ref[:], sz_ref[:]
    for y in range(yt):
        re2 = re_ref[:, y]  # (Z, Kx)
        im2 = im_ref[:, y]
        reF = _dot(cz, re2) + _dot(sz, im2)
        imF = _dot(cz, im2) - _dot(sz, re2)
        kre = kre_ref[:, y]
        kim = kim_ref[:, y]
        pre = reF * kre - imF * kim
        pim = reF * kim + imF * kre
        ore_ref[:, y] = (_dot(cz, pre) - _dot(sz, pim)) * inv
        oim_ref[:, y] = (_dot(cz, pim) + _dot(sz, pre)) * inv


def _pass_c_kernel(re_ref, im_ref, cy_ref, sy_ref, bcx_ref, bsx_ref, out_ref):
    """y-inverse then hermitian-weighted x-irfft for one z-slab:
    re/im (zt, Y, Kx) -> out (zt, Y, X)."""
    zt = re_ref.shape[0]
    inv_y = 1.0 / re_ref.shape[1]
    cy, sy = cy_ref[:], sy_ref[:]
    bcx, bsx = bcx_ref[:], bsx_ref[:]
    for z in range(zt):
        re1 = (_dot(cy, re_ref[z]) - _dot(sy, im_ref[z])) * inv_y
        im1 = (_dot(cy, im_ref[z]) + _dot(sy, re_ref[z])) * inv_y
        out_ref[z] = _dot(re1, bcx) - _dot(im1, bsx)


def _vmem():
    return pltpu.VMEM


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_convolve_spectrum(
    x: jnp.ndarray,
    k_re: jnp.ndarray,
    k_im: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Circular convolution with a pre-forwarded split spectrum, as three
    fused Pallas passes.  Same math as core.dft.dft_convolve_spectrum."""
    if x.ndim != 3:
        raise ValueError("fused path operates on single (z, y, x) volumes")
    Z, Y, X = (int(s) for s in x.shape)
    plan = make_plan((Z, Y, X))
    if not isinstance(plan, DFTPlan):
        raise ValueError("fused path requires compact shapes (<=256 per axis)")
    if not interpret and Z * Y * X > 2**22:
        # EXPERIMENTAL guard: compiled output validated correct up to
        # 128^3 and single-256-axis shapes on v5e, but WRONG at full 256^3
        # (suspected Mosaic issue at this buffer configuration), and the
        # per-plane matmul schedule currently loses to the einsum DFT
        # engine anyway (8.7 vs 4.9 ms/convolve at 256^3).  Keep the
        # production path on algorithm='dft' until this is resolved.
        raise ValueError(
            "fused kernel limited to <= 2^22 voxels compiled (experimental); "
            "use algorithm='dft'"
        )
    Kx = plan.kx
    # pass A/C per-z-plane bytes: input plane (Y*X) + 2 spectral planes
    # (Y*Kx) each, f32, x2 for double buffering.  (Blocks keep the last two
    # dims full, so any zt divisor is legal.)
    zt = _pick_tile(Z, 4 * (Y * X + 2 * Y * Kx) * 2)
    # pass B blocks are (Z, yt, Kx): Pallas requires the middle dim to be a
    # multiple of 8 (or the full Y); 8 rows keeps the 6 double-buffered
    # panels near the VMEM budget.
    yt = 8 if Y % 8 == 0 else Y

    spec_full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=_vmem()
    )
    # raise the scoped VMEM ceiling beyond the conservative 16M default
    # (v5e has far more physical VMEM; Mosaic double/triple-buffers the
    # grid-mapped panels)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- pass A: grid over z-slabs
    re1, im1 = pl.pallas_call(
        _pass_a_kernel,
        grid=(Z // zt,),
        in_specs=[
            pl.BlockSpec((zt, Y, X), lambda i: (i, 0, 0), memory_space=_vmem()),
            spec_full((X, Kx)),
            spec_full((X, Kx)),
            spec_full((Y, Y)),
            spec_full((Y, Y)),
        ],
        out_specs=(
            pl.BlockSpec((zt, Y, Kx), lambda i: (i, 0, 0), memory_space=_vmem()),
            pl.BlockSpec((zt, Y, Kx), lambda i: (i, 0, 0), memory_space=_vmem()),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Z, Y, Kx), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, Kx), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=params,
    )(x, plan.fcx, plan.fsx, plan.cy, plan.sy)

    # ---- pass B: grid over y tiles (k kept whole: Kx is modest)
    re2, im2 = pl.pallas_call(
        _pass_b_kernel,
        grid=(Y // yt,),
        in_specs=[
            pl.BlockSpec((Z, yt, Kx), lambda j: (0, j, 0), memory_space=_vmem()),
            pl.BlockSpec((Z, yt, Kx), lambda j: (0, j, 0), memory_space=_vmem()),
            pl.BlockSpec((Z, yt, Kx), lambda j: (0, j, 0), memory_space=_vmem()),
            pl.BlockSpec((Z, yt, Kx), lambda j: (0, j, 0), memory_space=_vmem()),
            spec_full((Z, Z)),
            spec_full((Z, Z)),
        ],
        out_specs=(
            pl.BlockSpec((Z, yt, Kx), lambda j: (0, j, 0), memory_space=_vmem()),
            pl.BlockSpec((Z, yt, Kx), lambda j: (0, j, 0), memory_space=_vmem()),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Z, Y, Kx), jnp.float32),
            jax.ShapeDtypeStruct((Z, Y, Kx), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=params,
    )(re1, im1, k_re, k_im, plan.cz, plan.sz)

    # ---- pass C: grid over z-slabs
    out = pl.pallas_call(
        _pass_c_kernel,
        grid=(Z // zt,),
        in_specs=[
            pl.BlockSpec((zt, Y, Kx), lambda i: (i, 0, 0), memory_space=_vmem()),
            pl.BlockSpec((zt, Y, Kx), lambda i: (i, 0, 0), memory_space=_vmem()),
            spec_full((Y, Y)),
            spec_full((Y, Y)),
            spec_full((Kx, X)),
            spec_full((Kx, X)),
        ],
        out_specs=pl.BlockSpec(
            (zt, Y, X), lambda i: (i, 0, 0), memory_space=_vmem()
        ),
        out_shape=jax.ShapeDtypeStruct((Z, Y, X), jnp.float32),
        interpret=interpret,
        compiler_params=params,
    )(re2, im2, plan.cy, plan.sy, plan.bcx, plan.bsx)
    return out
