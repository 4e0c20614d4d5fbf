"""Fused 3-pass Mosaic DFT-convolve, v2 — transposed-lane layout.

Round-1's fused kernel (negative result, tombstoned in
docs/PERFORMANCE.md) kept the hermitian-halved x-spectrum (Kx = X/2+1,
e.g. 129) in the LANE dimension: every y/z-stage matmul had N=129 lanes =
2 half-empty 128-lane tiles, wasting ~50% of MXU cycles — and its pass-B
per-row (Z, Kx) matmuls amplified that.  v2 re-lays the problem so the
halved axis lives in SUBLANES (129 rows = 17 sublane tiles, ~5% pad) and
every full axis (Y, Z and their spectra) spans full 128-lane tiles:

  volume layout   (Z, X, Y)   — pre-transposed ONCE outside the RL loop
                                (the RL elementwise steps are
                                layout-agnostic, so views/weights/psi all
                                live transposed across the whole
                                iteration; zero per-iteration transposes)
  intermediate    (Kx, Z, M)  — split re/im, minor dims (Z, M) fully tiled
  kernel spectrum (Kx, Q, M)  — split re/im, precomputed in this layout

  pass A  per z-slab:  plane (X, Y):
            t = Fx(Kx,X) @ plane          x-rfft, left-mult
            u = t @ GyT(Y,M)              y-DFT, right-mult
  pass B  per x-freq k:  slice (Z, M):
            v = Fz(Q,Z) @ u               z-DFT, left-mult
            p = v * K̂[k]                 spectral multiply
            w = Bz(Z,Q) @ p               z-inverse (1/Z folded)
  pass C  per z-slab:  slice (Kx, M):
            t = u @ ByT(M,Y)              y-inverse (1/Y folded)
            out = BxC(X,Kx) @ t_re - BxS @ t_im
                                          hermitian-weighted x-irfft

Every contraction is a plain 2D (M,K)@(K,N) with the constant DFT matrix
pre-oriented outside the kernel — no reshapes, no transposes, nothing for
Mosaic's layout inference to reject.  HBM traffic per 256³ convolve is
~1.1 GB (vs ~2.7 GB for the einsum engine's materialized stages).

Math is identical to core.dft.dft_convolve_spectrum (circular
convolution, 1/N scaling folded into the inverse stages); reference
contract: inplace_convolve_on_device
(/root/reference/inc/gpu_convolve.cuh:113-142) with the modulate fused
between the transforms.

Constraints: single (z,y,x) volumes, f32, X even, Z/Y/X multiples of 8.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedPlan(NamedTuple):
    """Constant stage matrices, pre-oriented for the v2 layout."""

    fxc: jnp.ndarray  # (Kx, X)  forward x cos
    fxs: jnp.ndarray  # (Kx, X)  forward x -sin (so t_im = fxs @ plane)
    gyc: jnp.ndarray  # (Y, M)   forward y cos (right-mult)
    gys: jnp.ndarray  # (Y, M)   forward y sin
    fzc: jnp.ndarray  # (Q, Z)   forward z cos (left-mult)
    fzs: jnp.ndarray  # (Q, Z)   forward z sin
    bzc: jnp.ndarray  # (Z, Q)   inverse z cos / Z
    bzs: jnp.ndarray  # (Z, Q)   inverse z sin / Z
    byc: jnp.ndarray  # (M, Y)   inverse y cos / Y
    bys: jnp.ndarray  # (M, Y)   inverse y sin / Y
    bxc: jnp.ndarray  # (X, Kx)  inverse x, hermitian-weighted cos / X
    bxs: jnp.ndarray  # (X, Kx)  inverse x, hermitian-weighted sin / X
    shape: Tuple[int, int, int]  # (Z, Y, X)

    @property
    def kx(self) -> int:
        return self.fxc.shape[0]


@functools.lru_cache(maxsize=16)
def make_fused_plan(shape: Tuple[int, int, int]) -> FusedPlan:
    Z, Y, X = (int(s) for s in shape)
    kx = X // 2 + 1

    def theta(a, b, n):
        return 2.0 * np.pi * np.outer(np.arange(a), np.arange(b)) / n

    tx = theta(kx, X, X)
    ty = theta(Y, Y, Y)
    tz = theta(Z, Z, Z)

    # hermitian doubling weights for the real x-inverse
    w = np.full(kx, 2.0)
    w[0] = 1.0
    if X % 2 == 0:
        w[-1] = 1.0

    with jax.ensure_compile_time_eval():
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return FusedPlan(
            fxc=f32(np.cos(tx)),
            fxs=f32(-np.sin(tx)),
            gyc=f32(np.cos(ty)),
            gys=f32(np.sin(ty)),
            fzc=f32(np.cos(tz)),
            fzs=f32(np.sin(tz)),
            bzc=f32(np.cos(tz).T / Z),
            bzs=f32(np.sin(tz).T / Z),
            byc=f32(np.cos(ty).T / Y),
            bys=f32(np.sin(ty).T / Y),
            bxc=f32((w[None, :] * np.cos(tx).T) / X),
            bxs=f32((w[None, :] * np.sin(tx).T) / X),
            shape=(Z, Y, X),
        )


def _dot(a, b, precision):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _pass_a_kernel(
    x_ref, fxc_ref, fxs_ref, gyc_ref, gys_ref, ure_ref, uim_ref, *, precision
):
    """x-rfft + y-DFT for one z-slab.  x (B, X, Y) -> u (Kx, B, M)."""
    B = x_ref.shape[0]
    fxc, fxs = fxc_ref[:], fxs_ref[:]
    gyc, gys = gyc_ref[:], gys_ref[:]
    for b in range(B):
        p = x_ref[b]  # (X, Y)
        t_re = _dot(fxc, p, precision)  # (Kx, Y)
        t_im = _dot(fxs, p, precision)
        # u = t @ (Cy - i Sy)
        ure_ref[:, b, :] = _dot(t_re, gyc, precision) + _dot(t_im, gys, precision)
        uim_ref[:, b, :] = _dot(t_im, gyc, precision) - _dot(t_re, gys, precision)


def _pass_b_kernel(
    ure_ref, uim_ref, kre_ref, kim_ref,
    fzc_ref, fzs_ref, bzc_ref, bzs_ref,
    ore_ref, oim_ref, *, precision,
):
    """z-DFT + spectral multiply + z-inverse for one x-frequency slice
    (1, Z, M) -> (1, Z, M)."""
    u_re = ure_ref[0]  # (Z, M)
    u_im = uim_ref[0]
    fzc, fzs = fzc_ref[:], fzs_ref[:]
    # v = (Cz - i Sz) @ u
    v_re = _dot(fzc, u_re, precision) + _dot(fzs, u_im, precision)
    v_im = _dot(fzc, u_im, precision) - _dot(fzs, u_re, precision)
    k_re = kre_ref[0]  # (Q, M)
    k_im = kim_ref[0]
    p_re = v_re * k_re - v_im * k_im
    p_im = v_re * k_im + v_im * k_re
    bzc, bzs = bzc_ref[:], bzs_ref[:]
    # w = (Cz^T + i Sz^T)/Z @ p
    ore_ref[0] = _dot(bzc, p_re, precision) - _dot(bzs, p_im, precision)
    oim_ref[0] = _dot(bzc, p_im, precision) + _dot(bzs, p_re, precision)


def _pass_c_kernel(
    ure_ref, uim_ref, byc_ref, bys_ref, bxc_ref, bxs_ref, out_ref, *, precision
):
    """y-inverse + hermitian x-irfft for one z-slab.
    u (Kx, B, M) -> out (B, X, Y)."""
    B = out_ref.shape[0]
    byc, bys = byc_ref[:], bys_ref[:]
    bxc, bxs = bxc_ref[:], bxs_ref[:]
    for b in range(B):
        u_re = ure_ref[:, b, :]  # (Kx, M)
        u_im = uim_ref[:, b, :]
        # t = u @ (Cy^T + i Sy^T)/Y
        t_re = _dot(u_re, byc, precision) - _dot(u_im, bys, precision)
        t_im = _dot(u_im, byc, precision) + _dot(u_re, bys, precision)
        # out = Re[ Bx @ t ]
        out_ref[b] = _dot(bxc, t_re, precision) - _dot(bxs, t_im, precision)


def _slab(n_z: int, x: int, y: int) -> int:
    """z-slab size: full input slab must stay well under VMEM with
    double-buffering; 8 aligns the (Kx, Z, M) sublane tiles."""
    bytes_per_plane = 4 * x * y
    b = 8
    while b > 1 and b * bytes_per_plane > 4 * 1024 * 1024:
        b //= 2
    while n_z % b:
        b //= 2
    return max(b, 1)


def kernel_spectrum_fused(kernel: jnp.ndarray, shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wrapped-kernel spectrum in the (Kx, Q, M) v2 layout (split re/im).

    Computed with the einsum engine's dft3 (compact layout (Q, M, Kx))
    then permuted once at prepare time — prepare-side cost, not loop cost.
    """
    from ...core.dft import dft3, make_plan as make_dft_plan, DFTPlan
    from ...core.wrap import wrap_kernel

    shape = tuple(int(s) for s in shape)
    plan = make_dft_plan(shape)
    if not isinstance(plan, DFTPlan):
        # long-axis shapes: build the compact-layout spectrum directly from
        # the same twiddle construction (dense at any size)
        wrapped = wrap_kernel(jnp.asarray(kernel, jnp.float32), shape)
        re, im = _dense_dft3(wrapped)
    else:
        wrapped = wrap_kernel(jnp.asarray(kernel, jnp.float32), shape)
        re, im = dft3(wrapped, plan)
    # (Q, M, Kx) -> (Kx, Q, M)
    return jnp.transpose(re, (2, 0, 1)), jnp.transpose(im, (2, 0, 1))


def _dense_dft3(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense rfft3 in the compact (Q, M, Kx) layout at ANY size (used for
    spectra when core.dft would pick a FullDFTPlan).  float32 einsums at
    HIGHEST precision; prepare-time only."""
    Z, Y, X = (int(s) for s in x.shape[-3:])
    p = make_fused_plan((Z, Y, X))
    hi = jax.lax.Precision.HIGHEST
    e = functools.partial(jnp.einsum, precision=hi)
    re = e("...zyx,kx->...zyk", x, p.fxc)
    im = e("...zyx,kx->...zyk", x, p.fxs)
    re, im = (
        e("...zyk,ym->...zmk", re, p.gyc) + e("...zyk,ym->...zmk", im, p.gys),
        e("...zyk,ym->...zmk", im, p.gyc) - e("...zyk,ym->...zmk", re, p.gys),
    )
    re, im = (
        e("...zmk,qz->...qmk", re, p.fzc) + e("...zmk,qz->...qmk", im, p.fzs),
        e("...zmk,qz->...qmk", im, p.fzc) - e("...zmk,qz->...qmk", re, p.fzs),
    )
    return re, im


@functools.partial(
    jax.jit, static_argnames=("interpret", "precision")
)
def fused_convolve_transposed(
    xt: jnp.ndarray,
    k_re: jnp.ndarray,
    k_im: jnp.ndarray,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Circular convolution of a (Z, X, Y)-TRANSPOSED volume with a
    pre-forwarded (Kx, Q, M)-layout split spectrum; returns the transposed
    convolved volume.  The fast path — callers keep volumes transposed
    across the whole RL loop (see deconv.rl algorithm='fused')."""
    if xt.ndim != 3:
        raise ValueError("fused path operates on single volumes")
    Z, X, Y = (int(s) for s in xt.shape)
    if X % 2 or Z % 8 or Y % 8 or X % 8:
        raise ValueError(
            f"fused kernel requires even X and Z/Y/X multiples of 8; got "
            f"ZXY={(Z, X, Y)}"
        )
    plan = make_fused_plan((Z, Y, X))
    Kx = plan.kx
    B = _slab(Z, X, Y)
    M = Y

    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    vmem = pltpu.VMEM
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=vmem
    )

    # ---- pass A: grid over z-slabs; (B, X, Y) -> (Kx, B, M)
    u_re, u_im = pl.pallas_call(
        functools.partial(_pass_a_kernel, precision=precision),
        grid=(Z // B,),
        in_specs=[
            pl.BlockSpec((B, X, Y), lambda i: (i, 0, 0), memory_space=vmem),
            full((Kx, X)),
            full((Kx, X)),
            full((Y, M)),
            full((Y, M)),
        ],
        out_specs=(
            pl.BlockSpec((Kx, B, M), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((Kx, B, M), lambda i: (0, i, 0), memory_space=vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Kx, Z, M), jnp.float32),
            jax.ShapeDtypeStruct((Kx, Z, M), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=params,
    )(xt, plan.fxc, plan.fxs, plan.gyc, plan.gys)

    # ---- pass B: grid over x-frequencies; (1, Z, M) slices
    v_re, v_im = pl.pallas_call(
        functools.partial(_pass_b_kernel, precision=precision),
        grid=(Kx,),
        in_specs=[
            pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem),
            full((Z, Z)),
            full((Z, Z)),
            full((Z, Z)),
            full((Z, Z)),
        ],
        out_specs=(
            pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem),
            pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Kx, Z, M), jnp.float32),
            jax.ShapeDtypeStruct((Kx, Z, M), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=params,
    )(u_re, u_im, k_re, k_im, plan.fzc, plan.fzs, plan.bzc, plan.bzs)

    # ---- pass C: grid over z-slabs; (Kx, B, M) -> (B, X, Y)
    out = pl.pallas_call(
        functools.partial(_pass_c_kernel, precision=precision),
        grid=(Z // B,),
        in_specs=[
            pl.BlockSpec((Kx, B, M), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((Kx, B, M), lambda i: (0, i, 0), memory_space=vmem),
            full((M, Y)),
            full((M, Y)),
            full((X, Kx)),
            full((X, Kx)),
        ],
        out_specs=pl.BlockSpec(
            (B, X, Y), lambda i: (i, 0, 0), memory_space=vmem
        ),
        out_shape=jax.ShapeDtypeStruct((Z, X, Y), jnp.float32),
        interpret=interpret,
        compiler_params=params,
    )(v_re, v_im, plan.byc, plan.bys, plan.bxc, plan.bxs)
    return out


def fused_convolve_spectrum(
    x: jnp.ndarray,
    k_re: jnp.ndarray,
    k_im: jnp.ndarray,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Convenience wrapper for standard (Z, Y, X) volumes: transposes in
    and out around :func:`fused_convolve_transposed` (one-off callers; the
    RL loop uses the transposed form directly)."""
    xt = jnp.transpose(x, (0, 2, 1))
    out = fused_convolve_transposed(
        xt, k_re, k_im, interpret=interpret, precision=precision
    )
    return jnp.transpose(out, (0, 2, 1))
