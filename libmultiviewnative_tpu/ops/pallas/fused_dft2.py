"""Fused 3-pass Mosaic DFT-convolve, v2 — transposed-lane layout.

Round-1's fused kernel (negative result, tombstoned in
docs/PERFORMANCE.md) kept the hermitian-halved x-spectrum (Kx = X/2+1,
e.g. 129) in the LANE dimension: every y/z-stage matmul had N=129 lanes =
2 half-empty 128-lane tiles, wasting ~50% of MXU cycles — and its pass-B
per-row (Z, Kx) matmuls amplified that.  v2 re-lays the problem so the
halved axis lives in SUBLANES and every full axis (Y, Z and their
spectra) spans full 128-lane tiles:

  volume layout   (Z, X, Y)   — pre-transposed ONCE outside the RL loop
                                (the RL elementwise steps are
                                layout-agnostic, so views/weights/psi all
                                live transposed across the whole
                                iteration; zero per-iteration transposes)
  intermediate    (Kx, Z, M)  — split re/im; pass B reads/writes clean
                                (1, Z, M) leading-dim blocks
  kernel spectrum (Kx, Q, M)  — split re/im, precomputed in this layout

  pass A  per z-slab:  plane (X, Y):
            t = Fx(Kx,X) @ plane          x-rfft, left-mult
            u = t @ Gy(Y,M)               y-DFT, right-mult (Karatsuba)
  pass B  per x-freq k:  slice (Z, M):
            v = Fz(Q,Z) @ u               z-DFT (Karatsuba)
            p = v * K̂[k]                 spectral multiply
            w = Bz(Z,Q) @ p               z-inverse, 1/Z folded (Karatsuba)
  pass C  per z-slab:  slice (Kx, M):
            t = u @ By(M,Y)               y-inverse, 1/Y folded (Karatsuba)
            out = BxC(X,Kx) @ t_re - BxS @ t_im
                                          hermitian-weighted x-irfft

Every contraction is a plain 2D (M,K)@(K,N) with the constant DFT matrix
pre-oriented outside the kernel — no reshapes, no transposes, nothing for
Mosaic's layout inference to reject.  Complex-by-complex stages use the
3-multiplication Karatsuba form (m1 = A@c, m2 = B@d, m3 = (A+B)@(c+d);
re = m1-m2, im = m3-m1-m2) with A+B precomputed — 25% fewer matmul FLOPs
than the 4-product form.  HBM traffic per 256³ convolve is ~1.1 GB (vs
~2.7 GB of materialized stages for the einsum engine).

Measured A/B notes (v5e, docs/PERFORMANCE.md): the (Kx, Z, M)
intermediate with strided pass-A sublane writes BEATS the (Z, Kx, M)
variant with clean writes (2.26 vs 2.46 ms standalone), and a per-k
pass B beats both a KB=8 loop (2.80) and a flat (Z, Kx*M) reshape
(3.44 — the XLA reshape between passes is a real relayout copy).

Math is identical to core.dft.dft_convolve_spectrum (circular
convolution, 1/N folded into the inverse stages); reference contract:
inplace_convolve_on_device (/root/reference/inc/gpu_convolve.cuh:113-142)
with the modulate fused between the transforms.

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
    """Constant stage matrices, pre-oriented for the v2 layout.

    Complex stages carry (A, B, A+B) triples for the Karatsuba form,
    where the stage operator is A + iB.
    """

    fxc: jnp.ndarray  # (Kx, X)  forward x cos
    fxs: jnp.ndarray  # (Kx, X)  forward x -sin
    gy: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (Y, M) fwd y: Cy, -Sy
    fz: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (Q, Z) fwd z: Cz, -Sz
    bz: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (Z, Q) inv z: C/Z, +S/Z
    by: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # (M, Y) inv y: C/Y, +S/Y
    bxc: jnp.ndarray  # (X, Kx)  inverse x, hermitian-weighted cos / X
    bxs: jnp.ndarray  # (X, Kx)  inverse x, hermitian-weighted sin / X
    shape: Tuple[int, int, int]  # (Z, Y, X)

    @property
    def kx(self) -> int:
        return self.fxc.shape[0]


def _triple(a: np.ndarray, b: np.ndarray):
    f32 = lambda m: jnp.asarray(m, jnp.float32)
    return (f32(a), f32(b), f32(a + b))


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
            gy=_triple(np.cos(ty), -np.sin(ty)),
            fz=_triple(np.cos(tz), -np.sin(tz)),
            bz=_triple(np.cos(tz).T / Z, np.sin(tz).T / Z),
            by=_triple(np.cos(ty).T / Y, np.sin(ty).T / Y),
            bxc=f32((w[None, :] * np.cos(tx).T) / X),
            bxs=f32((w[None, :] * np.sin(tx).T) / X),
            shape=(Z, Y, X),
        )


_DIMS = (((1,), (0,)), ((), ()))


def _split_bf16(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, precision):
    """2D matmul.  precision: 'highest' (full-f32 MXU passes) or 'bf16_3x'
    (manual 3-pass hi/lo-bf16 decomposition — Mosaic does not lower
    jax.lax.Precision.HIGH, so the bf16_3x scheme XLA uses for HIGH is
    spelled out: a@b ~= ah@bh + ah@bl + al@bh, error ~3e-5 relative,
    ~2x the f32 matmul rate).  Repeated splits of the loop-invariant DFT
    matrices are CSE'd by Mosaic."""
    if precision == "bf16_3x":
        ah, al = _split_bf16(a)
        bh, bl = _split_bf16(b)
        # precision pinned to DEFAULT: bf16 operands take one MXU pass
        # anyway, and leaving it unset would inherit the process-wide
        # jax_default_matmul_precision (HIGH), which Mosaic cannot lower
        d = lambda u, v: jax.lax.dot_general(
            u, v, _DIMS, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _cmul_right(d_re, d_im, trip, precision):
    """(d_re + i d_im) @ (A + iB) via 3 matmuls (trip = (A, B, A+B))."""
    a, b, ab = trip
    m1 = _dot(d_re, a, precision)
    m2 = _dot(d_im, b, precision)
    m3 = _dot(d_re + d_im, ab, precision)
    return m1 - m2, m3 - m1 - m2


def _cmul_left(trip, d_re, d_im, precision):
    """(A + iB) @ (d_re + i d_im) via 3 matmuls."""
    a, b, ab = trip
    m1 = _dot(a, d_re, precision)
    m2 = _dot(b, d_im, precision)
    m3 = _dot(ab, d_re + d_im, precision)
    return m1 - m2, m3 - m1 - m2


def _pass_a_kernel(
    x_ref, fxc_ref, fxs_ref, gya_ref, gyb_ref, gyab_ref,
    ure_ref, uim_ref, *, precision,
):
    """x-rfft + y-DFT for one z-slab.  x (B, X, Y) -> u (Kx, B, M)."""
    B = x_ref.shape[0]
    fxc, fxs = fxc_ref[:], fxs_ref[:]
    gy = (gya_ref[:], gyb_ref[:], gyab_ref[:])
    for b in range(B):
        p = x_ref[b]  # (X, Y)
        t_re = _dot(fxc, p, precision)  # (Kx, Y)
        t_im = _dot(fxs, p, precision)
        u_re, u_im = _cmul_right(t_re, t_im, gy, precision)
        ure_ref[:, b, :] = u_re
        uim_ref[:, b, :] = u_im


def _pass_b_kernel(
    ure_ref, uim_ref, kre_ref, kim_ref,
    fza_ref, fzb_ref, fzab_ref, bza_ref, bzb_ref, bzab_ref,
    ore_ref, oim_ref, *, precision,
):
    """z-DFT + spectral multiply + z-inverse for one x-frequency slice
    (1, Z, M) -> (1, Z, M)."""
    fz = (fza_ref[:], fzb_ref[:], fzab_ref[:])
    bz = (bza_ref[:], bzb_ref[:], bzab_ref[:])
    v_re, v_im = _cmul_left(fz, ure_ref[0], uim_ref[0], precision)
    k_re = kre_ref[0]  # (Q, M)
    k_im = kim_ref[0]
    p_re = v_re * k_re - v_im * k_im
    p_im = v_re * k_im + v_im * k_re
    w_re, w_im = _cmul_left(bz, p_re, p_im, precision)
    ore_ref[0] = w_re
    oim_ref[0] = w_im


def _pass_c_kernel(
    ure_ref, uim_ref, bya_ref, byb_ref, byab_ref, bxc_ref, bxs_ref,
    out_ref, *, precision,
):
    """y-inverse + hermitian x-irfft for one z-slab.
    u (Kx, B, M) -> out (B, X, Y)."""
    B = out_ref.shape[0]
    by = (bya_ref[:], byb_ref[:], byab_ref[:])
    bxc, bxs = bxc_ref[:], bxs_ref[:]
    for b in range(B):
        t_re, t_im = _cmul_right(
            ure_ref[:, b, :], uim_ref[:, b, :], by, precision
        )
        # out = Re[ Bx @ t ]
        out_ref[b] = _dot(bxc, t_re, precision) - _dot(bxs, t_im, precision)


def _slab(n_z: int, x: int, y: int) -> int:
    """z-slab size.  Mosaic requires block dims that are not the full
    array extent to be multiples of 8 (sublane) — the (Kx, B, M) output
    block's middle dim is B, so B = 8 (Z % 8 enforced by the caller; an
    8-plane 512x512 f32 slab is 8 MB, comfortably inside the raised
    vmem_limit with double-buffering)."""
    del x, y
    return 8 if n_z % 8 == 0 else n_z


def kernel_spectrum_fused(kernel: jnp.ndarray, shape) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Wrapped-kernel spectrum in the (Kx, Q, M) v2 layout (split re/im).

    Computed with the einsum engine's dft3 (compact layout (Q, M, Kx))
    then permuted once at prepare time — prepare-side cost, not loop cost.
    """
    from ...core.dft import dft3, make_plan as make_dft_plan, DFTPlan
    from ...core.wrap import wrap_kernel

    shape = tuple(int(s) for s in shape)
    plan = make_dft_plan(shape)
    wrapped = wrap_kernel(jnp.asarray(kernel, jnp.float32), shape)
    if not isinstance(plan, DFTPlan):
        # long-axis shapes: build the compact-layout spectrum directly from
        # the same twiddle construction (dense at any size)
        re, im = _dense_dft3(wrapped)
    else:
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
    cy, msy = p.gy[0], p.gy[1]  # (Y, M): Cy, -Sy
    cz, msz = p.fz[0], p.fz[1]  # (Q, Z): Cz, -Sz
    re = e("...zyx,kx->...zyk", x, p.fxc)
    im = e("...zyx,kx->...zyk", x, p.fxs)
    # (re + i im) @ (Cy + i(-Sy))
    re, im = (
        e("...zyk,ym->...zmk", re, cy) - e("...zyk,ym->...zmk", im, msy),
        e("...zyk,ym->...zmk", im, cy) + e("...zyk,ym->...zmk", re, msy),
    )
    # (Cz + i(-Sz)) @ (re + i im), matrix indexed [q, z]
    re, im = (
        e("...zmk,qz->...qmk", re, cz) - e("...zmk,qz->...qmk", im, msz),
        e("...zmk,qz->...qmk", im, cz) + e("...zmk,qz->...qmk", re, msz),
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
    precision: str = "highest",
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
    )(xt, plan.fxc, plan.fxs, *plan.gy)

    # ---- pass B: grid over x-frequencies; clean (1, Z, M) leading blocks
    blk = lambda: pl.BlockSpec((1, Z, M), lambda k: (k, 0, 0), memory_space=vmem)
    v_re, v_im = pl.pallas_call(
        functools.partial(_pass_b_kernel, precision=precision),
        grid=(Kx,),
        in_specs=[
            blk(), blk(), blk(), blk(),
            full((Z, Z)), full((Z, Z)), full((Z, Z)),
            full((Z, Z)), full((Z, Z)), full((Z, Z)),
        ],
        out_specs=(blk(), blk()),
        out_shape=(
            jax.ShapeDtypeStruct((Kx, Z, M), jnp.float32),
            jax.ShapeDtypeStruct((Kx, Z, M), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=params,
    )(u_re, u_im, k_re, k_im, *plan.fz, *plan.bz)

    # ---- pass C: grid over z-slabs; (Kx, B, M) -> (B, X, Y)
    out = pl.pallas_call(
        functools.partial(_pass_c_kernel, precision=precision),
        grid=(Z // B,),
        in_specs=[
            pl.BlockSpec((Kx, B, M), lambda i: (0, i, 0), memory_space=vmem),
            pl.BlockSpec((Kx, B, M), lambda i: (0, i, 0), memory_space=vmem),
            full((M, Y)),
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
    )(v_re, v_im, *plan.by, plan.bxc, plan.bxs)
    return out


def fused_convolve_spectrum(
    x: jnp.ndarray,
    k_re: jnp.ndarray,
    k_im: jnp.ndarray,
    interpret: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Convenience wrapper for standard (Z, Y, X) volumes: transposes in
    and out around :func:`fused_convolve_transposed` (one-off callers; the
    RL loop uses the transposed form directly)."""
    xt = jnp.transpose(x, (0, 2, 1))
    out = fused_convolve_transposed(
        xt, k_re, k_im, interpret=interpret, precision=precision
    )
    return jnp.transpose(out, (0, 2, 1))
