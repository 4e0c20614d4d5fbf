"""Ring halo exchange + overlap-save block convolution along a sharded Z axis.

This is the capability the reference *lacks*: it never decomposes a single
volume — when a volume outgrows device memory it falls back to PCIe
streaming (the interleaved strategy, /root/reference/src/gpu_deconvolve_methods.cuh:85-326)
or refuses (/root/reference/src/multiviewnative.cu:140).  On TPU we shard
the Z axis over the mesh and exchange PSF-support halos over ICI with
``lax.ppermute`` — the sharding analog of its stream/prefetch machinery.

Math: global *circular* convolution (the reference's no_padd deconvolution
boundary) decomposes exactly into per-block overlap-save with a RING halo
exchange: block 0's lower halo is the last block's top planes, which is
precisely the global wrap.  Each device convolves its halo-extended block
(extent Bz+k-1) circularly and keeps the central Bz output planes, which
never touch the block-edge wrap — so the result is bit-identical in
structure to the single-device circular convolve.

Halo widths come from the kernel center convention c = k//2
(/root/reference/inc/padd_utils.h:25-27): ``lo = k-1-c`` planes from the
previous block, ``hi = c`` planes from the next
(libmultiviewnative_tpu.core.shapes.halo_widths).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.convolve import convolve_spectrum
from ..core.fft import rfft3
from ..core.shapes import halo_widths
from ..core.wrap import wrap_kernel


def _ring_perms(n: int):
    fwd = [(i, (i + 1) % n) for i in range(n)]  # send to next rank
    bwd = [(i, (i - 1) % n) for i in range(n)]  # send to previous rank
    return fwd, bwd


def halo_exchange_z(
    block: jnp.ndarray, lo: int, hi: int, axis_name: str
) -> jnp.ndarray:
    """Extend a local (..., Bz, Y, X) block by ring-exchanged z halos.

    ``lo`` planes arrive from the previous rank (they are its top planes),
    ``hi`` planes from the next rank.  Ring wrap-around gives global
    circular boundary semantics for free.
    """
    n = lax.psum(1, axis_name)
    fwd, bwd = _ring_perms(n)
    zax = block.ndim - 3
    parts = []
    if lo > 0:
        top = lax.slice_in_dim(block, block.shape[zax] - lo, block.shape[zax], axis=zax)
        parts.append(lax.ppermute(top, axis_name, fwd))
    parts.append(block)
    if hi > 0:
        bottom = lax.slice_in_dim(block, 0, hi, axis=zax)
        parts.append(lax.ppermute(bottom, axis_name, bwd))
    return jnp.concatenate(parts, axis=zax) if len(parts) > 1 else block


def zblock_kernel_spectrum(
    kernel: jnp.ndarray, local_spatial: Tuple[int, int, int]
) -> jnp.ndarray:
    """Forward a PSF for halo-extended local blocks: wrap + rfft at extent
    (Bz + k - 1, Y, X)."""
    (lo_z, _, _), (hi_z, _, _) = halo_widths(kernel.shape)
    ext = (local_spatial[0] + lo_z + hi_z, local_spatial[1], local_spatial[2])
    return rfft3(wrap_kernel(kernel, ext))


def zblock_kernel_spectrum_split(
    kernel: jnp.ndarray, local_spatial: Tuple[int, int, int]
):
    """Split (re, im) spectrum at the halo-extended extent for the MXU DFT
    engine — halo-extended block shapes are small and rarely power-of-2,
    exactly where the dense DFT outruns the FFT op."""
    from ..core.dft import kernel_spectrum_split

    (lo_z, _, _), (hi_z, _, _) = halo_widths(kernel.shape)
    ext = (local_spatial[0] + lo_z + hi_z, local_spatial[1], local_spatial[2])
    return kernel_spectrum_split(kernel, ext)


def convolve_zblock(
    block: jnp.ndarray,
    kernel_hat_ext: jnp.ndarray,
    lo: int,
    hi: int,
    axis_name: str,
) -> jnp.ndarray:
    """Overlap-save circular convolution of a z-sharded volume.

    ``block``: local (..., Bz, Y, X) shard; ``kernel_hat_ext``: spectrum at
    the halo-extended extent.  Output planes [lo, lo+Bz) of the extended
    convolve are exact — crop offsets are the zero_padd ``offsets_``
    arithmetic (/root/reference/inc/padd_utils.h:121-146) lifted to blocks.
    """
    bz = block.shape[-3]
    ext = halo_exchange_z(block, lo, hi, axis_name)
    out = convolve_spectrum(ext, kernel_hat_ext)
    return lax.slice_in_dim(out, lo, lo + bz, axis=out.ndim - 3)


def convolve_zblock_dft(
    block: jnp.ndarray,
    kernel_split_ext,
    lo: int,
    hi: int,
    axis_name: str,
) -> jnp.ndarray:
    """:func:`convolve_zblock` with the MXU DFT engine (split spectra)."""
    from ..core.dft import dft_convolve_spectrum

    bz = block.shape[-3]
    ext = halo_exchange_z(block, lo, hi, axis_name)
    out = dft_convolve_spectrum(ext, kernel_split_ext[0], kernel_split_ext[1])
    return lax.slice_in_dim(out, lo, lo + bz, axis=out.ndim - 3)


def zblock_fused_extent(bz: int, lo: int, hi: int) -> int:
    """Fused-engine z extent for a halo-extended block: Bz + lo + hi,
    rounded UP to the Mosaic 8-sublane constraint (ops.pallas.fused_dft2
    requires all axes %8).  The extra pad planes are zeros appended BELOW
    the halo-extended block; output planes [lo, lo+Bz) of the circular
    convolve at the padded extent never read past plane Bz+lo+hi-1, so
    the pad changes nothing (overlap-save crop argument, see
    :func:`convolve_zblock`)."""
    ext = bz + lo + hi
    return -(-ext // 8) * 8


def zblock_kernel_spectrum_fused(
    kernel: jnp.ndarray, local_spatial: Tuple[int, int, int]
):
    """Fused-layout (Kxp, Q, M) split spectrum at the PADDED halo-extended
    extent (:func:`zblock_fused_extent`) — the z-block analog of
    deconv.rl.prepare_spectra_fused, so the production Mosaic engine
    serves the mesh rung with the same one-kernel-per-strategy contract
    as the reference's inplace_convolve_on_device
    (/root/reference/inc/gpu_convolve.cuh:113-142)."""
    from ..ops.pallas.fused_dft2 import kernel_spectrum_fused

    (lo_z, _, _), (hi_z, _, _) = halo_widths(kernel.shape)
    ze = zblock_fused_extent(local_spatial[0], lo_z, hi_z)
    return kernel_spectrum_fused(
        kernel, (ze, local_spatial[1], local_spatial[2])
    )


def convolve_zblock_fused(
    block_t: jnp.ndarray,
    kernel_fused_ext,
    lo: int,
    hi: int,
    axis_name: str,
    interpret: bool = False,
    precision: str = "highest",
    fold_x: bool = False,
) -> jnp.ndarray:
    """Overlap-save circular convolution of a z-sharded volume with the
    fully-fused Mosaic engine.

    ``block_t``: local TRANSPOSED (Bz, X, Y) shard (the fused engine's
    (Z, X, Y) domain — callers transpose once outside the iteration loop,
    exactly like the in-core driver); ``kernel_fused_ext``: (re, im)
    split spectrum at the padded extent from
    :func:`zblock_kernel_spectrum_fused`.  The halo-extended block is
    zero-padded to the %8 extent, convolved circularly there, and the
    central [lo, lo+Bz) planes cropped — exact for the global circular
    boundary (:func:`convolve_zblock`'s argument plus the pad-plane
    argument in :func:`zblock_fused_extent`)."""
    from ..ops.pallas.fused_dft2 import fused_convolve_transposed

    bz = block_t.shape[-3]
    ext = halo_exchange_z(block_t, lo, hi, axis_name)
    ze = zblock_fused_extent(bz, lo, hi)
    pad = ze - ext.shape[-3]
    if pad:
        ext = jnp.concatenate(
            [ext, jnp.zeros((pad,) + ext.shape[-2:], ext.dtype)], axis=-3
        )
    out = fused_convolve_transposed(
        ext,
        kernel_fused_ext[0],
        kernel_fused_ext[1],
        interpret=interpret,
        precision=precision,
        fold_x=fold_x,
    )
    return lax.slice_in_dim(out, lo, lo + bz, axis=out.ndim - 3)
