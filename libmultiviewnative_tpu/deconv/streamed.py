"""Out-of-core ("streamed") deconvolution for volumes beyond device memory.

TPU-native analog of the reference's interleaved GPU strategy
(/root/reference/src/gpu_deconvolve_methods.cuh:85-326): when the workspace
cannot live on one chip, the volume stays in HOST memory and flows through
the device in Z-chunks.  Where the reference hand-rolls 2 CUDA streams,
pinned buffers, and kernel prefetch ("kick"), here each stage is a jitted
chunk program and XLA/PJRT overlap the transfers.

Stage structure per view (the reference's 4 steps, src/multiviewnative.cpp:191-228):
  1. blurred  = psi (x) k1     — chunked overlap-save convolve (halo from
                                  neighboring chunks in HOST memory; ring
                                  wrap at volume ends = circular boundary)
  2. quotient = view / blurred — chunked elementwise
  3. integral = quotient (x) k2 — chunked overlap-save convolve
  4. psi      = rl_update(...)  — chunked elementwise

Correctness is exact vs the in-core path (overlap-save with full halos).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.convolve import convolve_spectrum
from ..core.fft import rfft3
from ..core.kernels import rl_update
from ..core.shapes import halo_widths
from ..core.wrap import wrap_kernel


def _chunk_bounds(Z: int, chunk: int) -> List[Tuple[int, int]]:
    return [(lo, min(lo + chunk, Z)) for lo in range(0, Z, chunk)]


@partial(jax.jit, static_argnames=("out_z", "lo"))
def _convolve_chunk(ext: jnp.ndarray, k_hat: jnp.ndarray, out_z: int, lo: int):
    out = convolve_spectrum(ext, k_hat)
    return jax.lax.slice_in_dim(out, lo, lo + out_z, axis=0)


def _gather_extended(vol: np.ndarray, z0: int, z1: int, lo: int, hi: int):
    """Chunk [z0, z1) plus circularly wrapped halos from host memory."""
    Z = vol.shape[0]
    idx = np.arange(z0 - lo, z1 + hi) % Z
    return vol[idx]


def _streamed_convolve(
    vol: np.ndarray,
    kernel: np.ndarray,
    chunk: int,
    out: np.ndarray,
    spectra_cache: dict,
) -> np.ndarray:
    """Full-volume circular convolution, chunked through the device.

    ``spectra_cache`` maps (kernel id, ext shape) -> device spectrum; the
    caller owns it across the whole iteration loop so each kernel is
    forwarded ONCE per extended-chunk shape (mirrors the in-core driver's
    one-time spectra prep, src/multiviewnative.cpp:146-174)."""
    (lo, _, _), (hi, _, _) = halo_widths(kernel.shape)
    Z = vol.shape[0]
    for z0, z1 in _chunk_bounds(Z, chunk):
        bz = z1 - z0
        ext_z = bz + lo + hi
        key = (id(kernel), ext_z)
        k_hat = spectra_cache.get(key)
        if k_hat is None:
            k_hat = rfft3(
                wrap_kernel(jnp.asarray(kernel), (ext_z,) + vol.shape[1:])
            )
            spectra_cache[key] = k_hat
        ext = jnp.asarray(_gather_extended(vol, z0, z1, lo, hi))
        out[z0:z1] = np.asarray(_convolve_chunk(ext, k_hat, bz, lo))
    return out


def deconvolve_streamed(
    psi: np.ndarray,
    views: Sequence[np.ndarray],
    kernels1: Sequence[np.ndarray],
    kernels2: Sequence[np.ndarray],
    weights: Sequence[np.ndarray],
    num_iterations: int,
    lam: float = 0.0,
    min_value: float = 1e-4,
    chunk_z: int = 64,
) -> np.ndarray:
    """Host-resident multi-view RL; device sees only Z-chunks.

    Exact same math as deconv.rl.deconvolve(view_order='sequential') — the
    acceptance contract of the reference's interleaved mode
    (tests/test_gpu_deconvolve_impl.cu compares both strategies to the same
    goldens)."""
    psi = np.array(psi, np.float32, copy=True)
    scratch = np.empty_like(psi)
    scratch2 = np.empty_like(psi)

    quot = jax.jit(lambda v, b: v * (1.0 / b))
    upd = jax.jit(
        lambda p, i, w: rl_update(p, i, w, lam, min_value),
        static_argnums=(),
    )

    # materialize kernels ONCE so the spectra cache keys stay stable across
    # the whole run (spectra are forwarded once per kernel x chunk shape)
    k1s = [np.asarray(k, np.float32) for k in kernels1]
    k2s = [np.asarray(k, np.float32) for k in kernels2]
    spectra_cache: dict = {}

    for _ in range(num_iterations):
        for v in range(len(views)):
            # 1. blurred = psi (x) k1   (into scratch)
            _streamed_convolve(psi, k1s[v], chunk_z, scratch, spectra_cache)
            # 2. quotient = view / blurred (chunked elementwise)
            for z0, z1 in _chunk_bounds(psi.shape[0], chunk_z):
                scratch[z0:z1] = np.asarray(
                    quot(jnp.asarray(views[v][z0:z1]), jnp.asarray(scratch[z0:z1]))
                )
            # 3. integral = quotient (x) k2 (into scratch2)
            _streamed_convolve(scratch, k2s[v], chunk_z, scratch2, spectra_cache)
            # 4. psi update (chunked elementwise)
            for z0, z1 in _chunk_bounds(psi.shape[0], chunk_z):
                psi[z0:z1] = np.asarray(
                    upd(
                        jnp.asarray(psi[z0:z1]),
                        jnp.asarray(scratch2[z0:z1]),
                        jnp.asarray(weights[v][z0:z1]),
                    )
                )
    return psi
