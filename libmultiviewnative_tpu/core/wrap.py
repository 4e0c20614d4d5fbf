"""Kernel wrapping and image embedding as pure, jittable XLA functions.

This replaces the reference's element-by-element host loops
(``wrapped_insert_at_point`` /root/reference/inc/padd_utils.h:11-40,
``zero_padd::insert_at_offsets`` :179-194) with static ``jnp.pad`` /
``jnp.roll`` graphs that XLA traces once per shape and fuses.

Semantics (bit-for-bit vs the reference):
  wrapped target[(i - k//2) mod extents] = kernel[i]
i.e. the kernel's center voxel lands at index 0 of the target and the
"negative" half wraps to the far end — the classic ifftshift placement used
so that FFT convolution introduces no spatial shift.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .shapes import as_shape, kernel_center


def wrap_kernel(kernel: jnp.ndarray, extents: Sequence[int]) -> jnp.ndarray:
    """Embed ``kernel`` into a zeros(extents) buffer with its center at origin.

    Equivalent to /root/reference/inc/padd_utils.h:11-40: place the kernel at
    the low corner, then circularly roll by -center along every axis.
    Requires extents[d] >= kernel.shape[d].
    """
    extents = as_shape(extents)
    kshape = kernel.shape
    if len(extents) != kernel.ndim:
        raise ValueError(f"rank mismatch: kernel {kshape} vs extents {extents}")
    if any(e < k for e, k in zip(extents, kshape)):
        # kernel support exceeds the target extent: circular convolution
        # aliases the kernel, target[(i - c) mod e] += kernel[i].  Fold by
        # padding each axis up to a multiple of its extent and summing the
        # period blocks.  (The reference's element loop would write out of
        # bounds here; we define the mathematically consistent behavior.)
        ndim = kernel.ndim
        pad = [(0, -int(k) % e) for e, k in zip(extents, kshape)]
        buf = jnp.pad(kernel, pad)
        folded_shape = []
        for e, p in zip(extents, buf.shape):
            folded_shape.extend((p // e, e))
        buf = buf.reshape(folded_shape).sum(axis=tuple(range(0, 2 * ndim, 2)))
    else:
        pad = [(0, e - k) for e, k in zip(extents, kshape)]
        buf = jnp.pad(kernel, pad)
    shifts = tuple(-(c % e) for c, e in zip(kernel_center(kshape), extents))
    return jnp.roll(buf, shifts, axis=tuple(range(kernel.ndim)))


def embed_at_offsets(
    image: jnp.ndarray, extents: Sequence[int], offsets: Sequence[int]
) -> jnp.ndarray:
    """Zero-embed ``image`` into an extents-sized buffer at ``offsets``.

    Parity: ``zero_padd::insert_at_offsets`` /root/reference/inc/padd_utils.h:179-194
    (and the trivial ``no_padd`` case when extents == image.shape, offsets == 0).
    """
    extents, offsets = as_shape(extents), as_shape(offsets)
    pad = [
        (o, e - o - s) for o, e, s in zip(offsets, extents, image.shape)
    ]
    for d, (lo, hi) in enumerate(pad):
        if lo < 0 or hi < 0:
            raise ValueError(
                f"image {image.shape} + offsets {offsets} exceeds extents "
                f"{extents} along axis {d}"
            )
    return jnp.pad(image, pad)


def crop_at_offsets(
    padded: jnp.ndarray, shape: Sequence[int], offsets: Sequence[int]
) -> jnp.ndarray:
    """Crop the ROI back out of the padded buffer.

    Parity: the subview assignment at /root/reference/inc/cpu_convolve.h:191-201.
    """
    shape, offsets = as_shape(shape), as_shape(offsets)
    slices = tuple(slice(o, o + s) for o, s in zip(offsets, shape))
    return padded[slices]
