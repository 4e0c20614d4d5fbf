"""PSF utilities: adjoint kernels and Preibisch-style compound kernels.

The reference consumes ``kernel2`` ("conditional pdf of all views for view
v", /root/reference/tests/tiff_fixtures.hpp:21-24) as an INPUT precomputed
by the Java plugin — the library never derives it.  For a self-contained
framework we provide the derivations:

  * ``adjoint``: P_v^* (the mirrored PSF) — plain per-view RL.
  * ``efficient``: P_v^* compounded with the other views' PSF
    autocorrelations (P_w^* (x) P_w), in the "virtual view" family of
    Preibisch et al., Efficient Bayesian-based multiview deconvolution
    (arXiv:1308.0730).  Compounding is a pointwise spectral product.
    NOTE: the plugin exposes several compounding variants (its
    optimization I/II); this implements the autocorrelation form, which
    trades per-iteration sharpening for stability.  It is validated
    behaviorally (normalized, converging), not bit-against the Java
    plugin — for plugin parity pass the plugin's own kernel2, which the
    deconvolve path consumes unchanged (the reference's contract).

All convolution-space compositions are computed as spectral products on a
support large enough to hold the full composition, then center-cropped to
the requested output support and L1-renormalized (PSFs are probability
kernels).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.shapes import as_shape


def flip_adjoint(psf: np.ndarray) -> np.ndarray:
    """P^* — mirror through the center: P^*(x) = P(-x)."""
    return np.flip(np.asarray(psf)).copy()


def normalize_l1(psf: np.ndarray) -> np.ndarray:
    psf = np.asarray(psf, np.float64)
    s = psf.sum()
    if s <= 0:
        raise ValueError("PSF has non-positive mass")
    return psf / s


def _spectral_compose(kernels: Sequence[np.ndarray], support) -> np.ndarray:
    """Convolve a list of kernels with each other: product of centered
    spectra on ``support`` (large enough that nothing wraps)."""
    from ..reference.numpy_ref import np_wrap_kernel

    support = as_shape(support)
    acc = None
    for k in kernels:
        spec = np.fft.rfftn(np_wrap_kernel(np.asarray(k, np.float64), support))
        acc = spec if acc is None else acc * spec
    out = np.fft.irfftn(acc, s=support, axes=tuple(range(len(support))))
    # composition is centered at the origin (wrapped); unwrap to center
    return np.fft.fftshift(out)


def _center_crop(vol: np.ndarray, shape) -> np.ndarray:
    shape = as_shape(shape)
    # keep the center voxel (index n//2) at out index s//2
    start = tuple((n // 2) - (s // 2) for n, s in zip(vol.shape, shape))
    sl = tuple(slice(st, st + s) for st, s in zip(start, shape))
    return vol[sl]


def compound_kernels(
    psfs: Sequence[np.ndarray],
    mode: str = "adjoint",
    output_shape: Optional[Tuple[int, int, int]] = None,
) -> List[np.ndarray]:
    """Derive kernel2 for every view from the per-view PSFs (kernel1).

    ``mode``: "adjoint" (plain RL) or "efficient" (virtual-view compound).
    ``output_shape`` defaults to each PSF's own support for "adjoint" and a
    slightly enlarged common support for "efficient" (the reference's data
    uses 25^3 kernel2 for 21^3 kernel1 — same idea of truncated support).
    """
    psfs = [normalize_l1(p) for p in psfs]
    if mode == "adjoint":
        outs = [flip_adjoint(p) for p in psfs]
        if output_shape is not None:
            from ..deconv.workspace import pad_kernel_to

            outs = [pad_kernel_to(o, output_shape) for o in outs]
        return [o.astype(np.float32) for o in outs]

    if mode != "efficient":
        raise ValueError(f"unknown compound mode {mode!r}")

    max_support = tuple(
        max(int(p.shape[d]) for p in psfs) for d in range(3)
    )
    if output_shape is None:
        output_shape = tuple(s + 4 for s in max_support)
    # full composition support: adjoint + (V-1) autocorrelations
    n_terms = 1 + 2 * (len(psfs) - 1)
    full = tuple(n_terms * (s - 1) + 1 for s in max_support)
    outs = []
    for v, pv in enumerate(psfs):
        terms = [flip_adjoint(pv)]
        for w, pw in enumerate(psfs):
            if w == v:
                continue
            terms += [flip_adjoint(pw), pw]  # autocorrelation P_w^* (x) P_w
        comp = _spectral_compose(terms, full)
        comp = np.clip(comp, 0.0, None)  # spectral ringing -> tiny negatives
        cropped = _center_crop(comp, output_shape)
        outs.append(normalize_l1(cropped).astype(np.float32))
    return outs
