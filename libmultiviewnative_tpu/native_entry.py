"""Python side of the native ABI bridge (native/src/bridge.cpp).

Receives raw buffer ADDRESSES from the C shim, wraps them as numpy arrays
without copying (ctypes), dispatches into the flat API, and writes results
back into the caller's memory — preserving the reference C ABI's in-place
mutation contract (/root/reference/inc/multiviewnative.h:43-55) across the
native boundary.

Not a public API: signatures here are the bridge wire format.
"""

from __future__ import annotations

import ctypes
from typing import List, Sequence, Tuple

import numpy as np

from . import api

_FLOATP = ctypes.POINTER(ctypes.c_float)


def _wrap(addr: int, dims: Sequence[int]) -> np.ndarray:
    """Wrap a raw float32 buffer address as a (z, y, x) numpy view (no copy;
    writes go to the caller's memory)."""
    shape = tuple(int(d) for d in dims)
    ptr = ctypes.cast(int(addr), _FLOATP)
    return np.ctypeslib.as_array(ptr, shape=shape)


def _wrap_flat(addr: int, size: int) -> np.ndarray:
    return np.ctypeslib.as_array(ctypes.cast(int(addr), _FLOATP), shape=(int(size),))


def inplace_deconvolve(
    psi_addr: int,
    psi_dims: Tuple[int, int, int],
    views: List[tuple],
    lambda_: float,
    min_value: float,
    num_iterations: int,
) -> None:
    """workspace deconvolution; views items are
    (img_addr, img_dims, k1_addr, k1_dims, k2_addr, k2_dims, w_addr, w_dims)."""
    psi = _wrap(psi_addr, psi_dims)
    images, k1s, k2s, ws = [], [], [], []
    for ia, idims, k1a, k1dims, k2a, k2dims, wa, wdims in views:
        images.append(_wrap(ia, idims))
        k1s.append(_wrap(k1a, k1dims))
        k2s.append(_wrap(k2a, k2dims))
        ws.append(_wrap(wa, wdims))
    out = api.deconvolve_flat(
        psi,
        images,
        k1s,
        k2s,
        ws,
        num_iterations=num_iterations,
        lambda_=lambda_,
        min_value=min_value,
    )
    psi[...] = out


def inplace_convolution(
    im_addr: int, im_dims, kernel_addr: int, kernel_dims
) -> None:
    im = _wrap(im_addr, im_dims)
    kernel = _wrap(kernel_addr, kernel_dims)
    im[...] = api.convolution3d(im, kernel)


def compute_quotient(input_addr: int, output_addr: int, size: int) -> None:
    """output = input / output (reference .h:84 pointer semantics)."""
    inp = _wrap_flat(input_addr, size)
    out = _wrap_flat(output_addr, size)
    out[...] = api.quotient_flat(inp, out)


def compute_final_values(
    image_addr: int,
    integral_addr: int,
    weight_addr: int,
    size: int,
    min_value: float,
    lambda_: float,
) -> None:
    psi = _wrap_flat(image_addr, size)
    integral = _wrap_flat(integral_addr, size)
    weight = _wrap_flat(weight_addr, size)
    psi[...] = api.final_values_flat(
        psi, integral, weight, lambda_=lambda_, min_value=min_value
    )


def iterate_fft_plain(
    input_addr: int, kernel_addr: int, output_addr: int, input_dims, kernel_dims
) -> None:
    """One RL view step; reference signature (.h:90) carries view data in
    ``input``, kernel1 doubling as kernel2's mirror (legacy single-kernel
    form).  The reference treats ``output`` as WRITE-ONLY and starts psi
    from the input buffer (src/multiviewnative.cu:463-465 copy input ->
    d_image_/d_initial_); mirroring that, psi0 = view — an uninitialized
    output buffer must not influence the result."""
    view = _wrap(input_addr, input_dims)
    kernel = _wrap(kernel_addr, kernel_dims)
    out = _wrap(output_addr, input_dims)
    weights = np.ones_like(view)
    psi0 = view.copy()
    out[...] = api.iterate_fft_plain(
        psi0, view, kernel, np.flip(kernel).copy(), weights
    )


def iterate_fft_tikhonov(
    input_addr: int,
    kernel_addr: int,
    output_addr: int,
    input_dims,
    kernel_dims,
    min_value: float,
    lambda_: float,
) -> None:
    """Tikhonov variant of :func:`iterate_fft_plain`; same write-only
    output contract (src/multiviewnative.cu:496-595)."""
    view = _wrap(input_addr, input_dims)
    kernel = _wrap(kernel_addr, kernel_dims)
    out = _wrap(output_addr, input_dims)
    weights = np.ones_like(view)
    psi0 = view.copy()
    out[...] = api.iterate_fft_tikhonov(
        psi0,
        view,
        kernel,
        np.flip(kernel).copy(),
        weights,
        lambda_=lambda_,
        min_value=min_value,
    )


get_num_devices = api.get_num_devices
get_device_name = api.get_device_name
get_device_mem = api.get_device_mem
select_device = api.select_device
