"""Execution-strategy dispatch: in-core / mesh-sharded / streamed.

TPU-native recast of the reference's GPU dispatch heuristic
(/root/reference/src/multiviewnative.cu:89-142): it chose all-on-device iff
``(4V+2)*stack + fft_workarea < 0.9*GMEM``, else PCIe streaming, else
refused.  Here the ladder is:

  1. fits on one chip              -> deconvolve_jit (in-core)
  2. >1 device and fits per-shard  -> deconvolve_sharded over ('view','z')
  3. psi+spectra fit, views don't  -> deconvolve_interleaved (psi on
                                      device, views streamed — the
                                      reference's interleaved design point)
  4. otherwise                     -> deconvolve_streamed (host-resident)

The decision is logged under LMVN_TRACE like the reference's stdout notice
(multiviewnative.cu:120-124).
"""

from __future__ import annotations

import math
import warnings
from typing import Optional

import jax
import numpy as np

from ..utils.trace import trace_print
from .rl import deconvolve_jit
from .streamed import deconvolve_streamed
from .workspace import MultiViewData


class DispatchDivergenceWarning(UserWarning):
    """A requested option cannot be honored on the selected execution rung
    and the delivered math differs from the request (e.g. a sequential
    view-order request served by the inherently simultaneous sharded rung)."""


def resolve_algorithm(algorithm: str, spatial_shape) -> str:
    """The engine 'auto' resolves to for a given spatial shape (mirrors
    deconv.rl.deconvolve's crossover: MXU DFT wins <= 256/axis on v5e;
    beyond that the fused Mosaic DFT-convolve where its layout
    constraints hold, else the XLA FFT op)."""
    if algorithm != "auto":
        return algorithm
    from .rl import fused_eligible

    if max(spatial_shape) >= 256 and fused_eligible(spatial_shape):
        return "fused"
    return "dft" if max(spatial_shape) <= 256 else "fft"


def estimate_workspace_bytes(data: MultiViewData, algorithm: str = "fft") -> int:
    """Device-resident working set of the in-core RL program.

    Counts: stacked views+weights (2V), both kernel spectrum sets, and
    psi/integral/FFT temporaries (~8 volumes) — the analog of the
    reference's ``(4V+2)*stack + workarea`` arithmetic
    (src/multiviewnative.cu:97-114).

    Engine-aware: the fft engine and the compact dft plan store hermitian
    half-spectra (complex64 at (Z, Y, X/2+1) ~= one f32 volume per kernel
    per view), but the long-axis dft engine (any axis > 256, FullDFTPlan)
    keeps FULL split-complex spectra = 2 f32 volumes per kernel per view."""
    spatial = data.spatial_shape
    vol = 4 * math.prod(spatial)
    V = data.num_views
    algo = resolve_algorithm(algorithm, spatial)
    spectrum_vols = 1
    if algo == "dft" and max(spatial) > 256:
        spectrum_vols = 2  # FullDFTPlan: full spectrum, split re/im
    elif algo == "fused":
        spectrum_vols = 2  # (Kx, Q, M) split re/im ~= 2 f32 volumes
    elif algo == "direct":
        spectrum_vols = 0  # kernels stay spatial (negligible vs volumes)
    spectra = 2 * V * spectrum_vols * vol
    return (2 * V) * vol + spectra + 8 * vol


def estimate_interleaved_bytes(data: MultiViewData, algorithm: str = "auto") -> int:
    """Device working set of the interleaved rung (deconv.interleaved):
    psi + 3 temporaries + the current and prefetched view's chunk uploads
    (the cross-view kick) + both kernel-spectrum sets — views/weights
    stay host-resident and stream through in chunks."""
    spatial = data.spatial_shape
    vol = 4 * math.prod(spatial)
    V = data.num_views
    from .interleaved import _resolve_engine

    algo = _resolve_engine(
        algorithm if algorithm in ("fft", "dft", "fused", "auto") else "auto",
        spatial,
    )
    # fused (Kxp, Q, M) split re/im and long-axis FullDFTPlan spectra are
    # ~2 f32 volumes per kernel per view; hermitian half-spectra ~1
    spectrum_vols = (
        2 if algo == "fused" or (algo == "dft" and max(spatial) > 256) else 1
    )
    return (6 + 2 * V * spectrum_vols) * vol


def device_capacity_bytes(device=None) -> int:
    d = device or jax.devices()[0]
    try:
        limit = int(d.memory_stats().get("bytes_limit", 0))
    except Exception:
        limit = 0
    if limit <= 0:
        # capacity unknown (e.g. CPU or tunneled device): assume 16 GiB HBM
        # (v5e) so the policy remains deterministic
        limit = 16 * 1024**3
    return limit


def deconvolve_auto(
    psi,
    data: MultiViewData,
    num_iterations: int,
    lam: float = 0.0,
    min_value: float = 1e-4,
    algorithm: str = "auto",
    headroom: float = 0.9,
    chunk_z="auto",
    adjoint_kernel2: bool = False,
    elementwise: str = "jnp",
    view_order: str = "sequential",
    strict: bool = False,
):
    """Run RL with the best strategy for the problem size and device fleet.

    Option fidelity contract:
      * ``algorithm`` and ``elementwise`` are forwarded to every rung
        (in-core, sharded, interleaved, streamed); the interleaved rung
        supports fft/dft/fused engines (an explicit 'direct' request skips
        it); the sharded rung supports fft/dft/fused (fused whenever the
        shard geometry meets the Mosaic layout constraints, see
        parallel.sharded.sharded_fused_eligible — ineligible fused
        requests diverge loudly to the rung's 'auto', as do explicit
        'fused' requests on the streamed rung).
      * ``adjoint_kernel2``: the sharded/streamed rungs (which consume
        spatial kernels) receive a materialized flip(kernel1) in place of
        data.kernel2 — equivalent to the in-core conjugate-spectrum path
        (odd kernel dims enforced, matching the in-core guard).
      * view_order: a too-big SEQUENTIAL request first tries a z-only
        mesh, where the reference's exact view loop runs over z-sharded
        overlap-save convolves — parity math at scale, no divergence
        (round-5).  Only when Z has no legal z-only factorization do the
        loud divergences apply: the view-sharded mesh rung is inherently
        simultaneous, the streamed rung inherently sequential.  A request
        the selected rung cannot honor raises ``ValueError`` when
        ``strict=True``, else emits a :class:`DispatchDivergenceWarning`
        and runs the rung's native order.
    """
    import jax.numpy as jnp

    est = estimate_workspace_bytes(data, algorithm)
    if adjoint_kernel2:
        # Engine-aware discount: the split-spectrum engines (fused, or dft
        # beyond the 256 dense limit) share the re part between k1 and
        # conj(k1) and only re-materialize the negated im -> one f32 volume
        # saved per view.  The fft engine (and the compact dft plan) still
        # materializes a full conj(k1) half-spectrum per view, so assuming
        # a saving there would undercount by ~V*vol right at the capacity
        # boundary (advisor, round 2).
        algo = resolve_algorithm(algorithm, data.spatial_shape)
        split_spectra = algo == "fused" or (
            algo == "dft" and max(data.spatial_shape) > 256
        )
        if split_spectra:
            est -= data.num_views * 4 * math.prod(data.spatial_shape)
        if any(int(d) % 2 == 0 for d in data.kernel1.shape[-3:]):
            raise ValueError(
                "adjoint_kernel2 requires odd kernel1 dims; got "
                f"{tuple(data.kernel1.shape[-3:])}"
            )
    cap = int(headroom * device_capacity_bytes())
    n_dev = jax.device_count()

    if view_order == "simultaneous":
        from .workspace import check_simultaneous_weights

        check_simultaneous_weights(data.weights)

    def diverge(msg: str):
        if strict:
            raise ValueError(msg + " (strict=True)")
        warnings.warn(msg, DispatchDivergenceWarning, stacklevel=3)

    if est < cap:
        trace_print(
            f"dispatch: in-core (est {est>>20} MiB < {cap>>20} MiB)"
        )
        return deconvolve_jit(
            psi, data, num_iterations=num_iterations, lam=lam,
            min_value=min_value, algorithm=algorithm,
            adjoint_kernel2=adjoint_kernel2, elementwise=elementwise,
            view_order=view_order,
        )

    def demote(rung: str, supported: tuple) -> str:
        """Each off-core rung runs its own per-shard/per-chunk engines; a
        requested engine the rung cannot honor (e.g. the fused Mosaic
        kernel on the sharded rung, or 'direct' where only spectral
        engines exist) diverges LOUDLY to the rung's 'auto' selection."""
        if algorithm in supported:
            return algorithm
        diverge(
            f"deconvolve_auto selected the {rung} rung, where "
            f"algorithm={algorithm!r} is not available — falling back to "
            "the rung's 'auto' engine selection."
        )
        return "auto"

    if adjoint_kernel2:
        # the remaining rungs consume spatial kernel2 stacks directly
        data = MultiViewData(
            views=data.views,
            kernel1=data.kernel1,
            kernel2=jnp.flip(data.kernel1, axis=(-3, -2, -1)),
            weights=data.weights,
        )

    if n_dev > 1 and view_order == "sequential" and est < cap * n_dev:
        # Reference-parity math at scale (round-5): a too-big SEQUENTIAL
        # request routes to a z-only mesh FIRST — the exact reference view
        # loop (/root/reference/src/multiviewnative.cpp:191-228) over
        # z-sharded overlap-save convolves, no divergence, no warning.
        # Only when no z-only factorization exists does the request fall
        # through to the simultaneous mesh (loud divergence) or the
        # sequential streaming rungs.
        from ..core.shapes import halo_widths

        (lo1, _, _), (hi1, _, _) = halo_widths(data.kernel1.shape[-3:])
        (lo2, _, _), (hi2, _, _) = halo_widths(data.kernel2.shape[-3:])
        halo = max(lo1, hi1, lo2, hi2)
        mesh = _pick_zonly_mesh(
            data.spatial_shape[0], n_dev, halo, est, cap
        )
        if mesh is not None:
            from ..parallel.sharded import (
                deconvolve_sharded_jit,
                shard_workspace,
                sharded_fused_eligible,
            )

            supported = ("fft", "dft", "auto") + (
                ("fused",)
                if sharded_fused_eligible(data.spatial_shape, mesh)
                else ()
            )
            if algorithm in supported:
                trace_print(
                    f"dispatch: sequential parity on z-only mesh "
                    f"{dict(mesh.shape)} (est {est>>20} MiB over "
                    f"{mesh.shape['z']} devices)"
                )
                psi_s, data_s = shard_workspace(data, psi, mesh)
                return deconvolve_sharded_jit(
                    psi_s, data_s, num_iterations=num_iterations, mesh=mesh,
                    lam=lam, min_value=min_value, algorithm=algorithm,
                    elementwise=elementwise, view_order="sequential",
                )
            # an engine this rung cannot honor (e.g. 'direct') falls
            # THROUGH — the sequential streaming rungs below honor both
            # the view order and the engine, which beats demoting here
            # (round-5 review: demoting lost fidelity a lower rung had)
            trace_print(
                f"dispatch: z-only mesh cannot honor algorithm="
                f"{algorithm!r}; trying lower rungs"
            )
        else:
            trace_print(
                "dispatch: no z-only factorization for the sequential "
                "request"
            )

    if n_dev > 1 and est < cap * n_dev:
        mesh = _pick_mesh(data.num_views, data.spatial_shape[0], n_dev)
        if mesh is not None:
            from ..parallel.sharded import deconvolve_sharded_jit, shard_workspace

            if view_order == "sequential":
                diverge(
                    "deconvolve_auto selected the mesh-sharded rung, which "
                    "computes the SIMULTANEOUS view-order update — the "
                    "requested sequential (reference-parity) math will "
                    "differ.  Pass view_order='simultaneous' to opt in "
                    "silently, or strict=True to forbid."
                )
                # the delivered math is simultaneous either way, so the
                # unnormalized-weights audit must run here, EAGERLY — the
                # in-rung check is skipped under jit (tracer weights)
                from .workspace import check_simultaneous_weights

                check_simultaneous_weights(data.weights)
            trace_print(
                f"dispatch: sharded mesh {dict(mesh.shape)} "
                f"(est {est>>20} MiB over {n_dev} devices)"
            )
            # the fused Mosaic engine now rides the mesh (view-sharded
            # full volumes or %8-padded z-block overlap-save) — honor an
            # explicit request whenever the shard geometry is eligible,
            # matching the reference's one-engine-serves-every-strategy
            # contract (inc/gpu_convolve.cuh:113-142)
            from ..parallel.sharded import sharded_fused_eligible

            supported = ("fft", "dft", "auto") + (
                ("fused",)
                if sharded_fused_eligible(data.spatial_shape, mesh)
                else ()
            )
            psi_s, data_s = shard_workspace(data, psi, mesh)
            return deconvolve_sharded_jit(
                psi_s, data_s, num_iterations=num_iterations, mesh=mesh,
                lam=lam, min_value=min_value,
                algorithm=demote("mesh-sharded", supported),
                elementwise=elementwise,
            )
        trace_print("dispatch: no valid mesh factorization; streaming")

    views = [np.asarray(data.views[v]) for v in range(data.num_views)]
    k1 = [np.asarray(data.kernel1[v]) for v in range(data.num_views)]
    k2 = [np.asarray(data.kernel2[v]) for v in range(data.num_views)]

    est_il = estimate_interleaved_bytes(data, algorithm)
    if algorithm != "direct" and est_il < cap:
        # interleaved rung: psi device-resident, views streamed — the
        # reference's interleaved mode design point (sequential math, so a
        # simultaneous request diverges; fft/dft/fused engines and both
        # elementwise modes are honored)
        if view_order == "simultaneous":
            diverge(
                "deconvolve_auto selected the interleaved rung, which runs "
                "the SEQUENTIAL view order — the requested simultaneous "
                "math will differ."
            )
        trace_print(
            f"dispatch: interleaved (est {est_il>>20} MiB device-resident, "
            f"views streamed; in-core would need {est>>20} MiB)"
        )
        from .interleaved import deconvolve_interleaved

        ws_il = [
            np.asarray(data.weights[v]) for v in range(data.num_views)
        ]
        ck = 64 if chunk_z == "auto" else chunk_z
        return jnp.asarray(
            deconvolve_interleaved(
                np.asarray(psi), views, k1, k2, ws_il, num_iterations,
                lam=lam, min_value=min_value, chunk_z=ck,
                algorithm=algorithm, elementwise=elementwise,
            )
        )

    trace_print(f"dispatch: streamed (est {est>>20} MiB > {cap>>20} MiB)")
    if view_order == "simultaneous":
        diverge(
            "deconvolve_auto selected the streamed rung, which runs the "
            "SEQUENTIAL view order — the requested simultaneous math will "
            "differ."
        )
    ws = [
        np.asarray(jnp.broadcast_to(data.weights[v], data.spatial_shape))
        for v in range(data.num_views)
    ]
    return deconvolve_streamed(
        np.asarray(psi), views, k1, k2, ws, num_iterations, lam, min_value,
        chunk_z=chunk_z,
        algorithm=demote("streamed", ("fft", "dft", "direct", "auto")),
        elementwise=elementwise,
    )


def _pick_zonly_mesh(Z: int, n_dev: int, halo: int, est: int, cap: int):
    """Largest z-only ('view'=1) mesh that divides Z, respects the PSF
    halo (Bz >= halo, the overlap-save legality bound), and gives the
    estimated working set enough aggregate capacity; None if none does."""
    from ..parallel.sharded import make_mesh

    for zp in range(n_dev, 1, -1):
        if Z % zp or (Z // zp) < max(halo, 1):
            continue
        if est >= cap * zp:
            continue
        return make_mesh(
            view_parallel=1, z_parallel=zp,
            devices=np.asarray(jax.devices()[:zp]),
        )
    return None


def _pick_mesh(V: int, Z: int, n_dev: int):
    """Choose a ('view','z') factorization vp*zp == n_dev with V % vp == 0
    and Z % zp == 0; None if no factorization exists (caller streams)."""
    from ..parallel.sharded import make_mesh

    best = None
    for vp in range(1, n_dev + 1):
        if n_dev % vp:
            continue
        zp = n_dev // vp
        if V % vp == 0 and Z % zp == 0:
            # prefer more view-parallelism (cheapest collective pattern)
            if best is None or vp > best[0]:
                best = (vp, zp)
    if best is None:
        return None
    return make_mesh(view_parallel=best[0], z_parallel=best[1])
