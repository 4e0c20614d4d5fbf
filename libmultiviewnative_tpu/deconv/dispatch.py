"""Execution-strategy dispatch: in-core / mesh-sharded / streamed.

TPU-native recast of the reference's GPU dispatch heuristic
(/root/reference/src/multiviewnative.cu:89-142): it chose all-on-device iff
``(4V+2)*stack + fft_workarea < 0.9*GMEM``, else PCIe streaming, else
refused.  Here the ladder is:

  1. fits on one chip              -> deconvolve_jit (in-core)
  2. >1 device and fits per-shard  -> deconvolve_sharded over ('view','z')
  3. otherwise                     -> deconvolve_streamed (host-resident)

The decision is logged under LMVN_TRACE like the reference's stdout notice
(multiviewnative.cu:120-124).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np

from ..utils.trace import trace_print
from .rl import deconvolve_jit
from .streamed import deconvolve_streamed
from .workspace import MultiViewData


def estimate_workspace_bytes(data: MultiViewData, algorithm: str = "fft") -> int:
    """Device-resident working set of the in-core RL program.

    Counts: stacked views+weights (2V), both kernel spectrum sets (~2V
    volume-equivalents: rfft half-spectrum complex64 == one f32 volume per
    kernel per view), psi/integral/FFT temporaries (~8 volumes) — the
    analog of the reference's ``(4V+2)*stack + workarea`` arithmetic."""
    vol = 4 * math.prod(data.spatial_shape)
    V = data.num_views
    spectra = 2 * V * vol  # c64 at (Z, Y, X/2+1) ~= one f32 volume each
    return (2 * V) * vol + spectra + 8 * vol


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
    chunk_z: int = 64,
    adjoint_kernel2: bool = False,
    elementwise: str = "jnp",
):
    """Run RL with the best strategy for the problem size and device fleet."""
    est = estimate_workspace_bytes(data)
    if adjoint_kernel2:
        est -= data.num_views * 4 * math.prod(data.spatial_shape)
    cap = int(headroom * device_capacity_bytes())
    n_dev = jax.device_count()

    if est < cap:
        trace_print(
            f"dispatch: in-core (est {est>>20} MiB < {cap>>20} MiB)"
        )
        return deconvolve_jit(
            psi, data, num_iterations=num_iterations, lam=lam,
            min_value=min_value, algorithm=algorithm,
            adjoint_kernel2=adjoint_kernel2, elementwise=elementwise,
        )

    if n_dev > 1 and est < cap * n_dev:
        from ..parallel.sharded import deconvolve_sharded_jit, make_mesh, shard_workspace

        V, Z = data.num_views, data.spatial_shape[0]
        vp = math.gcd(V, n_dev)
        zp = n_dev // vp
        while Z % zp and zp > 1:  # shrink until the z axis divides
            zp -= 1
        mesh = make_mesh(view_parallel=vp, z_parallel=zp)
        trace_print(
            f"dispatch: sharded mesh view={vp} z={zp} "
            f"(est {est>>20} MiB over {n_dev} devices)"
        )
        psi_s, data_s = shard_workspace(data, psi, mesh)
        return deconvolve_sharded_jit(
            psi_s, data_s, num_iterations=num_iterations, mesh=mesh, lam=lam,
            min_value=min_value,
        )

    trace_print(f"dispatch: streamed (est {est>>20} MiB > {cap>>20} MiB)")
    views = [np.asarray(data.views[v]) for v in range(data.num_views)]
    k1 = [np.asarray(data.kernel1[v]) for v in range(data.num_views)]
    k2 = [np.asarray(data.kernel2[v]) for v in range(data.num_views)]
    ws = [np.asarray(data.weights[v]) for v in range(data.num_views)]
    return deconvolve_streamed(
        np.asarray(psi), views, k1, k2, ws, num_iterations, lam, min_value,
        chunk_z=chunk_z,
    )
