"""Strategy-dispatch tests (reference heuristic analog,
src/multiviewnative.cu:89-142): the three rungs must all produce the same
result, and the estimator must pick sensibly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libmultiviewnative_tpu.deconv.dispatch import (
    deconvolve_auto,
    device_capacity_bytes,
    estimate_workspace_bytes,
)
from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
from libmultiviewnative_tpu.deconv.workspace import MultiViewData
from libmultiviewnative_tpu.reference.oracle import rms
from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel


def _data(rng, V=2, shape=(16, 8, 8)):
    views = rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)
    k1 = np.stack([gaussian_kernel((3, 3, 3), 1.0 + 0.2 * v) for v in range(V)])
    return MultiViewData(
        views=jnp.asarray(views),
        kernel1=jnp.asarray(k1),
        kernel2=jnp.asarray(np.flip(k1, axis=(1, 2, 3)).copy()),
        weights=jnp.full((V,) + shape, 1.0 / V, jnp.float32),
    )


def test_estimator_scales_with_views_and_volume(rng):
    small = estimate_workspace_bytes(_data(rng, V=2, shape=(8, 8, 8)))
    more_views = estimate_workspace_bytes(_data(rng, V=4, shape=(8, 8, 8)))
    bigger = estimate_workspace_bytes(_data(rng, V=2, shape=(16, 8, 8)))
    assert more_views > small and bigger > small


def test_capacity_positive():
    assert device_capacity_bytes() > 0


def test_auto_incore_matches_reference_path(rng):
    data = _data(rng)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    got = np.asarray(deconvolve_auto(psi0.copy(), data, 2, lam=0.006))
    want = np.asarray(deconvolve_jit(psi0.copy(), data, 2, lam=0.006))
    # auto picks the dft engine at this size; engines agree to transform
    # precision, not bitwise
    assert rms(got, want) < 1e-4


def test_auto_streamed_rung_matches(rng, monkeypatch):
    # force the streamed rung by shrinking the believed capacity
    import libmultiviewnative_tpu.deconv.dispatch as dd

    monkeypatch.setattr(dd, "device_capacity_bytes", lambda device=None: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    data = _data(rng)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    got = np.asarray(deconvolve_auto(psi0.copy(), data, 2, lam=0.006, chunk_z=8))
    want = np.asarray(deconvolve_jit(psi0.copy(), data, 2, lam=0.006))
    assert rms(got, want) < 1e-5


def test_auto_sharded_rung_matches(rng, monkeypatch):
    # force the sharded rung: capacity tiny but fleet big enough
    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng)
    est = estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 4)
    )
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    got = np.asarray(deconvolve_auto(psi0.copy(), data, 2, lam=0.006))
    # sharded runs the simultaneous view order — compare to that
    want = np.asarray(
        deconvolve_jit(
            psi0.copy(), data, 2, lam=0.006, view_order="simultaneous"
        )
    )
    assert rms(got, want) < 1e-4


def test_auto_streamed_honors_adjoint_kernel2(rng, monkeypatch):
    """Regression: adjoint_kernel2 must not be dropped when dispatch falls
    to the streamed rung (a stale data.kernel2 must stay ignored)."""
    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng)  # (3,3,3) kernels - odd, adjoint-eligible
    # poison kernel2 so using it would visibly change the result
    poisoned = MultiViewData(
        views=data.views,
        kernel1=data.kernel1,
        kernel2=jnp.ones_like(data.kernel2) / data.kernel2[0].size,
        weights=data.weights,
    )
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    want = np.asarray(
        deconvolve_jit(psi0.copy(), poisoned, 2, adjoint_kernel2=True)
    )
    monkeypatch.setattr(dd, "device_capacity_bytes", lambda device=None: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    got = np.asarray(
        deconvolve_auto(
            psi0.copy(), poisoned, 2, adjoint_kernel2=True, chunk_z=8
        )
    )
    assert rms(got, want) < 1e-5


def test_auto_mesh_factorization_falls_back_to_stream(rng, monkeypatch):
    """Regression: V=2 views, Z=15 (odd) on an 8-device fleet has no valid
    ('view','z') factorization — dispatch must stream, not crash."""
    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng, V=2, shape=(15, 8, 8))
    psi0 = jnp.full((15, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    est = dd.estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 2)
    )
    got = np.asarray(deconvolve_auto(psi0.copy(), data, 2, chunk_z=5))
    want = np.asarray(deconvolve_jit(psi0.copy(), data, 2))
    assert rms(got, want) < 1e-5


def test_model_view_order_honored_under_auto_dispatch(rng):
    from libmultiviewnative_tpu.models import RichardsonLucy

    data = _data(rng)
    model = RichardsonLucy(
        num_iterations=2, view_order="simultaneous", algorithm="fft",
        auto_dispatch=True,
    )
    got = np.asarray(model.run(data))
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    want = np.asarray(
        deconvolve_jit(psi0, data, 2, view_order="simultaneous")
    )
    assert rms(got, want) < 1e-6
