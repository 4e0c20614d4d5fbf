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
    # force the streamed rung by shrinking the believed capacity;
    # engine pinned so the comparison is engine-matched (algorithm='auto'
    # resolves per-chunk on the streamed rung)
    import libmultiviewnative_tpu.deconv.dispatch as dd

    monkeypatch.setattr(dd, "device_capacity_bytes", lambda device=None: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    data = _data(rng)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    got = np.asarray(
        deconvolve_auto(
            psi0.copy(), data, 2, lam=0.006, chunk_z=8, algorithm="fft"
        )
    )
    want = np.asarray(
        deconvolve_jit(psi0.copy(), data, 2, lam=0.006, algorithm="fft")
    )
    assert rms(got, want) < 1e-5


def test_streamed_rung_honors_algorithm_and_elementwise(rng, monkeypatch):
    """Option fidelity: algorithm='dft' must actually reach the streamed
    rung's chunk programs (observed via the kernel-operand preparation),
    the result must still match the in-core engine to overlap-save
    roundoff, and elementwise='pallas' must run (interpreter on CPU)."""
    import libmultiviewnative_tpu.deconv.dispatch as dd
    import libmultiviewnative_tpu.deconv.streamed as ds

    monkeypatch.setattr(dd, "device_capacity_bytes", lambda device=None: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    used_algos = set()
    real_operand = ds._kernel_operand

    def spy(kernel, ext_shape, algo, cache):
        used_algos.add(algo)
        return real_operand(kernel, ext_shape, algo, cache)

    monkeypatch.setattr(ds, "_kernel_operand", spy)
    data = _data(rng)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    got = np.asarray(
        deconvolve_auto(
            psi0.copy(), data, 2, lam=0.006, chunk_z=8, algorithm="dft"
        )
    )
    assert used_algos == {"dft"}
    want_dft = np.asarray(
        deconvolve_jit(psi0.copy(), data, 2, lam=0.006, algorithm="dft")
    )
    # overlap-save transforms run at extended-chunk extents, so agreement
    # is to f32 roundoff, not bitwise
    assert rms(got, want_dft) < 5e-5

    used_algos.clear()
    got_p = np.asarray(
        deconvolve_auto(
            psi0.copy(), data, 2, lam=0.006, chunk_z=8,
            algorithm="fft", elementwise="pallas",
        )
    )
    assert used_algos == {"fft"}
    want_fft = np.asarray(
        deconvolve_jit(psi0.copy(), data, 2, lam=0.006, algorithm="fft")
    )
    assert rms(got_p, want_fft) < 1e-5


def test_auto_sequential_routes_to_zonly_mesh(rng, monkeypatch):
    """Round-5: a too-big SEQUENTIAL request must scale on a z-only mesh
    with the reference's exact view loop — NO divergence warning — and
    match the single-device sequential (parity) result."""
    import warnings

    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng)
    est = estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 4)
    )
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", dd.DispatchDivergenceWarning)
        got = np.asarray(deconvolve_auto(psi0.copy(), data, 2, lam=0.006))
    want = np.asarray(
        deconvolve_jit(
            psi0.copy(), data, 2, lam=0.006, view_order="sequential"
        )
    )
    assert rms(got, want) < 1e-5


def test_auto_sharded_rung_matches(rng, monkeypatch):
    # force the view-sharded rung: capacity tiny but fleet big enough;
    # the z-only parity route is disabled to model a volume with no legal
    # z-only factorization
    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng)
    est = estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 4)
    )
    monkeypatch.setattr(dd, "_pick_zonly_mesh", lambda *a, **k: None)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    # a sequential request served by the (simultaneous) sharded rung must
    # warn LOUDLY — not just under LMVN_TRACE
    with pytest.warns(dd.DispatchDivergenceWarning):
        got = np.asarray(deconvolve_auto(psi0.copy(), data, 2, lam=0.006))
    # sharded runs the simultaneous view order — compare to that
    want = np.asarray(
        deconvolve_jit(
            psi0.copy(), data, 2, lam=0.006, view_order="simultaneous"
        )
    )
    assert rms(got, want) < 1e-4


def test_sharded_rung_honors_algorithm(rng, monkeypatch):
    """algorithm='dft' forwarded to the sharded rung (regression: it was
    silently dropped to 'fft' pre round 2).  The round-5 z-only parity
    route is disabled so the request lands on the VIEW-sharded rung."""
    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng)
    est = estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 4)
    )
    monkeypatch.setattr(dd, "_pick_zonly_mesh", lambda *a, **k: None)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    with pytest.warns(dd.DispatchDivergenceWarning):
        got = np.asarray(
            deconvolve_auto(psi0.copy(), data, 2, lam=0.006, algorithm="dft")
        )
    from libmultiviewnative_tpu.parallel.sharded import (
        deconvolve_sharded_jit,
        make_mesh,
        shard_workspace,
    )

    mesh = dd._pick_mesh(data.num_views, 16, jax.device_count())
    psi_s, data_s = shard_workspace(data, psi0.copy(), mesh)
    want = np.asarray(
        deconvolve_sharded_jit(
            psi_s, data_s, num_iterations=2, mesh=mesh, lam=0.006,
            algorithm="dft",
        )
    )
    assert rms(got, want) < 1e-6


def test_strict_mode_raises_on_divergence(rng, monkeypatch):
    import libmultiviewnative_tpu.deconv.dispatch as dd

    data = _data(rng)
    est = estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 4)
    )
    # no z-only factorization: the sequential request can only be served
    # by the simultaneous view-sharded mesh -> strict divergence
    monkeypatch.setattr(dd, "_pick_zonly_mesh", lambda *a, **k: None)
    psi0 = jnp.full((16, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    with pytest.raises(ValueError, match="SIMULTANEOUS"):
        deconvolve_auto(psi0.copy(), data, 2, strict=True)
    # simultaneous request on the streamed rung also diverges
    monkeypatch.setattr(dd, "device_capacity_bytes", lambda device=None: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    with pytest.raises(ValueError, match="SEQUENTIAL"):
        deconvolve_auto(
            psi0.copy(), data, 2, view_order="simultaneous", strict=True
        )


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
        deconvolve_jit(
            psi0.copy(), poisoned, 2, adjoint_kernel2=True, algorithm="fft"
        )
    )
    monkeypatch.setattr(dd, "device_capacity_bytes", lambda device=None: 1)
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    got = np.asarray(
        deconvolve_auto(
            psi0.copy(), poisoned, 2, adjoint_kernel2=True, chunk_z=8,
            algorithm="fft",
        )
    )
    assert rms(got, want) < 1e-5


def test_auto_mesh_factorization_falls_back_to_stream(rng, monkeypatch):
    """Regression: V=2 views, Z=15 (odd) on an 8-device fleet has no valid
    ('view','z') factorization — dispatch must stream, not crash.  (The
    round-5 z-only parity route is disabled here: Z=15 DOES have a 1x5
    z-only factorization, which is covered by its own test above.)"""
    import libmultiviewnative_tpu.deconv.dispatch as dd

    monkeypatch.setattr(dd, "_pick_zonly_mesh", lambda *a, **k: None)
    data = _data(rng, V=2, shape=(15, 8, 8))
    psi0 = jnp.full((15, 8, 8), float(jnp.mean(data.views)), jnp.float32)
    est = dd.estimate_workspace_bytes(data)
    monkeypatch.setattr(
        dd, "device_capacity_bytes", lambda device=None: int(est / 2)
    )
    got = np.asarray(
        deconvolve_auto(psi0.copy(), data, 2, chunk_z=5, algorithm="fft")
    )
    want = np.asarray(deconvolve_jit(psi0.copy(), data, 2, algorithm="fft"))
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


def test_resolve_algorithm_fused_crossover(monkeypatch):
    """'auto' routes: dft <= 256/axis; above that the fused Mosaic kernel
    when its layout constraints hold AND the backend is a real TPU; the
    fft engine otherwise (including always on the CPU test mesh)."""
    from libmultiviewnative_tpu.deconv import dispatch as dp
    from libmultiviewnative_tpu.deconv import rl

    assert dp.resolve_algorithm("auto", (256, 256, 256)) == "dft"
    assert dp.resolve_algorithm("dft", (512, 512, 512)) == "dft"
    # this suite runs on the CPU mesh: never fused
    assert dp.resolve_algorithm("auto", (512, 512, 512)) == "fft"

    monkeypatch.setattr(rl.jax, "default_backend", lambda: "tpu")
    assert dp.resolve_algorithm("auto", (512, 512, 512)) == "fused"
    # 256-class shapes route to fused too (measured 55.4 vs 50.6 it/s)
    assert dp.resolve_algorithm("auto", (256, 256, 256)) == "fused"
    assert dp.resolve_algorithm("auto", (128, 128, 128)) == "dft"
    # constraint violations fall back to fft
    assert dp.resolve_algorithm("auto", (300, 512, 512)) == "fft"  # Z%8
    assert dp.resolve_algorithm("auto", (512, 512, 511)) == "fft"  # odd X


def test_auto_fused_request_falls_back_off_incore(rng, monkeypatch):
    """algorithm='fused' is in-core-only: when dispatch leaves the in-core
    rung it must warn and fall back to per-rung auto, not crash."""
    import warnings as _w
    from libmultiviewnative_tpu.deconv.dispatch import DispatchDivergenceWarning

    data = _data(rng)
    psi0 = jnp.full(data.spatial_shape, 100.0, jnp.float32)
    monkeypatch.setattr(
        "libmultiviewnative_tpu.deconv.dispatch.device_capacity_bytes",
        lambda device=None: 1,
    )
    monkeypatch.setattr("jax.device_count", lambda: 1)
    with pytest.warns(DispatchDivergenceWarning):
        out = deconvolve_auto(
            psi0, data, num_iterations=2, algorithm="fused", chunk_z=8
        )
    ref = deconvolve_jit(psi0, data, num_iterations=2, algorithm="fft")
    assert rms(np.asarray(out), np.asarray(ref)) < 1e-4


def test_auto_interleaved_rung_matches(rng, monkeypatch):
    """Capacity between the interleaved estimate and the in-core estimate
    selects the interleaved rung (psi on device, views streamed), which
    must match the in-core sequential result."""
    from libmultiviewnative_tpu.deconv.dispatch import (
        estimate_interleaved_bytes,
    )
    import libmultiviewnative_tpu.deconv.interleaved as il

    data = _data(rng)
    psi0 = jnp.full(data.spatial_shape, 100.0, jnp.float32)
    est_il = estimate_interleaved_bytes(data, "fft")
    est_ic = estimate_workspace_bytes(data, "fft")
    assert est_il < est_ic
    cap = (est_il + est_ic) // 2

    called = {}
    orig = il.deconvolve_interleaved

    def spy(*a, **kw):
        called["yes"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(il, "deconvolve_interleaved", spy)
    monkeypatch.setattr(
        "libmultiviewnative_tpu.deconv.dispatch.device_capacity_bytes",
        lambda device=None: int(cap / 0.9) + 1,
    )
    monkeypatch.setattr("jax.device_count", lambda: 1)
    out = deconvolve_auto(
        psi0, data, num_iterations=2, algorithm="fft", chunk_z=8
    )
    assert called.get("yes")
    ref = deconvolve_jit(psi0, data, num_iterations=2, algorithm="fft")
    assert rms(np.asarray(out), np.asarray(ref)) < 1e-4


def test_fused_honored_on_interleaved_rung(rng, monkeypatch):
    """The interleaved rung supports the fused engine: an explicit
    'fused' request served there must pass through with NO divergence
    warning (and match the in-core fused result)."""
    import warnings as _w

    from libmultiviewnative_tpu.deconv.dispatch import (
        DispatchDivergenceWarning,
        estimate_interleaved_bytes,
    )

    data = _data(rng)
    psi0 = jnp.full(data.spatial_shape, 100.0, jnp.float32)
    est_il = estimate_interleaved_bytes(data, "fused")
    est_ic = estimate_workspace_bytes(data, "fused")
    cap = (est_il + est_ic) // 2
    monkeypatch.setattr(
        "libmultiviewnative_tpu.deconv.dispatch.device_capacity_bytes",
        lambda device=None: int(cap / 0.9) + 1,
    )
    monkeypatch.setattr("jax.device_count", lambda: 1)
    with _w.catch_warnings():
        _w.simplefilter("error", DispatchDivergenceWarning)
        out = deconvolve_auto(
            psi0, data, num_iterations=2, algorithm="fused", chunk_z=8
        )
    ref = deconvolve_jit(psi0, data, num_iterations=2, algorithm="fused")
    assert rms(np.asarray(out), np.asarray(ref)) < 1e-4


def test_sharded_rung_rejects_unsupported_engine(rng):
    """deconvolve_sharded must not silently serve 'direct'/typos with the
    fft path ('fused' is a supported mesh engine since round 4; its shape
    gating is covered in test_sharded.py)."""
    from libmultiviewnative_tpu.parallel.sharded import (
        deconvolve_sharded,
        make_mesh,
        shard_workspace,
    )

    data = _data(rng, V=2, shape=(16, 8, 8))
    psi0 = jnp.full((16, 8, 8), 100.0, jnp.float32)
    mesh = make_mesh(view_parallel=2, z_parallel=4)
    psi_s, data_s = shard_workspace(data, psi0, mesh)
    for bad in ("direct", "dtf"):
        with pytest.raises(ValueError, match="sharded rung supports"):
            deconvolve_sharded(psi_s, data_s, 1, mesh, algorithm=bad)


def test_sequential_to_sharded_runs_weight_audit(rng, monkeypatch):
    """A sequential request diverted to the (simultaneous) sharded rung
    must run the unnormalized-weights audit EAGERLY at dispatch — the
    in-rung check is skipped under jit."""
    from libmultiviewnative_tpu.deconv.dispatch import DispatchDivergenceWarning
    from libmultiviewnative_tpu.deconv.workspace import (
        WeightNormalizationWarning,
    )

    V, shape = 2, (16, 8, 8)
    data = _data(rng, V=V, shape=shape)
    bad = MultiViewData(
        views=data.views,
        kernel1=data.kernel1,
        kernel2=data.kernel2,
        weights=jnp.full((V,) + shape, 1.0, jnp.float32),  # sums to 2
    )
    psi0 = jnp.full(shape, 100.0, jnp.float32)
    est_ic = estimate_workspace_bytes(bad, "auto")
    monkeypatch.setattr(
        "libmultiviewnative_tpu.deconv.dispatch.device_capacity_bytes",
        lambda device=None: int(est_ic / 2),
    )
    import libmultiviewnative_tpu.deconv.dispatch as dd

    # disable the z-only parity route: this test pins the DIVERGENCE path
    monkeypatch.setattr(dd, "_pick_zonly_mesh", lambda *a, **k: None)
    with pytest.warns(WeightNormalizationWarning):
        with pytest.warns(DispatchDivergenceWarning):
            deconvolve_auto(
                psi0, bad, num_iterations=1, view_order="sequential"
            )
