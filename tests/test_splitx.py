"""Hermitian DIF-split x stages (LMVN_FUSED_SPLITX, round 5).

The 512-class x transform is the remaining dense N^2 matmul of the fused
chain (round-4 FLOP accounting: dense x ~72% of A/C-pass FLOPs, fold
halves it).  The split-x mode decomposes X = 4x128 decimation-in-frequency
with per-q twiddle-FOLDED stage matrices — same recipe as the y/z split
stages — and exploits the real-input hermitian structure: blocks q=0 and
q=2 have REAL inputs (one packed real matmul each), block q=3 is the
conjugate mirror of block q=1 (computed once, full M rows).  MXU cost
~1.6x below fold mode; the x-frequency rows land in a PERMUTED block
order that the kernel spectrum (forwarded by the same pipeline) matches
automatically.

Gate: X >= 256 with X/4 % 16 == 0 (the row-layout invariant; measured
wins at both the 256- and 512-class bench configs); other X fall back
to fold/dense.  Env knob
LMVN_FUSED_SPLITX, trace-time, fingerprinted into the public drivers'
jit keys like every fused knob.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel


@pytest.fixture(autouse=True)
def _clear_caches():
    """Plan + jit caches must not leak splitx layouts across tests."""
    import jax

    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import make_fused_plan

    yield
    make_fused_plan.cache_clear()
    jax.clear_caches()


def _convolve(shape, rng, monkeypatch, splitx, kshape=(5, 5, 5)):
    import jax

    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_spectrum,
        kernel_spectrum_fused,
        make_fused_plan,
    )

    del rng  # fixed seed: A/B calls must see IDENTICAL data
    monkeypatch.setenv("LMVN_FUSED_SPLITX", "1" if splitx else "0")
    make_fused_plan.cache_clear()
    jax.clear_caches()
    x = (np.random.default_rng(42).normal(size=shape) + 3.0).astype(
        np.float32
    )
    k = gaussian_kernel(kshape, 1.1)
    kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape)
    got = np.asarray(
        fused_convolve_spectrum(jnp.asarray(x), kre, kim, interpret=True)
    )
    return x, k, got


@pytest.mark.parametrize("shape", [(8, 8, 512)], ids=str)
def test_splitx_convolve_matches_oracle(shape, rng, monkeypatch):
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )

    x, k, got = _convolve(shape, rng, monkeypatch, splitx=True)
    ref = np_convolve_spectrum(
        x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5


@pytest.mark.parametrize("shape", [(8, 8, 512)], ids=str)
def test_splitx_matches_default_mode(shape, rng, monkeypatch):
    x, k, a = _convolve(shape, rng, monkeypatch, splitx=False)
    x2, k2, b = _convolve(shape, rng, monkeypatch, splitx=True)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


def test_splitx_plane_batched_path(rng, monkeypatch):
    """Y = 128 runs the plane-batched (lane-packed) x path; the split-x
    row ops must be plane-agnostic across the lane packing exactly like
    fold's."""
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )

    shape = (8, 128, 512)
    x, k, got = _convolve(shape, rng, monkeypatch, splitx=True)
    ref = np_convolve_spectrum(
        x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5


def test_splitx_gate_is_x512_only(monkeypatch):
    """The knob only changes plans with X >= 256 and X/4 % 16 == 0
    (both bench classes measured wins); everything below keeps its
    existing mode."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import make_fused_plan

    monkeypatch.setenv("LMVN_FUSED_SPLITX", "1")
    make_fused_plan.cache_clear()
    assert make_fused_plan((8, 8, 512)).splitx
    assert make_fused_plan((8, 8, 256)).splitx  # measured win at 256 too
    assert make_fused_plan((8, 8, 1024)).splitx  # M=256 meets the gate
    assert not make_fused_plan((8, 8, 128)).splitx  # M=32 < 64
    assert not make_fused_plan((8, 8, 264)).splitx  # M%16 fails
    # splitx replaces fold on its shapes (one x mode per plan)
    p = make_fused_plan((8, 8, 512), fold_x=True)
    assert p.splitx and not p.fold


@pytest.mark.parametrize("X", [512, 256])
def test_splitx_rl_step_matches_default(X, rng, monkeypatch):
    """Full fused RL view step agrees between split-x and default modes
    at both gated bench classes."""
    import jax

    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_rl_step_transposed,
        kernel_spectrum_fused,
        make_fused_plan,
    )

    shape = (8, 16, X)  # (Z, Y, X)
    shape_t = (8, X, 16)
    view = jnp.asarray(rng.gamma(2.0, 10.0, shape_t).astype(np.float32))
    psi = jnp.asarray(np.full(shape_t, 40.0, np.float32))
    k1 = gaussian_kernel((5, 5, 5), 1.0)
    outs = []
    for mode in ("0", "1"):
        monkeypatch.setenv("LMVN_FUSED_SPLITX", mode)
        make_fused_plan.cache_clear()
        jax.clear_caches()
        s1 = kernel_spectrum_fused(jnp.asarray(k1), shape)
        s2 = kernel_spectrum_fused(jnp.asarray(np.flip(k1).copy()), shape)
        outs.append(
            np.asarray(
                fused_rl_step_transposed(
                    psi, view, np.float32(0.5), s1, s2, 0.006, 1e-4,
                    interpret=True,
                )
            )
        )
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-4)


def test_splitx_carried_chain_matches_plain(rng, monkeypatch):
    """The carried 4-pass chain (the 512-class default) under split-x is
    bitwise-identical to the plain 5-pass chain under split-x — the same
    invariant the default mode holds."""
    import jax

    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_forward_transposed,
        fused_rl_step_carried,
        fused_rl_step_transposed,
        kernel_spectrum_fused,
        make_fused_plan,
    )

    monkeypatch.setenv("LMVN_FUSED_SPLITX", "1")
    make_fused_plan.cache_clear()
    jax.clear_caches()
    shape = (8, 16, 512)
    shape_t = (8, 512, 16)
    view = jnp.asarray(rng.gamma(2.0, 10.0, shape_t).astype(np.float32))
    psi = jnp.asarray(np.full(shape_t, 40.0, np.float32))
    k1 = gaussian_kernel((5, 5, 5), 1.0)
    s1 = kernel_spectrum_fused(jnp.asarray(k1), shape)
    s2 = kernel_spectrum_fused(jnp.asarray(np.flip(k1).copy()), shape)
    plain = np.asarray(
        fused_rl_step_transposed(
            psi, view, np.float32(0.5), s1, s2, 0.006, 1e-4, interpret=True
        )
    )
    u = fused_forward_transposed(psi, interpret=True)
    carried_psi, _u2 = fused_rl_step_carried(
        psi, u, view, np.float32(0.5), s1, s2, 0.006, 1e-4, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(carried_psi), plain)


def test_splitx_knob_fingerprinted():
    from libmultiviewnative_tpu.deconv.rl import _FUSED_KNOB_ENV

    assert "LMVN_FUSED_SPLITX" in _FUSED_KNOB_ENV


def test_splitx_auto_gate(monkeypatch):
    """Default 'auto': split-x ON at eligible shapes under bf16_3x (the
    measured 15.95-vs-12.52 it/s config), OFF at 'highest' (unmeasured
    there — same convention as the fold/carried gates)."""
    from libmultiviewnative_tpu.core.dft import set_matmul_precision
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import make_fused_plan

    monkeypatch.delenv("LMVN_FUSED_SPLITX", raising=False)
    try:
        set_matmul_precision("high")
        make_fused_plan.cache_clear()
        assert make_fused_plan((8, 8, 512)).splitx
        assert make_fused_plan((8, 8, 256)).splitx
        assert not make_fused_plan((8, 8, 128)).splitx
        set_matmul_precision("highest")
        make_fused_plan.cache_clear()
        assert not make_fused_plan((8, 8, 512)).splitx
    finally:
        set_matmul_precision("highest")
        make_fused_plan.cache_clear()


@pytest.mark.parametrize("shape", [(8, 8, 1024), (8, 8, 768), (8, 8, 384)], ids=str)
def test_splitx_x1024_matches_oracle(shape, rng, monkeypatch):
    """The gate admits any X >= 512 with X/4 % 16 == 0 — lock the
    generic-M construction across the gate: X=1024 (M=256, pad0=136;
    the row-layout invariant pad0 + M + M/2 == Kxp = 520 holds there
    too), the non-power-of-two X=768 (M=192), and the 384 class
    (M=96)."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import make_fused_plan
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )

    x, k, got = _convolve(shape, rng, monkeypatch, splitx=True)
    ref = np_convolve_spectrum(
        x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5


@pytest.mark.parametrize("shape", [(8, 8, 256), (8, 128, 256)], ids=str)
def test_splitx_x256_matches_oracle(shape, rng, monkeypatch):
    """X=256 (M=64) joined the gate after the measured 128.4-vs-119.3
    it/s win at the headline class (measure_r5b part D) — lock the
    construction there too, per-plane and plane-batched."""
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )

    x, k, got = _convolve(shape, rng, monkeypatch, splitx=True)
    ref = np_convolve_spectrum(
        x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5


def test_splitx_presplit_bitwise(rng, monkeypatch):
    """LMVN_FUSED_PRESPLIT=1 under split-x feeds the plan-time bf16 hi/lo
    splits of the split-x packs — bitwise-identical to the runtime-split
    program (the split of a loop-invariant constant is deterministic)."""
    import jax

    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_spectrum,
        kernel_spectrum_fused,
        make_fused_plan,
    )

    shape = (8, 8, 512)
    x = (np.random.default_rng(42).normal(size=shape) + 3.0).astype(
        np.float32
    )
    k = gaussian_kernel((5, 5, 5), 1.1)
    outs = []
    for pre in ("0", "1"):
        monkeypatch.setenv("LMVN_FUSED_SPLITX", "1")
        monkeypatch.setenv("LMVN_FUSED_PRESPLIT", pre)
        make_fused_plan.cache_clear()
        jax.clear_caches()
        kre, kim = kernel_spectrum_fused(
            jnp.asarray(k), shape, precision="bf16_3x"
        )
        outs.append(
            np.asarray(
                fused_convolve_spectrum(
                    jnp.asarray(x), kre, kim, interpret=True,
                    precision="bf16_3x",
                )
            )
        )
    np.testing.assert_array_equal(outs[0], outs[1])


def test_prepared_fused_spectra_reject_layout_flip(rng, monkeypatch):
    """Round-5 review finding: fused spectra prepared under one x-row
    layout (split-x permuted vs standard) are GARBAGE under the other —
    a LMVN_FUSED_SPLITX or matmul-precision flip between
    prepare_workspace and deconvolve_prepared must raise, not silently
    corrupt."""
    import jax

    from libmultiviewnative_tpu.deconv.rl import (
        deconvolve_prepared,
        prepare_workspace,
    )
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import make_fused_plan

    shape = (8, 8, 256)
    V = 2
    views = rng.gamma(2.0, 20.0, (V,) + shape).astype(np.float32)
    k1 = np.stack([gaussian_kernel((5, 5, 5), 1.0 + 0.3 * v) for v in range(V)])
    data = MultiViewData(
        jnp.asarray(views), jnp.asarray(k1),
        jnp.asarray(np.flip(k1, axis=(1, 2, 3)).copy()),
        jnp.full((V,), 1.0 / V, jnp.float32),
    )
    psi0 = jnp.full(shape, float(views.mean()), jnp.float32)

    monkeypatch.setenv("LMVN_FUSED_SPLITX", "1")
    make_fused_plan.cache_clear()
    prepared = prepare_workspace(data, shape, algorithm="fused")
    assert prepared.xmode == "splitx"
    # same layout state: runs fine
    out = np.asarray(
        deconvolve_prepared(psi0 + 0, data, prepared, 1, lam=0.006)
    )
    assert np.all(np.isfinite(out))
    # layout flip between prepare and use: must raise loudly
    monkeypatch.setenv("LMVN_FUSED_SPLITX", "0")
    make_fused_plan.cache_clear()
    jax.clear_caches()
    with pytest.raises(ValueError, match="x-row layout"):
        deconvolve_prepared(psi0 + 0, data, prepared, 1, lam=0.006)
