"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference path.

The structure mirrors the reference's device-kernels-vs-CPU-kernels tests
(test_gpu_kernels_impl.cu:21-487), including odd/ragged sizes."""

import numpy as np
import pytest
import jax.numpy as jnp

from libmultiviewnative_tpu.core.kernels import (
    compute_quotient,
    final_values,
    regularized_final_values,
)
from libmultiviewnative_tpu.ops.pallas.elementwise import (
    quotient_pallas,
    rl_update_pallas,
    spectral_multiply_pallas,
)


@pytest.fixture(params=[(8, 16, 16), (7, 9, 13), (3, 256, 130)])
def vol(request, rng):
    shape = request.param
    return (
        rng.gamma(2.0, 5.0, shape).astype(np.float32),
        rng.gamma(2.0, 0.5, shape).astype(np.float32),
        rng.uniform(0.0, 1.0, shape).astype(np.float32),
    )


def test_rl_update_plain_matches_jnp(vol):
    psi, integral, w = vol
    got = np.asarray(rl_update_pallas(psi, integral, w, 0.0, 1e-4, interpret=True))
    want = np.asarray(final_values(psi, integral, w, 1e-4))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_rl_update_tikhonov_matches_jnp(vol):
    psi, integral, w = vol
    got = np.asarray(
        rl_update_pallas(psi, integral, w, 0.006, 1e-4, interpret=True)
    )
    want = np.asarray(regularized_final_values(psi, integral, w, 0.006, 1e-4))
    # sqrt lowers differently between XLA and the Pallas interpreter —
    # single-ulp disagreements on isolated elements are expected
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=5e-5)


def test_rl_update_edge_values():
    psi = np.array([[1.0, 1.0, 1.0, 0.0]], np.float32)
    integral = np.array([[np.nan, np.inf, -2.0, 3.0]], np.float32)
    w = np.ones((1, 4), np.float32)
    got = np.asarray(rl_update_pallas(psi, integral, w, 0.0, 1e-4, interpret=True))
    want = np.asarray(final_values(psi, integral, w, 1e-4))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_quotient_matches_jnp(vol):
    view, integral, _ = vol
    got = np.asarray(quotient_pallas(view, integral, interpret=True))
    want = np.asarray(compute_quotient(view, integral))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_spectral_multiply_matches_complex(rng):
    shape = (4, 8, 5)
    a = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)
    b = (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)
    got = np.asarray(spectral_multiply_pallas(a, b, interpret=True))
    np.testing.assert_allclose(got, a * b, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Fused 3-pass DFT-convolve v2 (ops.pallas.fused_dft2) — interpret mode
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(16, 16, 16), (24, 16, 32), (32, 40, 16)], ids=str
)
def test_fused2_matches_einsum_engine(shape, rng):
    from libmultiviewnative_tpu.core.dft import (
        dft_convolve_spectrum,
        kernel_spectrum_split,
    )
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_spectrum,
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    x = rng.normal(size=shape).astype(np.float32)
    k = gaussian_kernel((5, 5, 5), 1.2)
    kre2, kim2 = kernel_spectrum_fused(jnp.asarray(k), shape)
    got = np.asarray(
        fused_convolve_spectrum(jnp.asarray(x), kre2, kim2, interpret=True)
    )
    kre, kim = kernel_spectrum_split(jnp.asarray(k), shape)
    want = np.asarray(dft_convolve_spectrum(jnp.asarray(x), kre, kim))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_fused2_carried_chain_bitwise(rng):
    """The carried-u chain (fused_rl_step_carried: B CQA B CUA, pass-A
    spectrum threaded across view steps — the round-2 verdict's pass-chain
    pipelining) must be BITWISE the plain chain (A B CQA B CU per step):
    the fused CUA pass runs the identical op sequence on identical values,
    only the HBM round-trip between CU and the next A is removed."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_forward_transposed,
        fused_rl_step_carried,
        fused_rl_step_transposed,
        kernel_spectrum_fused,
    )

    shape = (16, 16, 16)
    psi = rng.gamma(2.0, 20.0, shape).astype(np.float32)
    V = 2
    views = [rng.gamma(2.0, 20.0, shape).astype(np.float32) for _ in range(V)]
    ks = []
    for _ in range(V):
        k = rng.gamma(2.0, 1.0, (5, 5, 5)).astype(np.float32)
        ks.append(k / k.sum())
    t = lambda a: jnp.transpose(jnp.asarray(a), (0, 2, 1))

    for prec in ("highest", "bf16_3x"):
        k1s = [kernel_spectrum_fused(jnp.asarray(k), shape, precision=prec) for k in ks]
        k2s = [
            kernel_spectrum_fused(jnp.asarray(np.flip(k).copy()), shape, precision=prec)
            for k in ks
        ]
        p_plain = t(psi)
        for _ in range(2):
            for v in range(V):
                p_plain = fused_rl_step_transposed(
                    p_plain, t(views[v]), jnp.float32(0.5), k1s[v], k2s[v],
                    0.006, 1e-4, interpret=True, precision=prec,
                )
        p_c = t(psi)
        u = fused_forward_transposed(p_c, interpret=True, precision=prec)
        for _ in range(2):
            for v in range(V):
                p_c, u = fused_rl_step_carried(
                    p_c, u, t(views[v]), jnp.float32(0.5), k1s[v], k2s[v],
                    0.006, 1e-4, interpret=True, precision=prec,
                )
        np.testing.assert_array_equal(np.asarray(p_plain), np.asarray(p_c))


def test_fused2_carried_chain_fold_x(rng):
    """Carried chain under fold_x (both levers composed) still matches the
    plain chain bitwise."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_forward_transposed,
        fused_rl_step_carried,
        fused_rl_step_transposed,
        kernel_spectrum_fused,
    )

    shape = (16, 16, 16)
    psi = rng.gamma(2.0, 20.0, shape).astype(np.float32)
    view = rng.gamma(2.0, 20.0, shape).astype(np.float32)
    k = rng.gamma(2.0, 1.0, (5, 5, 5)).astype(np.float32)
    k /= k.sum()
    t = lambda a: jnp.transpose(jnp.asarray(a), (0, 2, 1))
    k1 = kernel_spectrum_fused(jnp.asarray(k), shape)
    k2 = kernel_spectrum_fused(jnp.asarray(np.flip(k).copy()), shape)

    p_plain = fused_rl_step_transposed(
        t(psi), t(view), jnp.float32(1.0), k1, k2, 0.0, 1e-4,
        interpret=True, fold_x=True,
    )
    u = fused_forward_transposed(t(psi), interpret=True, fold_x=True)
    p_c, _u = fused_rl_step_carried(
        t(psi), u, t(view), jnp.float32(1.0), k1, k2, 0.0, 1e-4,
        interpret=True, fold_x=True,
    )
    np.testing.assert_array_equal(np.asarray(p_plain), np.asarray(p_c))


def test_fused2_bf16_3x_precision_envelope(rng):
    """The bench-default bf16_3x mode (LMVN_MATMUL_PRECISION=high) against
    the float64 oracle — the always-on tolerance row for the precision
    users actually get; hardware ladder in tests/test_stability_fused.py."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_spectrum,
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    shape = (16, 24, 32)
    x = rng.gamma(2.0, 20.0, shape).astype(np.float32)
    k = gaussian_kernel((5, 5, 5), 1.2)
    want = np_convolve_spectrum(
        x.astype(np.float64),
        np.fft.rfftn(np_wrap_kernel(k.astype(np.float64), shape)),
    )
    kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape, precision="bf16_3x")
    got = np.asarray(
        fused_convolve_spectrum(
            jnp.asarray(x), kre, kim, interpret=True, precision="bf16_3x"
        )
    )
    rel = float(np.linalg.norm(got - want) / np.linalg.norm(want))
    assert rel < 1.5e-4  # measured 4.9e-6 at this size; gate = HW contract


def test_fused2_rejects_bad_shapes(rng):
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_transposed,
    )

    x = jnp.zeros((9, 16, 16), jnp.float32)  # Z not a multiple of 8
    with pytest.raises(ValueError, match="multiples of 8"):
        fused_convolve_transposed(x, x, x, interpret=True)


def test_fused2_spectrum_layout_roundtrip(rng):
    """kernel_spectrum_fused is the (Kx, Q, M) permutation of the compact
    dft3 spectrum (layout (Q, M, Kx)), zero-padded on the x-frequency
    axis to the 8-aligned Kxp pack stride."""
    from libmultiviewnative_tpu.core.dft import kernel_spectrum_split
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    shape = (16, 24, 32)
    kx = shape[2] // 2 + 1  # 17 -> Kxp 24
    k = gaussian_kernel((5, 5, 5), 1.0)
    re, im = kernel_spectrum_split(jnp.asarray(k), shape)
    re2, im2 = kernel_spectrum_fused(jnp.asarray(k), shape)
    assert re2.shape[0] == -(-kx // 8) * 8
    # split-stage pipeline vs einsum engine: same values up to f32
    # accumulation-order noise
    np.testing.assert_allclose(
        np.asarray(re2)[:kx], np.transpose(np.asarray(re), (2, 0, 1)),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(im2)[:kx], np.transpose(np.asarray(im), (2, 0, 1)),
        rtol=1e-5, atol=1e-6,
    )
    assert not np.asarray(re2)[kx:].any() and not np.asarray(im2)[kx:].any()


@pytest.mark.parametrize(
    "shape", [(256, 16, 16), (16, 256, 16), (256, 256, 16)], ids=str
)
def test_fused2_split_stages_match_oracle(shape, rng):
    """Axes that are multiples of 128 take the mixed-radix DIF split
    stages (R-fold fewer MXU FLOPs, interleaved frequency order absorbed
    by the pre-permuted kernel spectrum) — the result must still match
    the float64 numpy oracle."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_spectrum,
        kernel_spectrum_fused,
        pick_split,
    )
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    # the shapes under test exercise z-split, y-split, and both
    assert any(pick_split(int(s))[0] > 1 for s in shape[:2])
    x = (rng.normal(size=shape) + 3.0).astype(np.float32)
    k = gaussian_kernel((5, 5, 5), 1.1)
    kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape)
    got = np.asarray(
        fused_convolve_spectrum(jnp.asarray(x), kre, kim, interpret=True)
    )
    ref = np_convolve_spectrum(
        x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5


def test_fused2_split_perm_identity_and_interleave():
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import split_perm

    np.testing.assert_array_equal(split_perm(16, (1, 16)), np.arange(16))
    # position q*M+p holds frequency R*p+q
    p = split_perm(8, (2, 4))
    np.testing.assert_array_equal(p, [0, 2, 4, 6, 1, 3, 5, 7])


@pytest.mark.parametrize("shape", [(16, 16, 16), (16, 256, 32)], ids=str)
def test_fused2_fold_x_matches_dense(shape, rng):
    """fold_x=True (hermitian-fold x stages, halved matmul contraction)
    must match the dense-mode convolve to f32 accumulation noise.
    MEASURED NEGATIVE on v5e in round 3 (4.97 vs 4.72 ms at X=512,
    docs/PERFORMANCE.md tombstone) — kept correctness-locked as the
    reference implementation of the fold identities."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_transposed,
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    Z, Y, X = shape
    xt = jnp.asarray(
        (rng.normal(size=(Z, X, Y)) + 3.0).astype(np.float32)
    )
    k = gaussian_kernel((5, 5, 5), 1.1)
    kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape)
    dense = np.asarray(
        fused_convolve_transposed(xt, kre, kim, interpret=True)
    )
    folded = np.asarray(
        fused_convolve_transposed(xt, kre, kim, interpret=True, fold_x=True)
    )
    np.testing.assert_allclose(folded, dense, rtol=2e-5, atol=2e-5)


def test_fused2_fold_x_rl_step(rng):
    """The full fused RL view step agrees between fold and dense modes."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_rl_step_transposed,
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    shape = (16, 24, 32)  # (Z, Y, X)
    shape_t = (16, 32, 24)
    view = jnp.asarray(rng.gamma(2.0, 10.0, shape_t).astype(np.float32))
    psi = jnp.asarray(np.full(shape_t, 40.0, np.float32))
    k1 = gaussian_kernel((5, 5, 5), 1.0)
    s1 = kernel_spectrum_fused(jnp.asarray(k1), shape)
    s2 = kernel_spectrum_fused(jnp.asarray(np.flip(k1).copy()), shape)
    outs = [
        np.asarray(
            fused_rl_step_transposed(
                psi, view, np.float32(0.5), s1, s2, 0.006, 1e-4,
                interpret=True, fold_x=f,
            )
        )
        for f in (False, True)
    ]
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("shape", [(16, 136, 16), (16, 264, 24)], ids=str)
def test_fused2_lane_misaligned_y(shape, rng):
    """Shapes whose y extent is NOT a multiple of 128 must route through
    the per-plane path: the plane-batched restack concats slice lanes at
    per-operand offsets b*Y mod 128, which tpu.concatenate rejects
    ("result/input offset mismatch on non-concat dimension" — hit at
    264^3 on real hardware in the round-3 stability ladder; interpret
    mode cannot catch lowering legality, so this locks the ROUTING
    condition and the per-plane path's correctness at M >= 128)."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_spectrum,
        kernel_spectrum_fused,
        make_fused_plan,
    )
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    plan = make_fused_plan(shape)
    # the regression precondition: batched-illegal geometry (Y % 128 != 0
    # with wide-enough M that the OLD condition picked the batched path)
    assert (plan.sy.R * plan.sy.M) % 128 != 0 and plan.sy.M >= 128

    x = (rng.normal(size=shape) + 3.0).astype(np.float32)
    k = gaussian_kernel((5, 5, 5), 1.1)
    k_hat = np.fft.rfftn(np_wrap_kernel(k.astype(np.float64), shape))
    want = np_convolve_spectrum(x.astype(np.float64), k_hat)
    kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape)
    got = np.asarray(
        fused_convolve_spectrum(jnp.asarray(x), kre, kim, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("twfold", [False, True], ids=["plain", "twfold"])
def test_fused2_twiddle_fold_matches_oracle(twfold, rng):
    """Twiddle folding (per-q stage matrices, _make_split twfold=True)
    must match the float64 oracle in BOTH orientations (y right-mult and
    z left-mult split stages) and in the fused RL step — independent of
    the LMVN_FUSED_TWFOLD process default."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_convolve_transposed,
        fused_rl_step_transposed,
        kernel_spectrum_fused,
        make_fused_plan,
    )
    from libmultiviewnative_tpu.reference.numpy_ref import (
        np_convolve_spectrum,
        np_wrap_kernel,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    shape = (256, 256, 16)  # z R=2 (left-fold) AND y R=2 (right-fold)
    plan = make_fused_plan(shape, twfold=twfold)
    assert (plan.sy.wf[0].shape[0] != plan.sy.M) == twfold
    assert (plan.sz.wf[0].shape[0] != plan.sz.M) == twfold

    x = (rng.normal(size=shape) + 3.0).astype(np.float32)
    k = gaussian_kernel((5, 5, 5), 1.1)
    kre, kim = kernel_spectrum_fused(jnp.asarray(k), shape)
    # drive the pass runners directly through the explicit-twfold plan:
    # the jitted public wrappers read the env default, so convolve through
    # the runner chain by hand
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd

    xt = jnp.transpose(jnp.asarray(x), (0, 2, 1))
    B = fd._slab(*[int(s) for s in xt.shape])
    u = fd._run_pass_a(xt, plan, B, True, "highest")
    v = fd._run_pass_b(u[0], u[1], kre, kim, plan, True, "highest")
    got = np.asarray(fd._run_pass_c(v[0], v[1], plan, B, True, "highest"))
    got = np.transpose(got, (0, 2, 1))
    ref = np_convolve_spectrum(
        x.astype(np.float64), np.fft.rfftn(np_wrap_kernel(k, shape))
    )
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-5


@pytest.mark.parametrize(
    "shape,kshape",
    [((64, 256, 16), (5, 5, 5)), ((256, 16, 16), (21, 9, 9)),
     ((64, 16, 16), (8, 6, 6))],
    ids=str,
)
def test_fused2_sparse_prep_matches_dense(shape, kshape, rng, monkeypatch):
    """Z-sparse kernel-spectrum forwarding (pass A on the gathered nonzero
    planes + one direct (Z, Zs) contraction) must produce the same spectrum
    as the dense pass A + BF pipeline — including even kernels (asymmetric
    wrap split) and kernels spanning multiple 8-plane slabs."""
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd

    k = rng.standard_normal(kshape).astype(np.float32)
    specs = {}
    for sp in ("0", "1"):
        monkeypatch.setenv("LMVN_FUSED_SPARSE_PREP", sp)
        kr, ki = fd.kernel_spectrum_fused(jnp.asarray(k), shape,
                                          precision="highest")
        specs[sp] = (np.asarray(kr), np.asarray(ki))
    scale = np.abs(specs["0"][0]).max()
    for part in (0, 1):
        d = np.abs(specs["0"][part] - specs["1"][part]).max()
        assert d / scale < 1e-5, (part, d, scale)


# ---------------------------------------------------------------------------
# round-4 floor levers + advisor-demanded routing coverage
# ---------------------------------------------------------------------------


def _rl_step_fixture(rng, shape):
    """(psi_t, view_t, fused spectra k1/k2) for one RL view step at a
    (Z, Y, X) shape; transposed-domain arrays."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    Z, Y, X = shape
    view_t = jnp.asarray(rng.gamma(2.0, 10.0, (Z, X, Y)).astype(np.float32))
    psi_t = jnp.asarray(np.full((Z, X, Y), 20.0, np.float32))
    k1 = gaussian_kernel((5, 5, 5), 1.0)
    s1 = kernel_spectrum_fused(jnp.asarray(k1), shape)
    s2 = kernel_spectrum_fused(jnp.asarray(np.flip(k1).copy()), shape)
    return psi_t, view_t, s1, s2


def _jnp_rl_step_oracle(psi_t, view_t, shape, rng_seedk=None):
    """fft-engine view step on the same data (engine-independent truth)."""
    from libmultiviewnative_tpu.deconv.rl import prepare_spectra, rl_view_step
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    k1 = gaussian_kernel((5, 5, 5), 1.0)
    psi = jnp.transpose(psi_t, (0, 2, 1))
    view = jnp.transpose(view_t, (0, 2, 1))
    k1h = prepare_spectra(jnp.asarray(k1)[None], shape)[0]
    k2h = prepare_spectra(jnp.asarray(np.flip(k1).copy())[None], shape)[0]
    out = rl_view_step(psi, view, k1h, k2h, np.float32(0.5), 0.006, 1e-4)
    return np.transpose(np.asarray(out), (0, 2, 1))


@pytest.mark.parametrize("shape", [(16, 136, 16), (16, 136, 144)], ids=str)
def test_fused2_rl_step_lane_misaligned(shape, rng):
    """The full fused RL step (passes CQA/CU with their quotient/update
    epilogues) at lane-misaligned Y ((R*M) % 128 != 0, M >= 128) must take
    the per-plane route and match the fft-engine view step — the advisor
    noted only the convolve path (A/B/C) was covered at this geometry."""
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        fused_rl_step_transposed,
        make_fused_plan,
    )

    plan = make_fused_plan(shape)
    assert (plan.sy.R * plan.sy.M) % 128 != 0 and plan.sy.M >= 128

    psi_t, view_t, s1, s2 = _rl_step_fixture(rng, shape)
    got = np.asarray(
        fused_rl_step_transposed(
            psi_t, view_t, np.float32(0.5), s1, s2, 0.006, 1e-4,
            interpret=True,
        )
    )
    want = _jnp_rl_step_oracle(psi_t, view_t, shape)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused2_dual_chain_matches_default(rng, monkeypatch):
    """LMVN_FUSED_DUAL=1 (two independent half-slab plane chains per grid
    step) must be value-identical to the default single chain in both the
    convolve passes and the full RL step — the advisor noted the plane
    regrouping had no correctness test."""
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd

    shape = (16, 128, 16)  # wide path (M = 128), B = 8 slab -> dual splits
    psi_t, view_t, s1, s2 = _rl_step_fixture(rng, shape)
    outs = {}
    for dual in ("0", "1"):
        monkeypatch.setenv("LMVN_FUSED_DUAL", dual)
        # unjitted entry points: the knob is read at trace time, and these
        # trace per call
        outs[dual] = np.asarray(
            fd.fused_rl_step_transposed(
                psi_t, view_t, np.float32(0.5), s1, s2, 0.006, 1e-4,
                interpret=True,
            )
        )
    np.testing.assert_allclose(outs["1"], outs["0"], rtol=1e-6, atol=1e-5)


def test_fused2_spec_bf16_storage(rng, monkeypatch):
    """LMVN_FUSED_SPEC_BF16=1 stores the u/v spectral intermediates and
    kernel spectra in bf16 (the 512-class HBM-floor lever); the fused RL
    step must stay within the bf16 storage-rounding envelope of the f32
    chain AND of the fft-engine oracle."""
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd
    from libmultiviewnative_tpu.ops.pallas.fused_dft2 import (
        kernel_spectrum_fused,
    )
    from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel

    shape = (16, 128, 16)
    psi_t, view_t, _, _ = _rl_step_fixture(rng, shape)
    k1 = gaussian_kernel((5, 5, 5), 1.0)
    outs = {}
    for sb in ("0", "1"):
        monkeypatch.setenv("LMVN_FUSED_SPEC_BF16", sb)
        # same data both rounds; only the spectra (and the chain's HBM
        # intermediates) change representation
        s1 = kernel_spectrum_fused(jnp.asarray(k1), shape)
        s2 = kernel_spectrum_fused(jnp.asarray(np.flip(k1).copy()), shape)
        assert (np.asarray(s1[0]).dtype == np.float32) == (sb == "0")
        outs[sb] = np.asarray(
            fd.fused_rl_step_transposed(
                psi_t, view_t, np.float32(0.5), s1, s2, 0.006, 1e-4,
                interpret=True,
            )
        )
    scale = np.abs(outs["0"]).max()
    rel = np.abs(outs["1"] - outs["0"]).max() / scale
    assert rel < 2e-2, rel
    want = _jnp_rl_step_oracle(psi_t, view_t, shape)
    rel_oracle = np.abs(outs["1"] - want).max() / np.abs(want).max()
    assert rel_oracle < 2e-2, rel_oracle


def test_fused2_presplit_constants_bitwise(rng, monkeypatch):
    """LMVN_FUSED_PRESPLIT=1 feeds plan-time bf16 hi/lo constant splits;
    both splits round f32->bf16 to-nearest-even, so the bf16_3x RL step
    must be value-identical to the runtime-split default."""
    from libmultiviewnative_tpu.ops.pallas import fused_dft2 as fd

    shape = (16, 128, 16)
    psi_t, view_t, s1, s2 = _rl_step_fixture(rng, shape)
    outs = {}
    for ps in ("0", "1"):
        monkeypatch.setenv("LMVN_FUSED_PRESPLIT", ps)
        outs[ps] = np.asarray(
            fd.fused_rl_step_transposed(
                psi_t, view_t, np.float32(0.5), s1, s2, 0.006, 1e-4,
                interpret=True, precision="bf16_3x",
            )
        )
    np.testing.assert_array_equal(outs["1"], outs["0"])
