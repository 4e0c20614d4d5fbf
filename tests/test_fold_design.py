"""Math proof for the ROADMAP's hermitian-fold x-stage design (numpy only).

The fused kernel's x-rfft is a dense (2Kxp, X) packed matmul; the fold
halves each product's contraction depth using cos/sin symmetry:

    e[0] = p[0]; e[H] = p[H]; e[n] = p[n] + p[X-n]   (n = 1..H-1)
    o[n] = p[n] - p[X-n]                              (n = 1..H-1)
    Re rfft(p)[k] =  sum_{n=0..H}   cos(2*pi*k*n/X) * e[n]
    Im rfft(p)[k] = -sum_{n=1..H-1} sin(2*pi*k*n/X) * o[n]

and the inverse splits into even/odd output parts recombined with one
flip.  These identities are what the round-3 kernel change relies on
(docs/ROADMAP.md "x-axis fold/split"); locking them down here keeps the
eventual Mosaic implementation a pure performance change."""

import numpy as np


def _fold(p):
    X = p.shape[0]
    H = X // 2
    e = np.concatenate([p[:1], p[1:H] + p[H + 1 :][::-1], p[H : H + 1]])
    o = p[1:H] - p[H + 1 :][::-1]
    return e, o


def test_forward_fold_matches_rfft():
    rng = np.random.default_rng(0)
    X, W = 64, 8
    p = rng.normal(size=(X, W))
    H = X // 2
    kx = H + 1
    n_e = np.arange(H + 1)
    n_o = np.arange(1, H)
    k = np.arange(kx)
    C = np.cos(2 * np.pi * np.outer(k, n_e) / X)  # (Kx, H+1)
    S = np.sin(2 * np.pi * np.outer(k, n_o) / X)  # (Kx, H-1)
    e, o = _fold(p)
    got_re = C @ e
    got_im = -(S @ o)
    want = np.fft.rfft(p, axis=0)
    np.testing.assert_allclose(got_re, want.real, atol=1e-9)
    np.testing.assert_allclose(got_im, want.imag, atol=1e-9)


def test_inverse_fold_matches_irfft():
    """Inverse: out[n] = ev[n] + od[n], out[X-n] = ev[n] - od[n] where
    ev = (w*cos/X)^T-style contraction of Re and od of Im — the output
    halves recombine with one flip (the mirror of the forward fold)."""
    rng = np.random.default_rng(1)
    X, W = 64, 8
    H = X // 2
    kx = H + 1
    spec = np.fft.rfft(rng.normal(size=(X, W)), axis=0)
    re, im = spec.real, spec.imag
    w = np.full(kx, 2.0)
    w[0] = 1.0
    w[-1] = 1.0
    k = np.arange(kx)
    n_half = np.arange(H + 1)  # output rows 0..H
    Cinv = (np.cos(2 * np.pi * np.outer(n_half, k) / X) * w[None, :]) / X
    Sinv = (np.sin(2 * np.pi * np.outer(n_half, k) / X) * w[None, :]) / X
    ev = Cinv @ re  # (H+1, W): even part at rows n=0..H
    od = -(Sinv @ im)
    out = np.empty((X, W))
    out[: H + 1] = ev + od
    out[H + 1 :] = (ev - od)[1:H][::-1]
    want = np.fft.irfft(spec, n=X, axis=0)
    np.testing.assert_allclose(out, want, atol=1e-9)
