"""Trusted host-side reference implementations (float64 numpy) and oracles.

These regenerate the golden data the reference project keeps as external
TIFFs produced by the Java Fiji plugin (/root/reference/tests/tiff_fixtures.hpp:18-27):
since that pack is unavailable, goldens are produced by
:mod:`.numpy_ref` — a float64 mirror of the RL algorithm — and convolution
truth by the brute-force oracle in :mod:`.oracle`
(the analog of /root/reference/tests/test_algorithms.hpp:9-58).
"""

from .numpy_ref import np_convolve_spectrum, np_deconvolve, np_rl_view_step, np_wrap_kernel
from .oracle import (
    direct_convolve,
    l1norm,
    l2norm,
    l2norm_within_limits,
    rms,
    rms_within_limits,
)
