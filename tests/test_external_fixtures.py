"""External golden TIFF pack support — the reference's tier-4 convention.

The reference loads `input_view_i / kernel1_view_i / kernel2_view_i /
weights_view_i .tif` plus per-iteration `psi_i.tif` goldens from
LMVN_TEST_IMAGE_PATH (default /dev/shm/libmultiview_data —
/root/reference/tests/tiff_fixtures.hpp:18-27, CMakeLists.txt:25) and
SKIPS the tests when absent (tests/CMakeLists.txt:42-53).  Same contract
here: point LMVN_TEST_IMAGE_PATH at a pack produced by the Fiji plugin (or
any compatible tool) and these tests hold the TPU build to it."""

import os

import numpy as np
import pytest

DATA = os.environ.get("LMVN_TEST_IMAGE_PATH", "/dev/shm/libmultiview_data")


def _have_pack():
    return os.path.exists(os.path.join(DATA, "input_view_0.tif")) and os.path.exists(
        os.path.join(DATA, "psi_1.tif")
    )


pytestmark = pytest.mark.skipif(
    not _have_pack(), reason=f"no external TIFF pack at {DATA}"
)


def _load_views():
    from libmultiviewnative_tpu.deconv.workspace import View
    from libmultiviewnative_tpu.io.stacks import read_tiff_stack

    views = []
    v = 0
    while os.path.exists(os.path.join(DATA, f"input_view_{v}.tif")):
        views.append(
            View(
                image=read_tiff_stack(os.path.join(DATA, f"input_view_{v}.tif")),
                kernel1=read_tiff_stack(os.path.join(DATA, f"kernel1_view_{v}.tif")),
                kernel2=read_tiff_stack(os.path.join(DATA, f"kernel2_view_{v}.tif")),
                weights=read_tiff_stack(os.path.join(DATA, f"weights_view_{v}.tif")),
            )
        )
        v += 1
    return views


def test_external_goldens():
    """The acceptance thresholds of test_cpu_deconvolve.cpp:53-105 against
    the external pack (lambda=0.006, minValue=1e-4 per
    tiff_fixtures.hpp:449-450)."""
    import jax.numpy as jnp

    from libmultiviewnative_tpu.deconv.rl import deconvolve_jit
    from libmultiviewnative_tpu.deconv.workspace import MultiViewData
    from libmultiviewnative_tpu.io.stacks import read_tiff_stack
    from libmultiviewnative_tpu.reference.oracle import l2norm, l2norm_within_limits

    views = _load_views()
    assert views, "pack present but no views parsed"
    data = MultiViewData.from_views(views)
    psi0 = read_tiff_stack(os.path.join(DATA, "psi_0.tif"))

    out = np.asarray(
        deconvolve_jit(
            jnp.asarray(psi0), data, num_iterations=2, lam=0.006, min_value=1e-4
        )
    )
    golden = read_tiff_stack(os.path.join(DATA, "psi_1.tif"))
    assert l2norm(out, golden) < 40.0
    assert l2norm_within_limits(out, golden, 0.3, 0.7) < 1e-2
