"""Workspace container tests (the C-struct mirror layer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from libmultiviewnative_tpu.deconv.workspace import (
    MultiViewData,
    View,
    Workspace,
    initial_psi,
    pad_kernel_to,
)
from libmultiviewnative_tpu.utils.synthetic import gaussian_kernel, multiview_data


def test_workspace_knob_defaults():
    views = multiview_data(2, (8, 8, 8))
    ws = Workspace.from_views(views, lambda_=0.006, min_value=1e-4,
                              num_iterations=7)
    # mirrors inc/multiviewnative.h:28-35 semantics
    assert ws.lambda_ == 0.006
    assert ws.min_value == 1e-4
    assert ws.num_iterations == 7
    assert ws.data.num_views == 2
    assert ws.data.spatial_shape == (8, 8, 8)


def test_initial_psi_modes():
    views = multiview_data(3, (6, 6, 6))
    data = MultiViewData.from_views(views)
    avg = np.asarray(initial_psi(data, "average"))
    # views are constant 128 -> flat average field of 128
    np.testing.assert_allclose(avg, 128.0, rtol=1e-6)
    copy = np.asarray(initial_psi(data, "copy"))
    np.testing.assert_allclose(copy, np.asarray(data.views[0]))
    ones = np.asarray(initial_psi(data, "ones"))
    np.testing.assert_allclose(ones, 1.0)
    with pytest.raises(ValueError, match="unknown initial psi"):
        initial_psi(data, "nope")


def test_pad_kernel_to_rejects_shrink():
    k = gaussian_kernel((5, 5, 5))
    with pytest.raises(ValueError, match="does not fit"):
        pad_kernel_to(k, (3, 5, 5))


def test_pytree_roundtrip():
    import jax

    views = multiview_data(2, (6, 6, 6))
    data = MultiViewData.from_views(views)
    leaves, treedef = jax.tree_util.tree_flatten(data)
    assert len(leaves) == 4
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(back.views), np.asarray(data.views))
