"""Data-layout wrapper invariants (ref test/datalayouts.jl:13-188).

Shape/broadcast semantics of set_cols / set_domain / domain_view for every
index order, matching the reference's exact expectations (no tolerance).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.utils import datalayouts as dl


def test_constructors_and_order_validation():
    assert dl.nvc_data(4, 6, n=3).shape == (3, 4, 6)
    assert dl.vc_data(4, 6).shape == (4, 6)
    assert dl.nc_data(6, n=2).shape == (2, 6)
    assert dl.n_data(5).shape == (5,)
    with pytest.raises(ValueError):
        dl.RRTMGPData(jnp.zeros((2, 3)), dl.NVCOrder)
    with pytest.raises(ValueError):
        dl.RRTMGPData(jnp.zeros((2, 3, 4)), dl.VCOrder)


def test_set_cols_scalar_fill():
    for d in (dl.nvc_data(3, 5, n=2), dl.vc_data(3, 5), dl.nc_data(5, n=2),
              dl.n_data(4)):
        out = dl.set_cols(d, 2.5)
        assert out.shape == d.shape and out.order is d.order
        np.testing.assert_array_equal(np.asarray(out.array), 2.5)


def test_set_cols_vc_broadcasts():
    d = dl.vc_data(3, 5)
    # exact shape
    full = jnp.arange(15.0).reshape(3, 5)
    np.testing.assert_array_equal(dl.set_cols(d, full).array, full)
    # per-level vector broadcast over columns: (v,) -> (v, c)
    lev = jnp.array([1.0, 2.0, 3.0])
    out = dl.set_cols(d, lev).array
    np.testing.assert_array_equal(out, np.broadcast_to([[1.0], [2.0], [3.0]], (3, 5)))
    # per-column (1, c) broadcast
    col = jnp.arange(5.0)[None, :]
    out = dl.set_cols(dl.vc_data(3, 5), col).array
    np.testing.assert_array_equal(out, np.broadcast_to(np.arange(5.0), (3, 5)))
    with pytest.raises(ValueError):
        dl.set_cols(d, jnp.zeros((4, 5)))


def test_set_cols_nc_singleton_vector():
    d = dl.nc_data(5, n=1)
    out = dl.set_cols(d, jnp.arange(5.0)).array
    np.testing.assert_array_equal(out, np.arange(5.0)[None, :])


def test_set_cols_nvc_singleton_matrix():
    d = dl.nvc_data(3, 5, n=1)
    mat = jnp.arange(15.0).reshape(3, 5)
    out = dl.set_cols(d, mat).array
    np.testing.assert_array_equal(out, np.asarray(mat)[None])
    with pytest.raises(ValueError):
        dl.set_cols(dl.nvc_data(3, 5, n=2), mat)


def test_domain_view_strips_extra_top_layer():
    nvc = dl.RRTMGPData(jnp.arange(2 * 4 * 3.0).reshape(2, 4, 3), dl.NVCOrder)
    vc = dl.RRTMGPData(jnp.arange(12.0).reshape(4, 3), dl.VCOrder)
    assert dl.domain_view(False, nvc) is nvc
    assert dl.domain_view(True, nvc).shape == (2, 3, 3)
    assert dl.domain_view(True, vc).shape == (3, 3)
    np.testing.assert_array_equal(
        dl.domain_view(True, vc).array, np.asarray(vc.array)[:-1]
    )
    with pytest.raises(TypeError):
        dl.domain_view(True, dl.n_data(4))


def test_set_domain_preserves_boundary_layer():
    vc = dl.RRTMGPData(jnp.full((4, 3), 9.0), dl.VCOrder)
    out = dl.set_domain(vc, 1.0, isothermal_boundary_layer=True).array
    np.testing.assert_array_equal(out[:-1], 1.0)
    np.testing.assert_array_equal(out[-1], 9.0)
    # without the BL it is a plain set_cols
    out = dl.set_domain(vc, 1.0, isothermal_boundary_layer=False).array
    np.testing.assert_array_equal(out, 1.0)
    nvc = dl.RRTMGPData(jnp.full((2, 4, 3), 9.0), dl.NVCOrder)
    out = dl.set_domain(nvc, jnp.zeros((2, 3, 3)), True).array
    np.testing.assert_array_equal(out[:, :-1, :], 0.0)
    np.testing.assert_array_equal(out[:, -1, :], 9.0)


def test_wrapper_is_pytree():
    import jax

    d = dl.vc_data(3, 5)
    leaves = jax.tree_util.tree_leaves(d)
    assert len(leaves) == 1 and leaves[0].shape == (3, 5)
    # order survives a tree map (it is static metadata)
    out = jax.tree_util.tree_map(lambda x: x + 1, d)
    assert out.order is dl.VCOrder
