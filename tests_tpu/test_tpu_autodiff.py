"""Custom-VJP contract on the real chip: kernel forward, XLA backward.

The shipped adjoint (models/rrtmgp.differentiable_solve_{lw,sw}) runs the
Pallas megakernel forward and differentiates the mathematically-identical
pure-XLA solve in the backward pass. Off-TPU tests exercise the wrapper in
interpret mode; this gates the contract where the forward actually takes the
Mosaic path: the VJP cotangents must equal the pure-XLA VJP at the same
primals (they are DEFINED to be that — bitwise up to XLA scheduling), and the
kernel-forward primal must sit within the usual bf16-table envelope of the
XLA primal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrtmgp_tpu.data.synthetic import synthetic_atmosphere, synthetic_gas_lookup
from rrtmgp_tpu.models.rrtmgp import (
    differentiable_solve_lw,
    differentiable_solve_sw,
    solve_lw,
    solve_sw,
)
from rrtmgp_tpu.ops.gas_optics_pallas import build_pallas_tables, compute_min_window
from rrtmgp_tpu.states import LwBCs, SwBCs
from rrtmgp_tpu.utils.compile import sweep_block_cols, tpu_compiler_options

NCOL, NLAY = 128, 30


@pytest.mark.parametrize("band", ["lw", "sw"])
def test_custom_vjp_kernel_forward_xla_backward(band):
    dtype = np.float32
    lkp = synthetic_gas_lookup(
        longwave=band == "lw", n_gpt=256 if band == "lw" else 224,
        n_bnd=16 if band == "lw" else 14, seed=0 if band == "lw" else 1,
        dtype=dtype,
    )
    atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY, dtype=dtype)
    if band == "lw":
        bcs = LwBCs(sfc_emis=jnp.full((16, NCOL), 0.98, jnp.float32))
        mk, solve = differentiable_solve_lw, solve_lw
    else:
        bcs = SwBCs(
            cos_zenith=jnp.full((NCOL,), 0.6, jnp.float32),
            toa_flux=jnp.full((NCOL,), 1361.0, jnp.float32),
            sfc_alb_direct=jnp.full((14, NCOL), 0.2, jnp.float32),
            sfc_alb_diffuse=jnp.full((14, NCOL), 0.2, jnp.float32),
        )
        mk, solve = differentiable_solve_sw, solve_sw

    tabs = build_pallas_tables(lkp)
    win = compute_min_window(lkp, atm, mega=True)
    copts = tpu_compiler_options()
    f_kernel = mk(
        lkp, pallas_tables=tabs, pallas_windowed="force", pallas_window=win,
        pallas_sweep_cols=sweep_block_cols(),
    )

    def loss_kernel(a, b):
        fl = f_kernel(a, b)
        return jnp.sum(fl.flux_up) + 0.5 * jnp.sum(fl.flux_dn)

    def loss_xla(a, b):
        fl = solve(lkp, a, b)[0]
        return jnp.sum(fl.flux_up) + 0.5 * jnp.sum(fl.flux_dn)

    val_k, grads_k = jax.jit(
        jax.value_and_grad(loss_kernel, argnums=(0, 1)), compiler_options=copts
    )(atm, bcs)
    val_x, grads_x = jax.jit(
        jax.value_and_grad(loss_xla, argnums=(0, 1)), compiler_options=copts
    )(atm, bcs)

    # primal: kernel forward within the bf16-table envelope of the XLA solve
    np.testing.assert_allclose(float(val_k), float(val_x), rtol=5e-4)

    # cotangents: the custom VJP IS the XLA VJP at the same primals
    leaves_k, tree_k = jax.tree_util.tree_flatten(grads_k)
    leaves_x, tree_x = jax.tree_util.tree_flatten(grads_x)
    assert tree_k == tree_x
    n_checked = 0
    for gk, gx in zip(leaves_k, leaves_x):
        gk, gx = np.asarray(gk), np.asarray(gx)
        scale = max(float(np.max(np.abs(gx))), 1e-30)
        np.testing.assert_allclose(gk, gx, rtol=1e-5, atol=1e-6 * scale)
        n_checked += 1
        if np.any(gx != 0.0):
            # at least the temperature/emissivity cotangents must be live
            pass
    assert n_checked > 0
    # gradient must be non-trivial (t_lay feeds Planck sources / optics)
    total = sum(float(np.sum(np.abs(np.asarray(g)))) for g in leaves_k)
    assert np.isfinite(total) and total > 0.0
