"""Sharding tests: single-device vs 8-device column-sharded equivalence.

The TPU analogue of the reference's CPU-vs-CUDA same-kernel testing
(SURVEY.md section 4). Runs in a SUBPROCESS with
--xla_force_host_platform_device_count=8 because (a) the virtual-device flag
must be set before jax initializes and (b) 8 virtual devices slow all other
tests' compiles ~10x.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import sys
sys.path.insert(0, os.environ["RRTMGP_REPO"])
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from rrtmgp_tpu.data.synthetic import synthetic_gas_lookup, synthetic_atmosphere
from rrtmgp_tpu.models.rrtmgp import solve_lw, solve_sw
from rrtmgp_tpu.parallel.sharding import make_column_mesh, replicate, shard_columns
from rrtmgp_tpu.states import LwBCs, SwBCs

assert len(jax.devices()) == 8, jax.devices()

NCOL, NLAY, NGPT, NBND = 32, 12, 16, 2
lkp = synthetic_gas_lookup(longwave=True, n_gpt=NGPT, n_bnd=NBND)
lkp_sw = synthetic_gas_lookup(longwave=False, n_gpt=NGPT, n_bnd=NBND, seed=1)
atm = synthetic_atmosphere(ncol=NCOL, nlay=NLAY)
bcs_lw = LwBCs(sfc_emis=jnp.full((NBND, NCOL), 0.98))
bcs_sw = SwBCs(
    cos_zenith=jnp.full((NCOL,), 0.6), toa_flux=jnp.full((NCOL,), 1361.0),
    sfc_alb_direct=jnp.full((NBND, NCOL), 0.2), sfc_alb_diffuse=jnp.full((NBND, NCOL), 0.2),
)

# single-device result
f_lw = jax.jit(lambda l, a, b: solve_lw(l, a, b, two_stream=True)[0])
f_sw = jax.jit(lambda l, a, b: solve_sw(l, a, b)[0])
flux0 = f_lw(lkp, atm, bcs_lw)
fsw0 = f_sw(lkp_sw, atm, bcs_sw)

# column-sharded over an 8-device mesh
mesh = make_column_mesh()
atm_s = shard_columns(atm, mesh, NCOL)
bcs_lw_s = shard_columns(bcs_lw, mesh, NCOL)
bcs_sw_s = shard_columns(bcs_sw, mesh, NCOL)
lkp_s = replicate(lkp, mesh)
lkp_sw_s = replicate(lkp_sw, mesh)
flux1 = f_lw(lkp_s, atm_s, bcs_lw_s)
fsw1 = f_sw(lkp_sw_s, atm_s, bcs_sw_s)

np.testing.assert_allclose(np.asarray(flux0.flux_up), np.asarray(flux1.flux_up), rtol=1e-12)
np.testing.assert_allclose(np.asarray(flux0.flux_dn), np.asarray(flux1.flux_dn), rtol=1e-12)
np.testing.assert_allclose(np.asarray(fsw0.flux_up), np.asarray(fsw1.flux_up), rtol=1e-12)
np.testing.assert_allclose(np.asarray(fsw0.flux_dn_dir), np.asarray(fsw1.flux_dn_dir), rtol=1e-12)

# the sharded result must actually be distributed
assert len(flux1.flux_up.sharding.device_set) == 8, flux1.flux_up.sharding
print("SHARDING-EQUIVALENCE-OK")
"""


@pytest.mark.slow
def test_sharded_equivalence():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # drop the axon plugin injection
    env["RRTMGP_REPO"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "SHARDING-EQUIVALENCE-OK" in r.stdout
