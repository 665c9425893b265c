"""Atmospheric state containers (pytrees) + state precompute ops.

Mirrors the reference's L4 state layer:
- Vmr/VmrGM       /root/reference/src/optics/Vmrs.jl:22-117
- AtmosphericState /root/reference/src/optics/AtmosphericStates.jl:39-84
- CloudState/AerosolState ibid:91-163
- LwBCs/SwBCs     /root/reference/src/optics/BCs.jl:17-52
- compute_col_gas / compute_relative_humidity
                  /root/reference/src/optics/Optics.jl:124-185 and
                  /root/reference/src/optics/gas_optics.jl:16-75

Array layout: (nlay, ncol) / (nlay+1, ncol), level 0 = surface. The reference
packs col_dry/p_lay/t_lay/rel_hum into one (4, nlay, ncol) buffer for
coalesced CUDA access; with XLA the fields stay separate — fusion happens in
the compiler, and separate leaves shard/donate independently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .parameters import RRTMGPParameters
from .utils.pytree import pytree_dataclass


# ---------------------------------------------------------------------------
# Volume mixing ratios
# ---------------------------------------------------------------------------


@pytree_dataclass
class VmrGM:
    """Global-mean VMRs: 2D h2o + o3, global means for all other gases.

    ``vmr`` is indexed by the 1-based gas index of the gas lookup
    (position 0 unused). Ref /root/reference/src/optics/Vmrs.jl:22-30.
    """

    vmr_h2o: jax.Array  # (nlay, ncol)
    vmr_o3: jax.Array   # (nlay, ncol)
    vmr: jax.Array      # (ngas+1,)


@pytree_dataclass
class Vmr:
    """Fully 3D VMRs ``(ngas+1, nlay, ncol)`` (ref Vmrs.jl:73-77)."""

    vmr: jax.Array


def tree_map_columns(col_fn, other_fn, pytree):
    """tree_map with ``col_fn`` on (potential) column leaves and ``other_fn``
    on leaves known NOT to be column-trailing.

    Column-axis helpers (pad/slice/chunk/shard) identify column leaves by a
    trailing-axis shape test — with ONE exception a shape test cannot see:
    the VmrGM global-mean vector, shape (ngas+1,), collides with
    ``shape[-1] == ncol`` whenever ncol == ngas+1, and a shape-based pad/
    chunk/shard would then silently corrupt every gas concentration. This
    wrapper excludes it STRUCTURALLY; all other replicated leaves in the
    state/BCs family are scalars or None (safe under any shape test).
    """

    def node_fn(node):
        if isinstance(node, VmrGM):
            return VmrGM(col_fn(node.vmr_h2o), col_fn(node.vmr_o3),
                         other_fn(node.vmr))
        return col_fn(node)

    return jax.tree_util.tree_map(
        node_fn, pytree, is_leaf=lambda n: isinstance(n, VmrGM)
    )


def get_vmr(vmr, ig: int):
    """VMR of gas ``ig`` (1-based static index; 0 = none -> 1.0).

    Mirrors get_vmr's special cases (ref Vmrs.jl:89-117): for VmrGM,
    ig 1 = h2o, ig 3 = o3, others are global means. ``ig`` is static so the
    branch resolves at trace time.
    """
    if isinstance(vmr, VmrGM):
        if ig == 0:
            return jnp.ones((), vmr.vmr_h2o.dtype)
        if ig == 1:
            return vmr.vmr_h2o
        if ig == 3:
            return vmr.vmr_o3
        return vmr.vmr[ig]
    if isinstance(vmr, Vmr):
        if ig == 0:
            return jnp.ones((), vmr.vmr.dtype)
        return vmr.vmr[ig]
    raise TypeError(f"unknown vmr container {type(vmr)}")


# ---------------------------------------------------------------------------
# Cloud / aerosol states
# ---------------------------------------------------------------------------


@pytree_dataclass(meta_fields=("ice_rgh",))
class CloudState:
    """Cloud state (ref AtmosphericStates.jl:91-114). All (nlay, ncol)."""

    cld_r_eff_liq: jax.Array
    cld_r_eff_ice: jax.Array
    cld_path_liq: jax.Array
    cld_path_ice: jax.Array
    cld_frac: jax.Array
    ice_rgh: int = 2  # 1 = none, 2 = medium, 3 = rough


@pytree_dataclass
class AerosolState:
    """Aerosol state (ref AtmosphericStates.jl:152-163).

    aero_size/aero_mass: (n_aero, nlay, ncol), MERRA type indexing
    (1-based types 1..15, see /root/reference/src/api/api_methods.jl:49-65).
    """

    aero_size: jax.Array
    aero_mass: jax.Array


# ---------------------------------------------------------------------------
# Atmospheric state
# ---------------------------------------------------------------------------


@pytree_dataclass
class AtmosphericState:
    """Full-physics atmospheric state (ref AtmosphericStates.jl:39-58)."""

    p_lay: jax.Array    # (nlay, ncol)
    t_lay: jax.Array    # (nlay, ncol)
    p_lev: jax.Array    # (nlay+1, ncol)
    t_lev: jax.Array    # (nlay+1, ncol)
    t_sfc: jax.Array    # (ncol,)
    col_dry: jax.Array  # (nlay, ncol) molecules/cm^2
    vmr: VmrGM | Vmr
    rel_hum: jax.Array | None = None      # (nlay, ncol), aerosol path only
    cloud_state: CloudState | None = None
    aerosol_state: AerosolState | None = None
    lon: jax.Array | None = None
    lat: jax.Array | None = None

    @property
    def nlay(self) -> int:
        return self.p_lay.shape[0]

    @property
    def ncol(self) -> int:
        return self.p_lay.shape[-1]


# ---------------------------------------------------------------------------
# Boundary conditions
# ---------------------------------------------------------------------------


@pytree_dataclass
class LwBCs:
    """Longwave BCs (ref BCs.jl:17-28)."""

    sfc_emis: jax.Array               # (nbnd, ncol)
    inc_flux: jax.Array | None = None # (ncol, ngpt)


@pytree_dataclass
class SwBCs:
    """Shortwave BCs (ref BCs.jl:30-52)."""

    cos_zenith: jax.Array        # (ncol,)
    toa_flux: jax.Array          # (ncol,)
    sfc_alb_direct: jax.Array    # (nbnd, ncol)
    sfc_alb_diffuse: jax.Array   # (nbnd, ncol)
    inc_flux_diffuse: jax.Array | None = None  # (ncol, ngpt)


# ---------------------------------------------------------------------------
# Precompute ops
# ---------------------------------------------------------------------------


def compute_col_gas(
    p_lev: jax.Array,
    params: RRTMGPParameters,
    vmr_h2o: jax.Array | None = None,
    lat: jax.Array | None = None,
) -> jax.Array:
    """Hydrostatic column density of moist air [molecules/cm^2], (nlay, ncol).

    Helmert gravity when latitude is given
    (ref /root/reference/src/optics/gas_optics.jl:16-40).
    """
    dtype = p_lev.dtype
    helmert1 = params.grav
    helmert2 = 0.02586
    m2_to_cm2 = 1.0e4
    if lat is not None:
        g0 = helmert1 - helmert2 * jnp.cos(2.0 * jnp.pi * lat / 180.0)  # (ncol,)
        g0 = g0[None, :]
    else:
        g0 = jnp.asarray(helmert1, dtype)
    dp = p_lev[:-1] - p_lev[1:]  # positive: level 0 = surface
    vmr = jnp.zeros((), dtype) if vmr_h2o is None else vmr_h2o
    m_air = params.molmass_dryair + params.molmass_water * vmr
    return dp * params.avogad / (m2_to_cm2 * m_air * g0)


def compute_relative_humidity(
    p_lay: jax.Array,
    t_lay: jax.Array,
    vmr_h2o: jax.Array,
    params: RRTMGPParameters,
) -> jax.Array:
    """Relative humidity used by MERRA aerosol optics, (nlay, ncol).

    Magnus-type formula, ref /root/reference/src/optics/gas_optics.jl:57-75.
    """
    mwd = params.molmass_water / params.molmass_dryair
    t_ref = 273.16
    q_lay_min = 1e-7
    mmr_h2o = vmr_h2o * mwd
    q_lay = mmr_h2o / (1.0 + mmr_h2o)
    q_tmp = jnp.maximum(q_lay_min, q_lay)
    es_tmp = jnp.exp((17.67 * (t_lay - t_ref)) / (t_lay - 29.65))
    return jnp.maximum(0.01 * (0.263 * p_lay * q_tmp) / es_tmp, 0.0)
