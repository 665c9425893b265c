"""Index-order-tagged data layouts for host-model interop.

Mirrors /root/reference/src/api/datalayouts.jl: the reference wraps its
arrays in ``RRTMGPData{Order}`` so a host model (ClimaAtmos) can hand over
data in its own index order and broadcast scalars/columns into the radiation
grid (``set_cols!``/``set_domain!``).

JAX adaptation: arrays are immutable, so the mutating ``set_cols!`` becomes
``set_cols(data, value) -> data`` returning a new wrapper; the broadcasting
semantics (scalar fill, per-column vector broadcast over vertical, per-level
vector broadcast over columns) match the reference
(datalayouts.jl:150-194).

Orders (named after reference types, dimensions listed leading->trailing):
  NVCOrder  (N, vertical, column)
  VCOrder   (vertical, column)
  NCOrder   (N, column)
  NOrder    (N,)
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp

from .pytree import pytree_dataclass


class NVCOrder:
    ndim: ClassVar[int] = 3


class VCOrder:
    ndim: ClassVar[int] = 2


class NCOrder:
    ndim: ClassVar[int] = 2


class NOrder:
    ndim: ClassVar[int] = 1


@pytree_dataclass(meta_fields=("order",))
class RRTMGPData:
    """Index-order-tagged array wrapper (ref datalayouts.jl:57-63)."""

    array: jax.Array
    order: type = VCOrder

    def __post_init__(self):
        if self.array.ndim != self.order.ndim:
            raise ValueError(
                f"{self.order.__name__} expects {self.order.ndim}D, got {self.array.ndim}D"
            )

    @property
    def shape(self):
        return self.array.shape

    @property
    def dtype(self):
        return self.array.dtype


def nvc_data(nlay: int, ncol: int, n: int = 1, dtype=jnp.float32) -> RRTMGPData:
    return RRTMGPData(jnp.zeros((n, nlay, ncol), dtype), NVCOrder)


def vc_data(nlay: int, ncol: int, dtype=jnp.float32) -> RRTMGPData:
    return RRTMGPData(jnp.zeros((nlay, ncol), dtype), VCOrder)


def nc_data(ncol: int, n: int = 1, dtype=jnp.float32) -> RRTMGPData:
    return RRTMGPData(jnp.zeros((n, ncol), dtype), NCOrder)


def n_data(n: int, dtype=jnp.float32) -> RRTMGPData:
    return RRTMGPData(jnp.zeros((n,), dtype), NOrder)


def set_cols(data: RRTMGPData, value) -> RRTMGPData:
    """Broadcast ``value`` into ``data``'s columns (ref datalayouts.jl:160-194).

    Accepted value shapes for 2D data (v, c): scalar, (v, c), (v,), (1, c);
    for 3D (n, v, c) with n == 1: (v, c); otherwise exact shape.
    """
    arr = data.array
    value = jnp.asarray(value, arr.dtype) if not jnp.isscalar(value) else value
    if jnp.ndim(value) == 0:
        return dataclasses.replace(data, array=jnp.full_like(arr, value))
    if arr.ndim == 2:
        if value.shape == arr.shape:
            new = value
        elif arr.shape[0] == 1 and value.shape == (arr.shape[1],):
            new = value[None, :]
        elif value.shape == (arr.shape[0],):
            new = jnp.broadcast_to(value[:, None], arr.shape)
        elif value.shape == (1, arr.shape[1]):
            new = jnp.broadcast_to(value, arr.shape)
        else:
            raise ValueError(f"cannot set {arr.shape} from {value.shape}")
    elif arr.ndim == 3 and arr.shape[0] == 1 and value.ndim == 2:
        new = value[None]
    elif value.shape == arr.shape:
        new = value
    else:
        raise ValueError(f"cannot set {arr.shape} from {value.shape}")
    return dataclasses.replace(data, array=jnp.asarray(new, arr.dtype))


def domain_view(isothermal_boundary_layer: bool, data: RRTMGPData) -> RRTMGPData:
    """View excluding the isothermal boundary layer's extra top layer
    (ref api_methods.jl:17-42). Vertical axis is the order's V axis."""
    if not isothermal_boundary_layer:
        return data
    if data.order is NVCOrder:
        return dataclasses.replace(data, array=data.array[:, :-1, :])
    if data.order is VCOrder:
        return dataclasses.replace(data, array=data.array[:-1, :])
    raise TypeError(f"domain_view undefined for order {data.order.__name__}")


def set_domain(data: RRTMGPData, value, isothermal_boundary_layer: bool) -> RRTMGPData:
    """Set the domain portion (excluding boundary layer) to ``value``
    (ref datalayouts.jl:150-153)."""
    if not isothermal_boundary_layer:
        return set_cols(data, value)
    inner = set_cols(domain_view(True, data), value)
    if data.order is NVCOrder:
        arr = data.array.at[:, :-1, :].set(inner.array)
    else:
        arr = data.array.at[:-1, :].set(inner.array)
    return dataclasses.replace(data, array=arr)
