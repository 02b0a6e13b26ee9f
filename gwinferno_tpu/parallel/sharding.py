"""Sharding helpers: placement of chain states and Monte-Carlo data banks on
a mesh, and explicitly-sharded reductions.

The likelihood's two hot reductions (logsumexp over the PE sample axis,
logsumexp over the injection axis -- SURVEY.md S5 'long-context analogue')
shard as: shard-local logsumexp + cross-shard max/sum combine.  Under ``jit``
with NamedSharding inputs, XLA derives exactly that from the plain
``logsumexp``; ``sharded_logsumexp`` provides the explicit ``shard_map``
version for when manual control (or a Pallas inner kernel) is wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

__all__ = ["shard_chain_state", "shard_data_dict", "sharded_logsumexp"]


def shard_chain_state(mesh, state, chain_axis="chain"):
    """Place every leaf of a chain-batched pytree with its leading axis
    sharded over the mesh's chain axis."""

    def place(x):
        spec = P(chain_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, state)


def shard_data_dict(mesh, data, data_axis="data", axis=0):
    """Place each array of a data dict with dimension ``axis`` sharded over
    the mesh's data axis (event axis of PE banks, injection axis of the
    selection bank), replicated over the chain axis."""

    def place(x):
        spec = [None] * x.ndim
        if x.ndim > axis and x.shape[axis] % mesh.shape[data_axis] == 0:
            spec[axis] = data_axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, data)


def sharded_logsumexp(x, axis_name, axis=-1):
    """logsumexp over a sharded axis inside shard_map: local reduce, then a
    pmax/psum combine over ``axis_name`` (numerically stable)."""
    local_max = jnp.max(x, axis=axis)
    global_max = jax.lax.pmax(local_max, axis_name)
    local_sum = jnp.sum(jnp.exp(x - jnp.expand_dims(global_max, axis)), axis=axis)
    global_sum = jax.lax.psum(local_sum, axis_name)
    return global_max + jnp.log(global_sum)


