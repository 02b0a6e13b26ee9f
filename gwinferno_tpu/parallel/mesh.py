"""Device-mesh construction and multi-host initialization.

The scaling design (SURVEY.md S2.9): one global mesh with axes
``("chain", "data")`` -- chains (or SMC particles) shard over ``chain``,
the event/injection Monte-Carlo axes shard over ``data``.  Collectives ride
ICI within a slice and DCN across slices; user code only annotates
shardings and lets XLA insert the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["create_mesh", "distributed_initialize"]


def distributed_initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (no-op when single-process or already up)."""
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        else:
            jax.distributed.initialize()
    except (RuntimeError, ValueError):
        pass  # single-process or already initialized


def create_mesh(n_devices=None, chain_axis_size=None, axis_names=("chain", "data"), devices=None):
    """Build a 2-D ``(chain, data)`` mesh over the first ``n_devices`` devices.

    ``chain_axis_size`` defaults to the largest power-of-two split that keeps
    both axes nontrivial (or 1 when n_devices is 1).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if chain_axis_size is None:
        chain_axis_size = 1
        while chain_axis_size * 2 <= n and n % (chain_axis_size * 2) == 0 and chain_axis_size * chain_axis_size < n:
            chain_axis_size *= 2
    assert n % chain_axis_size == 0, (n, chain_axis_size)
    arr = np.array(devices).reshape(chain_axis_size, n // chain_axis_size)
    return Mesh(arr, axis_names)
