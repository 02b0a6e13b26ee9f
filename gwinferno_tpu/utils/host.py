"""Host/device array-namespace dispatch for construction-time caches.

Convention (round 3): every cache built at model-construction time -- design
matrices, cosmology tables, validity masks, normalization grids -- stays
HOST-side numpy.  Jitted programs close over these as ordinary constants and
XLA embeds them into the executable at compile; host->device happens once,
at executable load.

Why this matters: a closed-over *device* array must be fetched back to the
host during ``jit`` lowering (MLIR constant literalization).  On a remote-
tunneled TPU that fetch runs at ~30 s/MB -- round 2's "7-minute cold
compile" was mostly this, not XLA (measured: tools/profile_compile.py;
fetching eight 1.25 MB device constants alone took 229 s on the tunnel while
the actual XLA compile of the same program took 2 s).

``xp_for(*arrays)`` returns ``jax.numpy`` if any argument is a tracer or a
``jax.Array`` (runtime path: jit-traced or explicitly on-device), else
``numpy`` (construction path).  Code written against the returned namespace
works identically in both worlds for the elementwise/where/linspace subset
used here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["xp_for", "is_traced"]


def is_traced(*arrays):
    """True if any argument is a JAX tracer or device array."""
    return any(isinstance(a, (jax.core.Tracer, jax.Array)) for a in arrays)


def xp_for(*arrays):
    """``jnp`` when any input is traced/on-device, else ``np`` (host)."""
    return jnp if is_traced(*arrays) else np
