"""Inference engines: batched NUTS/HMC, SVI, and SMC, built TPU-first.

Design (SURVEY.md S7.1 item 4): every kernel is written against a **batched
chain axis** from day one -- state pytrees carry a leading ``(num_chains,)``
dimension, transitions are ``vmap``-ed, and adaptation reductions are plain
``mean``s over the chain axis so that under ``pjit`` with chains sharded over
a device mesh XLA lowers them to ICI collectives.  Single-host and multi-host
are the same code.
"""

from .hmc import HMC
from .mcmc import MCMC
from .nuts import NUTS
from .smc import SMC
from .svi import SVI
from .svi import Adam
from .svi import AutoDelta
from .svi import AutoNormal
from .svi import Trace_ELBO
from .svi import find_map

__all__ = ["NUTS", "HMC", "MCMC", "SVI", "Adam", "AutoDelta", "AutoNormal", "Trace_ELBO", "find_map", "SMC"]
