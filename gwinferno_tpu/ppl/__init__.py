"""A compact probabilistic-programming layer (the NumPyro-DSL replacement).

Models are plain Python callables using four primitives -- ``sample``,
``deterministic``, ``factor``, ``plate`` -- the complete set the reference
library actually uses (gwinferno/pipeline/analysis.py:247-319).  Effect
handlers (``trace``, ``seed``, ``substitute``, ``condition``) interpret the
primitives; ``infer_util`` provides the unconstrained-space log-density /
potential-energy surface that the NUTS/HMC/SVI engines (and the test seam,
mirroring numpyro's ``unconstrain_fn`` + ``potential_energy``) consume.

Everything is functional and trace-once: a model evaluation is pure given
(params, rng), so the whole density is jit/grad/vmap-safe by construction.
"""

from . import distributions
from .handlers import block
from .handlers import condition
from .handlers import seed
from .handlers import substitute
from .handlers import trace
from .infer_util import constrain_fn
from .infer_util import log_density
from .infer_util import potential_energy
from .infer_util import transform_fn
from .infer_util import unconstrain_fn
from .primitives import deterministic
from .primitives import factor
from .primitives import plate
from .primitives import sample

__all__ = [
    "distributions",
    "sample",
    "deterministic",
    "factor",
    "plate",
    "trace",
    "seed",
    "substitute",
    "condition",
    "block",
    "log_density",
    "potential_energy",
    "unconstrain_fn",
    "constrain_fn",
    "transform_fn",
]
