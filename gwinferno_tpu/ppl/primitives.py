"""PPL primitives: ``sample``, ``deterministic``, ``factor``, ``plate``.

These are the four primitives the reference's models use
(gwinferno/pipeline/analysis.py:247-319 is the complete usage inventory).
Effectful interpretation happens through a handler stack; with no handlers
active, ``sample`` requires an explicit ``rng_key``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distributions import Unit

_HANDLER_STACK = []


def apply_stack(msg):
    """Send a message through the active handler stack (outermost last)."""
    for handler in reversed(_HANDLER_STACK):
        handler.process_message(msg)
        if msg.get("stop"):
            break
    default_process_message(msg)
    for handler in _HANDLER_STACK:
        handler.postprocess_message(msg)
    return msg


def default_process_message(msg):
    if msg["value"] is None:
        if msg["type"] == "sample":
            if msg["rng_key"] is None:
                raise ValueError(
                    f"site '{msg['name']}' has no value: seed the model with "
                    "handlers.seed(...) or substitute a value"
                )
            msg["value"] = msg["fn"].sample(msg["rng_key"], msg["sample_shape"])
        elif msg["type"] == "deterministic":
            raise ValueError(f"deterministic site '{msg['name']}' missing value")


def sample(name, fn, obs=None, rng_key=None, sample_shape=()):
    """Declare a random variable named ``name`` distributed as ``fn``.

    ``obs`` marks the site observed (its density contributes, value fixed).
    An explicit ``rng_key`` draws immediately at trace time -- this is how the
    reference samples its latent categorical subpopulation assignments
    (analysis.py:248-252) and we preserve that behavior.
    """
    if not _HANDLER_STACK and obs is None and rng_key is None:
        raise ValueError(f"sample('{name}') outside an effect handler requires rng_key")
    msg = {
        "type": "sample",
        "name": name,
        "fn": fn,
        "value": obs,
        "is_observed": obs is not None,
        "rng_key": rng_key,
        "explicit_rng": rng_key is not None,
        "sample_shape": tuple(sample_shape),
        "cond_indep_stack": list(_PLATE_STACK),
    }
    apply_stack(msg)
    return msg["value"]


def deterministic(name, value):
    """Record a named deterministic quantity in the trace (the reference's
    diagnostics-riding-along-in-the-posterior pattern, SURVEY.md S5)."""
    msg = {
        "type": "deterministic",
        "name": name,
        "fn": None,
        "value": value,
        "is_observed": True,
        "rng_key": None,
        "sample_shape": (),
        "cond_indep_stack": [],
    }
    apply_stack(msg)
    return msg["value"]


def factor(name, log_factor):
    """Add an arbitrary log-probability term to the joint density."""
    unit = Unit(log_factor)
    msg = {
        "type": "sample",
        "name": name,
        "fn": unit,
        "value": jnp.zeros(()),
        "is_observed": True,
        "rng_key": None,
        "sample_shape": (),
        "cond_indep_stack": [],
    }
    apply_stack(msg)
    return None


_PLATE_STACK = []


class plate:
    """Conditionally-independent batch context.

    Matches the reference usage (``with plate("nObs", N) as idx``): yields the
    index array and stacks a (name, size, dim) frame so enclosed sample sites
    can later be recognized as batched.  Log-density accumulation sums over
    all dims anyway, so no extra bookkeeping is required for correctness of
    the joint density.
    """

    def __init__(self, name, size, dim=None):
        self.name, self.size, self.dim = name, size, dim if dim is not None else -1

    def __enter__(self):
        _PLATE_STACK.append((self.name, self.size, self.dim))
        return jnp.arange(self.size)

    def __exit__(self, *exc):
        _PLATE_STACK.pop()
        return False


def get_rng_key():
    """Fetch a fresh rng key from the innermost seed handler, if any."""
    from .handlers import seed as _seed

    for handler in reversed(_HANDLER_STACK):
        if isinstance(handler, _seed):
            return handler.next_key()
    return None
