"""Chain-state checkpoint / resume.

New capability beyond the reference (SURVEY.md S5: the reference has only
results-level saving).  Persists the full post-sampling MCMC state -- chain
positions/gradients, mass matrix, step size, rng key -- so long runs can be
continued across preemptions: ``mcmc.run(rng, ..., post_warmup_state=
load_checkpoint(path))`` skips warmup and continues sampling exactly where
the saved run stopped.
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint"]

_STATE_FIELDS = ["z", "pe", "grad", "energy", "accept_prob", "num_steps", "diverging", "tree_depth"]


def save_checkpoint(path, mcmc):
    """Write ``mcmc.post_warmup_state`` (set by a completed ``run``) to an npz."""
    st = mcmc.post_warmup_state
    arrays = {f"state_{name}": np.asarray(v) for name, v in zip(_STATE_FIELDS, st["state"])}
    arrays["inverse_mass_matrix"] = np.asarray(st["inverse_mass_matrix"])
    arrays["mass_chol"] = np.asarray(st["mass_chol"])
    arrays["step_size"] = np.asarray(st["step_size"])
    arrays["rng_key"] = np.asarray(st["rng_key"])
    np.savez(path, **arrays)


def load_checkpoint(path):
    """Read a checkpoint into the dict ``MCMC.run(post_warmup_state=...)`` takes."""
    with np.load(path) as f:
        state = tuple(f[f"state_{name}"] for name in _STATE_FIELDS)
        return {
            "state": state,
            "inverse_mass_matrix": f["inverse_mass_matrix"],
            "mass_chol": f["mass_chol"],
            "step_size": f["step_size"],
            "rng_key": f["rng_key"],
        }
