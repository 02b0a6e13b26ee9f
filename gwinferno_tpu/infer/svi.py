"""Stochastic variational inference: SVI driver, autoguides, ELBO, find_map.

Parity surface: the reference uses SVI only for MAP estimation
(``find_map`` = AutoDelta + Adam + Trace_ELBO, gwinferno/pipeline/
analysis.py:24-47); we provide that exact surface plus an AutoNormal
mean-field guide, with optimization by optax under one ``lax.scan`` (single
compile, no host round-trips).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax

from ..ppl.infer_util import _model_transforms
from ..ppl.infer_util import potential_energy

__all__ = ["SVI", "SVIRunResult", "AutoDelta", "AutoNormal", "Trace_ELBO", "Adam", "find_map"]


class SVIRunResult(NamedTuple):
    params: dict
    state: object
    losses: jax.Array


class Trace_ELBO:
    """Negative evidence lower bound.  ``num_particles`` MC samples for
    stochastic guides; AutoDelta needs none."""

    def __init__(self, num_particles=1):
        self.num_particles = num_particles


class Adam:
    """Thin optax.adam wrapper matching numpyro.optim.Adam(step_size)."""

    def __init__(self, step_size):
        self.step_size = step_size

    def to_optax(self):
        return optax.adam(self.step_size)


class AutoDelta:
    """MAP point-mass guide: variational params are the unconstrained site
    values; -ELBO == potential energy (joint density + Jacobian)."""

    def __init__(self, model, init_scale=0.1, init_values=None):
        """``init_values``: optional dict of CONSTRAINED site values to start
        from (numpyro's ``init_loc_fn=init_to_value`` parity); sites not
        listed start at ``init_scale``-jittered zeros in unconstrained space.
        """
        self.model = model
        self.init_scale = init_scale
        self.init_values = init_values or {}

    def init_params(self, key, model_args, model_kwargs):
        transforms, _, tr = _model_transforms(self.model, model_args, model_kwargs)
        self._transforms = transforms
        params = {}
        for name, t in transforms.items():
            if name in self.init_values:
                params[name] = t.inv(jnp.asarray(self.init_values[name], jnp.result_type(float)))
                continue
            shape = t.unconstrained_shape(jnp.shape(tr[name]["value"]))
            key, sub = jax.random.split(key)
            params[name] = self.init_scale * jax.random.normal(sub, shape)
        return params

    def neg_elbo(self, key, params, model_args, model_kwargs, num_particles=1):
        return potential_energy(self.model, model_args, model_kwargs, params)

    def median(self, params):
        """Constrained-space point estimate from variational params."""
        return {k: self._transforms[k](v) for k, v in params.items()}


class AutoNormal:
    """Mean-field Gaussian guide in unconstrained space (reparameterized)."""

    def __init__(self, model, init_scale=0.1):
        self.model = model
        self.init_scale = init_scale

    def init_params(self, key, model_args, model_kwargs):
        transforms, _, tr = _model_transforms(self.model, model_args, model_kwargs)
        self._transforms = transforms
        locs, log_scales = {}, {}
        for name, t in transforms.items():
            shape = t.unconstrained_shape(jnp.shape(tr[name]["value"]))
            key, sub = jax.random.split(key)
            locs[name] = self.init_scale * jax.random.normal(sub, shape)
            log_scales[name] = jnp.full(shape, jnp.log(self.init_scale))
        return {"loc": locs, "log_scale": log_scales}

    def neg_elbo(self, key, params, model_args, model_kwargs, num_particles=1):
        locs, log_scales = params["loc"], params["log_scale"]

        def one_particle(key):
            eps = {
                k: jax.random.normal(sub, jnp.shape(v))
                for (k, v), sub in zip(locs.items(), jax.random.split(key, len(locs)))
            }
            z = {k: locs[k] + jnp.exp(log_scales[k]) * eps[k] for k in locs}
            pe = potential_energy(self.model, model_args, model_kwargs, z)
            # entropy of the mean-field Gaussian (exact)
            ent = sum(jnp.sum(ls + 0.5 * jnp.log(2 * jnp.pi * jnp.e)) for ls in log_scales.values())
            return pe - ent

        keys = jax.random.split(key, num_particles)
        return jnp.mean(jax.vmap(one_particle)(keys))

    def median(self, params):
        return {k: self._transforms[k](v) for k, v in params["loc"].items()}

    def sample_posterior(self, key, params, sample_shape=()):
        locs, log_scales = params["loc"], params["log_scale"]
        out = {}
        for (k, loc), sub in zip(locs.items(), jax.random.split(key, len(locs))):
            eps = jax.random.normal(sub, tuple(sample_shape) + jnp.shape(loc))
            out[k] = self._transforms[k](loc + jnp.exp(log_scales[k]) * eps)
        return out


class SVI:
    """``SVI(model, guide, optim, loss).run(rng_key, num_steps, *args)``."""

    def __init__(self, model, guide, optim, loss):
        self.model = model
        self.guide = guide
        self.optim = optim.to_optax() if isinstance(optim, Adam) else optim
        self.loss = loss

    def run(self, rng_key, num_steps, *model_args, **model_kwargs):
        if isinstance(rng_key, int):
            rng_key = jax.random.PRNGKey(rng_key)
        key_init, key_steps = jax.random.split(rng_key)
        params = self.guide.init_params(key_init, model_args, model_kwargs)
        opt_state = self.optim.init(params)
        num_particles = getattr(self.loss, "num_particles", 1)

        def loss_fn(params, key):
            return self.guide.neg_elbo(key, params, model_args, model_kwargs, num_particles)

        def step(carry, key):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, key)
            updates, opt_state = self.optim.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key_steps, num_steps)
        (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), keys)
        return SVIRunResult(params=params, state=opt_state, losses=losses)


def find_map(rng_key, model, *model_args, Niter=100, lr=0.01, **model_kwargs):
    """MAP estimate via SVI with an AutoDelta guide and Adam on the ELBO.

    Returns the **constrained** parameter dict.  Parity:
    gwinferno/pipeline/analysis.py:24-47.
    """
    guide = AutoDelta(model)
    svi = SVI(model, guide, Adam(lr), Trace_ELBO())
    result = svi.run(rng_key, Niter, *model_args, **model_kwargs)
    return guide.median(result.params)
