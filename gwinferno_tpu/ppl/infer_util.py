"""Inference utilities over the PPL: joint log-density and the
unconstrained-space potential energy that the samplers differentiate.

This reproduces the numpyro seam the reference tests rely on
(``unconstrain_fn`` + ``potential_energy`` + ``value_and_grad``,
reference tests/inference_test.py:313-347), so the same smoke-test pattern
ports directly.
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp

from . import handlers
from .constraints import biject_to

__all__ = [
    "log_density",
    "potential_energy",
    "unconstrain_fn",
    "constrain_fn",
    "transform_fn",
    "init_to_uniform",
    "find_valid_initial_params",
]


def _sum_all(x):
    return jnp.sum(x)


def log_density(model, model_args=(), model_kwargs=None, params=None):
    """Joint log-density of ``model`` at constrained ``params``.

    Returns ``(log_joint, trace)``.  Sites absent from ``params`` must be
    observed, deterministic, or draw via an explicit rng_key.
    """
    model_kwargs = model_kwargs or {}
    params = params or {}
    with handlers.trace() as tr, handlers.substitute(data=params):
        model(*model_args, **model_kwargs)
    log_joint = jnp.zeros(())
    for name, site in tr.trace.items():
        if site["type"] != "sample":
            continue
        if site.get("explicit_rng") and name not in params and not site["is_observed"]:
            # trace-time draw with explicit key (reference categorical quirk):
            # treated as given, no density contribution to the hyper-posterior
            continue
        lp = site["fn"].log_prob(site["value"])
        log_joint = log_joint + _sum_all(lp)
    return log_joint, tr.trace


def _model_transforms(model, model_args=(), model_kwargs=None, params=None):
    """Trace once (substituting params) and collect site -> bijector."""
    model_kwargs = model_kwargs or {}
    with handlers.trace() as tr, handlers.substitute(data=params or {}), handlers.seed(rng_seed=0):
        model(*model_args, **model_kwargs)
    transforms, discrete = {}, set()
    for name, site in tr.trace.items():
        if site["type"] != "sample" or site["is_observed"]:
            continue
        if site.get("explicit_rng") and (params is None or name not in params):
            continue
        support = site["fn"].support
        if getattr(support, "is_discrete", False):
            discrete.add(name)
            continue
        transforms[name] = biject_to(support)
    return transforms, discrete, tr.trace


def unconstrain_fn(model, model_args=(), model_kwargs=None, params=None):
    """Map constrained site values to unconstrained space (numpyro parity)."""
    transforms, _, _ = _model_transforms(model, model_args, model_kwargs, params)
    return {k: transforms[k].inv(v) if k in transforms else v for k, v in params.items()}


def constrain_fn(model, model_args=(), model_kwargs=None, params=None):
    """Map unconstrained site values back to constrained space."""
    transforms, _, _ = _model_transforms(model, model_args, model_kwargs, None)
    return {k: transforms[k](v) if k in transforms else v for k, v in params.items()}


def transform_fn(transforms, params, invert=False):
    out = {}
    for k, v in params.items():
        t = transforms.get(k)
        if t is None:
            out[k] = v
        else:
            out[k] = t.inv(v) if invert else t(v)
    return out


def potential_energy(model, model_args=(), model_kwargs=None, params=None):
    """Negative log-joint at *unconstrained* ``params``, including the
    log-Jacobian of the constraining transforms.  Differentiable w.r.t.
    ``params``; this is the function HMC/NUTS integrates."""
    model_kwargs = model_kwargs or {}
    params = params or {}

    jac_accum = []

    def substitute_fn(msg):
        name = msg["name"]
        if name not in params:
            return None
        t = biject_to(msg["fn"].support)
        u = params[name]
        y = t(u)
        jac_accum.append(_sum_all(t.log_abs_det_jacobian(u, y)))
        return y

    with handlers.trace() as tr, handlers.substitute(substitute_fn=substitute_fn):
        model(*model_args, **model_kwargs)

    log_joint = jnp.zeros(())
    for name, site in tr.trace.items():
        if site["type"] != "sample":
            continue
        if site.get("explicit_rng") and name not in params and not site["is_observed"]:
            continue
        log_joint = log_joint + _sum_all(site["fn"].log_prob(site["value"]))
    for j in jac_accum:
        log_joint = log_joint + j
    return -log_joint


def init_to_uniform(radius=2.0):
    """Init strategy: uniform(-radius, radius) in unconstrained space."""

    def init(key, shape):
        return jax.random.uniform(key, shape, minval=-radius, maxval=radius)

    return init


def find_valid_initial_params(
    key,
    model,
    model_args=(),
    model_kwargs=None,
    init_strategy=None,
    max_tries=100,
    prototype_params=None,
):
    """Draw unconstrained initial params with finite potential energy and
    finite gradient, retrying up to ``max_tries`` (numpyro-style)."""
    init_strategy = init_strategy or init_to_uniform()
    model_kwargs = model_kwargs or {}

    if prototype_params is None:
        transforms, _, tr = _model_transforms(model, model_args, model_kwargs)
        prototype_params = {}
        for name, t in transforms.items():
            site_value = tr[name]["value"]
            ushape = t.unconstrained_shape(jnp.shape(site_value))
            prototype_params[name] = jnp.zeros(ushape)

    def draw(key):
        keys = jax.random.split(key, len(prototype_params)) if prototype_params else []
        return {
            name: init_strategy(k, jnp.shape(proto))
            for k, (name, proto) in zip(keys, prototype_params.items())
        }

    def pe_fn(p):
        return potential_energy(model, model_args, model_kwargs, p)

    for _ in range(max_tries):
        key, sub = jax.random.split(key)
        params = draw(sub)
        pe, grad = jax.value_and_grad(pe_fn)(params)
        gflat, _ = jax.flatten_util.ravel_pytree(grad)
        if jnp.isfinite(pe) and jnp.all(jnp.isfinite(gflat)):
            return params
    raise RuntimeError(f"no valid initial params found in {max_tries} tries")
