"""HMC building blocks: leapfrog integrator, kinetic energy / momentum
machinery for diagonal and dense mass matrices, Welford covariance
estimation, Nesterov dual averaging, and the Stan-style warmup window
schedule.

Everything operates on flat unconstrained vectors ``(dim,)`` (batching over
chains happens one level up via ``vmap``), is jit-safe, and avoids python
branching on traced values.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MassMatrix",
    "kinetic_energy",
    "velocity",
    "sample_momentum",
    "leapfrog",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_pool",
    "welford_covariance",
    "DAState",
    "da_init",
    "da_update",
    "build_warmup_schedule",
    "find_reasonable_step_size",
]


class MassMatrix(NamedTuple):
    """Inverse mass matrix and the Cholesky sqrt of the mass matrix.

    ``inverse`` is ``(dim,)`` for diagonal or ``(dim, dim)`` for dense.
    ``mass_chol`` satisfies ``mass_chol @ mass_chol.T = M = inverse^-1`` and
    is used to sample momenta ``r = mass_chol @ eps``.
    """

    inverse: jax.Array
    mass_chol: jax.Array

    @property
    def is_dense(self):
        return self.inverse.ndim == 2


def mass_matrix_from_inverse(inverse):
    if inverse.ndim == 1:
        return MassMatrix(inverse, jnp.sqrt(1.0 / inverse))
    ident = jnp.eye(inverse.shape[0], dtype=inverse.dtype)
    inv_chol = jnp.linalg.cholesky(inverse)
    # M^(1/2) = L^-T where inverse = L L^T  (cov(L^-T eps) = inverse^-1)
    mass_chol = jax.scipy.linalg.solve_triangular(inv_chol, ident, lower=True, trans=1)
    return MassMatrix(inverse, mass_chol)


def identity_mass_matrix(dim, dense=False, dtype=jnp.float32):
    inv = jnp.eye(dim, dtype=dtype) if dense else jnp.ones(dim, dtype=dtype)
    return mass_matrix_from_inverse(inv)


def velocity(mm: MassMatrix, r):
    return mm.inverse @ r if mm.is_dense else mm.inverse * r


def kinetic_energy(mm: MassMatrix, r):
    return 0.5 * jnp.dot(r, velocity(mm, r))


def sample_momentum(mm: MassMatrix, key, shape_like):
    eps = jax.random.normal(key, jnp.shape(shape_like), dtype=jnp.result_type(shape_like))
    return mm.mass_chol @ eps if mm.is_dense else mm.mass_chol * eps


def leapfrog(potential_fn):
    """One velocity-Verlet step. Returns ``step(z, r, grad, step_size, mm)``
    -> ``(z_new, r_new, pe_new, grad_new)`` with gradient caching (one
    gradient evaluation per step)."""
    pe_and_grad = jax.value_and_grad(potential_fn)

    def step(z, r, grad, step_size, mm: MassMatrix):
        r_half = r - 0.5 * step_size * grad
        z_new = z + step_size * velocity(mm, r_half)
        pe_new, grad_new = pe_and_grad(z_new)
        r_new = r_half - 0.5 * step_size * grad_new
        return z_new, r_new, pe_new, grad_new

    return step


# ---------------------------------------------------------------- Welford

class WelfordState(NamedTuple):
    mean: jax.Array
    m2: jax.Array  # (dim,) or (dim, dim)
    count: jax.Array


def welford_init(dim, dense=False, dtype=jnp.float32):
    m2 = jnp.zeros((dim, dim), dtype=dtype) if dense else jnp.zeros(dim, dtype=dtype)
    return WelfordState(jnp.zeros(dim, dtype=dtype), m2, jnp.zeros((), dtype=dtype))


def welford_update(state: WelfordState, x):
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    delta2 = x - mean
    if state.m2.ndim == 2:
        m2 = state.m2 + jnp.outer(delta, delta2)
    else:
        m2 = state.m2 + delta * delta2
    return WelfordState(mean, m2, count)


def welford_pool(wf: WelfordState):
    """Pool a chain-batched ``WelfordState`` (every leaf carries a leading
    chain axis) into one state over all chains' draws -- the exact parallel
    combine of Chan et al., including the between-chain mean-dispersion term
    that naive moment averaging drops.  Under pjit with the chain axis
    sharded, the sums lower to psum collectives over ICI."""
    c = wf.count  # (nc,)
    tot = jnp.sum(c)
    safe_tot = jnp.maximum(tot, 1.0)
    mean = jnp.sum(wf.mean * c[:, None], axis=0) / safe_tot
    dev = wf.mean - mean  # (nc, dim)
    if wf.m2.ndim == 3:
        between = jnp.einsum("c,ci,cj->ij", c, dev, dev)
    else:
        between = jnp.sum(c[:, None] * dev * dev, axis=0)
    m2 = jnp.sum(wf.m2, axis=0) + between
    return WelfordState(mean, m2, tot)


def welford_covariance(state: WelfordState, regularize=True):
    """Sample (co)variance with Stan's shrinkage toward the unit matrix."""
    n = jnp.maximum(state.count, 2.0)
    cov = state.m2 / (n - 1.0)
    if regularize:
        scale = n / (n + 5.0)
        shrink = 1e-3 * (5.0 / (n + 5.0))
        if cov.ndim == 2:
            cov = scale * cov + shrink * jnp.eye(cov.shape[0], dtype=cov.dtype)
        else:
            cov = scale * cov + shrink
    return cov


# ---------------------------------------------------------------- dual averaging

class DAState(NamedTuple):
    log_step: jax.Array
    log_step_avg: jax.Array
    grad_avg: jax.Array
    t: jax.Array
    prox_center: jax.Array


def da_init(step_size):
    log_step = jnp.log(step_size)
    return DAState(
        log_step=log_step,
        log_step_avg=jnp.zeros_like(log_step),
        grad_avg=jnp.zeros_like(log_step),
        t=jnp.zeros_like(log_step),
        prox_center=jnp.log(10.0) + log_step,
    )


def da_update(state: DAState, accept_prob, target=0.8, gamma=0.05, t0=10.0, kappa=0.75):
    t = state.t + 1.0
    g = target - accept_prob
    grad_avg = (1.0 - 1.0 / (t + t0)) * state.grad_avg + g / (t + t0)
    log_step = state.prox_center - jnp.sqrt(t) / gamma * grad_avg
    weight = t ** (-kappa)
    log_step_avg = weight * log_step + (1.0 - weight) * state.log_step_avg
    return DAState(log_step, log_step_avg, grad_avg, t, state.prox_center)


# ---------------------------------------------------------------- warmup schedule

def build_warmup_schedule(num_warmup, adapt_mass_matrix=True):
    """Stan-style warmup windows.  Returns numpy bool arrays of length
    ``num_warmup``: ``(update_mass_matrix_at, end_of_slow_window, in_slow_window)``.

    Layout: 75-step fast initial buffer (step size only), doubling slow
    windows from 25 steps (mass matrix + step size), 50-step fast terminal
    buffer.  Short warmups scale the buffers down proportionally.
    """
    init_buffer, base_window, term_buffer = 75, 25, 50
    if num_warmup < init_buffer + base_window + term_buffer:
        scale = num_warmup / (init_buffer + base_window + term_buffer)
        init_buffer = max(1, int(round(init_buffer * scale)))
        term_buffer = max(1, int(round(term_buffer * scale)))
        base_window = max(1, num_warmup - init_buffer - term_buffer)

    in_slow = np.zeros(num_warmup, dtype=bool)
    window_end = np.zeros(num_warmup, dtype=bool)
    if adapt_mass_matrix and num_warmup > 0:
        start = init_buffer
        size = base_window
        while start < num_warmup - term_buffer:
            end = start + size
            if end + 2 * size > num_warmup - term_buffer:
                end = num_warmup - term_buffer  # absorb the remainder
            end = min(end, num_warmup - term_buffer)
            in_slow[start:end] = True
            window_end[end - 1] = True
            start = end
            size *= 2
    return window_end, in_slow


# ---------------------------------------------------------------- init step size

def find_reasonable_step_size(potential_fn, mm: MassMatrix, z, key, init_step_size=1.0, target=0.8):
    """Double/halve the step size until the leapfrog acceptance probability
    crosses ``target`` (Stan/numpyro heuristic), inside jit."""
    step = leapfrog(potential_fn)
    pe0, grad0 = jax.value_and_grad(potential_fn)(z)

    def accept_log_prob(step_size, r):
        h0 = pe0 + kinetic_energy(mm, r)
        z1, r1, pe1, _ = step(z, r, grad0, step_size, mm)
        h1 = pe1 + kinetic_energy(mm, r1)
        return h0 - h1  # log accept prob (can be > 0)

    def cond(carry):
        step_size, direction, last_direction, _ = carry
        not_extreme = (step_size < 1e7) & (step_size > 1e-17)
        # keep going while we haven't yet moved (last == 0) or the
        # double/halve direction is unchanged; stop on the first flip
        return not_extreme & ((last_direction == 0) | (direction == last_direction))

    def body(carry):
        step_size, direction, _, k = carry
        k, sub = jax.random.split(k)
        step_size = step_size * (2.0**direction)
        r = sample_momentum(mm, sub, z)
        alog = accept_log_prob(step_size, r)
        alog = jnp.where(jnp.isnan(alog), -jnp.inf, alog)
        new_direction = jnp.where(alog > jnp.log(target), 1, -1).astype(jnp.int32)
        return step_size, new_direction, direction, k

    step_size, direction, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(init_step_size, dtype=z.dtype), jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), key)
    )
    # the loop exits one doubling past the accept-prob crossing; that one-step
    # overshoot is deliberate (dual averaging starts from here and corrects
    # within a few iterations) -- only clamp to a sane numeric range
    return jnp.clip(step_size, 1e-17, 1e7)
