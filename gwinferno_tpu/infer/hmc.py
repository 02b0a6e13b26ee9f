"""Plain HMC kernel (fixed trajectory length, Metropolis-corrected).

Shares the NUTSState container so the MCMC driver treats both uniformly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .hmc_util import MassMatrix
from .hmc_util import kinetic_energy
from .hmc_util import leapfrog
from .hmc_util import sample_momentum
from .nuts import NUTSState
from .nuts import nuts_init

__all__ = ["HMC", "hmc_transition"]


def hmc_transition(
    potential_fn,
    state: NUTSState,
    mm: MassMatrix,
    step_size,
    key,
    trajectory_length=2.0 * jnp.pi,
    max_num_steps=1023,
):
    """One HMC transition: leapfrog for ~trajectory_length/step_size steps,
    then accept/reject on the energy difference."""
    step_fn = leapfrog(potential_fn)
    dtype = state.z.dtype

    key_mom, key_accept = jax.random.split(key)
    r0 = sample_momentum(mm, key_mom, state.z)
    h0 = state.pe + kinetic_energy(mm, r0)

    num_steps = jnp.clip(
        jnp.ceil(trajectory_length / step_size).astype(jnp.int32), 1, max_num_steps
    )

    def body(carry):
        i, z, r, pe, grad = carry
        z, r, pe, grad = step_fn(z, r, grad, step_size, mm)
        return i + 1, z, r, pe, grad

    def cond(carry):
        return carry[0] < num_steps

    _, z1, r1, pe1, grad1 = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), state.z, r0, state.pe, state.grad))

    h1 = pe1 + kinetic_energy(mm, r1)
    delta = h1 - h0
    delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
    accept_prob = jnp.minimum(1.0, jnp.exp(-delta))
    accept = jax.random.uniform(key_accept, dtype=dtype) < accept_prob
    diverging = delta > 1000.0

    return NUTSState(
        z=jnp.where(accept, z1, state.z),
        pe=jnp.where(accept, pe1, state.pe),
        grad=jnp.where(accept, grad1, state.grad),
        energy=h0,
        accept_prob=accept_prob,
        num_steps=num_steps,
        diverging=diverging,
        tree_depth=jnp.zeros((), jnp.int32),
    )


class HMC:
    """HMC kernel configuration (``numpyro.infer.HMC`` parity surface)."""

    def __init__(
        self,
        model,
        step_size=1.0,
        trajectory_length=2.0 * jnp.pi,
        adapt_step_size=True,
        adapt_mass_matrix=True,
        dense_mass=False,
        target_accept_prob=0.8,
        init_strategy=None,
    ):
        self.model = model
        self.step_size = step_size
        self.trajectory_length = trajectory_length
        self.adapt_step_size = adapt_step_size
        self.adapt_mass_matrix = adapt_mass_matrix
        self.dense_mass = dense_mass
        self.target_accept_prob = target_accept_prob
        self.init_strategy = init_strategy

    def make_transition(self, potential_fn):
        def transition(state, mm, step_size, key):
            return hmc_transition(
                potential_fn, state, mm, step_size, key,
                trajectory_length=self.trajectory_length,
            )

        return transition

    def make_init(self, potential_fn):
        return lambda z: nuts_init(potential_fn, z)
