"""Multinomial NUTS with an iterative (jit-native) tree builder.

The recursive NUTS of Hoffman & Gelman cannot live under ``jit``; we use the
iterative formulation (Phan & Pradhan's scheme, as in numpyro): a doubling
loop of ``lax.while_loop``s whose inner subtree construction does U-turn
checks against a ``max_tree_depth``-sized checkpoint stack, so the whole
transition is one statically-shaped XLA program -- vmappable across chains
with divergent per-chain tree depths (finished lanes are masked, not
branched).

Proposal scheme: multinomial sampling within subtrees (progressive, Gumbel-
free), biased progressive sampling across doublings (favors the new subtree,
as in Stan).  Termination: generalized U-turn criterion on momentum sums,
checked at every power-of-two internal node, plus divergence at
``max_delta_energy``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc_util import MassMatrix
from .hmc_util import kinetic_energy
from .hmc_util import leapfrog
from .hmc_util import sample_momentum
from .hmc_util import velocity

__all__ = ["NUTS", "NUTSState", "nuts_init", "nuts_transition"]


class NUTSState(NamedTuple):
    z: jax.Array  # (dim,) unconstrained position
    pe: jax.Array  # potential energy at z
    grad: jax.Array  # d pe / dz
    energy: jax.Array  # H at the last accepted (z, r)
    accept_prob: jax.Array  # mean Metropolis accept prob over the last tree
    num_steps: jax.Array  # leapfrog steps taken in the last transition
    diverging: jax.Array  # bool
    tree_depth: jax.Array  # depth reached in the last transition


class _Tree(NamedTuple):
    z_left: jax.Array
    r_left: jax.Array
    grad_left: jax.Array
    z_right: jax.Array
    r_right: jax.Array
    grad_right: jax.Array
    z_prop: jax.Array
    pe_prop: jax.Array
    grad_prop: jax.Array
    log_weight: jax.Array  # logsumexp of (H0 - H_leaf) over leaves
    r_sum: jax.Array  # sum of momenta over all leaves
    turning: jax.Array
    diverging: jax.Array
    sum_accept: jax.Array  # sum of min(1, exp(H0 - H_leaf))
    num_leaves: jax.Array


def _is_turning(mm: MassMatrix, r_left, r_right, r_sum):
    """Generalized U-turn criterion on the velocity/momentum-sum inner
    products (Betancourt): terminate when either edge moves back toward the
    span's center of momentum."""
    v_left = velocity(mm, r_left)
    v_right = velocity(mm, r_right)
    rho = r_sum - 0.5 * (r_left + r_right)
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def _popcount(x):
    """Branchless popcount of a non-negative int32 scalar (vectorized bit
    extraction; leaf indices are < 2**max_tree_depth << 2**31).  Loop-free on
    purpose: a ``while_loop`` here would nest 4 deep inside the transition
    and blow up XLA compile time on TPU."""
    bits = jnp.arange(32, dtype=x.dtype)
    return jnp.sum((x >> bits) & 1).astype(x.dtype)


def _leaf_to_ckpt(n):
    """Checkpoint bookkeeping for the iterative U-turn scheme.

    For leaf index ``n`` (0-based within a subtree), returns ``(idx_min,
    idx_max)``: the checkpoint-slot range to test (odd ``n``) or the slot to
    store into (even ``n``).  ``idx_max`` = popcount(n >> 1); the number of
    trailing one-bits of ``n`` fixes how many nested spans end at ``n``
    (trailing_ones(n) = popcount(n ^ (n+1)) - 1).
    """
    idx_max = _popcount(n >> 1)
    trailing_ones = _popcount(n ^ (n + 1)) - 1
    idx_min = idx_max - trailing_ones + 1
    return idx_min, idx_max


def _iterative_turning_check(mm, r, r_sum, r_ckpts, r_sum_ckpts, idx_min, idx_max):
    """Check U-turns between the new (odd) leaf and every checkpointed span
    start in ``[idx_min, idx_max]``.

    All ``max_tree_depth`` slots are evaluated in one vectorized batch and
    masked to the live range -- at ~10 slots x dim-sized dot products the
    redundant lanes are free, and it removes two nested ``while_loop`` levels
    from the compiled transition (the round-1 program spent ~7 min in XLA
    compile largely on this nest)."""
    span_r_sum = r_sum[None, :] - r_sum_ckpts + r_ckpts  # (max_depth, dim)
    turning = jax.vmap(lambda r_l, rho_sum: _is_turning(mm, r_l, r, rho_sum))(r_ckpts, span_r_sum)
    slots = jnp.arange(r_ckpts.shape[0])
    return jnp.any(turning & (slots >= idx_min) & (slots <= idx_max))


def _build_subtree(step_fn, mm, h0, depth, z0, r0, grad0, direction, step_size, max_delta_energy, max_depth, key):
    """Build a subtree of ``2**depth`` leaves by iterated leapfrog in
    ``direction``, with intra-subtree U-turn checkpoints."""
    dim = z0.shape[0]
    dtype = z0.dtype
    num_leaves = jnp.asarray(2**depth, jnp.int32) if isinstance(depth, int) else (1 << depth)

    r_ckpts = jnp.zeros((max_depth, dim), dtype)
    r_sum_ckpts = jnp.zeros((max_depth, dim), dtype)

    init_tree = _Tree(
        z_left=z0, r_left=r0, grad_left=grad0,
        z_right=z0, r_right=r0, grad_right=grad0,
        z_prop=z0, pe_prop=jnp.zeros((), dtype), grad_prop=grad0,
        log_weight=-jnp.inf * jnp.ones((), dtype),
        r_sum=jnp.zeros(dim, dtype),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dtype),
        num_leaves=jnp.zeros((), jnp.int32),
    )

    def cond(carry):
        leaf, tree, _, _, _, _ = carry
        return (leaf < num_leaves) & ~tree.turning & ~tree.diverging

    def body(carry):
        leaf, tree, r_ckpts, r_sum_ckpts, k, _ = carry
        k, sub = jax.random.split(k)
        # step from the moving edge (right edge in trajectory coords)
        z, r, pe, grad = step_fn(tree.z_right, tree.r_right, tree.grad_right, direction * step_size, mm)
        h = pe + kinetic_energy(mm, r)
        delta = h - h0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        diverging = delta > max_delta_energy
        leaf_logw = -delta  # multinomial weight: exp(h0 - h)
        accept = jnp.minimum(1.0, jnp.exp(-delta))

        # progressive multinomial proposal within the subtree
        new_logw = jnp.logaddexp(tree.log_weight, leaf_logw)
        take_new = jnp.log(jax.random.uniform(sub, dtype=dtype)) < (leaf_logw - new_logw)
        z_prop = jnp.where(take_new, z, tree.z_prop)
        pe_prop = jnp.where(take_new, pe, tree.pe_prop)
        grad_prop = jnp.where(take_new, grad, tree.grad_prop)

        r_sum = tree.r_sum + r

        # checkpointed U-turn bookkeeping
        idx_min, idx_max = _leaf_to_ckpt(leaf)
        is_even = (leaf & 1) == 0
        r_ckpts = jnp.where(is_even, r_ckpts.at[idx_max].set(r), r_ckpts)
        r_sum_ckpts = jnp.where(is_even, r_sum_ckpts.at[idx_max].set(r_sum), r_sum_ckpts)
        turning = jnp.where(
            is_even | diverging,
            jnp.zeros((), bool),
            _iterative_turning_check(mm, r, r_sum, r_ckpts, r_sum_ckpts, idx_min, idx_max),
        )

        new_tree = _Tree(
            z_left=tree.z_left, r_left=tree.r_left, grad_left=tree.grad_left,
            z_right=z, r_right=r, grad_right=grad,
            z_prop=z_prop, pe_prop=pe_prop, grad_prop=grad_prop,
            log_weight=new_logw,
            r_sum=r_sum,
            turning=turning,
            diverging=diverging,
            sum_accept=tree.sum_accept + accept,
            num_leaves=tree.num_leaves + 1,
        )
        # first leaf initializes the left edge of the subtree
        first = leaf == 0
        new_tree = new_tree._replace(
            z_left=jnp.where(first, z, tree.z_left),
            r_left=jnp.where(first, r, tree.r_left),
            grad_left=jnp.where(first, grad, tree.grad_left),
        )
        return leaf + 1, new_tree, r_ckpts, r_sum_ckpts, k, take_new

    leaf0 = jnp.zeros((), jnp.int32)
    _, tree, _, _, _, _ = jax.lax.while_loop(
        cond, body, (leaf0, init_tree, r_ckpts, r_sum_ckpts, key, jnp.zeros((), bool))
    )
    return tree


def nuts_transition(
    potential_fn,
    state: NUTSState,
    mm: MassMatrix,
    step_size,
    key,
    max_tree_depth=10,
    max_delta_energy=1000.0,
):
    """One NUTS transition for a single chain (vmap over chains upstream)."""
    step_fn = leapfrog(potential_fn)
    dim = state.z.shape[0]
    dtype = state.z.dtype

    key_mom, key_doubling = jax.random.split(key)
    r0 = sample_momentum(mm, key_mom, state.z)
    h0 = state.pe + kinetic_energy(mm, r0)

    init = _Tree(
        z_left=state.z, r_left=r0, grad_left=state.grad,
        z_right=state.z, r_right=r0, grad_right=state.grad,
        z_prop=state.z, pe_prop=state.pe, grad_prop=state.grad,
        log_weight=jnp.zeros((), dtype),
        r_sum=r0,
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dtype),
        num_leaves=jnp.ones((), jnp.int32),
    )

    def cond(carry):
        depth, tree, _ = carry
        return (depth < max_tree_depth) & ~tree.turning & ~tree.diverging

    def body(carry):
        depth, tree, k = carry
        k, k_dir, k_sub, k_accept = jax.random.split(k, 4)
        going_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(going_right, 1.0, -1.0).astype(dtype)

        z0 = jnp.where(going_right, tree.z_right, tree.z_left)
        r0_edge = jnp.where(going_right, tree.r_right, tree.r_left)
        grad0 = jnp.where(going_right, tree.grad_right, tree.grad_left)

        sub = _build_subtree(
            step_fn, mm, h0, depth, z0, r0_edge, grad0, direction, step_size,
            max_delta_energy, max_tree_depth, k_sub,
        )
        # NB: depth is traced; _build_subtree uses (1 << depth) leaves.

        # merge edges
        z_left = jnp.where(going_right, tree.z_left, sub.z_right)
        r_left = jnp.where(going_right, tree.r_left, sub.r_right)
        grad_left = jnp.where(going_right, tree.grad_left, sub.grad_right)
        z_right = jnp.where(going_right, sub.z_right, tree.z_right)
        r_right = jnp.where(going_right, sub.r_right, tree.r_right)
        grad_right = jnp.where(going_right, sub.grad_right, tree.grad_right)

        sub_invalid = sub.turning | sub.diverging
        # biased progressive sampling across the doubling (Stan): favor new
        take_new = jnp.log(jax.random.uniform(k_accept, dtype=dtype)) < (sub.log_weight - tree.log_weight)
        take_new = take_new & ~sub_invalid
        z_prop = jnp.where(take_new, sub.z_prop, tree.z_prop)
        pe_prop = jnp.where(take_new, sub.pe_prop, tree.pe_prop)
        grad_prop = jnp.where(take_new, sub.grad_prop, tree.grad_prop)

        r_sum = tree.r_sum + sub.r_sum
        # full-tree U-turn check (only meaningful if the subtree was valid)
        turning_full = _is_turning(mm, r_left, r_right, r_sum)
        turning = sub.turning | (turning_full & ~sub.diverging)

        new_tree = _Tree(
            z_left=z_left, r_left=r_left, grad_left=grad_left,
            z_right=z_right, r_right=r_right, grad_right=grad_right,
            z_prop=z_prop, pe_prop=pe_prop, grad_prop=grad_prop,
            log_weight=jnp.where(sub_invalid, tree.log_weight, jnp.logaddexp(tree.log_weight, sub.log_weight)),
            r_sum=jnp.where(sub_invalid, tree.r_sum, r_sum),
            turning=turning,
            diverging=sub.diverging,
            sum_accept=tree.sum_accept + sub.sum_accept,
            num_leaves=tree.num_leaves + sub.num_leaves,
        )
        return depth + 1, new_tree, k

    depth, tree, _ = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), init, key_doubling))

    num_proposals = jnp.maximum(tree.num_leaves - 1, 1)
    accept_prob = tree.sum_accept / num_proposals.astype(dtype)
    new_pe, new_grad = tree.pe_prop, tree.grad_prop
    return NUTSState(
        z=tree.z_prop,
        pe=new_pe,
        grad=new_grad,
        energy=h0,
        accept_prob=accept_prob,
        num_steps=tree.num_leaves - 1,
        diverging=tree.diverging,
        tree_depth=depth,
    )


def nuts_init(potential_fn, z):
    pe, grad = jax.value_and_grad(potential_fn)(z)
    dtype = z.dtype
    return NUTSState(
        z=z,
        pe=pe,
        grad=grad,
        energy=pe,
        accept_prob=jnp.ones((), dtype),
        num_steps=jnp.zeros((), jnp.int32),
        diverging=jnp.zeros((), bool),
        tree_depth=jnp.zeros((), jnp.int32),
    )


class NUTS:
    """NUTS kernel configuration (consumed by :class:`~gwinferno_tpu.infer.MCMC`).

    Parity surface: ``numpyro.infer.NUTS(model, target_accept_prob=...,
    max_tree_depth=..., dense_mass=..., adapt_mass_matrix=...,
    adapt_step_size=...)`` as used by the reference pipeline
    (gwinferno/pipeline/analysis.py:21, examples/utils.py:63-84).
    """

    def __init__(
        self,
        model,
        step_size=1.0,
        adapt_step_size=True,
        adapt_mass_matrix=True,
        dense_mass=False,
        target_accept_prob=0.8,
        max_tree_depth=10,
        max_delta_energy=1000.0,
        init_strategy=None,
    ):
        self.model = model
        self.step_size = step_size
        self.adapt_step_size = adapt_step_size
        self.adapt_mass_matrix = adapt_mass_matrix
        self.dense_mass = dense_mass
        self.target_accept_prob = target_accept_prob
        self.max_tree_depth = max_tree_depth
        self.max_delta_energy = max_delta_energy
        self.init_strategy = init_strategy

    # transition factory used by MCMC
    def make_transition(self, potential_fn):
        def transition(state, mm, step_size, key):
            return nuts_transition(
                potential_fn, state, mm, step_size, key,
                max_tree_depth=self.max_tree_depth,
                max_delta_energy=self.max_delta_energy,
            )

        return transition

    def make_init(self, potential_fn):
        return lambda z: nuts_init(potential_fn, z)
