"""Multinomial NUTS with a single-loop (jit-native) iterative tree builder.

The recursive NUTS of Hoffman & Gelman cannot live under ``jit``.  The usual
iterative formulation (numpyro's) is a doubling ``while_loop`` nesting a
subtree ``while_loop``; round 2 shipped that and measured the consequence on
TPU: ~2/3 of every transition was tree *bookkeeping* -- per-leaf PRNG splits,
two loop-nest boundaries, dozens of small buffers -- executed as hundreds of
O(10 us) kernels, and the nested program dominated XLA compile time.

This version flattens the entire tree into ONE ``lax.while_loop`` over
leapfrog steps, built on the observation that the iterative scheme's
(doubling-depth, leaf-within-subtree) schedule is a *static* function of the
flat iteration index ``i``: doubling ``d`` occupies iterations
``[2^d - 1, 2^(d+1) - 2]``, so ``depth(i) = floor(log2(i+1))`` and
``leaf(i) = i - (2^depth - 1)``.  Consequences exploited here:

- every per-leaf quantity that depends only on the schedule (checkpoint slot
  ranges from popcounts, even/odd flags, subtree-completion flags) is
  precomputed into constant tables indexed by ``i`` -- zero bookkeeping
  arithmetic in the loop body;
- all randomness (doubling directions, per-leaf multinomial uniforms,
  per-doubling biased-accept uniforms) is pre-generated in three PRNG calls
  per transition and gathered by ``i`` -- no ``random.split`` inside the
  loop;
- the dim-sized tree state (edges, proposals, momentum sums, the subtree's
  moving edge) is packed into one ``(15, dim)`` buffer whose per-iteration
  update is a single fused stack of row selects.

Proposal scheme: multinomial sampling within subtrees (progressive, Gumbel-
free), biased progressive sampling across doublings (favors the new subtree,
as in Stan).  Termination: generalized U-turn criterion on momentum sums,
checked at every power-of-two internal node via the checkpoint scheme of
Phan & Pradhan, plus divergence at ``max_delta_energy``.  The algorithm is
unchanged from the nested-loop formulation (same trees, same acceptance
law); only the program structure and the RNG stream differ.
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .hmc_util import MassMatrix
from .hmc_util import kinetic_energy
from .hmc_util import leapfrog
from .hmc_util import sample_momentum
from .hmc_util import velocity

__all__ = ["NUTS", "NUTSState", "TreeCarry", "nuts_init", "nuts_transition",
           "tree_start", "tree_active", "tree_step", "tree_finish"]


class NUTSState(NamedTuple):
    z: jax.Array  # (dim,) unconstrained position
    pe: jax.Array  # potential energy at z
    grad: jax.Array  # d pe / dz
    energy: jax.Array  # H at the last accepted (z, r)
    accept_prob: jax.Array  # mean Metropolis accept prob over the last tree
    num_steps: jax.Array  # leapfrog steps taken in the last transition
    diverging: jax.Array  # bool
    tree_depth: jax.Array  # depth reached in the last transition


# rows of the packed (15, dim) vector-state buffer
_Z_L, _R_L, _G_L = 0, 1, 2  # left trajectory edge (position, momentum, gradient)
_Z_R, _R_R, _G_R = 3, 4, 5  # right trajectory edge
_Z_P, _G_P = 6, 7  # current tree proposal
_R_SUM = 8  # momentum sum over the valid tree
_S_Z, _S_R, _S_G = 9, 10, 11  # subtree moving edge (leapfrog input)
_S_ZP, _S_GP = 12, 13  # subtree proposal
_S_RSUM = 14  # subtree momentum sum

# slots of the packed (5,) scalar-state buffer
_LOGW, _S_LOGW, _PE_P, _S_PE_P, _ACC = range(5)


def _is_turning(mm: MassMatrix, r_left, r_right, r_sum):
    """Generalized U-turn criterion on the velocity/momentum-sum inner
    products (Betancourt): terminate when either edge moves back toward the
    span's center of momentum."""
    v_left = velocity(mm, r_left)
    v_right = velocity(mm, r_right)
    rho = r_sum - 0.5 * (r_left + r_right)
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def _iterative_turning_check(mm, r, r_sum, r_ckpts, r_sum_ckpts, idx_min, idx_max):
    """Check U-turns between the new (odd) leaf and every checkpointed span
    start in ``[idx_min, idx_max]``.

    All ``max_tree_depth`` slots are evaluated in one vectorized batch and
    masked to the live range -- at ~10 slots x dim-sized dot products the
    redundant lanes are free, and it keeps the loop body free of any inner
    control flow."""
    span_r_sum = r_sum[None, :] - r_sum_ckpts + r_ckpts  # (max_depth, dim)
    turning = jax.vmap(lambda r_l, rho_sum: _is_turning(mm, r_l, r, rho_sum))(r_ckpts, span_r_sum)
    slots = jnp.arange(r_ckpts.shape[0])
    return jnp.any(turning & (slots >= idx_min) & (slots <= idx_max))


@lru_cache(maxsize=None)
def _schedule_tables(max_depth):
    """Static per-iteration schedule of the flat tree loop (numpy, computed
    once per ``max_depth`` at trace time).

    For flat iteration ``i`` of ``2**max_depth - 1``:
      depth[i]     doubling this iteration belongs to
      leaf[i]      leaf index within the current subtree
      idx_min/max  checkpoint-slot range (popcount bookkeeping of the
                   iterative U-turn scheme: idx_max = popcount(leaf >> 1);
                   trailing_ones(leaf) spans end at odd leaves)
      is_even      leaf parity (even leaves store checkpoints, odd check)
      complete     this leaf completes its subtree (leaf == 2**depth - 1)
    """
    total = (1 << max_depth) - 1
    i = np.arange(total)
    depth = np.floor(np.log2(i + 1)).astype(np.int64)
    leaf = i - ((1 << depth) - 1)

    def popcount(x):
        return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)

    idx_max = popcount(leaf >> 1)
    trailing_ones = popcount(leaf ^ (leaf + 1)) - 1
    idx_min = idx_max - trailing_ones + 1
    is_even = (leaf & 1) == 0
    complete = leaf == (1 << depth) - 1
    return depth, idx_min, idx_max, is_even, complete


class TreeCarry(NamedTuple):
    """State of one in-flight flat-tree transition.

    The whole NUTS transition is a pure state machine over this carry:
    :func:`tree_start` -> repeat :func:`tree_step` while :func:`tree_active`
    -> :func:`tree_finish`.  :func:`nuts_transition` drives it with a single
    ``while_loop`` (the sync path); the continuous-batching chain scheduler
    (infer/mcmc.py) interleaves many carries at one leapfrog per round so
    chains never wait on the batch's deepest tree.
    """

    i: jax.Array  # flat iteration index
    turning: jax.Array  # bool
    diverging: jax.Array  # bool
    vecs: jax.Array  # (15, dim) packed vector state
    scal: jax.Array  # (5,) packed scalar state
    ckpts: jax.Array  # (2, md, dim) U-turn checkpoints
    const_f: jax.Array  # (total, 4) pre-generated per-transition randomness
    h0: jax.Array  # initial Hamiltonian
    step_size: jax.Array  # per-transition step size


def _const_i_table(md):
    _, idx_min_tab, idx_max_tab, even_tab, complete_tab = _schedule_tables(md)
    return jnp.asarray(
        np.stack([idx_min_tab, idx_max_tab, even_tab, complete_tab], axis=1), jnp.int32
    )  # (total, 4)


def tree_start(state: NUTSState, mm: MassMatrix, step_size, key, max_tree_depth) -> TreeCarry:
    """Sample momentum, pre-generate the transition's randomness, and pack
    the initial tree state."""
    dtype = state.z.dtype
    md = int(max_tree_depth)
    total = (1 << md) - 1
    depth_tab = _schedule_tables(md)[0]

    key_mom, key_dirs, key_mult, key_merge = jax.random.split(key, 4)
    r0 = sample_momentum(mm, key_mom, state.z)
    h0 = state.pe + kinetic_energy(mm, r0)

    # all randomness pre-generated: per-doubling directions (one spare slot
    # so the next-subtree gather at the last merge stays in bounds),
    # per-leaf multinomial uniforms, per-doubling biased-accept uniforms --
    # then spread onto the flat iteration axis by static gathers
    dirs = jnp.where(jax.random.bernoulli(key_dirs, shape=(md + 1,)), 1.0, -1.0).astype(dtype)
    log_u_mult = jnp.log(jax.random.uniform(key_mult, (total,), dtype=dtype))
    log_u_merge = jnp.log(jax.random.uniform(key_merge, (md,), dtype=dtype))
    const_f = jnp.stack(
        [
            dirs[depth_tab],  # direction of this iteration's subtree
            log_u_mult,  # per-leaf multinomial uniform
            log_u_merge[depth_tab],  # biased-accept uniform at this doubling
            dirs[depth_tab + 1],  # direction of the NEXT subtree
        ],
        axis=1,
    )  # (total, 4)

    zeros = jnp.zeros_like(r0)
    vecs0 = jnp.stack(
        [
            state.z, r0, state.grad,  # left edge
            state.z, r0, state.grad,  # right edge
            state.z, state.grad,  # tree proposal
            r0,  # tree momentum sum
            state.z, r0, state.grad,  # subtree moving edge
            state.z, state.grad,  # subtree proposal
            zeros,  # subtree momentum sum
        ]
    )
    scal0 = jnp.stack(
        [
            jnp.zeros((), dtype),  # tree log weight
            -jnp.inf * jnp.ones((), dtype),  # subtree log weight
            state.pe,  # tree proposal potential
            state.pe,  # subtree proposal potential
            jnp.zeros((), dtype),  # sum of accept probs
        ]
    )
    ckpts0 = jnp.zeros((2, md) + state.z.shape, dtype)  # [r, r_sum] checkpoints
    flag0 = jnp.zeros((), bool)
    return TreeCarry(
        i=jnp.zeros((), jnp.int32),
        turning=flag0,
        diverging=flag0,
        vecs=vecs0,
        scal=scal0,
        ckpts=ckpts0,
        const_f=const_f,
        h0=h0,
        step_size=jnp.asarray(step_size, dtype),
    )


def tree_active(carry: TreeCarry, max_tree_depth) -> jax.Array:
    total = (1 << int(max_tree_depth)) - 1
    return (carry.i < total) & ~carry.turning & ~carry.diverging


def tree_step(potential_fn, mm: MassMatrix, carry: TreeCarry, max_tree_depth, max_delta_energy=1000.0) -> TreeCarry:
    """One flat tree iteration: one leapfrog + the fused bookkeeping."""
    step_fn = leapfrog(potential_fn)
    md = int(max_tree_depth)
    const_i = _const_i_table(md)
    i = carry.i
    vecs, scal, ckpts = carry.vecs, carry.scal, carry.ckpts
    h0, step_size = carry.h0, carry.step_size

    f = carry.const_f[i]
    c = const_i[i]
    direction, log_u, log_u_m, next_dir = f[0], f[1], f[2], f[3]
    idx_min, idx_max = c[0], c[1]
    is_even = c[2] == 1
    complete = c[3] == 1

    # one leapfrog step from the subtree's moving edge
    z, r, pe, grad = step_fn(vecs[_S_Z], vecs[_S_R], vecs[_S_G], direction * step_size, mm)
    h = pe + kinetic_energy(mm, r)
    delta = h - h0
    delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
    diverging = delta > max_delta_energy
    leaf_logw = -delta  # multinomial weight: exp(h0 - h)
    accept = jnp.minimum(1.0, jnp.exp(-delta))

    # progressive multinomial proposal within the subtree
    sub_logw = jnp.logaddexp(scal[_S_LOGW], leaf_logw)
    take = log_u < leaf_logw - sub_logw
    sub_r_sum = vecs[_S_RSUM] + r

    # checkpointed U-turn bookkeeping: even leaves store, odd leaves test
    r_ck = jnp.where(is_even, ckpts[0].at[idx_max].set(r), ckpts[0])
    rs_ck = jnp.where(is_even, ckpts[1].at[idx_max].set(sub_r_sum), ckpts[1])
    sub_turn = jnp.where(
        is_even | diverging,
        jnp.zeros((), bool),
        _iterative_turning_check(mm, r, sub_r_sum, r_ck, rs_ck, idx_min, idx_max),
    )

    invalid = sub_turn | diverging
    merge = complete & ~invalid

    # merged tree edges (the subtree's far edge replaces the directional
    # tree edge); computed unconditionally, selected by `merge` below
    go_right = direction > 0
    zl = jnp.where(go_right, vecs[_Z_L], z)
    rl = jnp.where(go_right, vecs[_R_L], r)
    gl = jnp.where(go_right, vecs[_G_L], grad)
    zr = jnp.where(go_right, z, vecs[_Z_R])
    rr = jnp.where(go_right, r, vecs[_R_R])
    gr = jnp.where(go_right, grad, vecs[_G_R])
    r_sum_m = vecs[_R_SUM] + sub_r_sum
    turn_full = _is_turning(mm, rl, rr, r_sum_m)

    # biased progressive sampling across the doubling (Stan): favor new
    take_m = merge & (log_u_m < sub_logw - scal[_LOGW])

    # subtree proposal, then tree proposal on merge
    s_zp = jnp.where(take, z, vecs[_S_ZP])
    s_gp = jnp.where(take, grad, vecs[_S_GP])
    s_pep = jnp.where(take, pe, scal[_S_PE_P])
    next_right = next_dir > 0

    zeros = jnp.zeros_like(r)
    new_vecs = jnp.stack(
        [
            jnp.where(merge, zl, vecs[_Z_L]),
            jnp.where(merge, rl, vecs[_R_L]),
            jnp.where(merge, gl, vecs[_G_L]),
            jnp.where(merge, zr, vecs[_Z_R]),
            jnp.where(merge, rr, vecs[_R_R]),
            jnp.where(merge, gr, vecs[_G_R]),
            jnp.where(take_m, s_zp, vecs[_Z_P]),
            jnp.where(take_m, s_gp, vecs[_G_P]),
            jnp.where(merge, r_sum_m, vecs[_R_SUM]),
            # next subtree's moving edge: the merged tree edge in the
            # next doubling's direction (mid-subtree: this leaf)
            jnp.where(merge, jnp.where(next_right, zr, zl), z),
            jnp.where(merge, jnp.where(next_right, rr, rl), r),
            jnp.where(merge, jnp.where(next_right, gr, gl), grad),
            s_zp,
            s_gp,
            jnp.where(merge, zeros, sub_r_sum),
        ]
    )
    new_scal = jnp.stack(
        [
            jnp.where(merge, jnp.logaddexp(scal[_LOGW], sub_logw), scal[_LOGW]),
            jnp.where(merge, -jnp.inf, sub_logw),
            jnp.where(take_m, s_pep, scal[_PE_P]),
            s_pep,
            scal[_ACC] + accept,
        ]
    )
    new_ckpts = jnp.stack([r_ck, rs_ck])
    turning = carry.turning | sub_turn | (merge & turn_full)
    return TreeCarry(
        i=i + 1,
        turning=turning,
        diverging=carry.diverging | diverging,
        vecs=new_vecs,
        scal=new_scal,
        ckpts=new_ckpts,
        const_f=carry.const_f,
        h0=h0,
        step_size=step_size,
    )


def tree_finish(carry: TreeCarry, max_tree_depth) -> NUTSState:
    """Read the transition result out of a terminated carry."""
    md = int(max_tree_depth)
    depth_tab = _schedule_tables(md)[0]
    vecs, scal = carry.vecs, carry.scal
    dtype = vecs.dtype
    stopped = carry.turning | carry.diverging

    # attempted-doubling count for parity with the nested formulation: a
    # mid-subtree stop still counts the doubling it happened in
    depth_of = jnp.asarray(depth_tab, jnp.int32)
    tree_depth = jnp.where(stopped, depth_of[carry.i - 1] + 1, md)

    num_steps = carry.i
    accept_prob = scal[_ACC] / jnp.maximum(num_steps, 1).astype(dtype)
    return NUTSState(
        z=vecs[_Z_P],
        pe=scal[_PE_P],
        grad=vecs[_G_P],
        energy=carry.h0,
        accept_prob=accept_prob,
        num_steps=num_steps,
        diverging=carry.diverging,
        tree_depth=tree_depth,
    )


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
    md = int(max_tree_depth)
    carry0 = tree_start(state, mm, step_size, key, md)
    carry = jax.lax.while_loop(
        lambda c: tree_active(c, md),
        lambda c: tree_step(potential_fn, mm, c, md, max_delta_energy),
        carry0,
    )
    return tree_finish(carry, md)


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

    def make_tree_ops(self, potential_fn):
        """(start, active, step, finish) closures over the transition state
        machine -- the seam the continuous-batching chain scheduler drives
        (one leapfrog per chain per round instead of one whole transition
        per chain per step)."""
        md = self.max_tree_depth

        def start(state, mm, step_size, key):
            return tree_start(state, mm, step_size, key, md)

        def active(carry):
            return tree_active(carry, md)

        def step(mm, carry):
            return tree_step(potential_fn, mm, carry, md, self.max_delta_energy)

        def finish(carry):
            return tree_finish(carry, md)

        return start, active, step, finish

    def make_init(self, potential_fn):
        return lambda z: nuts_init(potential_fn, z)
