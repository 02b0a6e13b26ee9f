"""MCMC driver: warmup adaptation + sampling over a batched chain axis.

TPU-first design decisions (vs the reference's delegation to NumPyro):

- Chains are an explicit leading axis of every state pytree and transitions
  are ``vmap``-ed over it.  Under ``pjit`` with the chain axis sharded over a
  device mesh, cross-chain adaptation reductions (mean accept probability,
  the Chan-pooled Welford moments) lower to XLA collectives over ICI -- the
  same code runs single-chip and pod-slice.
- Warmup and sampling are ONE fused ``lax.scan``: the NUTS tree program is
  instantiated exactly once in the compiled graph (round 1 compiled it twice
  -- once per scan -- and paid ~7 minutes of XLA compile on TPU).
  Warmup-only work (dual averaging, Welford, mass-matrix refresh) is
  select-masked or ``lax.cond``-gated on per-step flags fed in as scan
  inputs, so the post-warmup steps are the identical program with adaptation
  frozen.
- The compiled program is cached on the instance keyed by (model, data
  identity, shapes): repeated ``run`` calls (new seeds, resumes) re-dispatch
  the same executable instead of re-tracing -- round 1's bench paid
  compilation twice for its two runs.
- Deterministic sites (the reference's diagnostics-riding-in-the-posterior
  pattern) are **not** materialized inside the hot loop; they are recomputed
  in a batched post-pass, keeping sampled state minimal in HBM.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from ..ppl import handlers
from ..ppl.infer_util import _model_transforms
from ..ppl.infer_util import potential_energy
from .hmc_util import MassMatrix
from .hmc_util import build_warmup_schedule
from .hmc_util import da_init
from .hmc_util import da_update
from .hmc_util import find_reasonable_step_size
from .hmc_util import mass_matrix_from_inverse
from .hmc_util import welford_covariance
from .hmc_util import welford_init
from .hmc_util import welford_pool
from .hmc_util import welford_update

__all__ = ["MCMC"]

_CHAIN_METHODS = ("vectorized", "parallel", "sequential")


def _tree_select(pred, new, old):
    """Per-leaf ``where`` select -- cheaper to compile than ``lax.cond`` for
    small adaptation updates (no branch programs)."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), new, old)


class MCMC:
    """Run an HMC/NUTS kernel: warmup (dual-averaging step size + Welford
    mass matrix with Stan windowing) then sampling.

    Parity surface: ``numpyro.infer.MCMC(kernel, num_warmup, num_samples,
    num_chains, thinning).run(rng_key, *model_args, **model_kwargs)`` as used
    by the reference entry points (examples/utils.py:63-84,
    bin/gwinferno_run_from_config.py:65-69).

    ``collective_adaptation=True`` pools adaptation statistics across the
    chain axis (step size from the mean accept prob, mass matrix from the
    Chan-combined Welford moments of all chains) -- the multi-device scaling
    mode.

    ``chain_method``: ``"vectorized"`` (vmap over a chain axis, default),
    ``"parallel"`` (vectorized + the chain axis sharded over all local
    devices), or ``"sequential"`` (chains run one after another, reusing one
    single-chain executable).  ``progress_bar=True`` segments the fused scan
    and prints step / divergence progress between segments (a long jitted
    scan is otherwise operationally silent).
    """

    def __init__(
        self,
        kernel,
        num_warmup=500,
        num_samples=1500,
        num_chains=1,
        thinning=1,
        collective_adaptation=False,
        chain_method="vectorized",
        progress_bar=False,
        jit_model_args=False,
        mesh=None,
        chain_axis="chain",
        max_steps_per_call=None,
        chain_groups=1,
        chain_scheduler="auto",
        chain_batch_size=None,
        leapfrogs_per_round=None,
    ):
        if chain_method not in _CHAIN_METHODS:
            raise ValueError(f"chain_method must be one of {_CHAIN_METHODS}, got {chain_method!r}")
        if chain_scheduler not in ("auto", "sync", "async"):
            raise ValueError(f"chain_scheduler must be auto/sync/async, got {chain_scheduler!r}")
        # chain_scheduler='async' + collective_adaptation is supported: the
        # engine barriers at adaptation-window boundaries (pooled Welford
        # close identical to the lockstep collective engine) and runs
        # continuous batching between them; step-size dual averaging stays
        # per-chain (see async_scan_fn)
        if jit_model_args:
            raise ValueError(
                "jit_model_args=True is not supported: model args are closed over "
                "and the compiled program is cached per (model, data, shapes) -- "
                "re-running with same-shaped data already reuses the executable"
            )
        if chain_method == "sequential" and collective_adaptation:
            raise ValueError("collective_adaptation requires a batched chain axis (vectorized/parallel)")
        self.chain_groups = int(chain_groups)
        if self.chain_groups > 1 and int(num_chains) % self.chain_groups != 0:
            raise ValueError(
                f"chain_groups={chain_groups} must divide num_chains={num_chains}"
            )
        # chain_batch_size=B: dispatch the vectorized engine sequentially in
        # batches of B chains, reusing ONE compiled B-lane executable.  The
        # alternative high-chain-count tiling to chain_groups: each batch
        # keeps the proven single-batch program end to end (no lax.map
        # re-tiling, bookkeeping sized to B lanes) at the cost of serializing
        # whole runs instead of rounds.  Chains are independent either way.
        self.chain_batch_size = None if chain_batch_size is None else int(chain_batch_size)
        if self.chain_batch_size is not None:
            if chain_method != "vectorized" or mesh is not None:
                raise ValueError("chain_batch_size needs chain_method='vectorized' without a mesh")
            if collective_adaptation:
                raise ValueError(
                    "chain_batch_size pools nothing across batches; collective_adaptation "
                    "needs all chains in one batch"
                )
            if int(num_chains) % self.chain_batch_size != 0:
                raise ValueError(
                    f"chain_batch_size={chain_batch_size} must divide num_chains={num_chains}"
                )
            if self.chain_groups > 1:
                raise ValueError("chain_batch_size and chain_groups are alternative tilings; pick one")
        # leapfrogs_per_round=L: the async scheduler's while-loop round runs
        # L masked leapfrog substeps before paying the transition-boundary
        # bookkeeping block once.  At 16 chains a transition finishes almost
        # every round, so the bookkeeping (finish/adapt/buffer-scatter/start
        # -- hundreds of small latency-bound kernels) rides every single
        # leapfrog at L=1; L>1 amortizes it L-fold at the cost of each chain
        # idling (L-1)/2 substeps per transition on average.  The realized
        # sample stream is IDENTICAL for every L (finished lanes are masked
        # until the round's bookkeeping; per-chain update order unchanged).
        # None -> auto (tuned on-chip; see _resolve_leapfrogs_per_round).
        if leapfrogs_per_round is not None and int(leapfrogs_per_round) < 1:
            raise ValueError(f"leapfrogs_per_round must be >= 1, got {leapfrogs_per_round}")
        self.leapfrogs_per_round = None if leapfrogs_per_round is None else int(leapfrogs_per_round)
        self.kernel = kernel
        self.num_warmup = int(num_warmup)
        self.num_samples = int(num_samples)
        self.num_chains = int(num_chains)
        self.thinning = int(thinning)
        self.collective_adaptation = collective_adaptation
        self.chain_method = chain_method
        self.progress_bar = progress_bar
        self.max_steps_per_call = max_steps_per_call
        self.chain_scheduler = chain_scheduler
        self.mesh = mesh
        self.chain_axis = chain_axis
        self._samples = None
        self._extra = None
        self._last_state = None
        self._cache_key = None
        self._compiled = None
        self._pf_from = None
        self._pf_consts = None

    # ------------------------------------------------------------------ setup

    def _setup(self, model_args, model_kwargs):
        model = self.kernel.model
        # the one-time EAGER model evaluation (site discovery + transform
        # inference) only needs values/shapes; on a remote-TPU tunnel every
        # eager bank op would round-trip the wire and re-upload multi-MB
        # host-numpy operands (measured 45.7 s of the bench's cold first
        # run) -- pin it to the host CPU device
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            # bypass the persistent compilation cache for these tiny eager
            # CPU programs: caching them is useless and cross-process cache
            # hits trip XLA:CPU AOT machine-feature mismatch warnings
            cache_prev = jax.config.jax_enable_compilation_cache
            jax.config.update("jax_enable_compilation_cache", False)
            try:
                with jax.default_device(cpu):
                    transforms, discrete, tr = _model_transforms(model, model_args, model_kwargs)
            finally:
                jax.config.update("jax_enable_compilation_cache", cache_prev)
        else:
            transforms, discrete, tr = _model_transforms(model, model_args, model_kwargs)
        if discrete:
            raise ValueError(
                f"discrete latent sites {sorted(discrete)} are not supported by "
                "HMC/NUTS; give them explicit rng keys or marginalize"
            )
        proto_u = {}
        for name, t in transforms.items():
            val = tr[name]["value"]
            proto_u[name] = jnp.zeros(t.unconstrained_shape(jnp.shape(val)), dtype=jnp.result_type(float))
        flat_proto, unravel = jax.flatten_util.ravel_pytree(proto_u)

        def potential_fn(zflat):
            return potential_energy(model, model_args, model_kwargs, unravel(zflat))

        return potential_fn, unravel, transforms, flat_proto

    def _init_chains(self, key, potential_fn, flat_proto, init_params=None, unravel=None, transforms=None):
        dim = flat_proto.shape[0]
        dtype = flat_proto.dtype
        nc = self.num_chains

        if init_params is not None:
            # constrained dict of site values -> unconstrained flat.  Values
            # may carry a per-chain leading axis of size num_chains (jittered
            # overdispersed starts); scalars/site-shaped values are broadcast.
            u = {k: transforms[k].inv(v) if k in transforms else jnp.asarray(v) for k, v in init_params.items()}
            proto = unravel(flat_proto)
            per_chain = any(
                jnp.ndim(v) == jnp.ndim(proto[k]) + 1 and jnp.shape(v)[0] == nc for k, v in u.items()
            )
            if per_chain:
                u = {
                    k: (v if jnp.ndim(v) == jnp.ndim(proto[k]) + 1 else jnp.broadcast_to(v, (nc,) + jnp.shape(proto[k])))
                    for k, v in u.items()
                }
                z = jax.vmap(lambda uu: jax.flatten_util.ravel_pytree(uu)[0])(u)
                return z.astype(dtype)
            flat, _ = jax.flatten_util.ravel_pytree(u)
            z = jnp.broadcast_to(flat, (nc, dim)).astype(dtype)
            return z

        # Vectorized init search: all rounds of shrinking radii are drawn and
        # evaluated in ONE batched device call (round 1's python rescue loop
        # did up to 200 sequential host-device round trips).  Shrinking toward
        # the transform midpoint works because for hierarchical likelihoods
        # with n_eff walls, flat-population points (u ~ 0) are the
        # reliably-valid region.
        rounds = 24
        radii = jnp.maximum(2.0 * 0.85 ** jnp.arange(rounds, dtype=dtype), 0.125)
        cand = (
            jax.random.uniform(key, (rounds, nc, dim), minval=-1.0, maxval=1.0, dtype=dtype)
            * radii[:, None, None]
        )
        # hoisted-consts path: pass the data banks as runtime args (closing
        # over them costs seconds-per-bank at lowering/compile on the tunnel)
        if getattr(self, "_pf_from", None) is not None:
            pe, grad = jax.jit(
                lambda c, consts: jax.vmap(jax.vmap(jax.value_and_grad(self._pf_from(consts))))(c)
            )(cand, self._pf_consts)
        else:
            pe, grad = jax.jit(jax.vmap(jax.vmap(jax.value_and_grad(potential_fn))))(cand)
        finite = jnp.isfinite(pe) & jnp.all(jnp.isfinite(grad), axis=-1)  # (rounds, nc)
        # |pe| >= 1e30 catches the nan_to_num(-inf) likelihood walls (hard
        # n_eff cuts): technically finite, but a zero-gradient plateau no
        # sampler can escape
        off_wall = finite & (jnp.abs(pe) < 1e30)
        chain_idx = jnp.arange(nc)
        z_strict = cand[jnp.argmax(off_wall, axis=0), chain_idx]
        z_loose = cand[jnp.argmax(finite, axis=0), chain_idx]
        strict_ok = np.asarray(jnp.any(off_wall, axis=0))
        loose_ok = np.asarray(jnp.any(finite, axis=0))
        if strict_ok.all():
            return z_strict
        if loose_ok.all():
            print(
                "warning: some chains initialize on a likelihood-wall plateau "
                "(|potential| >= 1e30); sampling may need long warmup to escape"
            )
            return jnp.where(jnp.asarray(strict_ok)[:, None], z_strict, z_loose)
        raise RuntimeError("could not find valid initial parameters for all chains")

    # ------------------------------------------------------------------ program

    def _build_programs(self, pf_from, dim, dtype, nc, find_ss0, use_async=False, leapfrogs=1):
        """Build (init_fn, scan_fn), each jitted once; reused across run() calls.

        ``pf_from(consts) -> potential_fn``: both programs take the hoisted
        model constants as their LAST argument (see _get_compiled) and
        rebuild the potential/transition closures inside the trace."""
        kernel = self.kernel
        dense = getattr(kernel, "dense_mass", False)
        target = getattr(kernel, "target_accept_prob", 0.8)
        adapt_ss = getattr(kernel, "adapt_step_size", True)
        adapt_mm = getattr(kernel, "adapt_mass_matrix", True)
        collective = self.collective_adaptation

        def wf_fresh():
            return jax.vmap(lambda _: welford_init(dim, dense, dtype))(jnp.arange(nc))

        def init_fn(z0, rng_key, mm_inverse0, ss_in, consts):
            potential_fn = pf_from(consts)
            kernel_init = kernel.make_init(potential_fn)
            state0 = jax.vmap(kernel_init)(z0)
            mm0 = jax.vmap(mass_matrix_from_inverse)(mm_inverse0)
            if find_ss0:
                keys = jax.random.split(rng_key, nc)
                ss0 = jax.vmap(lambda m, z, k: find_reasonable_step_size(potential_fn, m, z, k))(
                    mm0, state0.z, keys
                )
            else:
                ss0 = ss_in
            da0 = jax.vmap(da_init)(ss0)
            return state0, da0, wf_fresh(), mm0, ss0

        def window_update(args):
            wf, mm, da = args
            if collective:
                # exact Chan combine over the chain axis (between-chain mean
                # dispersion included); psum-shaped under a sharded chain axis
                cov1 = welford_covariance(welford_pool(wf))
                cov = jnp.broadcast_to(cov1, (nc,) + cov1.shape)
            else:
                cov = jax.vmap(welford_covariance)(wf)
            mm_new = jax.vmap(mass_matrix_from_inverse)(cov)
            # Stan-style window end: keep the current step size and restart
            # its dual-averaging stats.  (numpyro re-runs the step-size search
            # here; a vmapped while_loop nested in the warmup scan was the
            # single largest XLA compile sink in round 1.)
            da_new = jax.vmap(da_init)(jnp.exp(da.log_step))
            return wf_fresh(), mm_new, da_new

        groups = self.chain_groups

        def batched_transition(transition, state, mm, step_size, keys):
            """vmapped transition over chains, optionally split into
            ``chain_groups`` sequential sub-batches.

            A vmapped NUTS transition synchronizes every chain on the batch's
            DEEPEST tree each step (finished lanes idle, masked).  At 64
            chains that tail made ESS/s 7x worse than 16 (round-2 PERF.md).
            ``lax.map`` over groups runs each sub-batch to its OWN deepest
            tree: expected per-step work drops from E[max over nc] to
            sum_g E[max over nc/G] at identical statistics (grouping only
            reorders the lane->program assignment)."""
            if groups <= 1:
                return jax.vmap(transition)(state, mm, step_size, keys)
            gshape = lambda x: x.reshape((groups, nc // groups) + x.shape[1:])  # noqa: E731
            args_g = jax.tree.map(gshape, (state, mm, step_size, keys))
            out = jax.lax.map(lambda a: jax.vmap(transition)(*a), args_g)
            return jax.tree.map(lambda x: x.reshape((nc,) + x.shape[2:]), out)

        def step(transition, carry, xs):
            state, da, wf, mm, ss_final, key = carry
            is_warmup, in_slow, window_end, finalize = xs
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, nc)
            step_size = jnp.where(is_warmup, jnp.exp(da.log_step), ss_final)
            state = batched_transition(transition, state, mm, step_size, keys)

            if adapt_ss:
                accept = state.accept_prob
                if collective:
                    accept = jnp.broadcast_to(jnp.mean(accept), accept.shape)
                da_new = jax.vmap(lambda d, a: da_update(d, a, target=target))(da, accept)
                da = _tree_select(is_warmup, da_new, da)

            if adapt_mm:
                wf_new = jax.vmap(welford_update)(wf, state.z)
                wf = _tree_select(is_warmup & in_slow, wf_new, wf)
                wf, mm, da = jax.lax.cond(window_end, window_update, lambda a: a, (wf, mm, da))

            ss_now = jnp.exp(da.log_step_avg) if adapt_ss else step_size
            ss_final = jnp.where(finalize, ss_now, ss_final)

            out = {
                "z": state.z,
                "accept_prob": state.accept_prob,
                "diverging": state.diverging,
                "num_steps": state.num_steps,
                "energy": state.energy,
                "potential_energy": state.pe,
                "tree_depth": state.tree_depth,
            }
            return (state, da, wf, mm, ss_final, key), out

        def scan_fn(carry, xs, consts):
            transition = kernel.make_transition(pf_from(consts))
            return jax.lax.scan(lambda c, x: step(transition, c, x), carry, xs)

        def async_scan_fn(carry, xs, consts):
            """Continuous-batching drop-in for ``scan_fn``: one leapfrog per
            chain per round instead of one transition per chain per step.

            A vmapped NUTS transition synchronizes every chain on the batch's
            DEEPEST tree each step; here each chain runs its own transition
            state machine (nuts.tree_start/step/finish) and starts its next
            transition the round it finishes, so the deepest-tree wait is
            paid once per dispatched segment, not once per step.  Outputs and
            final carry are BIT-IDENTICAL to ``scan_fn``: the (step, chain)
            key table reproduces the sync key stream, and every per-chain
            adaptation update (dual averaging, Welford, window close,
            step-size capture) fires at the same per-chain step index in the
            same order.

            With ``chain_groups=G`` the round's leapfrogs run as G
            ``lax.map``-serialized sub-batches of nc/G lanes: on this chip
            the vmapped likelihood gradient falls off an XLA fusion cliff
            beyond ~16 chain lanes (docs/chain_scaling.json), so large chain
            counts want the known-good device-batch tiling while the
            continuous-batching schedule stays global.  The per-lane math is
            identical, but XLA re-tiles the fused reductions for the smaller
            sub-batch, so floating-point reduction order -- and therefore the
            realized sample stream -- can differ macroscopically (though
            validly) from the flat ``chain_groups=1`` tiling; see
            tests/infer/test_async_scheduler.py::
            test_async_grouped_leapfrogs_statistics.

            With ``collective_adaptation=True`` the engine runs continuous
            batching BETWEEN adaptation-window boundaries and barriers AT
            them: a chain may not start a transition past the next scheduled
            window-end step until every chain has completed that step (it
            parks, ``started=False``); the round the last chain crosses, the
            pooled (Chan-combined) Welford close runs once for the whole
            batch and the parked chains launch with the new mass matrix.
            Mass-matrix adaptation is therefore IDENTICAL to the lockstep
            collective engine (bit-identical samples with
            ``adapt_step_size=False`` and diag mass -- tested); step-size
            dual averaging stays per-chain (each chain updates at its own
            step index), a documented deviation from the sync collective
            engine's per-step pooled mean accept.
            """
            start, active, tstep, finish = kernel.make_tree_ops(pf_from(consts))

            def round_leapfrogs(mm_cur, tc_cur):
                if groups <= 1:
                    return jax.vmap(tstep)(mm_cur, tc_cur)
                gshape = lambda x: x.reshape((groups, nc // groups) + x.shape[1:])  # noqa: E731
                args_g = jax.tree.map(gshape, (mm_cur, tc_cur))
                out = jax.lax.map(lambda a: jax.vmap(tstep)(*a), args_g)
                return jax.tree.map(lambda x: x.reshape((nc,) + x.shape[2:]), out)
            state0, da0, wf0, mm0, ssf0, key0 = carry
            is_warmup, in_slow, window_end, finalize = xs
            K = is_warmup.shape[0]
            chain_ids = jnp.arange(nc)
            i32 = jnp.int32

            # the sync engine's per-step key consumption, precomputed
            def mk_keys(k, _):
                k, sub = jax.random.split(k)
                return k, jax.random.split(sub, nc)

            key_end, keys_tbl = jax.lax.scan(mk_keys, key0, None, length=K)

            def sel(mask, new, old):
                return jax.tree.map(
                    lambda a, b: jnp.where(mask.reshape((nc,) + (1,) * (a.ndim - 1)), a, b),
                    new, old,
                )

            ss0 = jnp.where(is_warmup[0], jnp.exp(da0.log_step), ssf0)
            tc0 = jax.vmap(lambda s, m, ss, k: start(s, m, ss, k))(state0, mm0, ss0, keys_tbl[0])
            # per-chain output buffers with a K-th spill row for masked writes
            bufs0 = {
                "z": jnp.zeros((nc, K + 1, dim), dtype),
                "accept_prob": jnp.zeros((nc, K + 1), dtype),
                "diverging": jnp.zeros((nc, K + 1), bool),
                "num_steps": jnp.zeros((nc, K + 1), i32),
                "energy": jnp.zeros((nc, K + 1), dtype),
                "potential_energy": jnp.zeros((nc, K + 1), dtype),
                "tree_depth": jnp.zeros((nc, K + 1), i32),
            }

            def cond(lc):
                return jnp.any(lc[0] < K)

            if collective:
                # scheduled window-end step indices within this segment,
                # K-padded (K is a static segment length, so the index table
                # has a static shape); w_ptr walks it as windows close
                w_ends = jnp.nonzero(window_end, size=K + 1, fill_value=K)[0]
            else:
                w_ends = jnp.full((K + 1,), K, i32)

            def bookkeeping(lc, done):
                """Everything that happens at a transition boundary: finalize,
                per-chain adaptation at the chain's own step index, output
                writes, and the next transition's start.  Runs under a
                ``cond`` -- on rounds where no chain finished (and the
                per-round loop is pure leapfrogging) it is skipped whole, so
                its cost (notably the batched Cholesky behind the inner
                window-close cond) never rides the hot path.  Exact: with no
                chain done every masked select is a no-op, the buffer writes
                land in the discarded K-th spill row, and ``t`` is unchanged.
                """
                t, tc, started, w_ptr, state, da, wf, mm, ss_final, bufs = lc
                state = sel(done, jax.vmap(finish)(tc), state)

                ti = jnp.minimum(t, K - 1)
                w_is, w_slow = is_warmup[ti], in_slow[ti]
                w_close, w_fin = window_end[ti], finalize[ti]

                if adapt_ss:
                    da_new = jax.vmap(lambda d, a: da_update(d, a, target=target))(da, state.accept_prob)
                    da = sel(done & w_is, da_new, da)
                if adapt_mm:
                    wf_new = jax.vmap(welford_update)(wf, state.z)
                    wf = sel(done & w_is & w_slow, wf_new, wf)
                    if not collective:
                        # per-chain window close; a second cond keeps the
                        # covariance + Cholesky off all non-window rounds
                        close = done & w_close

                        def do_close(ops):
                            wf_, mm_, da_ = ops
                            cov = jax.vmap(welford_covariance)(wf_)
                            mm2 = sel(close, jax.vmap(mass_matrix_from_inverse)(cov), mm_)
                            da2 = sel(close, jax.vmap(da_init)(jnp.exp(da_.log_step)), da_)
                            wf2 = sel(close, wf_fresh(), wf_)
                            return (wf2, mm2, da2)

                        wf, mm, da = jax.lax.cond(jnp.any(close), do_close, lambda ops: ops, (wf, mm, da))

                ss_now = jnp.exp(da.log_step_avg) if adapt_ss else tc.step_size
                ss_final = jnp.where(done & w_fin, ss_now, ss_final)

                widx = jnp.where(done, t, K)

                def wr(buf, val):
                    return jax.vmap(lambda b, i, v: b.at[i].set(v))(buf, widx, val)

                bufs = {
                    "z": wr(bufs["z"], state.z),
                    "accept_prob": wr(bufs["accept_prob"], state.accept_prob),
                    "diverging": wr(bufs["diverging"], state.diverging),
                    "num_steps": wr(bufs["num_steps"], state.num_steps),
                    "energy": wr(bufs["energy"], state.energy),
                    "potential_energy": wr(bufs["potential_energy"], state.pe),
                    "tree_depth": wr(bufs["tree_depth"], state.tree_depth),
                }

                t = t + done.astype(i32)
                started = started & ~done
                if collective and adapt_mm:
                    # collective window barrier: once EVERY chain has
                    # completed the pending window-end step, run the pooled
                    # (Chan-combined) close once for the whole batch
                    pending = w_ends[w_ptr]
                    close_now = jnp.all(t > pending) & (pending < K)
                    wf, mm, da = jax.lax.cond(close_now, window_update, lambda a: a, (wf, mm, da))
                    w_ptr = w_ptr + close_now.astype(i32)
                    pending = w_ends[w_ptr]
                    # a chain may start its next transition only up to (and
                    # including) the pending boundary step; past it, it parks
                    eligible = ~started & (t < K) & (t <= pending)
                else:
                    eligible = ~started & (t < K)
                ti2 = jnp.minimum(t, K - 1)
                ss_next = jnp.where(is_warmup[ti2], jnp.exp(da.log_step), ss_final)
                fresh = jax.vmap(lambda s, m, ss, k: start(s, m, ss, k))(
                    state, mm, ss_next, keys_tbl[ti2, chain_ids]
                )
                tc = sel(eligible, fresh, tc)
                started = started | eligible
                return (t, tc, started, w_ptr, state, da, wf, mm, ss_final, bufs)

            def body(lc):
                t, tc_in, started = lc[0], lc[1], lc[2]
                mm_cur = lc[7]
                running = started & (t < K)
                if leapfrogs <= 1:
                    stepped = round_leapfrogs(mm_cur, tc_in)
                    tc = sel(running, stepped, tc_in)
                else:
                    # L masked substeps per round (fori_loop: the substep
                    # program lowers once regardless of L).  A lane whose
                    # transition terminates mid-round stays masked until the
                    # round's single bookkeeping call -- the per-chain math
                    # and update order are identical to L=1, so the realized
                    # sample stream is too; only (L-1)/2 expected idle
                    # substeps per transition are traded for an L-fold cut
                    # in bookkeeping frequency.
                    def substep(_, tc_c):
                        live = running & jax.vmap(active)(tc_c)
                        stepped = round_leapfrogs(mm_cur, tc_c)
                        return sel(live, stepped, tc_c)

                    tc = jax.lax.fori_loop(0, leapfrogs, substep, tc_in)
                done = running & ~jax.vmap(active)(tc)
                lc = (t, tc) + lc[2:]
                return jax.lax.cond(
                    jnp.any(done), lambda c: bookkeeping(c, done), lambda c: c, lc
                )

            init = (
                jnp.zeros((nc,), i32), tc0, jnp.ones((nc,), bool), jnp.zeros((), i32),
                state0, da0, wf0, mm0, ssf0, bufs0,
            )
            end = jax.lax.while_loop(cond, body, init)
            _, _, _, _, state_e, da_e, wf_e, mm_e, ssf_e, bufs_e = end
            out = {k: jnp.moveaxis(v[:, :K], 0, 1) for k, v in bufs_e.items()}
            return (state_e, da_e, wf_e, mm_e, ssf_e, key_end), out

        return jax.jit(init_fn), jax.jit(async_scan_fn if use_async else scan_fn)

    def _get_compiled(self, model_args, model_kwargs, resume):
        """(Re)build the potential fn + jitted programs unless the cached ones
        match this call's model / data identity / chain layout."""
        leaves = jax.tree.leaves((model_args, model_kwargs))
        leaf_ids = tuple(id(x) for x in leaves)
        shapes = tuple((jnp.shape(x), jnp.result_type(x).name) for x in leaves)
        treedef = jax.tree.structure((model_args, model_kwargs))
        if self.chain_method == "sequential":
            nc = 1
        elif self.chain_batch_size is not None:
            nc = self.chain_batch_size
        else:
            nc = self.num_chains
        find_ss0 = getattr(self.kernel, "adapt_step_size", True) and not resume
        use_async = self._resolve_scheduler(nc)
        leapfrogs = self._resolve_leapfrogs_per_round(use_async, nc)
        key = (id(self.kernel.model), treedef, leaf_ids, shapes, nc, find_ss0,
               getattr(self.kernel, "dense_mass", False), self.collective_adaptation,
               self.chain_groups, use_async, leapfrogs)
        if self._cache_key != key:
            self._cache_leaves = leaves  # hold refs so leaf ids stay unique
            potential_fn, unravel, transforms, flat_proto = self._setup(model_args, model_kwargs)
            dim, dtype = flat_proto.shape[0], flat_proto.dtype

            # Hoist the model's closure constants (the multi-MB sample banks)
            # out of the program and into RUNTIME ARGUMENTS.  Measured on the
            # remote-TPU tunnel (docs/PERF.md r3): a program closing over
            # device arrays pays ~10 s per bank at LOWERING (MLIR constant
            # fetch), over numpy arrays ~2.6 s per bank at COMPILE (literal
            # processing); the same banks passed as arguments cost ~0 at
            # compile and one 0.1 s device_put at run.  make_jaxpr traces the
            # potential once; its consts ARE the closure data.
            closed = jax.make_jaxpr(potential_fn)(flat_proto)
            jaxpr = closed.jaxpr
            consts = tuple(jax.device_put(c) for c in closed.consts)

            def pf_from(consts_):
                def pf(zflat):
                    return jax.core.eval_jaxpr(jaxpr, list(consts_), zflat)[0]

                return pf

            self._pf_from, self._pf_consts = pf_from, consts
            init_fn, scan_fn = self._build_programs(
                pf_from, dim, dtype, nc, find_ss0, use_async, leapfrogs
            )
            self._compiled = (pf_from(consts), unravel, transforms, flat_proto, init_fn, scan_fn)
            self._cache_key = key
        return self._compiled

    def _resolve_leapfrogs_per_round(self, use_async, nc):
        """Substeps per async round.  Explicit value wins; ``None`` -> auto.

        Auto stays at 1 until the on-chip sweep says otherwise (the sample
        stream is identical for every L, so this is purely a wall-clock
        knob; see docs/PERF.md round-5 bookkeeping-amortization section).
        """
        if not use_async:
            if self.leapfrogs_per_round not in (None, 1):
                raise ValueError(
                    "leapfrogs_per_round only applies to the continuous-batching "
                    "(async) chain scheduler"
                )
            return 1
        if self.leapfrogs_per_round is not None:
            return self.leapfrogs_per_round
        return 1

    def _resolve_scheduler(self, nc):
        """True -> the continuous-batching (async) chain scheduler.

        ``auto`` uses it whenever it is a pure drop-in: a tree-based kernel
        (NUTS), plain vectorized chains on one device, per-chain adaptation.
        The async engine replays the sync scan's key schedule and per-chain
        update order exactly -- samples are bit-identical with a diagonal
        mass matrix and ULP-equivalent with dense mass (the batched Cholesky
        fuses differently); it only reschedules leapfrog work so chains never
        idle on the batch's deepest tree (tests/infer/test_async_scheduler.py).
        """
        if self.chain_scheduler == "sync":
            return False
        if self.chain_scheduler == "async":
            if not hasattr(self.kernel, "make_tree_ops"):
                raise ValueError("chain_scheduler='async' needs a kernel exposing make_tree_ops (NUTS)")
            if self.chain_method == "sequential":
                raise ValueError(
                    "chain_scheduler='async' needs a batched chain axis "
                    "(chain_method='vectorized' or 'parallel')"
                )
            if self.chain_groups > 1 and self.mesh is not None:
                raise ValueError(
                    "chain_groups > 1 is a single-device tiling knob; with a sharded "
                    "chain axis the mesh already bounds the per-device batch"
                )
            return True
        return (
            hasattr(self.kernel, "make_tree_ops")
            and not self.collective_adaptation
            and self.chain_method == "vectorized"
            and self.mesh is None
            and nc > 1
        )

    def _schedule_arrays(self, num_warmup, total, adapt_mm):
        """Per-step flag arrays for the fused scan: (is_warmup, in_slow,
        window_end, finalize), each length num_warmup + total."""
        T = num_warmup + total
        is_warmup = np.zeros(T, dtype=bool)
        is_warmup[:num_warmup] = True
        in_slow = np.zeros(T, dtype=bool)
        window_end = np.zeros(T, dtype=bool)
        if num_warmup > 0:
            w_end, w_slow = build_warmup_schedule(num_warmup, adapt_mm)
            window_end[:num_warmup] = w_end
            in_slow[:num_warmup] = w_slow
        finalize = np.zeros(T, dtype=bool)
        if num_warmup > 0:
            finalize[num_warmup - 1] = True
        return tuple(jnp.asarray(a) for a in (is_warmup, in_slow, window_end, finalize))

    # ------------------------------------------------------------------ run

    def run(self, rng_key, *model_args, init_params=None, post_warmup_state=None, **model_kwargs):
        phase_t0 = time.time()
        phases = []

        def _phase(label):
            # GWINF_PHASE_TIMING=1: wall per run() phase on stderr (where does
            # compile+first_run go -- tracing, chain init, warmup init, scan?)
            nonlocal phase_t0
            if os.environ.get("GWINF_PHASE_TIMING") == "1":
                now = time.time()
                phases.append((label, now - phase_t0))
                phase_t0 = now
                print(f"[mcmc-phase] {label}: {phases[-1][1]:.1f}s", file=sys.stderr, flush=True)

        if isinstance(rng_key, int):
            rng_key = jax.random.PRNGKey(rng_key)
        resume = post_warmup_state is not None
        potential_fn, unravel, transforms, flat_proto, init_fn, scan_fn = self._get_compiled(
            model_args, model_kwargs, resume
        )
        _phase("trace+build (get_compiled)")
        self._unravel, self._transforms = unravel, transforms
        self._model_args, self._model_kwargs = model_args, model_kwargs

        nc, dim = self.num_chains, flat_proto.shape[0]
        dtype = flat_proto.dtype
        key_init, key_ss, key_samp = jax.random.split(rng_key, 3)

        dense = getattr(self.kernel, "dense_mass", False)
        adapt_mm = getattr(self.kernel, "adapt_mass_matrix", True)

        if self.chain_method == "parallel" and self.mesh is None:
            ndev = len(jax.devices())
            if ndev > 1 and nc % ndev == 0:
                from jax.sharding import Mesh

                self.mesh = Mesh(np.asarray(jax.devices()), (self.chain_axis,))
            else:
                print(f"chain_method='parallel': {nc} chains not shardable over {ndev} devices; running vectorized")

        if resume:
            num_warmup = 0
            state_ckpt = jax.tree.map(jnp.asarray, post_warmup_state["state"])
            z0 = state_ckpt[0]  # NUTSState/HMCState field 0 is z
            mm_inv0 = jnp.asarray(post_warmup_state["inverse_mass_matrix"])
            ss_in = jnp.asarray(post_warmup_state["step_size"])
            key_samp = jnp.asarray(post_warmup_state.get("rng_key", key_samp))
        else:
            num_warmup = self.num_warmup
            z0 = self._init_chains(key_init, potential_fn, flat_proto, init_params, unravel, transforms)
            jax.block_until_ready(z0)
            _phase("chain init (candidate search)")
            inv0 = jnp.eye(dim, dtype=dtype) if dense else jnp.ones(dim, dtype=dtype)
            mm_inv0 = jnp.broadcast_to(inv0, (nc,) + inv0.shape)
            ss_in = jnp.full((nc,), float(self.kernel.step_size), dtype)

        total = self.num_samples * self.thinning
        xs = self._schedule_arrays(num_warmup, total, adapt_mm)

        if self.chain_method == "sequential" or self.chain_batch_size is not None:
            bs = 1 if self.chain_method == "sequential" else self.chain_batch_size
            collected, carry = self._run_sequential(
                init_fn, scan_fn, z0, mm_inv0, ss_in, key_ss, key_samp, xs, batch=bs
            )
        else:
            if self.mesh is not None:
                from ..parallel.sharding import shard_chain_state

                z0, mm_inv0, ss_in = (
                    shard_chain_state(self.mesh, x, self.chain_axis) for x in (z0, mm_inv0, ss_in)
                )
            state0, da0, wf0, mm0, ss0 = init_fn(z0, key_ss, mm_inv0, ss_in, self._pf_consts)
            jax.block_until_ready(ss0)
            _phase("init_fn (step-size search)")
            carry = (state0, da0, wf0, mm0, ss0, key_samp)
            carry, collected = self._run_scan(scan_fn, carry, xs, num_warmup)
            jax.block_until_ready(carry[4])
            _phase("scan (compile + all segments)")

        state, da, wf, mm, ss_final, key_end = carry
        step_size = ss_final
        self._adapt_info = {"step_size": step_size, "inverse_mass_matrix": mm.inverse}

        # strip warmup, then thin
        collected = jax.tree.map(lambda x: x[num_warmup:], collected)
        if self.thinning > 1:
            collected = jax.tree.map(lambda x: x[self.thinning - 1 :: self.thinning], collected)

        self._last_state = state
        self.post_warmup_state = {
            "state": tuple(state),
            "inverse_mass_matrix": mm.inverse,
            "mass_chol": mm.mass_chol,
            "step_size": step_size,
            "rng_key": key_end,
        }
        self._collected_z = collected.pop("z")  # (num_samples, chains, dim)
        self._extra = collected
        self._samples = None
        return self

    def _run_scan(self, scan_fn, carry, xs, num_warmup):
        """Run the fused scan, segmented when progress output or a device
        step cap asks for it.

        Segments of equal length re-dispatch ONE compiled executable (the
        schedule flags are data, not shapes).  ``max_steps_per_call`` bounds
        the length of a single device execution -- long-running single XLA
        programs have been observed to fault on the remote-TPU tunnel.
        """
        T = xs[0].shape[0]
        seg = T
        if self.max_steps_per_call:
            seg = min(seg, int(self.max_steps_per_call))
        if self.progress_bar:
            seg = min(seg, max(1, T // 10))
        if seg >= T:
            return scan_fn(carry, xs, self._pf_consts)
        outs = []
        t0 = time.time()
        done = 0
        ndiv = 0
        while done < T:
            n = min(seg, T - done)
            xs_seg = jax.tree.map(lambda a: a[done : done + n], xs)
            carry, out = scan_fn(carry, xs_seg, self._pf_consts)
            outs.append(out)
            done += n
            if self.progress_bar:
                jax.block_until_ready(out["diverging"])
                ndiv += int(jnp.sum(out["diverging"]))
                phase = "warmup" if done <= num_warmup else "sample"
                rate = done / max(time.time() - t0, 1e-9)
                print(
                    f"[mcmc] {phase} step {done}/{T}  ({rate:.2f} it/s, {ndiv} divergences)",
                    file=sys.stderr, flush=True,
                )
        collected = jax.tree.map(lambda *x: jnp.concatenate(x, axis=0), *outs)
        return carry, collected

    def _run_sequential(self, init_fn, scan_fn, z0, mm_inv0, ss_in, key_ss, key_samp, xs, batch=1):
        """Sequential dispatch of the vectorized engine in ``batch``-chain
        batches (chain_method='sequential' is batch=1; ``chain_batch_size=B``
        is batch=B): ONE compiled batch-lane executable reused for every
        batch, results stacked along the chain axis."""
        carries, outs = [], []
        for b, c in enumerate(range(0, self.num_chains, batch)):
            sl = slice(c, c + batch)
            state0, da0, wf0, mm0, ss0 = init_fn(
                z0[sl], jax.random.fold_in(key_ss, b), mm_inv0[sl], ss_in[sl], self._pf_consts
            )
            carry = (state0, da0, wf0, mm0, ss0, jax.random.fold_in(key_samp, b))
            carry, out = self._run_scan(scan_fn, carry, xs, 0)
            carries.append(carry[:5])  # rng key (carry[5]) is not chain-batched
            outs.append(out)
        collected = jax.tree.map(lambda *x: jnp.concatenate(x, axis=1), *outs)
        stacked = jax.tree.map(lambda *x: jnp.concatenate(x, axis=0), *carries)
        return collected, (*stacked, jax.random.fold_in(key_samp, self.num_chains))

    # ------------------------------------------------------------------ results

    def _constrain_all(self):
        """(num_samples, chains, dim) flat -> dict of constrained site arrays."""
        unravel, transforms = self._unravel, self._transforms

        def constrain_one(zflat):
            u = unravel(zflat)
            return {k: (transforms[k](v) if k in transforms else v) for k, v in u.items()}

        f = jax.vmap(jax.vmap(constrain_one))
        return f(self._collected_z)

    def get_samples(self, group_by_chain=False):
        if self._samples is None:
            self._samples = self._constrain_all()
        if group_by_chain:
            return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), self._samples)
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), self._samples)

    def get_extra_fields(self, group_by_chain=False):
        if group_by_chain:
            return jax.tree.map(lambda x: jnp.swapaxes(x, 0, 1), self._extra)
        return jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]), self._extra)

    def get_deterministic(self, site_names=None, batch_size=64):
        """Recompute deterministic sites over the posterior (batched post-pass).

        Returns dict name -> (num_samples * chains, ...).  This reproduces the
        reference's deterministic diagnostics (rate, logBFs, n_effs, PPC
        draws...) without carrying them through the sampler hot loop.
        """
        samples = self.get_samples()
        model = self.kernel.model
        args, kwargs = self._model_args, self._model_kwargs

        def eval_one(sample):
            with handlers.trace() as tr, handlers.substitute(data=sample):
                model(*args, **kwargs)
            out = {}
            for name, site in tr.trace.items():
                if site["type"] == "deterministic":
                    out[name] = site["value"]
                elif site["type"] == "sample" and site.get("explicit_rng") and name not in sample:
                    out[name] = site["value"]
            if site_names is not None:
                out = {k: v for k, v in out.items() if k in site_names}
            return out

        n = jax.tree.leaves(samples)[0].shape[0]
        eval_batch = jax.jit(jax.vmap(eval_one))
        chunks = []
        for start in range(0, n, batch_size):
            chunk = jax.tree.map(lambda x: x[start : start + batch_size], samples)
            chunks.append(eval_batch(chunk))
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

    def print_summary(self, prob=0.9):
        from .diagnostics import print_summary

        print_summary(self.get_samples(group_by_chain=True), prob=prob)
        extra = self.get_extra_fields()
        nd = int(jnp.sum(extra["diverging"]))
        print(f"\nNumber of divergences: {nd}")
