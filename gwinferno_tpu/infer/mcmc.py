"""MCMC driver: warmup adaptation + sampling over a batched chain axis.

TPU-first design decisions (vs the reference's delegation to NumPyro):

- Chains are an explicit leading axis of every state pytree and transitions
  are ``vmap``-ed over it.  Under ``pjit`` with the chain axis sharded over a
  device mesh, cross-chain adaptation reductions (means of accept
  probabilities, pooled Welford moments) lower to XLA collectives over ICI --
  the same code runs single-chip and pod-slice.
- The whole warmup and sampling loops are single ``lax.scan`` programs: one
  compile, no host round-trips per step.
- Deterministic sites (the reference's diagnostics-riding-in-the-posterior
  pattern) are **not** materialized inside the hot loop; they are recomputed
  in a batched post-pass, keeping sampled state minimal in HBM.
"""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from ..ppl import handlers
from ..ppl.constraints import biject_to
from ..ppl.infer_util import _model_transforms
from ..ppl.infer_util import potential_energy
from . import hmc_util
from .hmc_util import DAState
from .hmc_util import MassMatrix
from .hmc_util import build_warmup_schedule
from .hmc_util import da_init
from .hmc_util import da_update
from .hmc_util import find_reasonable_step_size
from .hmc_util import mass_matrix_from_inverse
from .hmc_util import welford_covariance
from .hmc_util import welford_init
from .hmc_util import welford_update

__all__ = ["MCMC"]


class MCMC:
    """Run an HMC/NUTS kernel: warmup (dual-averaging step size + Welford
    mass matrix with Stan windowing) then sampling.

    Parity surface: ``numpyro.infer.MCMC(kernel, num_warmup, num_samples,
    num_chains, thinning).run(rng_key, *model_args, **model_kwargs)`` as used
    by the reference entry points (examples/utils.py:63-84,
    bin/gwinferno_run_from_config.py:65-69).

    ``collective_adaptation=True`` pools adaptation statistics across the
    chain axis (step size from the mean accept prob, mass matrix from all
    chains' draws) -- the multi-device scaling mode.
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
    ):
        self.kernel = kernel
        self.num_warmup = int(num_warmup)
        self.num_samples = int(num_samples)
        self.num_chains = int(num_chains)
        self.thinning = int(thinning)
        self.collective_adaptation = collective_adaptation
        self.mesh = mesh
        self.chain_axis = chain_axis
        self._samples = None
        self._extra = None
        self._last_state = None

    # ------------------------------------------------------------------ setup

    def _setup(self, model_args, model_kwargs):
        model = self.kernel.model
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

        pe_grad = jax.jit(jax.vmap(jax.value_and_grad(potential_fn)))

        def attempt_rounds(max_rounds, strict):
            nonlocal key
            z = jnp.zeros((nc, dim), dtype)
            valid = np.zeros(nc, dtype=bool)
            for attempt in range(max_rounds):
                key, sub = jax.random.split(key)
                # shrink toward the transform midpoint: for hierarchical
                # likelihoods with n_eff walls, flat-population points (u ~ 0)
                # are the reliably-valid region
                radius = max(0.125, 2.0 * (0.9**attempt))
                cand = jax.random.uniform(sub, (nc, dim), minval=-radius, maxval=radius, dtype=dtype)
                pe, grad = pe_grad(cand)
                ok = jnp.isfinite(pe) & jnp.all(jnp.isfinite(grad), axis=-1)
                if strict:
                    # |pe| >= 1e30 catches the nan_to_num(-inf) likelihood
                    # walls (hard n_eff cuts): technically finite, but a
                    # zero-gradient plateau no sampler can escape
                    ok = ok & (jnp.abs(pe) < 1e30)
                ok = np.asarray(ok)
                take = ok & ~valid
                z = jnp.where(jnp.asarray(take)[:, None], cand, z)
                valid |= ok
                if valid.all():
                    return z
            return None

        z = attempt_rounds(100, strict=True)
        if z is None:
            z = attempt_rounds(100, strict=False)
            if z is not None:
                print(
                    "warning: some chains initialize on a likelihood-wall plateau "
                    "(|potential| >= 1e30); sampling may need long warmup to escape"
                )
        if z is None:
            raise RuntimeError("could not find valid initial parameters for all chains")
        return z

    # ------------------------------------------------------------------ run

    def run(self, rng_key, *model_args, init_params=None, post_warmup_state=None, **model_kwargs):
        if isinstance(rng_key, int):
            rng_key = jax.random.PRNGKey(rng_key)
        potential_fn, unravel, transforms, flat_proto = self._setup(model_args, model_kwargs)
        self._unravel, self._transforms = unravel, transforms
        self._model_args, self._model_kwargs = model_args, model_kwargs

        nc, dim = self.num_chains, flat_proto.shape[0]
        dtype = flat_proto.dtype
        key_init, key_warm, key_samp = jax.random.split(rng_key, 3)

        z0 = self._init_chains(key_init, potential_fn, flat_proto, init_params, unravel, transforms)

        transition = self.kernel.make_transition(potential_fn)
        kernel_init = self.kernel.make_init(potential_fn)
        dense = getattr(self.kernel, "dense_mass", False)
        target = getattr(self.kernel, "target_accept_prob", 0.8)
        adapt_ss = getattr(self.kernel, "adapt_step_size", True)
        adapt_mm = getattr(self.kernel, "adapt_mass_matrix", True)

        if self.mesh is not None:
            from ..parallel.sharding import shard_chain_state

            z0 = shard_chain_state(self.mesh, z0, self.chain_axis)

        state0 = jax.vmap(kernel_init)(z0)
        inv0 = jnp.eye(dim, dtype=dtype) if dense else jnp.ones(dim, dtype=dtype)
        mm0 = jax.vmap(lambda _: mass_matrix_from_inverse(inv0))(jnp.arange(nc))
        if self.mesh is not None:
            from ..parallel.sharding import shard_chain_state

            state0 = shard_chain_state(self.mesh, state0, self.chain_axis)
            mm0 = shard_chain_state(self.mesh, mm0, self.chain_axis)

        # initial per-chain step size
        if adapt_ss:
            keys = jax.random.split(key_warm, nc + 1)
            key_warm = keys[0]
            ss0 = jax.jit(jax.vmap(lambda mm, z, k: find_reasonable_step_size(potential_fn, mm, z, k)))(
                mm0, state0.z, keys[1:]
            )
        else:
            ss0 = jnp.full((nc,), float(self.kernel.step_size), dtype)
        da0 = jax.vmap(da_init)(ss0)
        wf0 = jax.vmap(lambda _: welford_init(dim, dense, dtype))(jnp.arange(nc))

        window_end, in_slow = build_warmup_schedule(self.num_warmup, adapt_mm)

        collective = self.collective_adaptation

        def warmup_step(carry, xs):
            state, da, wf, mm, key = carry
            t_window_end, t_in_slow, _ = xs
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, nc)
            step_size = jnp.exp(da.log_step)
            state = jax.vmap(transition)(state, mm, step_size, keys)

            accept = state.accept_prob
            if collective:
                accept = jnp.mean(accept) * jnp.ones_like(accept)
            da = jax.vmap(lambda d, a: da_update(d, a, target=target))(da, accept) if adapt_ss else da

            # accumulate Welford during slow windows
            def wf_upd(wf):
                return jax.vmap(welford_update)(wf, state.z)

            wf = jax.lax.cond(t_in_slow, wf_upd, lambda w: w, wf)

            # at slow-window end: refresh the mass matrix, reset Welford + DA
            def window_update(args):
                wf, mm, da, key = args
                if collective:
                    # pool moments across chains: average means/m2 (equal counts)
                    pooled_mean = jnp.mean(wf.mean, axis=0)
                    pooled_m2 = jnp.mean(wf.m2, axis=0) + 0.0
                    pooled = hmc_util.WelfordState(
                        jnp.broadcast_to(pooled_mean, wf.mean.shape),
                        jnp.broadcast_to(pooled_m2, wf.m2.shape),
                        wf.count,
                    )
                    cov = jax.vmap(welford_covariance)(pooled)
                else:
                    cov = jax.vmap(welford_covariance)(wf)
                mm_new = jax.vmap(mass_matrix_from_inverse)(cov)
                key, sub = jax.random.split(key)
                keys = jax.random.split(sub, nc)
                ss = jax.vmap(lambda m, z, k: find_reasonable_step_size(potential_fn, m, z, k))(
                    mm_new, state.z, keys
                )
                da_new = jax.vmap(da_init)(ss)
                wf_new = jax.vmap(lambda _: welford_init(dim, dense, dtype))(jnp.arange(nc))
                return wf_new, mm_new, da_new, key

            wf, mm, da, key = jax.lax.cond(
                t_window_end & adapt_mm, window_update, lambda a: a, (wf, mm, da, key)
            )
            return (state, da, wf, mm, key), state.accept_prob

        if post_warmup_state is not None:
            # resume: skip warmup, restore chain + adaptation state
            state = jax.tree.map(jnp.asarray, post_warmup_state["state"])
            if not isinstance(state, type(state0)):
                state = type(state0)(*state)
            mm = MassMatrix(jnp.asarray(post_warmup_state["inverse_mass_matrix"]),
                            jnp.asarray(post_warmup_state["mass_chol"]))
            step_size = jnp.asarray(post_warmup_state["step_size"])
            key_samp = jnp.asarray(post_warmup_state.get("rng_key", key_samp))
        elif self.num_warmup > 0:
            xs = (
                jnp.asarray(window_end),
                jnp.asarray(in_slow),
                jnp.arange(self.num_warmup),
            )
            (state, da, wf, mm, _), _ = jax.lax.scan(
                warmup_step, (state0, da0, wf0, mm0, key_warm), xs
            )
            step_size = jnp.exp(da.log_step_avg) if adapt_ss else jnp.exp(da.log_step)
        else:
            state, mm = state0, mm0
            step_size = ss0

        self._adapt_info = {"step_size": step_size, "inverse_mass_matrix": mm.inverse}

        def sample_step(carry, key):
            state = carry
            keys = jax.random.split(key, nc)
            state = jax.vmap(transition)(state, mm, step_size, keys)
            out = {
                "z": state.z,
                "accept_prob": state.accept_prob,
                "diverging": state.diverging,
                "num_steps": state.num_steps,
                "energy": state.energy,
                "potential_energy": state.pe,
                "tree_depth": state.tree_depth,
            }
            return state, out

        total = self.num_samples * self.thinning
        keys = jax.random.split(key_samp, total)
        state, collected = jax.lax.scan(sample_step, state, keys)
        if self.thinning > 1:
            collected = jax.tree.map(lambda x: x[self.thinning - 1 :: self.thinning], collected)

        self._last_state = state
        self.post_warmup_state = {
            "state": tuple(state),
            "inverse_mass_matrix": mm.inverse,
            "mass_chol": mm.mass_chol,
            "step_size": step_size,
            "rng_key": jax.random.fold_in(key_samp, total),
        }
        self._collected_z = collected.pop("z")  # (num_samples, chains, dim)
        self._extra = collected
        self._samples = None
        return self

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
