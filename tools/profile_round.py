"""Async-round cost decomposition: where does the ~4.3 ms/leapfrog-round go?

Measures, each chained on-device (fori_loop/scan) so tunnel RTT is excluded:

  grad      -- vmapped value_and_grad of the bench potential (the leapfrog's
               irreducible physics)
  leapfrog  -- vmapped leapfrog step alone (gradient + position/momentum
               update)
  tree_step -- vmapped full NUTS tree_step (leapfrog + fused tree
               bookkeeping: multinomial weights, U-turn checkpoint
               scatter/gather, the (15, dim) row-select stack)
  body      -- tree_step + the masked-select + cond(skip-bookkeeping) shell
               the async scheduler wraps each round in (bookkeeping branch
               NOT taken: measures the pure-leapfrog round floor)

Run on TPU:  python tools/profile_round.py [--chains 16] [--iters 200]
"""

import argparse
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)


def timeit(fn, args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--dense", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.flatten_util
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

    import bench
    from gwinferno_tpu.infer import NUTS
    from gwinferno_tpu.infer.hmc_util import MassMatrix, leapfrog, mass_matrix_from_inverse
    from gwinferno_tpu.infer.nuts import nuts_init, tree_start, tree_active, tree_step
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
    from gwinferno_tpu.ppl.infer_util import potential_energy
    from gwinferno_tpu.ppl.infer_util import _model_transforms

    nc, M = args.chains, args.iters
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = bench.make_model(pedict, injdict, constants, z_model)

    transforms, _, tr = _model_transforms(model, (), {})
    proto_u = {
        k: jnp.zeros(t.unconstrained_shape(jnp.shape(tr[k]["value"])), jnp.result_type(float))
        for k, t in transforms.items()
    }
    flat_proto, unravel = jax.flatten_util.ravel_pytree(proto_u)
    dim, dtype = flat_proto.shape[0], flat_proto.dtype

    def potential_fn(zflat):
        return potential_energy(model, (), {}, unravel(zflat))

    z0 = jnp.zeros((nc, dim), dtype) - 0.1
    inv = jnp.eye(dim, dtype=dtype) if args.dense else jnp.ones(dim, dtype=dtype)
    mm1 = mass_matrix_from_inverse(inv)
    mm = jax.tree.map(lambda x: jnp.broadcast_to(x, (nc,) + x.shape), mm1)
    md = 6

    # ---- grad ----
    vg = jax.vmap(jax.value_and_grad(potential_fn))

    @jax.jit
    def run_grad(z):
        def body(zc, _):
            pe, g = vg(zc)
            return zc - 1e-6 * jnp.tanh(g), pe

        z, pes = jax.lax.scan(body, z, None, length=M)
        return z, pes

    t_grad = timeit(run_grad, (z0,)) / M

    # ---- leapfrog ----
    step_fn = leapfrog(potential_fn)
    g0 = vg(z0)[1]

    @jax.jit
    def run_leap(z, g):
        def body(c, _):
            zc, rc, gc = c
            z2, r2, pe2, g2 = jax.vmap(lambda zz, rr, gg: step_fn(zz, rr, gg, 1e-3, mm1))(zc, rc, gc)
            return (z2, r2, g2), pe2

        c, pes = jax.lax.scan(body, (z, jnp.zeros_like(z), g), None, length=M)
        return c, pes

    t_leap = timeit(run_leap, (z0, g0)) / M

    # ---- tree_step (full NUTS flat-tree iteration), reset at depth cap ----
    state0 = jax.vmap(lambda z: nuts_init(potential_fn, z))(z0)
    keys = jax.random.split(jax.random.PRNGKey(0), nc)
    tc0 = jax.vmap(lambda s, k: tree_start(s, mm1, jnp.asarray(0.001, dtype), k, md))(state0, keys)

    @jax.jit
    def run_tree(tc):
        def body(c, _):
            c2 = jax.vmap(lambda t: tree_step(potential_fn, mm1, t, md))(c)
            # wrap i so the flat index never exceeds the schedule tables
            c2 = c2._replace(i=jnp.where(c2.i >= (1 << md) - 1, 0, c2.i),
                             turning=jnp.zeros_like(c2.turning),
                             diverging=jnp.zeros_like(c2.diverging))
            return c2, c2.scal[:, 0]

        c, w = jax.lax.scan(body, tc, None, length=M)
        return c, w

    t_tree = timeit(run_tree, (tc0,)) / M

    # ---- async round shell: masked select + cond(no-bookkeeping) ----
    running0 = jnp.ones((nc,), bool)

    def sel(mask, new, old):
        return jax.tree.map(
            lambda a, b: jnp.where(mask.reshape((nc,) + (1,) * (a.ndim - 1)), a, b), new, old
        )

    @jax.jit
    def run_body(tc):
        def body(c, _):
            stepped = jax.vmap(lambda t: tree_step(potential_fn, mm1, t, md))(c)
            c2 = sel(running0, stepped, c)
            c2 = c2._replace(i=jnp.where(c2.i >= (1 << md) - 1, 0, c2.i),
                             turning=jnp.zeros_like(c2.turning),
                             diverging=jnp.zeros_like(c2.diverging))
            done = jnp.zeros((nc,), bool)
            c3 = jax.lax.cond(jnp.any(done), lambda x: x, lambda x: x, c2)
            return c3, c3.scal[:, 0]

        c, w = jax.lax.scan(body, tc, None, length=M)
        return c, w

    t_body = timeit(run_body, (tc0,)) / M

    # ---- L-substep fori_loop round (the leapfrogs_per_round=L shape) ----
    L = 4

    @jax.jit
    def run_fori(tc):
        def body(c, _):
            def substep(_, cc):
                stepped = jax.vmap(lambda t: tree_step(potential_fn, mm1, t, md))(cc)
                c2 = sel(running0, stepped, cc)
                return c2._replace(i=jnp.where(c2.i >= (1 << md) - 1, 0, c2.i),
                                   turning=jnp.zeros_like(c2.turning),
                                   diverging=jnp.zeros_like(c2.diverging))

            c3 = jax.lax.fori_loop(0, L, substep, c)
            done = jnp.zeros((nc,), bool)
            c3 = jax.lax.cond(jnp.any(done), lambda x: x, lambda x: x, c3)
            return c3, c3.scal[:, 0]

        c, w = jax.lax.scan(body, tc, None, length=M // L)
        return c, w

    t_fori = timeit(run_fori, (tc0,)) / M  # per LEAPFROG, not per round

    # ---- bookkeeping pieces (per fire, chained in a scan) ----
    from gwinferno_tpu.infer.nuts import tree_finish

    K = 25
    keys_tbl = jax.random.split(jax.random.PRNGKey(1), K * nc).reshape(K, nc, -1)
    bufs0 = {
        "z": jnp.zeros((nc, K + 1, dim), dtype),
        "accept_prob": jnp.zeros((nc, K + 1), dtype),
        "diverging": jnp.zeros((nc, K + 1), bool),
        "num_steps": jnp.zeros((nc, K + 1), jnp.int32),
        "energy": jnp.zeros((nc, K + 1), dtype),
        "potential_energy": jnp.zeros((nc, K + 1), dtype),
        "tree_depth": jnp.zeros((nc, K + 1), jnp.int32),
    }

    @jax.jit
    def run_start(tc):
        def body(c, k):
            st = jax.vmap(tree_finish, in_axes=(0, None))(c, md)
            c2 = jax.vmap(lambda s, kk: tree_start(s, mm1, jnp.asarray(0.001, dtype), kk, md))(st, k)
            return c2, st.pe

        c, pes = jax.lax.scan(body, tc, keys_tbl)
        return c, pes

    t_start = timeit(run_start, (tc0,)) / K  # finish + start per fire

    @jax.jit
    def run_writes(bufs):
        def body(b, i):
            widx = jnp.full((nc,), i % K, jnp.int32)
            st = jax.vmap(tree_finish, in_axes=(0, None))(tc0, md)

            def wr(buf, val):
                return jax.vmap(lambda bb, ii, v: bb.at[ii].set(v))(buf, widx, val)

            b = {
                "z": wr(b["z"], st.z),
                "accept_prob": wr(b["accept_prob"], st.accept_prob),
                "diverging": wr(b["diverging"], st.diverging),
                "num_steps": wr(b["num_steps"], st.num_steps),
                "energy": wr(b["energy"], st.energy),
                "potential_energy": wr(b["potential_energy"], st.pe),
                "tree_depth": wr(b["tree_depth"], st.tree_depth),
            }
            return b, ()

        b, _ = jax.lax.scan(body, bufs, jnp.arange(M))
        return b

    t_writes = timeit(run_writes, (bufs0,)) / M

    # ---- cond shell with a DATA-DEPENDENT predicate + big carried bufs ----
    # (the production body's cond cannot be constant-folded; measures what
    # routing the (nc, K+1, ...) output buffers through both cond branches
    # costs per round even when the bookkeeping branch is NOT taken)
    @jax.jit
    def run_cond_shell(tc, bufs):
        def body(c, _):
            cc, b = c
            stepped = jax.vmap(lambda t: tree_step(potential_fn, mm1, t, md))(cc)
            c2 = sel(running0, stepped, cc)
            c2 = c2._replace(i=jnp.where(c2.i >= (1 << md) - 1, 0, c2.i),
                             turning=jnp.zeros_like(c2.turning),
                             diverging=jnp.zeros_like(c2.diverging))
            done = c2.scal[:, 0] > 1e30  # data-dependent, always false
            c3, b3 = jax.lax.cond(
                jnp.any(done), lambda x: x, lambda x: x, (c2, b)
            )
            return (c3, b3), c3.scal[:, 0]

        c, w = jax.lax.scan(body, (tc, bufs), None, length=M)
        return c, w

    t_cond = timeit(run_cond_shell, (tc0, bufs0)) / M

    rows = {
        "chains": nc,
        "cond_shell_ms": round(t_cond * 1e3, 3),
        "finish_plus_start_ms": round(t_start * 1e3, 3),
        "buffer_writes_ms": round(t_writes * 1e3, 3),
        "grad_ms": round(t_grad * 1e3, 3),
        "leapfrog_ms": round(t_leap * 1e3, 3),
        "tree_step_ms": round(t_tree * 1e3, 3),
        "round_shell_ms": round(t_body * 1e3, 3),
        "fori_L4_per_leapfrog_ms": round(t_fori * 1e3, 3),
        "platform": jax.devices()[0].platform,
    }
    import json

    print(json.dumps(rows))


if __name__ == "__main__":
    main()
