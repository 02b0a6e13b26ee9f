"""Where does the bench's cold XLA compile go?  Times lower()+compile() of
each jitted program the MCMC driver builds: the raw potential gradient, the
chain-init search, init_fn (find_reasonable_step_size), and the fused
warmup+sample scan segment.

Run on the ambient TPU:  python tools/profile_compile.py
"""

import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

if os.environ.get("PROFILE_COLD") == "1":
    # cold-cache mode: compile times must not hit the persistent cache
    import tempfile

    jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp(prefix="jaxcache_cold_"))

import bench  # noqa: E402
from gwinferno_tpu.infer import MCMC, NUTS  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402


def t(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label:>40s}: {dt:8.1f}s", flush=True)
    return out


def main():
    depth = int(os.environ.get("BENCH_MAX_TREE_DEPTH", 6))
    nc = int(os.environ.get("BENCH_CHAINS", 16))
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = bench.make_model(pedict, injdict, constants, z_model)

    mcmc = MCMC(
        NUTS(model, dense_mass=True, max_tree_depth=depth),
        num_warmup=300, num_samples=300, num_chains=nc, max_steps_per_call=25,
    )
    potential_fn, unravel, transforms, flat_proto, init_fn, scan_fn = mcmc._get_compiled((), {}, False)
    consts = mcmc._pf_consts
    dim, dtype = flat_proto.shape[0], flat_proto.dtype
    print(f"dim={dim} chains={nc} depth={depth}", flush=True)

    # 1. raw 16-chain potential gradient
    g = jax.jit(jax.vmap(jax.value_and_grad(potential_fn)))
    zz = jnp.zeros((nc, dim), dtype)
    lowered = t("grad lower", lambda: g.lower(zz))
    t("grad compile", lowered.compile)

    # 2. init_fn (find_reasonable_step_size while_loop, vmapped)
    mm_inv0 = jnp.broadcast_to(jnp.eye(dim, dtype=dtype), (nc, dim, dim))
    ss_in = jnp.ones((nc,), dtype)
    args = (zz, jax.random.PRNGKey(0), mm_inv0, ss_in, consts)
    lowered = t("init_fn lower", lambda: init_fn.lower(*args))
    init_c = t("init_fn compile", lowered.compile)

    # 3. the fused scan segment (the program the whole run re-dispatches)
    carry = init_c(*args)
    carry = (*carry, jax.random.PRNGKey(1))
    xs = jax.tree.map(lambda a: a[:25], mcmc._schedule_arrays(300, 300, True))
    lowered = t("scan(25) lower", lambda: scan_fn.lower(carry, xs, consts))
    scan_c = t("scan(25) compile", lowered.compile)

    # 3b. same program at reduced XLA optimization effort (cold-compile
    # lever; measures compile-time saved AND the runtime cost on a segment)
    for effort in (float(e) for e in os.environ.get("PROFILE_EFFORTS", "-0.5,-1.0").split(",")):
        try:
            lo2 = scan_fn.lower(carry, xs, consts)
            c2 = t(f"scan(25) compile effort={effort}", lambda: lo2.compile(
                compiler_options={"exec_time_optimization_effort": effort}
            ))
        except Exception as e:  # pragma: no cover - backend-dependent knob
            print(f"  effort={effort}: unsupported ({e})", flush=True)
            continue
        out = c2(carry, xs, consts)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = c2(*((carry, xs, consts)))
            jax.block_until_ready(out[0][0])
        print(f"{'effort=' + str(effort) + ' 3x25-step segments':>40s}: {time.time() - t0:8.1f}s", flush=True)
    # reference timing for the default-effort executable
    ref = scan_c(carry, xs, consts)
    jax.block_until_ready(ref[0][0])
    t0 = time.time()
    for _ in range(3):
        ref = scan_c(carry, xs, consts)
        jax.block_until_ready(ref[0][0])
    print(f"{'default effort 3x25-step segments':>40s}: {time.time() - t0:8.1f}s", flush=True)

    # 4. the chain-init vectorized search program (runtime-jitted in run())
    cand = jnp.zeros((24, nc, dim), dtype)
    g2 = jax.jit(lambda c, cs: jax.vmap(jax.vmap(jax.value_and_grad(mcmc._pf_from(cs))))(c))
    lowered = t("init-search lower", lambda: g2.lower(cand, consts))
    t("init-search compile", lowered.compile)


if __name__ == "__main__":
    main()
