"""B-spline hot-path microbenchmark: fused Pallas kernel vs plain XLA at
production spline counts (m50 q30 a16 t16 z20 -> K~134 stacked basis).

Measures the in-scan per-gradient latency of the full importance-weight
reduction (logBFs over the PE bank + detection efficiency over the
injection bank + gradients w.r.t. all coefficient blocks), vmapped over a
chain batch.  Run on TPU:

    python tools/profile_bspline.py [--chains 16]

CAVEAT (round 5): after the hoisted-consts rework this microbench returned
implausible microsecond-scale timings on the remote-TPU tunnel (the same
scan pattern measures sanely on CPU) -- a tunnel async/blocking artifact.
The AUTHORITATIVE fused-vs-XLA comparison is the end-to-end production
head-to-head in docs/PERF.md (unfused 251 s vs fused 1056 s total at the
identical whitened config); treat numbers from this tool on the tunnel
with suspicion.
"""

import argparse
import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)


def time_call(fn, args, reps=5):
    import jax

    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--m", type=int, default=50)
    ap.add_argument("--q", type=int, default=30)
    ap.add_argument("--a", type=int, default=16)
    ap.add_argument("--t", type=int, default=16)
    ap.add_argument("--z", type=int, default=20)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

    import bench
    from gwinferno_tpu.models.bsplines.fused_path import FusedBSplineLikelihood
    from gwinferno_tpu.pipeline.analysis import detection_efficiency
    from gwinferno_tpu.pipeline.analysis import per_event_log_bayes_factors
    from gwinferno_tpu.pipeline.utils import (
        load_pe_and_injections_as_dict,
        setup_bspline_mass_models,
        setup_bspline_spin_models,
        setup_powerlaw_spline_redshift_model,
    )

    platform = jax.devices()[0].platform
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    mass = setup_bspline_mass_models(pedict, injdict, args.m, args.q, 5.0, 100.0)
    mag, tilt = setup_bspline_spin_models(pedict, injdict, args.a, args.t, iid=True)
    zmod = setup_powerlaw_spline_redshift_model(pedict, injdict, args.z)
    fused = FusedBSplineLikelihood(mass, mag, tilt, zmod, pedict, injdict, constants["total_inj"])

    def split(theta):
        ks = [args.m, args.q, args.a, args.t, args.z]
        outs, i = [], 0
        for k in ks:
            outs.append(theta[i : i + k])
            i += k
        return outs + [theta[i]]

    def loss_fused(theta):
        m_cs, q_cs, a_cs, t_cs, z_cs, lamb = split(theta)
        logBFs, logneffs, logmu, logneff_inj = fused(m_cs, q_cs, a_cs, t_cs, z_cs, lamb)
        return jnp.sum(logBFs) - 69.0 * logmu + 1e-6 * (jnp.sum(logneffs) + logneff_inj)

    def loss_plain(theta):
        m_cs, q_cs, a_cs, t_cs, z_cs, lamb = split(theta)

        def weights(d, pe):
            w = (
                mass(m_cs, q_cs, pe_samples=pe)
                * mag(a_cs, pe_samples=pe)
                * tilt(t_cs, pe_samples=pe)
                * zmod(d["redshift"], lamb, z_cs)
                / d["prior"]
            )
            return jnp.where(jnp.isnan(w) | jnp.isinf(w), 0.0, w)

        logBFs, logneffs, _ = per_event_log_bayes_factors(weights(pedict, True), log=False)
        logmu, logneff_inj, _ = detection_efficiency(weights(injdict, False), constants["total_inj"], log=False)
        return jnp.sum(logBFs) - 69.0 * logmu + 1e-6 * (jnp.sum(logneffs) + logneff_inj)

    dim = args.m + args.q + args.a + args.t + args.z + 1
    theta0 = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (args.chains, dim))

    results = {}
    for label, loss in [("plain-xla", loss_plain), ("fused-pallas", loss_fused)]:
        # hoist the closed-over sample banks into runtime arguments (the
        # MCMC engine's treatment): closing over them embeds multi-MB
        # constants in the remote-compile request (observed HTTP 413) and
        # pays per-bank constant fetches at lowering
        closed = jax.make_jaxpr(loss)(theta0[0])
        consts = tuple(jax.device_put(c) for c in closed.consts)

        def loss_c(th, consts_, jx=closed.jaxpr):
            return jax.core.eval_jaxpr(jx, list(consts_), th)[0]

        def scan_fn(th, consts_):
            vg = jax.vmap(jax.value_and_grad(lambda t: loss_c(t, consts_)))

            def body(t, _):
                v, g = vg(t)
                return t - 1e-6 * jnp.tanh(g), v

            return jax.lax.scan(body, th, None, length=args.iters)

        f = jax.jit(scan_fn)
        t = time_call(f, (theta0, consts), reps=5) / args.iters
        results[label] = round(t * 1e3, 3)
        print(json.dumps({"path": label, "in_scan_grad_ms": results[label],
                          "per_chain_grad_us": round(t / args.chains * 1e6, 1)}))

    speedup = results["plain-xla"] / results["fused-pallas"]
    print(json.dumps({"platform": platform, "chains": args.chains, "K_total": dim + 5,
                      "speedup_fused_over_xla": round(speedup, 3)}))


if __name__ == "__main__":
    main()
