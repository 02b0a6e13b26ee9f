"""Measure the CPU baseline for bench.py's headline (writes bench_baseline.json).

The reference publishes no benchmarks (BASELINE.md) and numpyro is not
installed here, so the honest baseline is: the SAME engine, the SAME
14-hyperparameter problem and catalog, on this machine's CPU in f64 --
the configuration a reference user would actually run (the reference is
CPU-numpyro-f64 end to end; its examples cannot run on TPU as written).
``bench.py`` divides its TPU min-ESS/s by this number for ``vs_baseline``.

Run from the repo root:  python tools/measure_cpu_baseline.py
(one long CPU MCMC; an offline artifact generator, not part of the suite.)
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import bench  # noqa: E402
from gwinferno_tpu.infer import MCMC, NUTS  # noqa: E402
from gwinferno_tpu.infer.diagnostics import effective_sample_size, split_rhat  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402


def main():
    n_chains = int(os.environ.get("BASELINE_CHAINS", 4))
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = bench.make_model(pedict, injdict, constants, z_model)

    bench.N_CHAINS = n_chains  # make_init sizes its jitter batch from this
    mcmc = MCMC(
        NUTS(
            model,
            dense_mass=bench.DENSE_MASS,
            max_tree_depth=int(os.environ.get("BENCH_MAX_TREE_DEPTH", 6)),
            target_accept_prob=float(os.environ.get("BENCH_TARGET_ACCEPT", 0.8)),
        ),
        num_warmup=bench.WARMUP,
        num_samples=bench.SAMPLES,
        num_chains=n_chains,
        progress_bar=True,
    )
    # warm the executable cache so the timed run measures sampling only
    # (mirrors bench.py's compile+first_run / timed_run split)
    mcmc.run(jax.random.PRNGKey(0), init_params=bench.make_init(0))
    t0 = time.time()
    mcmc.run(jax.random.PRNGKey(1), init_params=bench.make_init(1))
    jax.block_until_ready(mcmc._collected_z)
    wall = time.time() - t0

    samples = mcmc.get_samples(group_by_chain=True)
    ess = {
        k: effective_sample_size(np.asarray(v))
        for k, v in samples.items()
        if np.asarray(v).ndim == 2
    }
    min_ess = min(ess.values())
    extra = mcmc.get_extra_fields()
    div = float(np.mean(np.asarray(extra["diverging"])))
    max_rhat = max(float(split_rhat(np.asarray(v))) for v in samples.values())

    flat = {k: np.asarray(v).reshape(-1) for k, v in samples.items()}
    worst_z = max(
        abs(float(flat[k].mean()) - tv) / max(float(flat[k].std()), 1e-12)
        for k, tv in bench.TRUTH.items()
    )

    out = {
        "ess_per_s": round(min_ess / wall, 4),
        "platform": "cpu-f64 (this host, measured)",
        "config": (
            "bench.py model on the self-consistent synthetic catalog "
            "(pe_inj_synthetic.h5): 14-hyperparameter powerlaw+peak w/ independent "
            f"spins x powerlaw-z, min_neff_cut, dense mass, {bench.WARMUP}w+{bench.SAMPLES}s, "
            f"{n_chains} chains"
        ),
        "measured": {
            "wall_s": round(wall, 1),
            "min_ess": round(float(min_ess), 1),
            "divergences_frac": round(div, 4),
            "max_rhat": round(max_rhat, 3),
            "truth_recovery": f"worst |mean-truth|/sd = {worst_z:.2f} over all 14 hyperparameters",
        },
        "note": (
            "Measured on this machine's CPU with the same engine and problem the TPU "
            "bench runs (numpyro is not installed here; BASELINE.md's reference-on-CPU "
            "procedure is impossible). Posterior-moment validation against an INDEPENDENT "
            "implementation+sampler lives in tools/parity/."
        ),
    }
    path = os.path.join(ROOT, "bench_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
