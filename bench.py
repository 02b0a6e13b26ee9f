"""Headline benchmark: effective samples / second on the powerlaw+peak NUTS
config (the reference's PR1 config: 69-event GWTC-3 catalog, 14
hyperparameters, injection-based selection -- BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Procedure: two identical MCMC runs (500 warmup + 500 samples, 1 chain); the
first pays compilation, the second is timed.  ESS = min effective sample size
across hyperparameters (arviz-style FFT autocorrelation estimator).
``vs_baseline`` is measured against the self-generated CPU reference number
in bench_baseline.json (the reference publishes no benchmarks -- BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

WARMUP = int(os.environ.get("BENCH_WARMUP", 500))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", 500))
N_CHAINS = int(os.environ.get("BENCH_CHAINS", 16))
DENSE_MASS = os.environ.get("BENCH_DENSE_MASS", "1") == "1"
MMIN, MMAX = 5.0, 100.0


def ensure_data():
    gen = os.path.join(HERE, "tests", "data", "make_synthetic_injections.py")
    target = os.path.join(HERE, "tests", "data", "pe_inj_file.h5")
    if not os.path.exists(target) or os.path.getmtime(target) < os.path.getmtime(gen):
        subprocess.run([sys.executable, gen], check=True)
    return target


def make_model(pedict, injdict, constants, z_model):
    import jax.numpy as jnp

    from gwinferno_tpu import ppl
    from gwinferno_tpu.models.parametric.parametric import independent_spin_magnitude_beta_dist
    from gwinferno_tpu.models.parametric.parametric import independent_spin_tilt
    from gwinferno_tpu.models.parametric.parametric import plpeak_primary_ratio_pdf
    from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood
    from gwinferno_tpu.ppl import distributions as dist

    def model():
        beta = ppl.sample("beta", dist.Normal(0, 5))
        alpha = ppl.sample("alpha", dist.Normal(0, 5))
        mu_peak = ppl.sample("mu_peak", dist.Uniform(MMIN, MMAX))
        sig_peak = ppl.sample("sig_peak", dist.HalfNormal(10))
        lambda_m = ppl.sample("lambda_m", dist.Uniform(0, 1))
        # non-singular beta spin magnitudes (alpha, beta >= 1: the LVK
        # production constraint -- keeps importance weights finite-variance)
        alpha_a1 = ppl.sample("alpha_a1", dist.Uniform(1.0, 10.0))
        beta_a1 = ppl.sample("beta_a1", dist.Uniform(1.0, 10.0))
        alpha_a2 = ppl.sample("alpha_a2", dist.Uniform(1.0, 10.0))
        beta_a2 = ppl.sample("beta_a2", dist.Uniform(1.0, 10.0))
        lambda_ct1 = ppl.sample("lambda_ct1", dist.Uniform(0, 1))
        lambda_ct2 = ppl.sample("lambda_ct2", dist.Uniform(0, 1))
        sig_ct1 = ppl.sample("sig_ct1", dist.Uniform(0.1, 4))
        sig_ct2 = ppl.sample("sig_ct2", dist.Uniform(0.1, 4))
        lamb = ppl.sample("lamb", dist.Normal(0, 5))

        def get_weights(d):
            p_m1q = plpeak_primary_ratio_pdf(d["mass_1"], d["mass_ratio"], alpha, beta, MMIN, MMAX, mu_peak, sig_peak, lambda_m)
            p_a = independent_spin_magnitude_beta_dist(d["a_1"], d["a_2"], alpha_a1, beta_a1, alpha_a2, beta_a2)
            p_ct = independent_spin_tilt(d["cos_tilt_1"], d["cos_tilt_2"], lambda_ct1, lambda_ct2, sig_ct1, sig_ct2)
            wts = p_m1q * p_a * p_ct * z_model(d["redshift"], lamb) / d["prior"]
            return jnp.where(jnp.isnan(wts) | jnp.isinf(wts), 0.0, wts)

        hierarchical_likelihood(
            get_weights(pedict),
            get_weights(injdict),
            total_inj=constants["total_inj"],
            Nobs=constants["nObs"],
            Tobs=constants["obs_time"],
            surveyed_hypervolume=z_model.normalization(lamb),
            marginalize_selection=False,
            min_neff_cut=True,
        )

    return model


FIDUCIAL_INIT = {
    "alpha": -2.35, "beta": 1.0, "mu_peak": 35.0, "sig_peak": 5.0, "lambda_m": 0.05,
    "alpha_a1": 1.5, "beta_a1": 3.0, "alpha_a2": 1.5, "beta_a2": 3.0,
    "lambda_ct1": 0.5, "lambda_ct2": 0.5, "sig_ct1": 1.5, "sig_ct2": 1.5,
    "lamb": 1.7, "unscaled_rate": 69.0,
}


def run_once(model, seed):
    import jax
    import jax.numpy as jnp

    from gwinferno_tpu.infer import MCMC, NUTS

    # per-chain jittered inits around the fiducial point (the numpyro-style
    # overdispersed start; a single shared point biases cross-chain diagnostics)
    key = jax.random.PRNGKey(100 + seed)
    jitter = {
        "alpha": 0.3, "beta": 0.3, "mu_peak": 2.0, "sig_peak": 1.0, "lambda_m": 0.03,
        "alpha_a1": 0.3, "beta_a1": 0.5, "alpha_a2": 0.3, "beta_a2": 0.5,
        "lambda_ct1": 0.1, "lambda_ct2": 0.1, "sig_ct1": 0.3, "sig_ct2": 0.3,
        "lamb": 0.5, "unscaled_rate": 10.0,
    }
    init = {}
    for k, v in FIDUCIAL_INIT.items():
        key, sub = jax.random.split(key)
        init[k] = jnp.asarray(v) + jitter[k] * jax.random.uniform(sub, (N_CHAINS,), minval=-1.0, maxval=1.0)
    mcmc = MCMC(
        NUTS(model, dense_mass=DENSE_MASS),
        num_warmup=WARMUP,
        num_samples=SAMPLES,
        num_chains=N_CHAINS,
    )
    t0 = time.time()
    mcmc.run(jax.random.PRNGKey(seed), init_params=init)
    jax.block_until_ready(mcmc._collected_z)
    wall = time.time() - t0
    return mcmc, wall


def main():
    data_file = ensure_data()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))

    from gwinferno_tpu.infer.diagnostics import effective_sample_size
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict

    import numpy as np

    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(data_file)
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = make_model(pedict, injdict, constants, z_model)

    run_once(model, seed=0)  # compile + cache
    mcmc, wall = run_once(model, seed=1)  # timed

    # group_by_chain gives (chains, n), the layout the ESS estimator expects
    samples = mcmc.get_samples(group_by_chain=True)
    ess = {k: effective_sample_size(np.asarray(v)) for k, v in samples.items() if np.asarray(v).ndim == 2}
    min_ess = min(ess.values())
    value = min_ess / wall

    baseline_path = os.path.join(HERE, "bench_baseline.json")
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("ess_per_s"):
            vs_baseline = value / base["ess_per_s"]

    platform = jax.devices()[0].platform
    result = {
        "metric": "min-ESS/s, powerlaw+peak NUTS (69 evs x 1000 samps, 14 hyperparams, 200w+200s, 16 chains)",
        "value": round(value, 3),
        "unit": "effective samples/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
        "detail": {
            "wall_s": round(wall, 2),
            "min_ess": round(min_ess, 1),
            "platform": platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
