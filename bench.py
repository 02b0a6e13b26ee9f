"""Headline benchmark: effective samples / second on the powerlaw+peak NUTS
config (the reference's PR1 config: 69-event GWTC-3-scale catalog, 14
hyperparameters, injection-based selection -- BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Procedure: one MCMC instance, two runs.  The first pays compilation (the
compiled warmup+sample program is cached on the instance and in the
persistent XLA cache); the second is timed.  ESS = min effective sample size
across hyperparameters (arviz-style FFT autocorrelation estimator).
``vs_baseline`` is measured against the self-generated CPU reference number
in bench_baseline.json (the reference publishes no benchmarks -- BASELINE.md).

TPU notes: all importance weights stay in log space end to end (f32 cannot
square linear weights -- round 1's overflow), and the paired
logsumexp/logsumexp(2x) reductions hit the fused Pallas kernel
(ops/fused.py) unless GWINF_FUSED=0.
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

WARMUP = int(os.environ.get("BENCH_WARMUP", 300))
SAMPLES = int(os.environ.get("BENCH_SAMPLES", 300))
N_CHAINS = int(os.environ.get("BENCH_CHAINS", 16))
DENSE_MASS = os.environ.get("BENCH_DENSE_MASS", "1") == "1"
MMIN, MMAX = 5.0, 100.0
RETRIES = int(os.environ.get("BENCH_RETRIES", 3))


def ensure_data():
    """The bench problem: the self-consistent synthetic catalog (69 events
    drawn from a KNOWN powerlaw+peak population, detected by the same proxy
    search that produced the injection bank, flat-prior Gaussian PE clouds --
    make_synthetic_injections.TRUE_POP).  The real GWTC-3 test catalog makes
    this model ill-posed (broad PE z-tails admit MC-artifact runaway modes
    through the n_eff cuts); it remains the fixture for the shape/contract
    tests."""
    gen = os.path.join(HERE, "tests", "data", "make_synthetic_injections.py")
    target = os.path.join(HERE, "tests", "data", "pe_inj_synthetic.h5")
    if not os.path.exists(target) or os.path.getmtime(target) < os.path.getmtime(gen):
        subprocess.run([sys.executable, gen], check=True)
    return target


def make_model(pedict, injdict, constants, z_model):
    """Powerlaw+peak mass x powerlaw redshift over the 69-event test catalog.

    This is the reference's canonical test-catalog model
    (tests/inference_test.py:162-198: spinless powerlaw mass + redshift on
    the checked-in nospin GWTC-3 file) with the PR1 config's Gaussian peak
    added and the production min_neff_cut=True.  Spins are excluded,
    matching the reference's own use of THIS catalog: the 1000-sample
    downsampled banks put spin-weighted populations' per-event n_eff at ~86
    vs the wall at 69, so every trajectory terminates against the wall.  The
    synthetic injection bank's detection horizon is tuned so found
    injections match the catalog's redshift reach (make_synthetic_injections
    D0_MPC); with the earlier too-deep bank the fit ran to lamb ~ -6 jammed
    on the n_eff walls regardless of the cut setting.
    """
    import jax.numpy as jnp

    from gwinferno_tpu import ppl
    from gwinferno_tpu.models.parametric.parametric import log_plpeak_primary_ratio_pdf
    from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood
    from gwinferno_tpu.ppl import distributions as dist

    # PE and injection banks concatenated into ONE flat vector per parameter:
    # the pdf chains evaluate once over 80.6k elements instead of twice over
    # 69k + 11.6k -- halves the number of (latency-bound) fused kernels per
    # NUTS gradient on TPU
    E, S = pedict["mass_1"].shape
    n_pe = E * S

    def cat(name):
        return jnp.concatenate([pedict[name].reshape(-1), injdict[name]])

    bank = {k: cat(k) for k in ("mass_1", "mass_ratio", "redshift")}
    log_prior_all = jnp.log(cat("prior"))
    # dVc/dz at the concatenated bank (PowerlawRedshiftModel caches per-bank)
    log_dvdz_all = jnp.log(jnp.concatenate([z_model.dVdzs[1].reshape(-1), z_model.dVdzs[0]]))
    log1p_z_all = jnp.log1p(bank["redshift"])

    def model():
        beta = ppl.sample("beta", dist.Normal(0, 5))
        alpha = ppl.sample("alpha", dist.Normal(0, 5))
        mu_peak = ppl.sample("mu_peak", dist.Uniform(MMIN, MMAX))
        sig_peak = ppl.sample("sig_peak", dist.HalfNormal(10))
        lambda_m = ppl.sample("lambda_m", dist.Uniform(0, 1))
        lamb = ppl.sample("lamb", dist.Normal(0, 5))

        # log space end to end: f32 on TPU cannot square linear weights
        z_lognorm = jnp.log(z_model.normalization(lamb))
        logw = (
            log_plpeak_primary_ratio_pdf(
                bank["mass_1"], bank["mass_ratio"], alpha, beta, MMIN, MMAX, mu_peak, sig_peak, lambda_m
            )
            + jnp.where(
                bank["redshift"] <= z_model.zmax,
                log_dvdz_all + (lamb - 1.0) * log1p_z_all - z_lognorm,
                jnp.nan_to_num(-jnp.inf),
            )
            - log_prior_all
        )
        logw = jnp.where(jnp.isnan(logw) | (logw == jnp.inf), -jnp.inf, logw)

        hierarchical_likelihood(
            logw[:n_pe].reshape(E, S),
            logw[n_pe:],
            total_inj=constants["total_inj"],
            Nobs=constants["nObs"],
            Tobs=constants["obs_time"],
            surveyed_hypervolume=jnp.exp(z_lognorm),
            marginalize_selection=False,
            min_neff_cut=True,
            log=True,
        )

    return model


FIDUCIAL_INIT = {
    "alpha": -2.35, "beta": 1.0, "mu_peak": 35.0, "sig_peak": 5.0, "lambda_m": 0.05,
    "lamb": 1.7, "unscaled_rate": 69.0,
}


def make_init(seed):
    """Per-chain jittered inits around the fiducial point (numpyro-style
    overdispersed starts; a single shared point biases cross-chain
    diagnostics)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(100 + seed)
    jitter = {
        "alpha": 0.3, "beta": 0.3, "mu_peak": 2.0, "sig_peak": 1.0, "lambda_m": 0.03,
        "lamb": 0.5, "unscaled_rate": 10.0,
    }
    init = {}
    for k, v in FIDUCIAL_INIT.items():
        key, sub = jax.random.split(key)
        init[k] = jnp.asarray(v) + jitter[k] * jax.random.uniform(sub, (N_CHAINS,), minval=-1.0, maxval=1.0)
    return init


def main():
    data_file = ensure_data()

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))

    from gwinferno_tpu.infer import MCMC, NUTS
    from gwinferno_tpu.infer.diagnostics import effective_sample_size
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
    from gwinferno_tpu.utils.prof import Timer

    import numpy as np

    timer = Timer()
    with timer("load_data"):
        pedict, injdict, constants, _ = load_pe_and_injections_as_dict(data_file)
        z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
        model = make_model(pedict, injdict, constants, z_model)

    mcmc = MCMC(
        NUTS(
            model,
            dense_mass=DENSE_MASS,
            # depth sweep (docs/PERF.md): mean depth on this posterior is
            # ~3.9; capping at 6 cuts the vmapped-chain sync tail (all 16
            # chains wait for the deepest tree each step) for 1.7x ESS/s at
            # <17% ESS cost; depth 5 over-truncates (ESS drops faster)
            max_tree_depth=int(os.environ.get("BENCH_MAX_TREE_DEPTH", 6)),
            target_accept_prob=float(os.environ.get("BENCH_TARGET_ACCEPT", 0.8)),
        ),
        num_warmup=WARMUP,
        num_samples=SAMPLES,
        num_chains=N_CHAINS,
        progress_bar=True,  # stderr; stdout stays one JSON line
        # bound single device executions: O(100)-step XLA programs (~2 min
        # per call) have faulted on the remote-TPU tunnel; 25-step segments
        # survive sustained multi-run sessions (equal segments reuse ONE
        # compiled executable, so the only cost is dispatch)
        max_steps_per_call=int(os.environ.get("BENCH_SEG", 25)),
    )

    with timer("compile+first_run"):
        mcmc.run(jax.random.PRNGKey(0), init_params=make_init(0))
        jax.block_until_ready(mcmc._collected_z)

    with timer("timed_run"):
        t0 = time.time()
        mcmc.run(jax.random.PRNGKey(1), init_params=make_init(1))
        jax.block_until_ready(mcmc._collected_z)
        wall = time.time() - t0

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

    timer.report(print_fn=lambda s: print(s, file=sys.stderr))
    extra = mcmc.get_extra_fields()
    platform = jax.devices()[0].platform
    result = {
        "metric": f"min-ESS/s, powerlaw+peak NUTS (69 evs x 1000 samps, 7 hyperparams, {WARMUP}w+{SAMPLES}s, {N_CHAINS} chains)",
        "value": round(value, 3),
        "unit": "effective samples/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
        "detail": {
            "wall_s": round(wall, 2),
            "compile_plus_first_run_s": round(timer.totals["compile+first_run"], 2),
            "min_ess": round(min_ess, 1),
            "n_divergences": int(np.sum(np.asarray(extra["diverging"]))),
            "mean_tree_depth": round(float(np.mean(np.asarray(extra["tree_depth"]))), 2),
            "platform": platform,
            "fused_kernel": os.environ.get("GWINF_FUSED", "auto"),
        },
    }
    print(json.dumps(result))


def _main_with_retries():
    """The remote-TPU tunnel intermittently faults whole processes
    (UNAVAILABLE: TPU device error) under sustained load; a fresh process
    recovers.  Re-exec ourselves up to RETRIES times; the child's stdout
    (the one JSON line) passes through."""
    for attempt in range(RETRIES):
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env={**os.environ, "BENCH_INNER": "1"})
        if r.returncode == 0:
            return 0
        print(f"bench attempt {attempt + 1}/{RETRIES} failed (rc={r.returncode}); retrying", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if os.environ.get("BENCH_INNER") == "1" or RETRIES <= 1:
        main()
    else:
        sys.exit(_main_with_retries())
