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
    x 8000 PE samples drawn from a KNOWN powerlaw+peak+spins population,
    detected by the same proxy search that produced the injection bank,
    flat-prior truncnorm PE clouds -- make_synthetic_injections.TRUE_POP).
    The real GWTC-3 test catalog makes this model ill-posed (broad PE
    z-tails admit MC-artifact runaway modes through the n_eff cuts); it
    remains the fixture for the shape/contract tests."""
    gen = os.path.join(HERE, "tests", "data", "make_synthetic_injections.py")
    target = os.path.join(HERE, "tests", "data", "pe_inj_synthetic.h5")
    # Regenerate ONLY if missing (or BENCH_REGEN_DATA=1).  The catalog is
    # committed and md5-pinned by the parity/ensemble baselines
    # (tools/parity); the old mtime heuristic re-ran the generator after
    # every fresh checkout (checkout order sets mtimes) and tiny
    # environment-level float differences produced a not-bit-identical
    # file, silently disabling the parity gate for the whole session.
    if not os.path.exists(target) or os.environ.get("BENCH_REGEN_DATA") == "1":
        subprocess.run([sys.executable, gen], check=True)
    elif os.path.getmtime(target) < os.path.getmtime(gen):
        print(
            "note: tests/data/make_synthetic_injections.py is newer than the "
            "committed catalog; set BENCH_REGEN_DATA=1 to regenerate (and then "
            "regenerate the md5-pinned baselines under tools/parity/)",
            file=sys.stderr,
        )
    return target


def make_model(pedict, injdict, constants, z_model):
    """The FULL 14-hyperparameter PR1 powerlaw+peak model WITH spins
    (reference examples/simple_powerlaw_peak_example.py:29-113): powerlaw+
    peak (m1, q), INDEPENDENT beta spin magnitudes parameterized by
    (mu, var), INDEPENDENT isotropic+aligned tilt mixtures, powerlaw-in-
    (1+z) redshift evolution, production min_neff_cut=True.

    Two deliberate deviations from the reference example's literal text,
    both 'intended semantics' per SURVEY.md S7.3:

    - weights are computed in log space end to end (the reference's linear
      products overflow f32 on TPU -- its own tests only ever run f64 CPU);
    - the (mu, var) -> (alpha, beta) beta-shape map is the standard moment
      map the reference ships as
      gwinferno/preprocess/conversions.py:88 (alpha_beta_from_mu_var).  The
      example's inline 'alpha_a1 = mu_a1 * var_a1' (line 64) caps alpha at
      0.25 for every (mu, var) in its own prior box, i.e. admits ONLY
      double-divergent U-shaped betas and can represent no realistic spin
      truth; it is a typo for the moment map.
    """
    import jax.numpy as jnp
    import numpy as np

    from gwinferno_tpu import ppl
    from gwinferno_tpu.models.parametric.parametric import log_independent_spin_magnitude_beta_dist
    from gwinferno_tpu.models.parametric.parametric import log_independent_spin_tilt
    from gwinferno_tpu.models.parametric.parametric import log_plpeak_primary_ratio_pdf
    from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood
    from gwinferno_tpu.ppl import distributions as dist

    # PE and injection banks concatenated into ONE flat vector per parameter:
    # the pdf chains evaluate once over one ~320k vector instead of twice
    # over 276k + 46k -- halves the number of fused kernels per NUTS gradient.
    # All banks are HOST numpy f32 (utils.host convention): the jitted scan
    # closes over them as executable constants -- device-resident constants
    # cost ~30 s/MB to fetch at jit lowering through the remote-TPU tunnel.
    E, S = pedict["mass_1"].shape
    n_pe = E * S
    PARAMS7 = ("mass_1", "mass_ratio", "redshift", "a_1", "a_2", "cos_tilt_1", "cos_tilt_2")

    def cat(name):
        return np.concatenate([np.asarray(pedict[name]).reshape(-1), np.asarray(injdict[name])])

    bank = {k: cat(k) for k in PARAMS7}
    log_prior_all = np.log(cat("prior"))
    # dVc/dz at the concatenated bank (PowerlawRedshiftModel caches per-bank)
    log_dvdz_all = np.log(
        np.concatenate([np.asarray(z_model.dVdzs[1]).reshape(-1), np.asarray(z_model.dVdzs[0])])
    )
    log1p_z_all = np.log1p(bank["redshift"])
    bank["log_prior"], bank["log_dvdz"], bank["log1pz"] = log_prior_all, log_dvdz_all, log1p_z_all

    # BENCH_SAMPLE_CHUNKS > 1: evaluate the likelihood in sample-axis chunks
    # (lax.scan + checkpoint, ops/chunked.py) feeding the summaries seam --
    # bounds the (C, N_bank) gradient intermediates that fall off the XLA
    # fusion cliff beyond ~16 flat chain lanes (docs/chain_scaling.json)
    n_chunks = int(os.environ.get("BENCH_SAMPLE_CHUNKS", "1"))
    # BENCH_STREAMED=1: the whole log-weight chain fused into streamed
    # Pallas kernels (ops/streamed.py) feeding the summaries seam -- the
    # flat XLA gradient moves ~1.01 GB of (C, N_bank) intermediates per
    # 16-chain step (74% of HBM bandwidth, the engine's measured floor);
    # the streamed kernels touch only the banks themselves.
    streamed = os.environ.get("BENCH_STREAMED", "0") == "1"
    if streamed or n_chunks > 1:
        pe2d = {k: np.asarray(pedict[k]) for k in PARAMS7}
        pe2d["log_prior"] = np.log(np.asarray(pedict["prior"]))
        pe2d["log_dvdz"] = np.log(np.asarray(z_model.dVdzs[1]))
        pe2d["log1pz"] = np.log1p(pe2d["redshift"])
        inj1d = {k: np.asarray(injdict[k]) for k in PARAMS7}
        inj1d["log_prior"] = np.log(np.asarray(injdict["prior"]))
        inj1d["log_dvdz"] = np.log(np.asarray(z_model.dVdzs[0]))
        inj1d["log1pz"] = np.log1p(inj1d["redshift"])

    if streamed:
        from gwinferno_tpu.ops.streamed import make_streamed_double_logsumexp
        from gwinferno_tpu.ops.streamed import reshape_bank_rows
        from gwinferno_tpu.ops.streamed import streamed_summaries

        def streamed_logw(d, th):
            logw = (
                log_plpeak_primary_ratio_pdf(
                    d["mass_1"], d["mass_ratio"], th["alpha"], th["beta"],
                    MMIN, MMAX, th["mu_peak"], th["sig_peak"], th["lambda_m"]
                )
                + log_independent_spin_magnitude_beta_dist(
                    d["a_1"], d["a_2"], th["alpha_a1"], th["beta_a1"], th["alpha_a2"], th["beta_a2"]
                )
                + log_independent_spin_tilt(
                    d["cos_tilt_1"], d["cos_tilt_2"], th["lambda_ct1"], th["lambda_ct2"],
                    th["sig_ct1"], th["sig_ct2"]
                )
                + jnp.where(
                    d["redshift"] <= z_model.zmax,
                    d["log_dvdz"] + (th["lamb"] - 1.0) * d["log1pz"] - th["z_lognorm"],
                    jnp.nan_to_num(-jnp.inf),
                )
                - d["log_prior"]
            )
            return jnp.where(jnp.isnan(logw) | (logw == jnp.inf), -jnp.inf, logw)

        inj_rows, inj_valid = reshape_bank_rows(inj1d, cols=8192)
        pe_op = make_streamed_double_logsumexp(streamed_logw, pe2d, block_rows=8)
        inj_op = make_streamed_double_logsumexp(
            streamed_logw, inj_rows, block_rows=8, valid=inj_valid
        )

    def beta_ab(mu, var):
        nu = mu * (1.0 - mu) / var - 1.0
        return mu * nu, (1.0 - mu) * nu

    def model():
        # mass (5)
        beta = ppl.sample("beta", dist.Normal(0, 5))
        alpha = ppl.sample("alpha", dist.Normal(0, 5))
        mu_peak = ppl.sample("mu_peak", dist.Uniform(MMIN, MMAX))
        sig_peak = ppl.sample("sig_peak", dist.HalfNormal(10))
        lambda_m = ppl.sample("lambda_m", dist.Uniform(0, 1))
        # spin magnitudes, independent (4)
        mu_a1 = ppl.sample("mu_a1", dist.Uniform(0, 1))
        var_a1 = ppl.sample("var_a1", dist.Uniform(0.005, 0.25))
        mu_a2 = ppl.sample("mu_a2", dist.Uniform(0, 1))
        var_a2 = ppl.sample("var_a2", dist.Uniform(0.005, 0.25))
        # spin tilts, independent (4)
        lambda_ct1 = ppl.sample("lambda_ct1", dist.Uniform(0, 1))
        lambda_ct2 = ppl.sample("lambda_ct2", dist.Uniform(0, 1))
        sig_ct1 = ppl.sample("sig_ct1", dist.Uniform(0.1, 4))
        sig_ct2 = ppl.sample("sig_ct2", dist.Uniform(0.1, 4))
        # redshift (1)
        lamb = ppl.sample("lamb", dist.Normal(0, 5))

        alpha_a1, beta_a1 = beta_ab(mu_a1, var_a1)
        alpha_a2, beta_a2 = beta_ab(mu_a2, var_a2)

        # log space end to end: f32 on TPU cannot square linear weights
        z_lognorm = jnp.log(z_model.normalization(lamb))

        def log_weight(d):
            logw = (
                log_plpeak_primary_ratio_pdf(
                    d["mass_1"], d["mass_ratio"], alpha, beta, MMIN, MMAX, mu_peak, sig_peak, lambda_m
                )
                + log_independent_spin_magnitude_beta_dist(
                    d["a_1"], d["a_2"], alpha_a1, beta_a1, alpha_a2, beta_a2
                )
                + log_independent_spin_tilt(
                    d["cos_tilt_1"], d["cos_tilt_2"], lambda_ct1, lambda_ct2, sig_ct1, sig_ct2
                )
                + jnp.where(
                    d["redshift"] <= z_model.zmax,
                    d["log_dvdz"] + (lamb - 1.0) * d["log1pz"] - z_lognorm,
                    jnp.nan_to_num(-jnp.inf),
                )
                - d["log_prior"]
            )
            return jnp.where(jnp.isnan(logw) | (logw == jnp.inf), -jnp.inf, logw)

        if streamed:
            th = {
                "alpha": alpha, "beta": beta, "mu_peak": mu_peak, "sig_peak": sig_peak,
                "lambda_m": lambda_m, "alpha_a1": alpha_a1, "beta_a1": beta_a1,
                "alpha_a2": alpha_a2, "beta_a2": beta_a2, "lambda_ct1": lambda_ct1,
                "lambda_ct2": lambda_ct2, "sig_ct1": sig_ct1, "sig_ct2": sig_ct2,
                "lamb": lamb, "z_lognorm": z_lognorm,
            }
            pe_sum, inj_sum = streamed_summaries(pe_op, inj_op, th, S, constants["total_inj"])
            hierarchical_likelihood(
                None,
                None,
                total_inj=constants["total_inj"],
                Nobs=constants["nObs"],
                Tobs=constants["obs_time"],
                surveyed_hypervolume=jnp.exp(z_lognorm),
                marginalize_selection=False,
                min_neff_cut=True,
                log=True,
                pe_summaries=pe_sum,
                inj_summaries=inj_sum,
            )
            return

        if n_chunks > 1:
            from gwinferno_tpu.ops.chunked import chunked_summaries

            pe_sum, inj_sum = chunked_summaries(
                log_weight, pe2d, log_weight, inj1d, constants["total_inj"], n_chunks, inj_chunks=1
            )
            hierarchical_likelihood(
                None,
                None,
                total_inj=constants["total_inj"],
                Nobs=constants["nObs"],
                Tobs=constants["obs_time"],
                surveyed_hypervolume=jnp.exp(z_lognorm),
                marginalize_selection=False,
                min_neff_cut=True,
                log=True,
                pe_summaries=pe_sum,
                inj_summaries=inj_sum,
            )
            return

        logw = log_weight(bank)
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
    "alpha": -2.35, "beta": 1.0, "mu_peak": 35.0, "sig_peak": 5.0, "lambda_m": 0.25,
    "mu_a1": 0.35, "var_a1": 0.03, "mu_a2": 0.35, "var_a2": 0.03,
    "lambda_ct1": 0.7, "lambda_ct2": 0.7, "sig_ct1": 0.5, "sig_ct2": 0.5,
    "lamb": 1.7, "unscaled_rate": 69.0,
}

# the synthetic catalog's population truth, keyed by model site name
# (make_synthetic_injections.TRUE_POP)
TRUTH = {
    "alpha": -2.35, "beta": 1.0, "mu_peak": 35.0, "sig_peak": 5.0, "lambda_m": 0.25,
    "mu_a1": 0.35, "var_a1": 0.03, "mu_a2": 0.35, "var_a2": 0.03,
    "lambda_ct1": 0.7, "lambda_ct2": 0.7, "sig_ct1": 0.5, "sig_ct2": 0.5,
    "lamb": 1.7,
}


def make_init(seed):
    """Per-chain jittered inits around the fiducial point (numpyro-style
    overdispersed starts; a single shared point biases cross-chain
    diagnostics)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(100 + seed)
    jitter = {
        "alpha": 0.3, "beta": 0.3, "mu_peak": 2.0, "sig_peak": 1.0, "lambda_m": 0.05,
        "mu_a1": 0.05, "var_a1": 0.01, "mu_a2": 0.05, "var_a2": 0.01,
        "lambda_ct1": 0.1, "lambda_ct2": 0.1, "sig_ct1": 0.15, "sig_ct2": 0.15,
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

    cache_dir = os.environ.get("BENCH_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from gwinferno_tpu.infer import MCMC, NUTS
    from gwinferno_tpu.infer.diagnostics import effective_sample_size, split_rhat
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
    from gwinferno_tpu.utils.prof import Timer

    import numpy as np

    timer = Timer()
    with timer("load_data"):
        pedict, injdict, constants, _ = load_pe_and_injections_as_dict(data_file)
        z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
        model = make_model(pedict, injdict, constants, z_model)
    n_ev, n_samp = pedict["mass_1"].shape

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
        # amortize the async round's transition-boundary bookkeeping over L
        # masked leapfrog substeps (sample stream identical for every L;
        # docs/PERF.md round-5 sweep picked the default)
        leapfrogs_per_round=(
            int(os.environ["BENCH_LEAPFROGS"]) if os.environ.get("BENCH_LEAPFROGS") else None
        ),
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

    # --- statistical-quality self-checks ON THE BENCHED RUN itself -------
    # (VERDICT r2 item 2: the headline number carries its own evidence)
    flat = {k: np.asarray(v).reshape(-1) for k, v in samples.items()}
    truth_z = {}
    for k, tv in TRUTH.items():
        mean, sd = float(flat[k].mean()), float(flat[k].std())
        truth_z[k] = round(abs(mean - tv) / max(sd, 1e-12), 2)
    truth_ok = all(z < 3.0 for z in truth_z.values())

    # parity vs the INDEPENDENT numpy implementation + ensemble sampler
    # (tools/parity/): benched means within combined MC error of its means
    parity_path = os.path.join(HERE, "tools", "parity", "parity_baseline.json")
    parity_z, parity_ok = {}, None
    if os.path.exists(parity_path):
        with open(parity_path) as f:
            pb = json.load(f)
        import hashlib

        with open(data_file, "rb") as f:
            data_md5 = hashlib.md5(f.read()).hexdigest()[:12]
        if pb.get("data_md5") != data_md5:
            print(
                f"WARNING: parity baseline is for a different catalog "
                f"({pb.get('data_md5')} != {data_md5}); skipping parity check "
                "-- regenerate with tools/parity/make_parity_baseline.py",
                file=sys.stderr,
            )
            pb = {}
        parity_fail = []
        for k, m in pb.get("moments", {}).items():
            if k not in flat:
                continue
            mean, sd = float(flat[k].mean()), float(flat[k].std())
            se = (sd**2 / max(ess[k], 1.0) + m["mc_se"] ** 2) ** 0.5
            parity_z[k] = round(abs(mean - m["mean"]) / max(se, 1e-12), 2)
            # STRICT gate: 5 sigma of the combined MC standard error, no
            # bias floor.  Requires a long-enough ensemble baseline (the
            # 3000-step regeneration; round 3's 700-step baseline carried
            # ~0.5 sd of burn-in bias on weakly-identified sites and needed
            # a 0.75-sd floor that defeated the gate's purpose).
            if abs(mean - m["mean"]) >= 5.0 * se:
                parity_fail.append(k)
        if parity_z:
            parity_ok = not parity_fail

    timer.report(print_fn=lambda s: print(s, file=sys.stderr))
    extra = mcmc.get_extra_fields()
    n_div = int(np.sum(np.asarray(extra["diverging"])))
    div_rate = n_div / (SAMPLES * N_CHAINS)
    platform = jax.devices()[0].platform
    result = {
        "metric": f"min-ESS/s, powerlaw+peak NUTS w/ spins ({n_ev} evs x {n_samp} samps, 14 hyperparams, {WARMUP}w+{SAMPLES}s, {N_CHAINS} chains)",
        "value": round(value, 3),
        "unit": "effective samples/s/chip",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline is not None else None,
        "detail": {
            "wall_s": round(wall, 2),
            "compile_plus_first_run_s": round(timer.totals["compile+first_run"], 2),
            "min_ess": round(min_ess, 1),
            "n_divergences": n_div,
            "divergence_rate": round(div_rate, 4),
            "mean_tree_depth": round(float(np.mean(np.asarray(extra["tree_depth"]))), 2),
            "max_rhat": round(max(float(split_rhat(np.asarray(v))) for v in samples.values()), 3),
            "platform": platform,
            "fused_kernel": os.environ.get("GWINF_FUSED", "auto"),
            "truth_recovery_z": truth_z,
            "truth_within_3sd": truth_ok,
            "parity_z_vs_independent": parity_z,
            "parity_within_5se": parity_ok,
        },
    }
    if not truth_ok:
        print(f"WARNING: truth recovery failed: {truth_z}", file=sys.stderr)
    if parity_ok is False:
        print(f"WARNING: parity check failed: {parity_z}", file=sys.stderr)
    if div_rate >= 0.01:
        print(f"WARNING: divergence rate {div_rate:.2%} >= 1%", file=sys.stderr)
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
