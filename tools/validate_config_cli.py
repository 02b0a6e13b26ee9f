"""End-to-end statistical validation of the config-driven CLI path.

Drives the REAL production surface -- ``pipeline.cli.run_inference`` on
``examples/config_files/config_validation.yml`` -- against the truth-known
product-population catalog (tests/data/make_config_validation_catalog.py),
then scores the run exactly the way bench.py scores the hand-built model:
post-warmup divergence rate, max split-r_hat, min ESS, and per-hyperparameter
truth z-scores.  Writes ``docs/config_cli_r5/metrics.json`` (VERDICT r4
item 1).

Run:  python tools/validate_config_cli.py            (ambient platform)
Env:  CFGVAL_WARMUP / CFGVAL_SAMPLES / CFGVAL_CHAINS override the config's
      sampler block for quick smokes; CFGVAL_OUTDIR redirects the artifact.
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from gwinferno_tpu.infer.diagnostics import effective_sample_size, split_rhat  # noqa: E402
from gwinferno_tpu.pipeline.cli import run_inference  # noqa: E402

# truth: make_config_validation_catalog.py TRUE_CFG, keyed by site name
TRUTH = {
    "mass_1_alpha": -2.35,
    "mass_1_minimum": 8.0,
    "mass_1_maximum": 70.0,
    "mass_1_alpha_min": 2.0,
    "mass_1_alpha_max": 10.0,
    "mass_ratio_alpha": 1.2,
    "redshift_lamb": 1.7,
}


def main():
    outdir = os.environ.get("CFGVAL_OUTDIR", os.path.join(ROOT, "docs", "config_cli_r5"))
    os.makedirs(outdir, exist_ok=True)
    config_path = os.path.join(ROOT, "examples", "config_files", "config_validation.yml")

    catalog = os.path.join(ROOT, "tests", "data", "pe_inj_config_val.h5")
    gen = os.path.join(ROOT, "tests", "data", "make_config_validation_catalog.py")
    if not os.path.exists(catalog) or os.path.getmtime(gen) > os.path.getmtime(catalog):
        import subprocess

        print("regenerating config-validation catalog ...", flush=True)
        subprocess.run([sys.executable, gen], check=True)

    # optional overrides for quick smokes (the committed artifact uses the
    # config's own sampler block)
    overrides = {k: os.environ.get("CFGVAL_" + k.upper()) for k in ("warmup", "samples", "chains")}
    if any(v is not None for v in overrides.values()):
        with open(config_path) as f:
            conf = yaml.safe_load(f)
        mk = conf["sampler"]["mcmc_kwargs"]
        names = {"warmup": "num_warmup", "samples": "num_samples", "chains": "num_chains"}
        for k, v in overrides.items():
            if v is not None:
                mk[names[k]] = int(v)
        conf["outdir"] = os.path.join(outdir, "run")
        config_path = os.path.join(outdir, "config_effective.yml")
        with open(config_path, "w") as f:
            yaml.safe_dump(conf, f)

    t0 = time.time()
    mcmc = run_inference(config_path, rng_seed=7)
    wall = time.time() - t0

    samples = mcmc.get_samples(group_by_chain=True)
    ess_min, rhat_max = np.inf, 0.0
    for _, v in samples.items():
        arr = np.asarray(v)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
        for j in range(flat.shape[2]):
            ess_min = min(ess_min, float(effective_sample_size(flat[:, :, j])))
            rhat_max = max(rhat_max, float(split_rhat(flat[:, :, j])))
    extra = mcmc.get_extra_fields()
    div = float(np.asarray(extra["diverging"]).mean())

    flat_samples = mcmc.get_samples()
    truth_z = {}
    for site, true_val in TRUTH.items():
        s = np.asarray(flat_samples[site])
        truth_z[site] = round(float((s.mean() - true_val) / max(s.std(), 1e-12)), 2)

    metrics = {
        "config": "config-driven CLI on the truth-known product-population catalog "
                  "(PowerlawSmoothedPowerlaw mass + Powerlaw q + PowerlawRedshift), "
                  "examples/config_files/config_validation.yml",
        "platform": jax.devices()[0].platform,
        "wall_total_s": round(wall, 1),
        "divergence_rate": round(div, 4),
        "max_split_rhat": round(rhat_max, 3),
        "min_ess": round(ess_min, 1),
        "mean_tree_depth": round(float(np.mean(np.asarray(extra["tree_depth"]))), 2),
        "truth_z": truth_z,
        "truth_recovery": bool(all(abs(z) <= 3.0 for z in truth_z.values())),
    }
    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics, indent=1), flush=True)


if __name__ == "__main__":
    main()
