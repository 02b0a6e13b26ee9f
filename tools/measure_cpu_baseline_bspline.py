"""CPU-f64 baseline for the B-SPLINE production problem (VERDICT r4 item 2).

Same rationale as tools/measure_cpu_baseline.py: the reference publishes no
benchmarks and is CPU-numpyro-f64 end to end, so the honest denominator for
the nonparametric headline is the SAME engine on the SAME problem (full
production knot counts, full 69 x 8000 catalog, min_neff cut, whitened
coefficient priors) on this machine's CPU in f64.  Writes
``docs/bspline_r5/cpu_baseline.json`` with ``ess_per_s``; the production
metrics tool reads it for a ``vs_baseline`` multiplier.

A full 300w+600s x 8-chain CPU run is ~days on this 2-core host (measured
204 ms/gradient single-chain); the baseline uses a smaller chain/draw count
(BASELINE_* env overrides, default 150w+200s x 2 chains) -- ESS/s is a
throughput measure and is config-comparable once mixing is healthy, and the
r_hat/divergence numbers are recorded alongside so the run's health is
checkable.

Run from the repo root:  python tools/measure_cpu_baseline_bspline.py
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import bench  # noqa: E402
import simple_bspline_example as ex  # noqa: E402
from gwinferno_tpu.infer.diagnostics import effective_sample_size, split_rhat  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_base_parser  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402
from utils import run_bspline_analysis  # noqa: E402


def main():
    warmup = os.environ.get("BASELINE_WARMUP", "150")
    samples = os.environ.get("BASELINE_SAMPLES", "200")
    chains = os.environ.get("BASELINE_CHAINS", "2")
    argv = [
        "--pe-inj-file", bench.ensure_data(),
        "--m-nsplines", "50", "--q-nsplines", "30",
        "--a-nsplines", "16", "--tilt-nsplines", "16", "--z-nsplines", "20",
        "--warmup", warmup, "--samples", samples, "--chains", chains,
        "--result-dir", "/tmp/bspline_cpu_baseline", "--run-label", "cpu_baseline",
        "--rngkey", "1",
        "--target-accept", os.environ.get("BSPLINE_TARGET_ACCEPT", "0.8"),
        "--reparam", os.environ.get("BSPLINE_REPARAM", "whitened"),
        "--chain-scheduler", "sync",
    ]
    args = load_base_parser().parse_args(argv)
    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(args.pe_inj_file)

    t0 = time.time()
    posterior, models = run_bspline_analysis(ex.model, pedict, injdict, constants, param_names, args)
    wall = time.time() - t0
    mcmc = models.pop("_mcmc")

    samples_bc = mcmc.get_samples(group_by_chain=True)
    ess_min, rhat_max = np.inf, 0.0
    for _, v in samples_bc.items():
        arr = np.asarray(v)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
        for j in range(flat.shape[2]):
            ess_min = min(ess_min, float(effective_sample_size(flat[:, :, j])))
            rhat_max = max(rhat_max, float(split_rhat(flat[:, :, j])))
    extra = mcmc.get_extra_fields()
    div = float(np.asarray(extra["diverging"]).mean())

    out = {
        "ess_per_s": round(ess_min / wall, 4),
        "platform": "cpu-f64 (this host, measured)",
        "config": (
            "B-spline production knots (m1:50 q:30 a:16 tilt:16 z:20), whitened "
            f"coefficient priors, min_neff_cut, 69 x 8000 catalog, {warmup}w+{samples}s, "
            f"{chains} chains, diag mass"
        ),
        "measured": {
            "wall_total_s": round(wall, 1),
            "min_ess": round(ess_min, 1),
            "divergence_rate": round(div, 4),
            "max_split_rhat": round(rhat_max, 3),
            "mean_tree_depth": round(float(np.mean(np.asarray(extra["tree_depth"]))), 2),
        },
        "note": (
            "Smaller chain/draw budget than the TPU production artifact (a full-size "
            "run is ~days on this 2-core host); ESS/s is the throughput denominator, "
            "health metrics recorded for comparability."
        ),
    }
    outdir = os.path.join(ROOT, "docs", "bspline_r5")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "cpu_baseline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
