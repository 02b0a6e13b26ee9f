"""Classify the bench run's divergent transitions by cause.

The 14-hyperparameter bench model has three hard likelihood walls (all
reference semantics, gwinferno/pipeline/analysis.py:272-303 + the beta
moment-map validity region):

  1. beta-shape validity: nu = mu_a (1 - mu_a) / var_a - 1 <= 0 makes the
     moment-mapped Beta(alpha, beta) undefined (NaN -> -inf potential);
  2. injection n_eff wall: n_eff_inj < 4 Nobs;
  3. per-event n_eff wall: min_k n_eff_k <= Nobs.

Crossing any wall mid-trajectory flags a NUTS divergence even though the
posterior bulk is far from it; genuine curvature divergences (funnels) are
the ones that bias moments.  This tool runs the bench configuration,
evaluates wall margins at every collected transition, and prints the
fraction of divergent transitions adjacent to each wall vs none (= likely
curvature).

Run on the ambient platform:  python tools/diagnose_divergences.py
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from gwinferno_tpu.infer import MCMC, NUTS  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402


def main():
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = bench.make_model(pedict, injdict, constants, z_model)

    mcmc = MCMC(
        NUTS(
            model,
            dense_mass=bench.DENSE_MASS,
            max_tree_depth=int(os.environ.get("BENCH_MAX_TREE_DEPTH", 6)),
            target_accept_prob=float(os.environ.get("BENCH_TARGET_ACCEPT", 0.8)),
        ),
        num_warmup=bench.WARMUP,
        num_samples=bench.SAMPLES,
        num_chains=bench.N_CHAINS,
        progress_bar=True,
        max_steps_per_call=int(os.environ.get("BENCH_SEG", 25)),
    )
    mcmc.run(jax.random.PRNGKey(1), init_params=bench.make_init(1))
    samples = mcmc.get_samples()
    extra = mcmc.get_extra_fields()
    div = np.asarray(extra["diverging"]).reshape(-1)
    n = div.size
    print(f"\ncollected {n} transitions, {div.sum()} divergent ({div.mean():.2%})")

    s = {k: np.asarray(v).reshape(-1) for k, v in samples.items()}
    nu1 = s["mu_a1"] * (1 - s["mu_a1"]) / s["var_a1"] - 1.0
    nu2 = s["mu_a2"] * (1 - s["mu_a2"]) / s["var_a2"] - 1.0

    det = mcmc.get_deterministic(site_names=["log_nEff_inj", "log_nEffs"])
    log_neff_inj = np.asarray(det["log_nEff_inj"]).reshape(-1)
    log_neffs_min = np.asarray(det["log_nEffs"]).reshape(n, -1).min(axis=1)
    nobs = float(constants["nObs"])

    # wall margins (log space where the walls are log-space)
    m_nu = np.minimum(nu1, nu2)  # wall at 0
    m_inj = log_neff_inj - np.log(4 * nobs)  # wall at 0
    m_pe = log_neffs_min - np.log(nobs)  # wall at 0

    def report(mask, label):
        k = mask.sum()
        if k == 0:
            print(f"{label:>14}: none")
            return
        print(
            f"{label:>14}: n={k:5d}  "
            f"min-nu p10/p50={np.percentile(m_nu[mask], 10):7.3f}/{np.percentile(m_nu[mask], 50):7.3f}  "
            f"inj-margin p10/p50={np.percentile(m_inj[mask], 10):6.2f}/{np.percentile(m_inj[mask], 50):6.2f}  "
            f"pe-margin p10/p50={np.percentile(m_pe[mask], 10):6.2f}/{np.percentile(m_pe[mask], 50):6.2f}"
        )

    report(div.astype(bool), "divergent")
    report(~div.astype(bool), "clean")

    # classify each divergent transition by its NEAREST wall (smallest
    # normalized margin; normalization = that margin's clean-run sd)
    mask = div.astype(bool)
    if mask.any():
        margins = np.stack(
            [
                m_nu / max(np.std(m_nu[~mask]), 1e-9),
                m_inj / max(np.std(m_inj[~mask]), 1e-9),
                m_pe / max(np.std(m_pe[~mask]), 1e-9),
            ],
            axis=0,
        )
        nearest = np.argmin(margins[:, mask], axis=0)
        names = ["beta-validity(nu)", "inj-n_eff", "pe-n_eff"]
        print("\ndivergent transitions by nearest wall (normalized margin):")
        for i, nm in enumerate(names):
            sel = nearest == i
            if sel.any():
                print(
                    f"  {nm:>18}: {sel.sum():5d} ({sel.mean():.1%})  "
                    f"median normalized margin {np.median(margins[i, mask][sel]):.2f}"
                )
        # a divergent point far from EVERY wall is curvature
        far = (margins[:, mask] > 2.0).all(axis=0)
        print(f"  far from all walls (>2 sd): {far.sum()} ({far.mean():.1%}) -> curvature candidates")
        for k in ("sig_peak", "lambda_m", "mu_peak", "sig_ct1", "sig_ct2"):
            print(
                f"    {k}: divergent mean {s[k][mask].mean():.3f} vs clean {s[k][~mask].mean():.3f}"
            )


if __name__ == "__main__":
    main()
