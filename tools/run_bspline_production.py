"""End-to-end TPU run of the B-spline PRODUCTION configuration.

The reference's production nonparametric model (knot counts from
gwinferno/pipeline/utils.py:29-33 -- m1: 50, q: 30, a: 16, tilt: 16, z: 20;
example surface examples/simple_bspline_example.py:25-89) over the
self-consistent synthetic catalog, with the fused log-affine likelihood
path, run on the ambient platform.  Produces the second headline row
(VERDICT r2 item 4): wall, min-ESS/s, divergence rate, max split-r_hat in
``docs/bspline_r3/metrics.json`` plus the committed posterior/PPD/plot
artifacts next to it.

Run on the TPU:  python tools/run_bspline_production.py
(defaults: 300w+300s, 8 chains, fused, 25-step segments; override with
BSPLINE_* env vars.)
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

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import simple_bspline_example as ex  # noqa: E402
from gwinferno_tpu.infer.diagnostics import effective_sample_size, split_rhat  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_base_parser  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402
from utils import run_bspline_analysis  # noqa: E402


def main():
    outdir = os.environ.get("BSPLINE_OUTDIR", os.path.join(ROOT, "docs", "bspline_r3"))
    os.makedirs(outdir, exist_ok=True)
    argv = [
        "--pe-inj-file", bench.ensure_data(),
        "--m-nsplines", "50", "--q-nsplines", "30",
        "--a-nsplines", "16", "--tilt-nsplines", "16", "--z-nsplines", "20",
        "--warmup", os.environ.get("BSPLINE_WARMUP", "300"),
        "--samples", os.environ.get("BSPLINE_SAMPLES", "300"),
        "--chains", os.environ.get("BSPLINE_CHAINS", "8"),
        "--max-steps-per-call", os.environ.get("BSPLINE_SEG", "25"),
        "--result-dir", outdir,
        "--run-label", "bspline_production",
        "--rngkey", "1",
        "--target-accept", os.environ.get("BSPLINE_TARGET_ACCEPT", "0.9"),
        # sync: the async scheduler + fused Pallas likelihood combination has
        # hung/faulted on the remote-TPU tunnel (3/3 attempts); the lockstep
        # scan is proven at this config (docs/bspline_r3)
        "--chain-scheduler", os.environ.get("BSPLINE_SCHEDULER", "sync"),
        # whitened: non-centered coefficient priors through the smoothing-
        # prior Cholesky (round-5 reparameterization; 'centered' restores the
        # reference-parity parameterization)
        "--reparam", os.environ.get("BSPLINE_REPARAM", "whitened"),
        "--a-tau", os.environ.get("BSPLINE_A_TAU", "25"),
        "--ct-tau", os.environ.get("BSPLINE_CT_TAU", "25"),
    ]
    # BSPLINE_FUSED=1 opts back into the RETIRED fused Pallas matmul path:
    # at the production config the unfused XLA path is 4.2x faster end to
    # end at equal quality (251 s vs 1056 s total, docs/bspline_r5 vs
    # docs/bspline_r5_fused_comparison)
    if os.environ.get("BSPLINE_FUSED", "0") == "1":
        argv.append("--fused")
    args = load_base_parser().parse_args(argv)

    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(args.pe_inj_file)
    t0 = time.time()
    posterior, models = run_bspline_analysis(ex.model, pedict, injdict, constants, param_names, args)
    wall_total = time.time() - t0
    mcmc = models.pop("_mcmc")

    # min ESS over every scalar component of every sampled site, PLUS (under
    # --reparam whitened, where the coefficient vectors are deterministic
    # sites in c-space) the coefficient components themselves, so the metric
    # stays comparable with the centered rounds
    samples = dict(mcmc.get_samples(group_by_chain=True))
    n_chains = next(iter(samples.values())).shape[0]
    coef_sites = {"mass_cs", "q_cs", "a_cs", "tilt_cs", "z_cs"}
    det = mcmc.get_deterministic(site_names=coef_sites)
    for name, v in det.items():
        arr = np.asarray(v)  # (draws*chains, ...) draw-major
        arr = arr.reshape((-1, n_chains) + arr.shape[1:]).swapaxes(0, 1)
        samples["det_" + name] = arr
    ess_min, rhat_max = np.inf, 0.0
    for name, v in samples.items():
        arr = np.asarray(v)  # (chains, draws, *shape)
        flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
        for j in range(flat.shape[2]):
            ess_min = min(ess_min, float(effective_sample_size(flat[:, :, j])))
            rhat_max = max(rhat_max, float(split_rhat(flat[:, :, j])))
    extra = mcmc.get_extra_fields()
    div = np.asarray(extra["diverging"])
    n_dim = sum(
        int(np.prod(np.asarray(v).shape[2:]) or 1)
        for k, v in samples.items() if not k.startswith("det_")
    )

    # CPU-f64 denominator (tools/measure_cpu_baseline_bspline.py), when present
    vs_baseline = None
    base_path = os.path.join(ROOT, "docs", "bspline_r5", "cpu_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("ess_per_s"):
            vs_baseline = round((ess_min / wall_total) / base["ess_per_s"], 1)

    metrics = {
        "config": (
            "B-spline production (m1:50 q:30 a:16 tilt:16 z:20, smoothing priors, "
            f"min_neff_cut, fused={bool(args.fused)}, target_accept={args.target_accept}, "
            f"reparam={args.reparam}, a_tau={args.a_tau}, ct_tau={args.ct_tau}), "
            f"{args.warmup}w+{args.samples}s, "
            f"{args.chains} chains, 69-ev synthetic catalog x {pedict['mass_1'].shape[1]} samps"
        ),
        "platform": jax.devices()[0].platform,
        "n_sampled_dims": n_dim,
        "wall_total_s": round(wall_total, 1),
        "min_ess": round(ess_min, 1),
        "min_ess_per_s_total": round(ess_min / wall_total, 3),
        "vs_cpu_f64_baseline": vs_baseline,
        "divergence_rate": round(float(div.mean()), 4),
        "max_split_rhat": round(rhat_max, 3),
        "mean_tree_depth": round(float(np.mean(np.asarray(extra["tree_depth"]))), 2),
    }

    # PPDs + plots from the chip's posterior (same artifact set as the example)
    from gwinferno_tpu.pipeline.utils import pdf_dict_to_xarray, posterior_dict_to_xarray
    from gwinferno_tpu.postprocess.calculations import (
        calculate_bspline_mass_ppds,
        calculate_bspline_spin_ppds,
        calculate_powerlaw_spline_rate_of_z_ppds,
    )
    from gwinferno_tpu.postprocess.plot import plot_mass_pdfs, plot_rate_of_z_pdfs, plot_spin_pdfs

    label = "bspline_production"
    posterior_ds = posterior_dict_to_xarray(dict(posterior))
    posterior_ds.to_hdf5(os.path.join(outdir, f"{label}_posterior_samples.h5"))
    nspline_dict = {
        "m1": args.m_nsplines, "q": args.q_nsplines,
        "a": args.a_nsplines, "tilt": args.tilt_nsplines, "redshift": args.z_nsplines,
    }
    mass, m1s, mass_ratio, qs = calculate_bspline_mass_ppds(
        np.asarray(posterior["mass_cs"]), np.asarray(posterior["q_cs"]), nspline_dict, args.mmin, args.mmax
    )
    apdfs, mags, ctpdfs, tilts = calculate_bspline_spin_ppds(
        np.asarray(posterior["a_cs"]), np.asarray(posterior["tilt_cs"]), nspline_dict
    )
    r_of_z, zs = calculate_powerlaw_spline_rate_of_z_ppds(
        np.asarray(posterior["lamb"]), np.asarray(posterior["z_cs"]), np.asarray(posterior["rate"]), models["z"]
    )
    names, colors = ["BSpline"], ["tab:blue"]
    plot_mass_pdfs([mass], [mass_ratio], m1s, qs, names, label, outdir, save=True, colors=colors)
    plot_spin_pdfs([apdfs], [ctpdfs], mags, tilts, names, label, outdir, save=True, colors=colors)
    plot_rate_of_z_pdfs(r_of_z, zs, label, outdir, save=True)
    pdf_dict = {"a1": apdfs, "cos_tilt1": ctpdfs, "mass_1": mass, "mass_ratio": mass_ratio, "redshift": r_of_z}
    param_dict = {"a1": mags, "cos_tilt1": tilts, "mass_1": m1s, "mass_ratio": qs, "redshift": zs}
    pdf_dataset = pdf_dict_to_xarray(pdf_dict, param_dict, args.samples)
    pdf_dataset.to_hdf5(os.path.join(outdir, f"{label}_pdfs.h5"))

    # truth recovery: the catalog's population is known (powerlaw+peak,
    # tests/data/make_synthetic_injections.py TRUE_POP); the nonparametric
    # PPD bands must bracket the true curves pointwise
    cov = truth_bracketing_coverage(
        mass, m1s, mass_ratio, qs, apdfs, mags, ctpdfs, tilts, np.asarray(r_of_z), zs
    )
    metrics["truth_band_coverage_90"] = {k: round(v, 3) for k, v in cov.items()}
    # the spin-magnitude curve carries visible P-spline smoothing bias at 69
    # events (the Beta peak is flattened toward the smoothing prior) and is
    # reported above but not gated; mass / ratio / tilt / rate-shape must
    # bracket
    gated = ["mass_1", "mass_ratio", "cos_tilt_1", "rate_z_shape"]
    metrics["truth_bracketing"] = bool(all(cov[k] >= 0.9 for k in gated))

    with open(os.path.join(outdir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics, indent=1), flush=True)
    print(f"artifacts in {outdir}", flush=True)


def truth_bracketing_coverage(mass, m1s, qpdfs, qs, apdfs, mags, ctpdfs, tilts, r_of_z, zs):
    """Fraction of grid points where each PPD's pointwise 90% credible band
    contains the TRUE synthetic-population curve.

    Truth: tests/data/make_synthetic_injections.py TRUE_POP (powerlaw+peak
    mass, conditional powerlaw mass ratio, Beta spin magnitudes, isotropic+
    aligned tilt mixture, (1+z)^lamb rate evolution).  The rate curve is
    compared in shape, R(z)/R(0), to factor out the absolute-rate posterior.
    """
    sys.path.insert(0, os.path.join(ROOT, "tests", "data"))
    from make_synthetic_injections import TRUE_POP as p
    from make_synthetic_injections import beta_ab_from_mu_var
    from scipy.stats import beta as beta_dist
    from scipy.stats import truncnorm

    def pl_pdf(x, alpha, lo, hi):
        ap1 = alpha + 1.0
        out = ap1 * np.power(x, alpha) / (hi**ap1 - lo**ap1)
        return np.where((x >= lo) & (x <= hi), out, 0.0)

    a_lo, a_hi = (p["mmin"] - p["mpp"]) / p["sigpp"], (p["mmax"] - p["mpp"]) / p["sigpp"]

    def m1_pdf(x):
        return (1 - p["lam_peak"]) * pl_pdf(x, p["alpha"], p["mmin"], p["mmax"]) + p[
            "lam_peak"
        ] * truncnorm.pdf(x, a_lo, a_hi, loc=p["mpp"], scale=p["sigpp"])

    # marginal q: integrate the conditional powerlaw(beta) on [mmin/m1, 1]
    mg = np.linspace(p["mmin"] + 1e-6, p["mmax"], 3000)
    pm = m1_pdf(mg)
    lo_q = p["mmin"] / mg
    bp1 = p["beta"] + 1.0
    pq_cond = np.where(
        qs[None, :] >= lo_q[:, None],
        bp1 * qs[None, :] ** p["beta"] / (1.0 - lo_q[:, None] ** bp1),
        0.0,
    )
    q_true = np.trapezoid(pq_cond * pm[:, None], mg, axis=0)

    aa, bb = beta_ab_from_mu_var(p["mu_a"], p["var_a"])
    tn_lo = (-1.0 - 1.0) / p["sig_tilt"]
    ct_true = p["xi_tilt"] * truncnorm.pdf(tilts, tn_lo, 0.0, loc=1.0, scale=p["sig_tilt"]) + (
        1 - p["xi_tilt"]
    ) * 0.5

    def cover(draws, true, mask):
        lo_, hi_ = np.quantile(draws, 0.05, axis=0), np.quantile(draws, 0.95, axis=0)
        ok = (true >= lo_) & (true <= hi_)
        return float(ok[mask].mean())

    return {
        "mass_1": cover(mass, m1_pdf(m1s), (m1s >= 5.5) & (m1s <= 95.0)),
        "mass_ratio": cover(qpdfs, q_true, (qs >= 0.15) & (qs <= 0.98)),
        "a_1": cover(apdfs, beta_dist.pdf(mags, aa, bb), (mags >= 0.02) & (mags <= 0.9)),
        "cos_tilt_1": cover(ctpdfs, ct_true, np.ones(len(tilts), bool)),
        "rate_z_shape": cover(
            r_of_z / r_of_z[:, :1], (1.0 + zs) ** p["lamb_z"], zs <= zs.max() * 0.8
        ),
    }


if __name__ == "__main__":
    main()
