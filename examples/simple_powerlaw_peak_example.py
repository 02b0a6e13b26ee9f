"""Powerlaw+peak population analysis -- the reference's PR1 config
(examples/simple_powerlaw_peak_example.py) on this framework, with three
'intended semantics' fixes (SURVEY.md S7.3):

- the stale ``surv_hypervolume_fct`` kwargs are fixed to the library's
  ``surveyed_hypervolume=`` signature (SURVEY.md S2.8);
- hyper-weights are computed in LOG space end to end: the reference's linear
  products (its :80-82) square the weights inside n_eff and overflow f32, so
  the example as written cannot run on the TPU hardware this framework
  targets (its own tests only ever run f64 CPU);
- the (mu, var) -> (alpha, beta) spin-magnitude map is the standard moment
  map the reference itself ships as
  gwinferno/preprocess/conversions.py:88 (``alpha_beta_from_mu_var``).  The
  reference example's inline ``alpha_a1 = mu_a1 * var_a1`` (its :64) caps
  alpha at 0.25 over its whole prior box, i.e. admits ONLY double-divergent
  U-shaped betas -- a typo for the moment map.

Run:  python examples/simple_powerlaw_peak_example.py --pe-inj-file tests/data/pe_inj_file.h5 --warmup 500 --samples 1500
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from gwinferno_tpu import ppl  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import log_independent_spin_magnitude_beta_dist  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import log_independent_spin_tilt  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import log_plpeak_primary_ratio_pdf  # noqa: E402
from gwinferno_tpu.pipeline.analysis import hierarchical_likelihood  # noqa: E402
from gwinferno_tpu.preprocess.conversions import alpha_beta_from_mu_var  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_base_parser  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402
from gwinferno_tpu.pipeline.utils import pdf_dict_to_xarray  # noqa: E402
from gwinferno_tpu.pipeline.utils import posterior_dict_to_xarray  # noqa: E402
from gwinferno_tpu.postprocess.calculations import calculate_beta_spin_mag  # noqa: E402
from gwinferno_tpu.postprocess.calculations import calculate_mixture_iso_aligned_spin_tilt  # noqa: E402
from gwinferno_tpu.postprocess.calculations import calculate_powerlaw_peak_mass_ppds  # noqa: E402
from gwinferno_tpu.postprocess.calculations import calculate_powerlaw_rate_of_z_ppds  # noqa: E402
from gwinferno_tpu.postprocess.plot import plot_mass_pdfs  # noqa: E402
from gwinferno_tpu.postprocess.plot import plot_rate_of_z_pdfs  # noqa: E402
from gwinferno_tpu.postprocess.plot import plot_spin_pdfs  # noqa: E402
from gwinferno_tpu.ppl import distributions as dist  # noqa: E402

from utils import run_powerlawpeak_analysis  # noqa: E402
from utils import setup_result_dir  # noqa: E402


def model(pedict, injdict, Nobs, Tobs, Ninj, z_model, mmin, mmax, param_names):
    """The 14-hyperparameter powerlaw+peak + independent-spins model
    (parity: reference examples/simple_powerlaw_peak_example.py:29-113)."""
    # Mass
    beta = ppl.sample("beta", dist.Normal(0, 5))
    alpha = ppl.sample("alpha", dist.Normal(0, 5))
    mu_peak = ppl.sample("mu_peak", dist.Uniform(mmin, mmax))
    sig_peak = ppl.sample("sig_peak", dist.HalfNormal(10))
    lambda_m = ppl.sample("lambda_m", dist.Uniform(0, 1))

    # Spin magnitude (independent; beta-distribution shape reparameterization)
    mu_a1 = ppl.sample("mu_a1", dist.Uniform(0, 1))
    var_a1 = ppl.sample("var_a1", dist.Uniform(0.005, 0.25))
    mu_a2 = ppl.sample("mu_a2", dist.Uniform(0, 1))
    var_a2 = ppl.sample("var_a2", dist.Uniform(0.005, 0.25))
    # moment map (see module docstring); invalid (mu, var) combinations give
    # non-positive shapes -> NaN logpdf -> the -inf likelihood wall
    a1_shapes = alpha_beta_from_mu_var(mu_a1, var_a1)
    a2_shapes = alpha_beta_from_mu_var(mu_a2, var_a2)
    alpha_a1 = ppl.deterministic("alpha_a1", a1_shapes[0])
    alpha_a2 = ppl.deterministic("alpha_a2", a2_shapes[0])
    beta_a1 = ppl.deterministic("beta_a1", a1_shapes[1])
    beta_a2 = ppl.deterministic("beta_a2", a2_shapes[1])

    # Spin tilt (independent)
    lambda_ct1 = ppl.sample("lambda_ct1", dist.Uniform(0, 1))
    lambda_ct2 = ppl.sample("lambda_ct2", dist.Uniform(0, 1))
    sig_ct1 = ppl.sample("sig_ct1", dist.Uniform(0.1, 4))
    sig_ct2 = ppl.sample("sig_ct2", dist.Uniform(0.1, 4))

    # Redshift
    lamb = ppl.sample("lamb", dist.Normal(0, 5))

    def get_log_weights(datadict):
        logw = (
            log_plpeak_primary_ratio_pdf(
                datadict["mass_1"], datadict["mass_ratio"], alpha, beta, mmin, mmax, mu_peak, sig_peak, lambda_m
            )
            + log_independent_spin_magnitude_beta_dist(
                datadict["a_1"], datadict["a_2"], alpha_a1, beta_a1, alpha_a2, beta_a2
            )
            + log_independent_spin_tilt(
                datadict["cos_tilt_1"], datadict["cos_tilt_2"], lambda_ct1, lambda_ct2, sig_ct1, sig_ct2
            )
            + z_model.log_prob(datadict["redshift"], lamb)
            - jnp.log(jnp.asarray(datadict["prior"]))
        )
        return jnp.where(jnp.isnan(logw), -jnp.inf, logw)

    pe_log_weights = get_log_weights(pedict)
    inj_log_weights = get_log_weights(injdict)

    hierarchical_likelihood(
        pe_log_weights,
        inj_log_weights,
        float(Ninj),
        Nobs,
        Tobs,
        surveyed_hypervolume=z_model.normalization(lamb),
        param_names=param_names,
        posterior_predictive_check=True,
        pedata=pedict,
        injdata=injdict,
        m2min=mmin,
        m1min=mmin,
        mmax=mmax,
        log=True,
    )


def main():
    parser = load_base_parser()
    parser.add_argument("--example", type=str, default=None)
    args = parser.parse_args()

    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(args.pe_inj_file)
    label, result_dir = setup_result_dir(args, default_label="powerlaw_peak")

    posterior, z_model = run_powerlawpeak_analysis(model, pedict, injdict, constants, param_names, args)
    posterior_ds = posterior_dict_to_xarray(posterior)
    posterior_ds.to_hdf5(result_dir + f"/{label}_posterior_samples.h5")
    print(f"posteriors file saved: {result_dir}/{label}_posterior_samples.h5")

    import numpy as np

    names = ["PowerlawPeak"]
    colors = ["tab:blue"]

    print("calculating mass ppds:")
    mass, m1s, mass_ratio, qs = calculate_powerlaw_peak_mass_ppds(
        np.asarray(posterior["alpha"]), np.asarray(posterior["beta"]), np.asarray(posterior["mu_peak"]),
        np.asarray(posterior["sig_peak"]), np.asarray(posterior["lambda_m"]), args.mmin, args.mmax,
    )

    print("calculating spin ppds:")
    alpha_a1, beta_a1 = alpha_beta_from_mu_var(np.asarray(posterior["mu_a1"]), np.asarray(posterior["var_a1"]))
    alpha_a2, beta_a2 = alpha_beta_from_mu_var(np.asarray(posterior["mu_a2"]), np.asarray(posterior["var_a2"]))
    mag1, _ = calculate_beta_spin_mag(alpha_a1, beta_a1)
    mag2, mags = calculate_beta_spin_mag(alpha_a2, beta_a2)
    tilt1, _ = calculate_mixture_iso_aligned_spin_tilt(np.asarray(posterior["sig_ct1"]), np.asarray(posterior["lambda_ct1"]))
    tilt2, tilts = calculate_mixture_iso_aligned_spin_tilt(np.asarray(posterior["sig_ct2"]), np.asarray(posterior["lambda_ct2"]))

    print("calculating rate(z) ppds:")
    r_of_z, zs = calculate_powerlaw_rate_of_z_ppds(np.asarray(posterior["lamb"]), np.asarray(posterior["rate"]), z_model)

    print("plotting:")
    plot_mass_pdfs([mass], [mass_ratio], m1s, qs, names, label, result_dir, save=args.save_plots, colors=colors)
    plot_spin_pdfs([mag1], [tilt1], mags, tilts, names, label, result_dir, save=args.save_plots, colors=colors)
    plot_spin_pdfs([mag2], [tilt2], mags, tilts, names, label, result_dir, save=args.save_plots, colors=colors, secondary=True)
    plot_rate_of_z_pdfs(r_of_z, zs, label, result_dir, save=args.save_plots)

    pdf_dict = {
        "a1": mag1, "cos_tilt1": tilt1, "a2": mag2, "cos_tilt2": tilt2,
        "mass_1": mass, "mass_ratio": mass_ratio, "redshift": r_of_z,
    }
    param_dict = {"a1": mags, "a2": mags, "cos_tilt1": tilts, "cos_tilt2": tilts, "mass_1": m1s, "redshift": zs, "mass_ratio": qs}
    pdf_dataset = pdf_dict_to_xarray(pdf_dict, param_dict, args.samples)
    pdf_dataset.to_hdf5(result_dir + f"/{label}_pdfs.h5")
    print(f"pdfs saved: {result_dir}/{label}_pdfs.h5")


if __name__ == "__main__":
    main()
