"""Generate a deterministic synthetic sensitivity-injection bank.

The reference test suite downloads the LVK O3 injection set from zenodo
(tests/download_test_data.sh); this environment has no egress, so we generate
a synthetic bank with a *known* sampling pdf and a mass/distance-dependent
detection model, written in the LVK O3 HDF5 schema so the production loader
(gwinferno_tpu.preprocess.selection.get_o3_cumulative_injection_dict) is
exercised unmodified.  Also builds the combined pe+injection handoff artifact
(tests/data/pe_inj_file.h5) from the real checked-in GWTC-3 catalog.

Draw distributions (all densities tracked exactly):
  m1 ~ powerlaw(alpha=-2.35) on [2, 100]
  q | m1 ~ powerlaw(beta=1) on [2/m1, 1]        (m2 = q m1 >= 2)
  z ~ dVc/dz (1+z)^1.7 / norm on [1e-4, 2.3]
  spins: isotropic directions, uniform magnitudes (vector pdf 1/(4 pi a^2))
Detection: proxy SNR ~ Mc_det^(5/6)/DL with a random projection factor.
The bank is drawn deep (N_GEN) so that spin-weighted populations keep
n_eff_inj comfortably above the production 4*Nobs wall: the found
injections' spin dims are uniform/isotropic draws, so a beta-magnitude x
aligned-tilt population costs a ~4-5x n_eff factor on top of the mass/z
weighting (round-3 sizing; with the round-2 24M bank the 14-parameter
posterior bulk sat within ~1.4x of the wall).

The horizon scale D0 is tuned so the FOUND injections' redshift
distribution matches the real 69-event catalog (median z_found 0.31 vs
catalog per-event-median 0.30).  With the earlier D0=10000 the synthetic
search was ~4x deeper than the instrument that detected the real events,
and the joint fit pushed the redshift evolution to lamb ~ -6 with the
posterior jammed against the min_neff walls (round-2 bench post-mortem).

Run from the repo root:  python tests/data/make_synthetic_injections.py
"""

import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gwinferno_tpu.cosmology import PLANCK_2015_LVK_Cosmology as cosmo  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SEED = 20260817
N_GEN = 96_000_000
CHUNK = 2_000_000
ALPHA, BETA = -2.35, 1.0
MMIN, MMAX = 2.0, 100.0
LAMB_Z = 1.7
ZMIN, ZMAX = 1e-4, 2.3
ANALYSIS_TIME_YR = 1.0
D0_MPC = 1600.0  # proxy-SNR horizon scale (see module docstring)

# --- self-consistent synthetic EVENT catalog (the bench problem) ---------
# Population truth for the powerlaw+peak bench: events drawn from this
# population, detected by the SAME proxy search as the injections, with
# flat-prior Gaussian PE sample clouds.  This makes the hierarchical
# posterior well-posed with the production min_neff_cut: tight PE clouds
# keep per-event n_eff ~ S, and extreme hyperparameters are excluded by the
# data (every event's narrow cloud gets tiny population density) instead of
# by MC-noise walls.  The REAL 69-event GWTC-3 catalog (kept for the model
# shape/contract tests) turned out to make this model ill-posed: its broad
# PE z-tails let runaway hyperparameters (lamb ~ +14 or -6) pass the n_eff
# cuts via importance-weight saturation, so chains of ANY sampler drift into
# MC-artifact modes (round-2 bench post-mortem).
#
# Round 3 (VERDICT items 1-2): the catalog carries a FULL spin truth so the
# 14-hyperparameter PR1 model (reference
# examples/simple_powerlaw_peak_example.py:29-113) is exercised end to end:
# beta-distributed magnitudes (moments mu_a/var_a, i.e. Beta(2.30, 4.28)),
# isotropic+aligned tilt mixtures, and informative spin PE clouds.  S=4000
# PE samples/event clears the min(n_eff) > Nobs wall for spin-weighted
# models (the 1000-sample banks put it at ~86 vs the wall at 69).  The peak
# fraction is 0.25 (round 2's 0.05 truth left mu_peak/sig_peak/lambda_m
# near-prior -- the 'powerlaw+peak' label was barely exercised).
N_EVENTS = 69
N_PE_SAMPLES = 8000
TRUE_POP = {"alpha": -2.35, "beta": 1.0, "mmin": 5.0, "mmax": 100.0,
            "mpp": 35.0, "sigpp": 5.0, "lam_peak": 0.25, "lamb_z": 1.7,
            # spin truth, shared by both components (the independent-spin
            # model recovers equal component truths)
            "mu_a": 0.35, "var_a": 0.03, "xi_tilt": 0.7, "sig_tilt": 0.5}


def beta_ab_from_mu_var(mu, var):
    """Standard beta-distribution moment map (reference
    gwinferno/preprocess/conversions.py:88 semantics)."""
    nu = mu * (1 - mu) / var - 1.0
    return mu * nu, (1 - mu) * nu


def _truncnorm_rejection(rng, loc, sig, lo, hi, shape):
    """Vectorized rejection sampling of N(loc, sig) truncated to [lo, hi]
    (loc may lie outside the interval; broadcastable)."""
    loc = np.broadcast_to(loc, shape)
    x = loc + sig * rng.standard_normal(shape)
    bad = (x < lo) | (x > hi)
    while bad.any():
        x[bad] = (loc[bad] + sig * rng.standard_normal(bad.sum()))
        bad = (x < lo) | (x > hi)
    return x


def powerlaw_icdf(u, alpha, lo, hi):
    ap1 = alpha + 1.0
    return (lo**ap1 + u * (hi**ap1 - lo**ap1)) ** (1.0 / ap1)


def powerlaw_pdf(x, alpha, lo, hi):
    ap1 = alpha + 1.0
    return ap1 * x**alpha / (hi**ap1 - lo**ap1)


def _generate_chunk(rng, n, zgrid, pz_grid, cdf):
    m1 = powerlaw_icdf(rng.uniform(size=n), ALPHA, MMIN, MMAX)
    qmin = MMIN / m1
    q = powerlaw_icdf(rng.uniform(size=n), BETA, qmin, 1.0)
    m2 = q * m1
    p_m1 = powerlaw_pdf(m1, ALPHA, MMIN, MMAX)
    p_q = powerlaw_pdf(q, BETA, qmin, 1.0)
    z = np.interp(rng.uniform(size=n), cdf, zgrid)
    p_z = np.interp(z, zgrid, pz_grid)

    # spins: uniform magnitude, isotropic direction
    a1, a2 = rng.uniform(size=n), rng.uniform(size=n)
    ct1, ct2 = rng.uniform(-1, 1, size=n), rng.uniform(-1, 1, size=n)
    phi1, phi2 = rng.uniform(0, 2 * np.pi, size=n), rng.uniform(0, 2 * np.pi, size=n)
    st1, st2 = np.sqrt(1 - ct1**2), np.sqrt(1 - ct2**2)

    # sampling pdf over (m1, m2, z, s1vec, s2vec):
    #   p(m2|m1) = p(q|m1)/m1 ; spin-vector pdf = 1/(4 pi a^2) each
    sampling_pdf = p_m1 * (p_q / m1) * p_z / (4 * np.pi * a1**2) / (4 * np.pi * a2**2)

    # detection model: proxy SNR with projection factor
    Mc = (m1 * m2) ** (3.0 / 5.0) / (m1 + m2) ** (1.0 / 5.0)
    DL = np.asarray(cosmo.z2DL(z))
    snr_opt = 8.0 * ((Mc * (1 + z)) / 25.0) ** (5.0 / 6.0) * (D0_MPC / DL)
    w = rng.uniform(size=n) ** (1.0 / 3.0)
    found = snr_opt * w > 8.0
    k = found
    return {
        "mass1_source": m1[k],
        "mass2_source": m2[k],
        "redshift": z[k],
        "spin1x": (a1 * st1 * np.cos(phi1))[k],
        "spin1y": (a1 * st1 * np.sin(phi1))[k],
        "spin1z": (a1 * ct1)[k],
        "spin2x": (a2 * st2 * np.cos(phi2))[k],
        "spin2y": (a2 * st2 * np.sin(phi2))[k],
        "spin2z": (a2 * ct2)[k],
        "sampling_pdf": sampling_pdf[k],
        "optimal_snr_net": snr_opt[k],
    }


def _draw_population(rng, n, zgrid, pz_grid, cdf):
    """Draw n sources from the TRUE powerlaw+peak population (with spins)."""
    p = TRUE_POP
    from_peak = rng.uniform(size=n) < p["lam_peak"]
    m_pl = powerlaw_icdf(rng.uniform(size=n), p["alpha"], p["mmin"], p["mmax"])
    m_pk = _truncnorm_rejection(rng, p["mpp"], p["sigpp"], p["mmin"], p["mmax"], (n,))
    m1 = np.where(from_peak, m_pk, m_pl)
    q = powerlaw_icdf(rng.uniform(size=n), p["beta"], p["mmin"] / m1, 1.0)
    z = np.interp(rng.uniform(size=n), cdf, zgrid)
    # spins: Beta(mu_a, var_a) magnitudes; isotropic+aligned tilt mixture
    aa, bb = beta_ab_from_mu_var(p["mu_a"], p["var_a"])
    a1, a2 = rng.beta(aa, bb, size=n), rng.beta(aa, bb, size=n)
    aligned1 = rng.uniform(size=n) < p["xi_tilt"]
    aligned2 = rng.uniform(size=n) < p["xi_tilt"]
    ct_ali1 = _truncnorm_rejection(rng, 1.0, p["sig_tilt"], -1.0, 1.0, (n,))
    ct_ali2 = _truncnorm_rejection(rng, 1.0, p["sig_tilt"], -1.0, 1.0, (n,))
    ct1 = np.where(aligned1, ct_ali1, rng.uniform(-1, 1, size=n))
    ct2 = np.where(aligned2, ct_ali2, rng.uniform(-1, 1, size=n))
    return m1, q, z, a1, a2, ct1, ct2


def generate_event_catalog(rng, zgrid, cdf_pop):
    """Detected synthetic events + known-prior PE sample clouds.

    Measurement model per parameter x: x_obs = x_true + noise, PE samples ~
    the posterior of x given x_obs under the cloud's own sampling prior:

    - q, a_1, a_2, cos_tilt_1, cos_tilt_2: truncnorm(x_obs, sigma, support)
      clouds == the FLAT-prior posterior exactly (the truncnorm
      normalization depends on x_obs only);
    - m1, z: lognormal clouds exp(ln x_obs + sigma N) == the posterior under
      a prior FLAT IN ln x, i.e. pi(x) proportional to 1/x.  The prior row
      must therefore be 1/(m1 z) -- NOT 1.  (Writing 1 here silently
      reweights every event cloud by m1 z; with the round-3 spin catalog
      that biased the recovered lamb to 6.3 +/- 1.8 against a truth of 1.7
      and alpha to -2.98 vs -2.35, reproduced independently by BOTH samplers
      in tools/parity/ -- the per-event constant normalization cancels in
      the log-BFs, the x-dependence does not.)

    Returns (n_events, n_params, n_samples) with the real catalog's param
    row order."""
    kept = []
    while sum(len(k[0]) for k in kept) < N_EVENTS:
        m1, q, z, a1, a2, ct1, ct2 = _draw_population(rng, 200_000, zgrid, None, cdf_pop)
        m2 = q * m1
        Mc = (m1 * m2) ** (3.0 / 5.0) / (m1 + m2) ** (1.0 / 5.0)
        DL = np.asarray(cosmo.z2DL(z))
        snr = 8.0 * ((Mc * (1 + z)) / 25.0) ** (5.0 / 6.0) * (D0_MPC / DL)
        w = rng.uniform(size=len(m1)) ** (1.0 / 3.0)
        det = snr * w > 8.0
        kept.append((m1[det], q[det], z[det], a1[det], a2[det], ct1[det], ct2[det]))
    m1, q, z, a1, a2, ct1, ct2 = (np.concatenate([k[i] for k in kept])[:N_EVENTS] for i in range(7))

    S = N_PE_SAMPLES
    sig_lnm, sig_q, sig_lnz = 0.08, 0.08, 0.08
    # spin-cloud widths sized so the hard per-event n_eff wall (> Nobs,
    # production min_neff_cut) stays >> 1 posterior-sd from the posterior
    # bulk: broader clouds (0.20/0.30 in round-3's first cut) put the
    # 14-param posterior's min-n_eff median only 2.7x above the wall and
    # EVERY NUTS trajectory crossed it (100% divergence flags).  The
    # collapse directions are small sig_ct / small var_a, where the
    # population gets narrower than the measurement -- informative clouds
    # keep the posterior out of those zones (tools/diagnose_divergences.py)
    sig_a, sig_ct = 0.14, 0.20
    lnm_obs = np.log(m1) + sig_lnm * rng.standard_normal(N_EVENTS)
    q_obs = q + sig_q * rng.standard_normal(N_EVENTS)
    lnz_obs = np.log(z) + sig_lnz * rng.standard_normal(N_EVENTS)
    m1_s = np.exp(lnm_obs[:, None] + sig_lnm * rng.standard_normal((N_EVENTS, S)))
    q_s = _truncnorm_rejection(rng, q_obs[:, None], sig_q, 0.02, 1.0, (N_EVENTS, S))
    z_s = np.exp(lnz_obs[:, None] + sig_lnz * rng.standard_normal((N_EVENTS, S)))

    def spin_cloud(x, sig, lo, hi):
        x_obs = x + sig * rng.standard_normal(N_EVENTS)
        return _truncnorm_rejection(rng, x_obs[:, None], sig, lo, hi, (N_EVENTS, S))

    a1_s = spin_cloud(a1, sig_a, 0.0, 1.0)
    a2_s = spin_cloud(a2, sig_a, 0.0, 1.0)
    ct1_s = spin_cloud(ct1, sig_ct, -1.0, 1.0)
    ct2_s = spin_cloud(ct2, sig_ct, -1.0, 1.0)

    params = ["redshift", "mass_1", "a_1", "cos_tilt_1", "mass_2", "a_2", "cos_tilt_2", "mass_ratio", "prior"]
    # PE sampling prior in the analysis parameterization (m1, q, z, a, ct):
    # flat in q/spins, flat-in-log (1/x) in m1 and z -- see docstring
    data = np.stack(
        [z_s, m1_s, a1_s, ct1_s, q_s * m1_s, a2_s, ct2_s, q_s, 1.0 / (m1_s * z_s)], axis=1
    )
    print(
        f"synthetic catalog: {N_EVENTS} events, med z {np.median(z):.3f}, med m1 {np.median(m1):.1f}, "
        f"med a {np.median(np.concatenate([a1, a2])):.2f}, med ct {np.median(np.concatenate([ct1, ct2])):.2f}"
    )
    return params, data, {"m1": m1, "q": q, "z": z, "a1": a1, "a2": a2, "ct1": ct1, "ct2": ct2}


def main():
    rng = np.random.default_rng(SEED)

    # redshift draw pdf proportional to dVc/dz (1+z)^(LAMB_Z - 1)
    zgrid = np.linspace(ZMIN, ZMAX, 4000)
    dVdz = np.asarray(cosmo.dVcdz(zgrid))
    pz_grid = dVdz * (1 + zgrid) ** (LAMB_Z - 1.0)
    pz_grid = pz_grid / np.trapezoid(pz_grid, zgrid)
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (pz_grid[1:] + pz_grid[:-1]) * np.diff(zgrid))])
    cdf /= cdf[-1]

    chunks = []
    done = 0
    while done < N_GEN:
        n = min(CHUNK, N_GEN - done)
        chunks.append(_generate_chunk(rng, n, zgrid, pz_grid, cdf))
        done += n
    data = {k: np.concatenate([c[k] for c in chunks]) for k in chunks[0]}
    n_found = len(data["redshift"])
    print(f"found {n_found} / {N_GEN} ({n_found / N_GEN:.3%}), median z_found {np.median(data['redshift']):.3f}")

    # store only the found rows (keeps the file small); total_generated
    # records the full draw count, exactly like the LVK release convention
    path = os.path.join(HERE, "injections.h5")
    with h5py.File(path, "w") as f:
        f.attrs["analysis_time"] = ANALYSIS_TIME_YR * 365.25 * 24 * 3600
        g = f.create_group("injections")
        g.attrs["total_generated"] = N_GEN
        for name, arr in data.items():
            g.create_dataset(name, data=arr)
        g.create_dataset("ifar_synthetic", data=np.full(n_found, 100.0))
        g.create_dataset("name", data=np.array([b"o3"] * n_found))
    print(f"wrote {path}")

    # combined handoff artifact from the real catalog + these injections
    from gwinferno_tpu.preprocess.data_collection import load_catalog_netcdf3
    from gwinferno_tpu.preprocess.data_collection import load_injection_dataset
    from gwinferno_tpu.preprocess.data_collection import save_posterior_samples_and_injection_datasets_as_idata
    from gwinferno_tpu.utils.dataset import DataArray
    from gwinferno_tpu.utils.dataset import Dataset

    catalog_path = os.path.join(HERE, "xarray_GWTC3_BBH_69evs_downsampled_1000samps_nospin.h5")
    if not os.path.exists(catalog_path):
        catalog_path = "/root/reference/tests/data/xarray_GWTC3_BBH_69evs_downsampled_1000samps_nospin.h5"
    pe = load_catalog_netcdf3(catalog_path)
    inj = load_injection_dataset(
        path,
        ["mass_1", "mass_ratio", "redshift", "a_1", "a_2", "cos_tilt_1", "cos_tilt_2"],
        through_o3=True,
    )
    inj_ds = Dataset({"injections": inj}, attrs=dict(inj.attrs))
    out = os.path.join(HERE, "pe_inj_file.h5")
    save_posterior_samples_and_injection_datasets_as_idata(pe, inj_ds, out)
    print(f"wrote {out}")

    # self-consistent synthetic-event artifact (the bench problem)
    params, pedata, truths = generate_event_catalog(rng, zgrid, cdf)
    arr = DataArray(
        pedata,
        ("event", "param", "sample"),
        coords={
            "event": np.array([f"SYN{i:03d}" for i in range(N_EVENTS)]),
            "param": np.array(params),
            "sample": np.arange(pedata.shape[-1]),
        },
    )
    pe_synth = Dataset({"posteriors": arr})
    out2 = os.path.join(HERE, "pe_inj_synthetic.h5")
    save_posterior_samples_and_injection_datasets_as_idata(pe_synth, inj_ds, out2)
    print(f"wrote {out2}  (truth: {TRUE_POP})")


if __name__ == "__main__":
    main()
