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
N_GEN = 3_000_000
ALPHA, BETA = -2.35, 1.0
MMIN, MMAX = 2.0, 100.0
LAMB_Z = 1.7
ZMIN, ZMAX = 1e-4, 2.3
ANALYSIS_TIME_YR = 1.0


def powerlaw_icdf(u, alpha, lo, hi):
    ap1 = alpha + 1.0
    return (lo**ap1 + u * (hi**ap1 - lo**ap1)) ** (1.0 / ap1)


def powerlaw_pdf(x, alpha, lo, hi):
    ap1 = alpha + 1.0
    return ap1 * x**alpha / (hi**ap1 - lo**ap1)


def main():
    rng = np.random.default_rng(SEED)

    # masses
    m1 = powerlaw_icdf(rng.uniform(size=N_GEN), ALPHA, MMIN, MMAX)
    qmin = MMIN / m1
    q = powerlaw_icdf(rng.uniform(size=N_GEN), BETA, qmin, 1.0)
    m2 = q * m1
    p_m1 = powerlaw_pdf(m1, ALPHA, MMIN, MMAX)
    p_q = powerlaw_pdf(q, BETA, qmin, 1.0)

    # redshift from a gridded pdf proportional to dVc/dz (1+z)^(LAMB_Z - 1)
    zgrid = np.linspace(ZMIN, ZMAX, 4000)
    dVdz = np.asarray(cosmo.dVcdz(zgrid))
    pz_grid = dVdz * (1 + zgrid) ** (LAMB_Z - 1.0)
    znorm = np.trapezoid(pz_grid, zgrid)
    pz_grid = pz_grid / znorm
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (pz_grid[1:] + pz_grid[:-1]) * np.diff(zgrid))])
    cdf /= cdf[-1]
    z = np.interp(rng.uniform(size=N_GEN), cdf, zgrid)
    p_z = np.interp(z, zgrid, pz_grid)

    # spins: uniform magnitude, isotropic direction
    a1, a2 = rng.uniform(size=N_GEN), rng.uniform(size=N_GEN)
    ct1, ct2 = rng.uniform(-1, 1, size=N_GEN), rng.uniform(-1, 1, size=N_GEN)
    phi1, phi2 = rng.uniform(0, 2 * np.pi, size=N_GEN), rng.uniform(0, 2 * np.pi, size=N_GEN)
    st1, st2 = np.sqrt(1 - ct1**2), np.sqrt(1 - ct2**2)
    s1x, s1y, s1z = a1 * st1 * np.cos(phi1), a1 * st1 * np.sin(phi1), a1 * ct1
    s2x, s2y, s2z = a2 * st2 * np.cos(phi2), a2 * st2 * np.sin(phi2), a2 * ct2

    # sampling pdf over (m1, m2, z, s1vec, s2vec):
    #   p(m2|m1) = p(q|m1)/m1 ; spin-vector pdf = 1/(4 pi a^2) each
    sampling_pdf = p_m1 * (p_q / m1) * p_z / (4 * np.pi * a1**2) / (4 * np.pi * a2**2)

    # detection model: proxy SNR with projection factor
    Mc = (m1 * m2) ** (3.0 / 5.0) / (m1 + m2) ** (1.0 / 5.0)
    DL = np.asarray(cosmo.z2DL(z))
    snr_opt = 8.0 * ((Mc * (1 + z)) / 25.0) ** (5.0 / 6.0) * (10000.0 / DL)
    w = rng.uniform(size=N_GEN) ** (1.0 / 3.0)
    snr_obs = snr_opt * w
    found = snr_obs > 8.0
    ifar = np.where(found, 100.0, 1e-3)
    print(f"found {found.sum()} / {N_GEN} ({found.mean():.2%})")

    # store only the found rows (keeps the file small); total_generated
    # records the full draw count, exactly like the LVK release convention
    k = found
    path = os.path.join(HERE, "injections.h5")
    with h5py.File(path, "w") as f:
        f.attrs["analysis_time"] = ANALYSIS_TIME_YR * 365.25 * 24 * 3600
        g = f.create_group("injections")
        g.attrs["total_generated"] = N_GEN
        g.create_dataset("mass1_source", data=m1[k])
        g.create_dataset("mass2_source", data=m2[k])
        g.create_dataset("redshift", data=z[k])
        g.create_dataset("spin1x", data=s1x[k])
        g.create_dataset("spin1y", data=s1y[k])
        g.create_dataset("spin1z", data=s1z[k])
        g.create_dataset("spin2x", data=s2x[k])
        g.create_dataset("spin2y", data=s2y[k])
        g.create_dataset("spin2z", data=s2z[k])
        g.create_dataset("sampling_pdf", data=sampling_pdf[k])
        g.create_dataset("ifar_synthetic", data=ifar[k])
        g.create_dataset("optimal_snr_net", data=snr_opt[k])
        g.create_dataset("name", data=np.array([b"o3"] * int(k.sum())))
    print(f"wrote {path}")

    # combined handoff artifact from the real catalog + these injections
    from gwinferno_tpu.preprocess.data_collection import load_catalog_netcdf3
    from gwinferno_tpu.preprocess.data_collection import load_injection_dataset
    from gwinferno_tpu.preprocess.data_collection import save_posterior_samples_and_injection_datasets_as_idata
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


if __name__ == "__main__":
    main()
