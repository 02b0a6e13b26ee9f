"""PPD calculators + plotting + result containers (mirrors reference
tests/pipeline/utils_test.py's postprocess chain)."""

import os
import tempfile

import numpy as np

from gwinferno_tpu.postprocess.calculations import calculate_beta_spin_mag
from gwinferno_tpu.postprocess.calculations import calculate_bspline_mass_ppds
from gwinferno_tpu.postprocess.calculations import calculate_mixture_iso_aligned_spin_tilt
from gwinferno_tpu.postprocess.calculations import calculate_powerlaw_peak_mass_ppds
from gwinferno_tpu.pipeline.utils import pdf_dict_to_xarray
from gwinferno_tpu.pipeline.utils import posterior_dict_to_xarray
from gwinferno_tpu.utils.dataset import Dataset

RNG = np.random.default_rng(0)
NDRAW = 6


def test_plpeak_mass_ppds_normalized():
    alpha = RNG.uniform(-4, -2, NDRAW)
    beta = RNG.uniform(0, 2, NDRAW)
    mu = RNG.uniform(25, 40, NDRAW)
    sig = RNG.uniform(2, 6, NDRAW)
    lam = RNG.uniform(0, 0.1, NDRAW)
    m, ms, q, qs = calculate_powerlaw_peak_mass_ppds(alpha, beta, mu, sig, lam, 5.0, 100.0)
    assert m.shape == (NDRAW, 800) and q.shape == (NDRAW, 800)
    # each draw's marginal pdf normalizes (rate defaults to 1)
    norms = np.trapezoid(m, ms, axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-6)


def test_bspline_mass_ppds_shapes():
    m_cs = RNG.normal(size=(NDRAW, 8))
    q_cs = RNG.normal(size=(NDRAW, 5))
    m, ms, q, qs = calculate_bspline_mass_ppds(m_cs, q_cs, {"m1": 8, "q": 5}, 5.0, 100.0)
    assert m.shape == (NDRAW, 800)
    assert np.all(np.isfinite(m)) and np.all(np.isfinite(q))


def test_spin_ppds():
    apdf, aa = calculate_beta_spin_mag(RNG.uniform(1, 3, NDRAW), RNG.uniform(1, 3, NDRAW))
    np.testing.assert_allclose(np.trapezoid(apdf, aa, axis=1), 1.0, rtol=1e-6)
    ctpdf, cc = calculate_mixture_iso_aligned_spin_tilt(RNG.uniform(0.5, 2, NDRAW), RNG.uniform(0, 1, NDRAW))
    np.testing.assert_allclose(np.trapezoid(ctpdf, cc, axis=1), 1.0, rtol=1e-6)


def test_result_containers_roundtrip():
    post = {"alpha": RNG.normal(size=20), "coefs": RNG.normal(size=(20, 4))}
    ds = posterior_dict_to_xarray(post)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "post.h5")
        ds.to_hdf5(path)
        back = Dataset.from_hdf5(path)
        np.testing.assert_allclose(back["alpha"].data, post["alpha"])
        np.testing.assert_allclose(back["coefs"].data, post["coefs"])

    pdfs = {"mass_1": RNG.random((20, 50))}
    grids = {"mass_1": np.linspace(5, 100, 50)}
    ds2 = pdf_dict_to_xarray(pdfs, grids, 20)
    assert ds2["mass_1"].shape == (20, 50)


def test_plotting_writes_files():
    from gwinferno_tpu.postprocess.plot import plot_mass_pdfs, plot_rate_of_z_pdfs, plot_spin_pdfs

    m = RNG.random((NDRAW, 100)) + 1e-4
    q = RNG.random((NDRAW, 100)) + 1e-4
    ms, qs = np.linspace(5, 100, 100), np.linspace(0.05, 1, 100)
    aa, cc = np.linspace(0, 1, 100), np.linspace(-1, 1, 100)
    z = np.linspace(0.01, 2, 100)
    with tempfile.TemporaryDirectory() as d:
        plot_mass_pdfs([m], [q], ms, qs, ["test"], "t", d)
        plot_spin_pdfs([m], [q], aa, cc, ["test"], "t", d)
        plot_rate_of_z_pdfs(RNG.random((NDRAW, 100)) * 20 + 5, z, "t", d)
        files = os.listdir(d)
        assert "mass_pdf_t.png" in files
        assert "redshift_pdf_t.png" in files
