"""Cosmology tables vs scipy quadrature oracle (astropy is unavailable here;
the reference compares against astropy Planck15 at <=1-2% -- we integrate the
same FLRW expressions with adaptive quadrature, a strictly tighter oracle)."""

import numpy as np
from numpy.testing import assert_allclose
from scipy.integrate import quad

from gwinferno_tpu.cosmology import C_SI
from gwinferno_tpu.cosmology import PLANCK_2015_Cosmology as cosmology
from gwinferno_tpu.cosmology import PLANCK_2015_LVK_Cosmology as lvk_cosmology


def _oracle_Dc(cosmo, z):
    def integrand(zz):
        opz = 1 + zz
        E = np.sqrt(cosmo.OmegaLambda + cosmo.OmegaMatter * opz**3 + cosmo.OmegaRadiation * opz**4)
        return (C_SI / cosmo.Ho) / E

    return np.array([quad(integrand, 0, zi, limit=200)[0] for zi in z])


def test_z2Dc_vs_quad():
    for cosmo in (cosmology, lvk_cosmology):
        z = np.linspace(1e-9, 3.0, 25)
        got = np.asarray(cosmo.z2Dc(z))
        want = _oracle_Dc(cosmo, z)
        assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_z2DL_roundtrip():
    z = np.linspace(1e-6, 5.0, 100)
    dl = np.asarray(cosmology.z2DL(z))
    z_back = np.asarray(cosmology.DL2z(dl))
    assert_allclose(z_back, z, rtol=1e-4, atol=1e-6)


def test_dVcdz_consistent_with_Dc():
    z = np.linspace(0.01, 3.0, 50)
    Dc = _oracle_Dc(cosmology, z)
    dDcdz = np.asarray(cosmology.dDcdz(z))
    want = 4 * np.pi * Dc**2 * dDcdz
    got = np.asarray(cosmology.dVcdz(z))
    assert_allclose(got, want, rtol=1e-4)


def test_logdVcdz_matches_log_of_linear():
    z = np.linspace(0.01, 3.0, 50)
    assert_allclose(
        np.asarray(cosmology.logdVcdz(z)),
        np.log(np.asarray(cosmology.dVcdz(z))),
        rtol=1e-10,
    )


def test_lvk_constants_pinned():
    # identity pin (reference tests/models/bsplines/single_test.py:test_cosmology)
    assert lvk_cosmology.Ho == 67.90 / 1e-3
    assert lvk_cosmology.OmegaMatter == 0.3065


def test_E_function():
    z = np.array([0.0, 1.0, 2.0])
    opz = 1 + z
    want = np.sqrt(cosmology.OmegaLambda + cosmology.OmegaMatter * opz**3)
    assert_allclose(np.asarray(cosmology.z2E(z)), want, rtol=1e-12)
