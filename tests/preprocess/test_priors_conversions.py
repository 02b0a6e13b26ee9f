"""Effective-spin fiducial priors + conversions (mirrors reference
tests/preprocess/{priors,conversions}_test.py)."""

import numpy as np
import pytest

from gwinferno_tpu.preprocess.conversions import alpha_beta_from_mu_var
from gwinferno_tpu.preprocess.conversions import chieff_from_q_component_spins
from gwinferno_tpu.preprocess.conversions import chip_from_q_component_spins
from gwinferno_tpu.preprocess.conversions import mu_var_from_alpha_beta
from gwinferno_tpu.preprocess.priors import chi_effective_prior_from_aligned_spins
from gwinferno_tpu.preprocess.priors import chi_effective_prior_from_isotropic_spins
from gwinferno_tpu.preprocess.priors import chi_p_prior_from_isotropic_spins


@pytest.mark.parametrize("q", [0.3, 0.6, 0.9, 1.0])
def test_chi_eff_aligned_prior_normalized(q):
    x = np.linspace(-1, 1, 20001)
    p = chi_effective_prior_from_aligned_spins(x, q)
    assert abs(np.trapezoid(p, x) - 1.0) < 1e-3
    assert p[0] == 0.0 or abs(p[0]) < 1e-10


@pytest.mark.parametrize("q", [0.3, 0.6, 0.9])
def test_chi_eff_isotropic_prior_normalized_and_zero_at_bounds(q):
    x = np.linspace(-1, 1, 20001)
    p = chi_effective_prior_from_isotropic_spins(x, q)
    assert np.all(np.isfinite(p))
    assert abs(np.trapezoid(p, x) - 1.0) < 2e-3
    assert p[0] < 1e-6 and p[-1] < 1e-6
    # symmetric in chi_eff
    np.testing.assert_allclose(p, p[::-1], atol=1e-8)


def test_chi_eff_isotropic_vs_monte_carlo():
    """Oracle: direct MC of the implied chi_eff distribution."""
    q = 0.7
    rng = np.random.default_rng(0)
    n = 2_000_000
    a1, a2 = rng.random(n), rng.random(n)
    ct1, ct2 = rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    chieff = chieff_from_q_component_spins(q, a1, a2, ct1, ct2)
    hist, edges = np.histogram(chieff, bins=100, range=(-1, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    p = chi_effective_prior_from_isotropic_spins(centers, q)
    assert np.max(np.abs(hist - p)) < 0.05


@pytest.mark.parametrize("q", [0.4, 0.8])
def test_chi_p_prior_normalized(q):
    x = np.linspace(1e-6, 1, 20001)
    p = chi_p_prior_from_isotropic_spins(x, q)
    assert np.all(np.isfinite(p))
    assert abs(np.trapezoid(p, x) - 1.0) < 2e-3


def test_chi_p_prior_vs_monte_carlo():
    q = 0.8
    rng = np.random.default_rng(1)
    n = 2_000_000
    a1, a2 = rng.random(n), rng.random(n)
    ct1, ct2 = rng.uniform(-1, 1, n), rng.uniform(-1, 1, n)
    chip = chip_from_q_component_spins(q, a1, a2, ct1, ct2)
    hist, edges = np.histogram(chip, bins=100, range=(0, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    p = chi_p_prior_from_isotropic_spins(centers, q)
    assert np.max(np.abs(hist - p)) < 0.08


def test_chieff_point_values():
    # point-check parity (reference tests/preprocess/conversions_test.py:24-31)
    got = chieff_from_q_component_spins(0.5, 0.3, 0.4, 1.0, -1.0)
    want = (0.3 * 1.0 + 0.5 * 0.4 * (-1.0)) / 1.5
    assert abs(got - want) < 1e-7
    got = chieff_from_q_component_spins(1.0, 0.5, 0.5, 0.0, 0.0)
    assert abs(got) < 1e-12


def test_chip_point_values():
    got = chip_from_q_component_spins(1.0, 0.6, 0.2, 0.0, 0.0)
    assert abs(got - 0.6) < 1e-12  # primary dominates
    got = chip_from_q_component_spins(0.5, 0.0, 0.8, 1.0, 0.0)
    want = (3 + 4 * 0.5) / (4 + 3 * 0.5) * 0.5 * 0.8
    assert abs(got - want) < 1e-12


def test_beta_moment_roundtrip():
    alpha, beta = 2.3, 4.1
    mu, var = mu_var_from_alpha_beta(alpha, beta)
    a2, b2 = alpha_beta_from_mu_var(mu, var)
    assert abs(a2 - alpha) < 1e-10 and abs(b2 - beta) < 1e-10
    from scipy.stats import beta as sbeta

    assert abs(mu - sbeta(alpha, beta).mean()) < 1e-12
    assert abs(var - sbeta(alpha, beta).var()) < 1e-12
