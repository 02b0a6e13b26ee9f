"""Convergence-diagnostic estimator unit tests."""

import numpy as np

from gwinferno_tpu.infer.diagnostics import effective_sample_size
from gwinferno_tpu.infer.diagnostics import split_rhat


def test_ess_iid_draws_near_max():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 500))
    ess = effective_sample_size(x)
    assert 1200 < ess < 2600, ess


def test_ess_frozen_chains_is_zero():
    """Regression: a stuck sampler (zero-variance chains) must report ZERO
    effective draws, not the m*n maximum -- a frozen run previously scored
    as perfectly mixed and poisoned the benchmark."""
    x = np.full((16, 200), 2.35)
    assert effective_sample_size(x) == 0.0


def test_ess_heavily_autocorrelated_low():
    rng = np.random.default_rng(1)
    n = 1000
    x = np.empty((2, n))
    for c in range(2):
        e = rng.normal(size=n)
        ar = np.empty(n)
        ar[0] = e[0]
        for t in range(1, n):
            ar[t] = 0.95 * ar[t - 1] + e[t]
        x[c] = ar
    ess = effective_sample_size(x)
    assert ess < 0.15 * x.size, ess


def test_ess_stuck_plus_moving_chains_penalized():
    """One frozen chain among movers inflates between-chain variance; the
    estimate must be far below the per-chain-iid count."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 300))
    x[0] = 5.0  # frozen far away
    ess = effective_sample_size(x)
    assert ess < 100, ess


def test_split_rhat_mixed_vs_stuck():
    rng = np.random.default_rng(3)
    good = rng.normal(size=(4, 400))
    assert split_rhat(good) < 1.05
    bad = np.concatenate([rng.normal(size=(2, 400)), 10 + rng.normal(size=(2, 400))])
    assert split_rhat(bad) > 1.5
