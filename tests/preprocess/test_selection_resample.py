"""Unit test for selection.resample_injections (reference
gwinferno/preprocess/selection.py:143-156 has no test of its own)."""

import jax
import jax.numpy as jnp
import numpy as np

from gwinferno_tpu.preprocess.selection import resample_injections

PARAM_MAP = {"x": 0, "prior": 1}


def _target(injdata):
    # p(x) = 2x on [0, 1]
    return 2.0 * injdata[PARAM_MAP["x"], :]


def test_resample_injections_contract():
    rng = np.random.default_rng(5)
    n_found, n_draw = 4000, 10000
    x = rng.uniform(0.0, 1.0, n_found)
    injdata = jnp.asarray(np.stack([x, np.ones(n_found)]))

    bank, n_eff_bank, neff_new = resample_injections(
        jax.random.PRNGKey(0), _target, injdata, n_draw, PARAM_MAP
    )

    w = _target(injdata)  # prior row is 1
    w_sum, w_sumsq = float(jnp.sum(w)), float(jnp.sum(w * w))
    mu = w_sum / n_draw

    # effective-size draw count and the updated Neff follow the MC formulas
    assert n_eff_bank == int(w_sum**2 // w_sumsq)
    assert bank.shape == (2, n_eff_bank)
    var_mu = w_sumsq / n_draw**2 - mu**2 / n_draw
    np.testing.assert_allclose(float(neff_new), mu**2 / var_mu, rtol=1e-6)

    # the new prior row is the target density over its own normalization
    np.testing.assert_allclose(
        np.asarray(bank[1]), np.asarray(_target(bank)) / mu, rtol=1e-6
    )

    # resampled x is distributed per the target: E[x] under 2x is 2/3
    assert abs(float(jnp.mean(bank[0])) - 2.0 / 3.0) < 0.02
