"""Pallas kernels vs their XLA reference implementations (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from gwinferno_tpu.ops.fused import fused_logweight_logsumexp
from gwinferno_tpu.ops.fused import fused_logweight_logsumexp_xla
from gwinferno_tpu.ops.fused import logsumexp_rows


def _setup(C=4, K=16, E=8, S=128, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    coefs = jax.random.normal(k1, (C, K), dtype=jnp.float32) * 0.3
    design = jax.random.uniform(k2, (K, E * S), dtype=jnp.float32)
    nlp = jax.random.normal(k3, (E * S,), dtype=jnp.float32)
    return coefs, design, nlp, E, S


def test_fused_kernel_matches_xla_reference():
    coefs, design, nlp, E, S = _setup()
    want_bf, want_neff = fused_logweight_logsumexp_xla(coefs, design, nlp, E, S)
    got_bf, got_neff = fused_logweight_logsumexp(coefs, design, nlp, E, S, event_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got_bf), np.asarray(want_bf), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_neff), np.asarray(want_neff), rtol=2e-5)


def test_fused_kernel_event_padding():
    # E=6 not divisible by tile 4 -> internal padding path
    coefs, design, nlp, E, S = _setup(E=6)
    want_bf, _ = fused_logweight_logsumexp_xla(coefs, design, nlp, E, S)
    got_bf, _ = fused_logweight_logsumexp(coefs, design, nlp, E, S, event_tile=4, interpret=True)
    assert got_bf.shape == want_bf.shape
    np.testing.assert_allclose(np.asarray(got_bf), np.asarray(want_bf), rtol=2e-5)


def test_logsumexp_rows_kernel():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 1000), dtype=jnp.float32) * 3
    got = logsumexp_rows(x, interpret=True, block=256)
    want = logsumexp(x, axis=-1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_logsumexp_rows_with_neginf():
    x = jnp.full((4, 512), -jnp.inf, dtype=jnp.float32)
    x = x.at[:, 0].set(jnp.arange(4, dtype=jnp.float32))
    got = logsumexp_rows(x, interpret=True, block=128)
    np.testing.assert_allclose(np.asarray(got), np.arange(4), atol=1e-6)
