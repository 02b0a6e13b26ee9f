"""Pallas TPU kernels for the likelihood hot path.

The hierarchical likelihood's hot loop is (SURVEY.md S3.2):

    log w = coefs @ design_matrix - log_prior        (dense matvec, MXU)
    logBF_e = logsumexp_over_samples(log w_e)        (VPU reduce)
    log n_eff_e = 2 logBF_e - logsumexp(2 log w_e)

``fused_logweight_logsumexp`` fuses the three into ONE kernel over a batch of
coefficient vectors (the chain axis): the design matrix streams through VMEM
once per tile and both reductions come out without materializing the
(chains, events, samples) weight tensor in HBM -- the main bandwidth win over
the unfused XLA path at production chain counts.

All kernels have pure-jnp reference implementations (``*_xla``) used as CPU
fallbacks and as the oracle in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["fused_logweight_logsumexp", "fused_logweight_logsumexp_xla", "logsumexp_rows"]


def fused_logweight_logsumexp_xla(coefs, design, neg_log_prior, n_events, n_samples):
    """Reference implementation (pure jnp, XLA-fused).

    Args:
        coefs: (C, K) batched coefficient vectors (chain axis C).
        design: (K, E*S) stacked design matrix over the flattened PE bank.
        neg_log_prior: (E*S,) minus-log fiducial prior (added to log-weights).
        n_events, n_samples: static bank shape (E, S).

    Returns:
        (logBFs, log_n_effs): each (C, E).
    """
    logw = coefs @ design + neg_log_prior  # (C, E*S)
    logw = logw.reshape(coefs.shape[0], n_events, n_samples)
    logBF = logsumexp(logw, axis=-1)
    log_neff = 2.0 * logBF - logsumexp(2.0 * logw, axis=-1)
    return logBF - jnp.log(n_samples * 1.0), log_neff


def _fused_kernel(coefs_ref, design_ref, nlp_ref, logbf_ref, logneff_ref, *, n_samples):
    """One grid step: all chains x one event-tile.

    Block shapes: coefs (C, K); design (K, S_tile*E_tile); nlp (E_tile, S_tile)
    flattened as (E_tile * S_tile,) view -- we keep (E_tile, S_tile) layout.
    """
    c = coefs_ref[:]  # (C, K)
    d = design_ref[:]  # (K, T) with T = E_tile * n_samples
    logw = jax.lax.dot_general(
        c, d, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (C, T)
    logw = logw + nlp_ref[:][None, :]
    C = logw.shape[0]
    e_tile = logw.shape[1] // n_samples
    logw = logw.reshape(C, e_tile, n_samples)
    m = jnp.max(logw, axis=-1, keepdims=True)
    w1 = jnp.exp(logw - m)
    s1 = jnp.sum(w1, axis=-1)
    s2 = jnp.sum(w1 * w1, axis=-1)
    logBF = m[..., 0] + jnp.log(s1)
    log_neff = 2.0 * logBF - (2.0 * m[..., 0] + jnp.log(s2))
    logbf_ref[:] = logBF - jnp.log(n_samples * 1.0)
    logneff_ref[:] = log_neff


def fused_logweight_logsumexp(coefs, design, neg_log_prior, n_events, n_samples, event_tile=8, interpret=False):
    """Fused batched log-weight + per-event reductions as a Pallas TPU kernel.

    Falls back to the XLA reference when not on TPU.  Shapes as in
    :func:`fused_logweight_logsumexp_xla`; ``n_events`` must be divisible by
    ``event_tile`` (callers pad the event axis -- logBF rows of padded events
    are garbage and must be sliced off).
    """
    platform = jax.devices()[0].platform
    if platform not in ("tpu",) and not interpret:
        return fused_logweight_logsumexp_xla(coefs, design, neg_log_prior, n_events, n_samples)

    from jax.experimental import pallas as pl

    C, K = coefs.shape
    E, S = n_events, n_samples
    assert design.shape == (K, E * S), (design.shape, (K, E * S))
    if E % event_tile:
        pad = event_tile - E % event_tile
        design = jnp.pad(design, ((0, 0), (0, pad * S)))
        neg_log_prior = jnp.pad(neg_log_prior, (0, pad * S), constant_values=-jnp.inf)
        E = E + pad
    T = event_tile * S

    grid = (E // event_tile,)
    out_shape = (
        jax.ShapeDtypeStruct((C, E), coefs.dtype),
        jax.ShapeDtypeStruct((C, E), coefs.dtype),
    )
    logBF, log_neff = pl.pallas_call(
        functools.partial(_fused_kernel, n_samples=S),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, K), lambda i: (0, 0)),
            pl.BlockSpec((K, T), lambda i: (0, i)),
            pl.BlockSpec((T,), lambda i: (i,)),
        ],
        out_specs=(
            pl.BlockSpec((C, event_tile), lambda i: (0, i)),
            pl.BlockSpec((C, event_tile), lambda i: (0, i)),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(coefs, design, neg_log_prior)
    return logBF[:, :n_events], log_neff[:, :n_events]


def logsumexp_rows(x, interpret=False, block=1024):
    """Stable logsumexp over the last axis of a 2-D array as a single-pass
    tiled Pallas kernel (online max/sum combine); XLA fallback elsewhere."""
    platform = jax.devices()[0].platform
    if platform not in ("tpu",) and not interpret:
        return logsumexp(x, axis=-1)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, N = x.shape
    nblocks = -(-N // block)
    if N % block:
        x = jnp.pad(x, ((0, 0), (0, nblocks * block - N)), constant_values=-jnp.inf)

    def kernel(x_ref, out_ref, acc_m, acc_s):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _():
            acc_m[:] = jnp.full_like(acc_m, -jnp.inf)
            acc_s[:] = jnp.zeros_like(acc_s)

        xb = x_ref[:]  # (R, block)
        m_new = jnp.maximum(acc_m[:], jnp.max(xb, axis=-1))
        s_new = acc_s[:] * jnp.exp(acc_m[:] - m_new) + jnp.sum(jnp.exp(xb - m_new[:, None]), axis=-1)
        acc_m[:] = m_new
        acc_s[:] = s_new

        @pl.when(j == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_m[:] + jnp.log(acc_s[:])

    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((R, block), lambda j: (0, j))],
        out_specs=pl.BlockSpec((R,), lambda j: (0,)),
        out_shape=jax.ShapeDtypeStruct((R,), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((R,), x.dtype),
            pltpu.VMEM((R,), x.dtype),
        ],
        interpret=interpret,
    )(x)
    return out
