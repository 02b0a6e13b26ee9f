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
import os

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

try:  # pallas imports are module-level for the TPU path; harmless on CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = pltpu = None

__all__ = [
    "double_logsumexp",
    "fused_logweight_logsumexp",
    "fused_logweight_logsumexp_xla",
]


# --------------------------------------------------------------------------
# double_logsumexp: the likelihood's importance-weight reduction
# --------------------------------------------------------------------------
# per_event_log_bayes_factors / detection_efficiency both need
# (logsumexp(w), logsumexp(2w)) over the sample/injection axis at every
# NUTS gradient.  The fused kernel computes both in ONE streaming pass with
# online (max, sum, sum-of-squares) accumulation -- one HBM read of the
# weight bank instead of two -- and carries a custom VJP so it sits directly
# on the NUTS hot path.  Mode: GWINF_FUSED=1 forces the kernel, =0 forces
# the XLA fallback, =auto (default) uses the kernel on TPU.


def _dlse_xla(x):
    return logsumexp(x, axis=-1), logsumexp(2.0 * x, axis=-1)


def _dlse_kernel(x_ref, lse1_ref, lse2_ref, m_acc, s1_acc, s2_acc):
    # stats live in column 0 of lane-padded (R, 128) scratch: Mosaic's block
    # tiling wants >= 2-D, and a vmapped pallas_call (the chain axis) rejects
    # 1-D output blocks outright
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, -jnp.inf)
        s1_acc[:] = jnp.zeros_like(s1_acc)
        s2_acc[:] = jnp.zeros_like(s2_acc)

    xb = x_ref[:]  # (R, block)
    m_old = m_acc[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(xb, axis=-1, keepdims=True))
    # where-guards keep all--inf rows (masked events / padding) NaN-free
    scale = jnp.where(m_old == m_new, 1.0, jnp.exp(m_old - m_new))
    e = jnp.where(xb == -jnp.inf, 0.0, jnp.exp(xb - m_new))
    s1_new = s1_acc[:, 0:1] * scale + jnp.sum(e, axis=-1, keepdims=True)
    s2_new = s2_acc[:, 0:1] * scale * scale + jnp.sum(e * e, axis=-1, keepdims=True)
    m_acc[:, 0:1] = m_new
    s1_acc[:, 0:1] = s1_new
    s2_acc[:, 0:1] = s2_new

    @pl.when(j == pl.num_programs(0) - 1)
    def _():
        lse1_ref[:] = jnp.broadcast_to(m_new + jnp.log(s1_new), lse1_ref.shape)
        lse2_ref[:] = jnp.broadcast_to(2.0 * m_new + jnp.log(s2_new), lse2_ref.shape)


def _dlse_pallas_2d(x, block=2048, interpret=False):
    """(logsumexp(x,-1), logsumexp(2x,-1)) for 2-D x via one Pallas pass."""
    R, N = x.shape
    R_pad = -(-R // 8) * 8
    block = min(block, -(-N // 128) * 128)
    N_pad = -(-N // block) * block
    if R_pad != R or N_pad != N:
        x = jnp.pad(x, ((0, R_pad - R), (0, N_pad - N)), constant_values=-jnp.inf)

    lse1, lse2 = pl.pallas_call(
        _dlse_kernel,
        grid=(N_pad // block,),
        in_specs=[pl.BlockSpec((R_pad, block), lambda j: (0, j))],
        out_specs=(
            pl.BlockSpec((R_pad, 128), lambda j: (0, 0)),
            pl.BlockSpec((R_pad, 128), lambda j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R_pad, 128), x.dtype),
            jax.ShapeDtypeStruct((R_pad, 128), x.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((R_pad, 128), x.dtype),
            pltpu.VMEM((R_pad, 128), x.dtype),
            pltpu.VMEM((R_pad, 128), x.dtype),
        ],
        interpret=interpret,
    )(x)
    return lse1[:R, 0], lse2[:R, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _dlse_fused(x, interpret=False):
    lead, n = x.shape[:-1], x.shape[-1]
    l1, l2 = _dlse_pallas_2d(x.reshape((-1, n)), interpret=interpret)
    return l1.reshape(lead), l2.reshape(lead)


def _dlse_fwd(x, interpret=False):
    out = _dlse_fused(x, interpret)
    return out, (x, *out)


def _dlse_bwd(interpret, res, g):
    x, lse1, lse2 = res
    g1, g2 = g
    neg = x == -jnp.inf
    # d lse1/dx = softmax(x); d lse2/dx = 2 softmax(2x)
    t1 = jnp.where(neg, 0.0, jnp.exp(x - lse1[..., None])) * g1[..., None]
    t2 = 2.0 * jnp.where(neg, 0.0, jnp.exp(2.0 * x - lse2[..., None])) * g2[..., None]
    return (t1 + t2,)


_dlse_fused.defvjp(_dlse_fwd, _dlse_bwd)


def double_logsumexp(x, axis=-1, mode=None, interpret=False):
    """``(logsumexp(x, axis), logsumexp(2x, axis))`` -- the hierarchical
    likelihood's paired importance-weight reductions, fused on TPU.

    ``mode``: "1" force Pallas, "0" force XLA, "auto" Pallas-on-TPU;
    defaults to the GWINF_FUSED environment variable (default "auto").
    """
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    mode = mode if mode is not None else os.environ.get("GWINF_FUSED", "auto")
    on_tpu = pl is not None and jax.devices()[0].platform == "tpu"
    # honor an explicit CPU default_device (e.g. the MCMC engine pins its
    # one-time eager model trace to host CPU): a Pallas kernel launched
    # there would fail with "Only interpret mode is supported on CPU"
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) == "cpu":
        on_tpu = False
    if mode == "1" or (mode == "auto" and on_tpu):
        return _dlse_fused(x, interpret)
    return _dlse_xla(x)


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


def _fused_kernel(coefs_ref, design_ref, nlp_ref, logbf_ref, logneff_ref, m_acc, s1_acc, s2_acc, *, event_tile):
    """Grid step (i, j): all chains x ``event_tile`` events x one sample chunk.

    Blocks: coefs (C, K); design (K, event_tile, S_CHUNK) slice of the 3-D
    (K, E_pad, S_pad) layout; nlp (event_tile, S_CHUNK); outputs
    (event_tile, C) slices written on the last chunk.  Chunks accumulate an
    online (max, sum, sum-of-squares) in VMEM scratch -- the flash-attention
    pattern applied to the importance-weight reductions.
    """
    j = pl.program_id(1)
    c = coefs_ref[:]  # (C, K)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, -jnp.inf)
        s1_acc[:] = jnp.zeros_like(s1_acc)
        s2_acc[:] = jnp.zeros_like(s2_acc)

    for e in range(event_tile):
        d = design_ref[:, e, :]  # (K, S_CHUNK)
        logw = jax.lax.dot_general(
            c, d, dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=c.dtype
        ) + nlp_ref[e, :][None, :]  # (C, S_CHUNK)
        m_new = jnp.maximum(m_acc[e, :], jnp.max(logw, axis=-1))
        scale = jnp.exp(m_acc[e, :] - m_new)
        w1 = jnp.exp(logw - m_new[:, None])
        s1_acc[e, :] = s1_acc[e, :] * scale + jnp.sum(w1, axis=-1)
        s2_acc[e, :] = s2_acc[e, :] * scale * scale + jnp.sum(w1 * w1, axis=-1)
        m_acc[e, :] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        logBF = m_acc[:] + jnp.log(s1_acc[:])
        logbf_ref[:] = logBF
        logneff_ref[:] = 2.0 * logBF - (2.0 * m_acc[:] + jnp.log(s2_acc[:]))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flw_core(coefs, d3, nlp2, event_tile, chunk, interpret):
    """Raw fused matmul + double logsumexp over the padded 3-D layout.

    coefs (C, K); d3 (K, E_pad, S_pad); nlp2 (E_pad, S_pad).
    Returns raw ``(lse1, lse2)`` each (C, E_pad) where
    lse_k = logsumexp_s(k * (coefs @ d3 + nlp2)).

    Differentiable in ``coefs`` and ``nlp2``; the DESIGN MATRIX is treated as
    a constant (cached bank, SURVEY.md S3.2) -- its cotangent is zero.
    """
    E_pad = d3.shape[1]
    grid = (E_pad // event_tile, d3.shape[2] // chunk)
    C = coefs.shape[0]
    out_shape = (
        jax.ShapeDtypeStruct((E_pad, C), coefs.dtype),
        jax.ShapeDtypeStruct((E_pad, C), coefs.dtype),
    )
    logBF_t, log_neff_t = pl.pallas_call(
        functools.partial(_fused_kernel, event_tile=event_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((C, coefs.shape[1]), lambda i, j: (0, 0)),
            pl.BlockSpec((coefs.shape[1], event_tile, chunk), lambda i, j: (0, i, j)),
            pl.BlockSpec((event_tile, chunk), lambda i, j: (i, j)),
        ],
        out_specs=(
            pl.BlockSpec((event_tile, C), lambda i, j: (i, 0)),
            pl.BlockSpec((event_tile, C), lambda i, j: (i, 0)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((event_tile, C), coefs.dtype),
            pltpu.VMEM((event_tile, C), coefs.dtype),
            pltpu.VMEM((event_tile, C), coefs.dtype),
        ],
        interpret=interpret,
    )(coefs, d3, nlp2)
    # kernel emits (lse1^T, (2*lse1 - lse2)^T); recover raw lse2
    lse1 = logBF_t.T
    lse2 = 2.0 * lse1 - log_neff_t.T
    return lse1, lse2


def _flw_fwd(coefs, d3, nlp2, event_tile, chunk, interpret):
    out = _flw_core(coefs, d3, nlp2, event_tile, chunk, interpret)
    return out, (coefs, d3, nlp2, *out)


def _flw_bwd(event_tile, chunk, interpret, res, g):
    """Rematerializing backward: one (C,K)@(K,E*S) matmul rebuilds the
    log-weights, then d_coefs comes back through a second matmul -- the
    (C,E,S) tensor exists only transiently inside this fused region."""
    coefs, d3, nlp2, lse1, lse2 = res
    g1, g2 = g
    K, E_pad, S_pad = d3.shape
    logw = jnp.einsum("ck,kes->ces", coefs, d3) + nlp2  # (C, E_pad, S_pad)
    neg = nlp2 == -jnp.inf
    w1 = jnp.where(neg, 0.0, jnp.exp(logw - lse1[..., None]))
    w2 = jnp.where(neg, 0.0, jnp.exp(2.0 * logw - lse2[..., None]))
    dlogw = g1[..., None] * w1 + 2.0 * g2[..., None] * w2
    d_coefs = jnp.einsum("ces,kes->ck", dlogw, d3)
    d_nlp2 = jnp.sum(dlogw, axis=0)
    return d_coefs, jnp.zeros_like(d3), d_nlp2


_flw_core.defvjp(_flw_fwd, _flw_bwd)


def fused_logweight_logsumexp(coefs, design, neg_log_prior, n_events, n_samples, event_tile=8, sample_chunk=1024, interpret=False):
    """Fused batched log-weight + per-event reductions as a Pallas TPU kernel.

    Falls back to the XLA reference when not on TPU.  Shapes as in
    :func:`fused_logweight_logsumexp_xla`.  The sample axis is padded to a
    lane multiple and streamed in ``sample_chunk`` pieces with online
    max/sum accumulation, so arbitrarily large banks fit in VMEM.  Carries a
    custom VJP (rematerializing backward) so it can sit directly on the NUTS
    hot path; gradients flow to ``coefs`` and ``neg_log_prior`` but NOT the
    design matrix (a cached constant).
    """
    platform = jax.devices()[0].platform
    dd = jax.config.jax_default_device
    if dd is not None and getattr(dd, "platform", None) == "cpu":
        platform = "cpu"  # eager trace pinned to host CPU (see double_logsumexp)
    if platform not in ("tpu",) and not interpret:
        return fused_logweight_logsumexp_xla(coefs, design, neg_log_prior, n_events, n_samples)

    C, K = coefs.shape
    E, S = n_events, n_samples
    assert design.shape == (K, E * S), (design.shape, (K, E * S))

    LANE = 128
    S_pad = -(-S // LANE) * LANE
    E_pad = -(-E // event_tile) * event_tile
    chunk = min(sample_chunk, S_pad)
    S_pad = -(-S_pad // chunk) * chunk  # multiple of chunk

    d3 = design.reshape(K, E, S)
    nlp2 = neg_log_prior.reshape(E, S)
    if S_pad != S:
        d3 = jnp.pad(d3, ((0, 0), (0, 0), (0, S_pad - S)))
        nlp2 = jnp.pad(nlp2, ((0, 0), (0, S_pad - S)), constant_values=-jnp.inf)
    if E_pad != E:
        d3 = jnp.pad(d3, ((0, 0), (0, E_pad - E), (0, 0)))
        nlp2 = jnp.pad(nlp2, ((0, E_pad - E), (0, 0)), constant_values=-jnp.inf)

    lse1, lse2 = _flw_core(coefs, d3, nlp2, event_tile, chunk, interpret)
    logBF = lse1[:, :E] - jnp.log(S * 1.0)
    log_neff = 2.0 * lse1[:, :E] - lse2[:, :E]
    return logBF, log_neff


def fused_bspline_per_event_log_bayes_factors(design_coef_pairs, neg_log_prior, n_events, n_samples, log_norms=None, **kwargs):
    """High-level fused hot path for B-spline population models.

    Stacks the per-parameter cached design matrices and coefficient vectors
    into ONE ``(C, K_total) @ (K_total, E*S)`` contraction fused with the
    per-event reductions -- the whole multi-parameter B-spline likelihood in
    a single MXU pass.

    Args:
        design_coef_pairs: list of ``(design_matrix (K_i, E*S), coefs
            (..., K_i))`` -- coefs may carry a leading chain-batch axis.
        neg_log_prior: ``(E*S,)`` minus-log fiducial prior; bake sample
            masks in as ``-inf`` entries.
        log_norms: optional list of per-spline log-normalization scalars
            (``(...,)``-shaped, chain-batched like coefs) added to the
            log-weights.

    Returns ``(logBFs, log_n_effs)``, each ``(C, E)`` (C=1 squeezed off when
    coefs were unbatched).
    """
    unbatched = design_coef_pairs[0][1].ndim == 1
    coefs = jnp.concatenate(
        [jnp.atleast_2d(c) for _, c in design_coef_pairs], axis=-1
    )  # (C, K_total)
    design = jnp.concatenate([d for d, _ in design_coef_pairs], axis=0)  # (K_total, E*S)
    if log_norms is not None:
        total_log_norm = sum(jnp.atleast_1d(ln) for ln in log_norms)  # (C,)
    else:
        total_log_norm = 0.0
    logBF, log_neff = fused_logweight_logsumexp(
        coefs, design, neg_log_prior, n_events, n_samples, **kwargs
    )
    if log_norms is not None:
        logBF = logBF + total_log_norm[:, None]
    if unbatched:
        return logBF[0], log_neff[0]
    return logBF, log_neff
