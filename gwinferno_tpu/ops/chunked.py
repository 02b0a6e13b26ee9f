"""Sample-axis-chunked likelihood reductions -- the >16-chain-lane fix.

A flat vmapped likelihood gradient materializes ``(C, N_bank)``
intermediates per pdf factor; beyond ~16 chain lanes those overflow the
fusion/VMEM budget on a TPU v5e chip and per-lane throughput collapses
(docs/chain_scaling.json: 64 flat lanes ran at 0.58x the per-draw
throughput of 16).  Scanning the bank axis in chunks under ``lax.scan`` +
``jax.checkpoint`` bounds the live intermediates to ONE chunk in both the
forward and backward pass (checkpoint recomputes the chunk inside the VJP
instead of storing it), so the footprint is ``n_chunks`` times smaller at
the cost of one recompute of the cheap elementwise pdf chain.

The outputs feed ``hierarchical_likelihood``'s summaries seam
(``pe_summaries`` / ``inj_summaries``) -- the same seam the fused Pallas
path uses -- so the likelihood semantics (including the n_eff walls) are
unchanged.  Chunk-combining ``logsumexp`` via ``logaddexp`` reorders float
reductions, so results match the flat path to f32 roundoff, not bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

__all__ = ["chunked_double_logsumexp", "chunked_summaries"]


def chunked_double_logsumexp(logw_fn, banks, n_chunks):
    """Per-row ``(logsumexp(w), logsumexp(2w))`` of the implicit
    ``(rows, S)`` log-weight matrix ``logw_fn(banks)``, computed in
    ``n_chunks`` sample-axis chunks.

    ``banks``: dict name -> ``(rows, S)`` array (host numpy fine -- closed
    over as executable constants).  ``logw_fn(chunk_dict) -> (rows, chunk)``
    log weights.  ``S`` must be divisible by ``n_chunks``.

    ``n_chunks=1`` degenerates to one full-bank evaluation (still under the
    scan+checkpoint structure).
    """
    first = next(iter(banks.values()))
    S = first.shape[-1]
    if S % n_chunks:
        raise ValueError(f"sample axis {S} not divisible by n_chunks={n_chunks}")
    chunk = S // n_chunks
    banks = {k: jnp.asarray(v) for k, v in banks.items()}

    @jax.checkpoint
    def body(carry, i):
        lse1, lse2 = carry
        part = {
            k: jax.lax.dynamic_slice_in_dim(v, i * chunk, chunk, axis=-1)
            for k, v in banks.items()
        }
        lw = logw_fn(part)
        c1 = logsumexp(lw, axis=-1)
        c2 = logsumexp(2.0 * lw, axis=-1)
        return (jnp.logaddexp(lse1, c1), jnp.logaddexp(lse2, c2)), None

    rows = first.shape[0]
    dtype = jnp.result_type(float)
    neg_inf = jnp.full((rows,), -jnp.inf, dtype)
    (lse1, lse2), _ = jax.lax.scan(body, (neg_inf, neg_inf), jnp.arange(n_chunks))
    return lse1, lse2


def chunked_summaries(pe_logw_fn, pe_banks, inj_logw_fn, inj_banks, total_inj, n_chunks, inj_chunks=None):
    """Chunked ``(pe_summaries, inj_summaries)`` for
    ``hierarchical_likelihood``.

    ``pe_banks``: dict name -> ``(E, S)``; ``inj_banks``: dict name ->
    ``(N_found,)`` (reshaped internally to one row).  Returns
    ``((logBFs, log_n_effs, S), (log_mu, log_n_eff_inj))`` with exactly the
    log-path estimator semantics of ``per_event_log_bayes_factors`` and
    ``detection_efficiency`` (pipeline/analysis.py:43-101).
    """
    S = next(iter(pe_banks.values())).shape[-1]
    lse1, lse2 = chunked_double_logsumexp(pe_logw_fn, pe_banks, n_chunks)
    logBFs = lse1 - jnp.log(1.0 * S)
    log_n_effs = 2.0 * lse1 - lse2

    inj_rows = {k: jnp.asarray(v).reshape(1, -1) for k, v in inj_banks.items()}
    ichunks = inj_chunks if inj_chunks is not None else n_chunks
    n_found = next(iter(inj_rows.values())).shape[-1]
    if n_found % ichunks:
        ichunks = 1
    ilse1, ilse2 = chunked_double_logsumexp(
        lambda part: inj_logw_fn({k: v[0] for k, v in part.items()})[None, :],
        inj_rows,
        ichunks,
    )
    ilse1, ilse2 = ilse1[0], ilse2[0]
    log_ninj = jnp.log(total_inj)
    log_mu = ilse1 - log_ninj
    # shifted-log variance, exactly detection_efficiency's log branch
    A = ilse2 - 2.0 * log_ninj
    B = 2.0 * log_mu - log_ninj
    logvar = A + jnp.log1p(-jnp.exp(jnp.minimum(B - A, -1e-6)))
    log_n_eff_inj = 2.0 * log_mu - logvar
    return (logBFs, log_n_effs, S), (log_mu, log_n_eff_inj)
