"""Convergence diagnostics: split-R-hat, effective sample size, summaries.

FFT-based autocorrelation ESS (Geyer initial monotone sequence) and rank-
normalized split R-hat, matching the standard arviz/numpyro definitions the
reference relies on for its ``print_summary`` output.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["effective_sample_size", "split_rhat", "summary", "print_summary", "hpdi"]


def _autocovariance(x):
    """Autocovariance along axis 0 via FFT.  x: (n, chains)."""
    n = x.shape[0]
    xc = x - x.mean(axis=0, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n)))
    f = np.fft.rfft(xc, size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), size, axis=0)[:n].real
    return acov / n


def effective_sample_size(x):
    """ESS for draws ``x`` of shape (chains, n).  Returns a scalar."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None]
    m, n = x.shape
    if np.all(x == x[:, :1]):
        # every chain constant = a stuck sampler, not perfect mixing
        return 0.0
    if n < 4:
        return float(m * n)
    acov = _autocovariance(x.T)  # (n, m)
    mean_var = acov[0].mean()
    var_plus = mean_var * (n - 1) / n
    if m > 1:
        var_plus += x.mean(axis=1).var(ddof=1)
    if var_plus <= 0 or not np.isfinite(var_plus):
        # zero total variance = frozen chains (a stuck sampler), not perfect
        # mixing -- report zero effective draws, never m*n
        return 0.0
    rho = 1.0 - (mean_var - acov.mean(axis=1)) / var_plus  # (n,)
    # Geyer initial positive + monotone sequence over pair sums
    npairs = (n - 1) // 2
    pair = rho[1 : 2 * npairs + 1].reshape(npairs, 2).sum(axis=1)
    pos = pair > 0
    if not pos.all():
        first_neg = int(np.argmax(~pos))
        pair = pair[:first_neg]
    if len(pair) > 0:
        pair = np.minimum.accumulate(pair)
    tau = 1.0 + 2.0 * pair.sum() + rho[0] - 1.0  # rho[0] == 1
    tau = max(tau, 1.0 / np.log10(max(n, 10)))
    return float(m * n / tau)


def split_rhat(x):
    """Split R-hat for draws ``x`` of shape (chains, n)."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim == 1:
        x = x[None]
    m, n = x.shape
    half = n // 2
    if half < 2:
        return np.nan
    halves = np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)  # (2m, half)
    chain_means = halves.mean(axis=1)
    chain_vars = halves.var(axis=1, ddof=1)
    W = chain_vars.mean()
    B = half * chain_means.var(ddof=1)
    var_plus = (half - 1) / half * W + B / half
    if W <= 0:
        return np.nan
    return float(np.sqrt(var_plus / W))


def hpdi(x, prob=0.9):
    """Highest posterior density interval of 1-D draws."""
    x = np.sort(np.asarray(x).ravel())
    n = len(x)
    size = max(1, int(np.floor(prob * n)))
    widths = x[size:] - x[: n - size]
    i = int(np.argmin(widths))
    return x[i], x[i + size]


def summary(samples_by_chain, prob=0.9):
    """Dict name -> stats over samples of shape (chains, n, *event)."""
    rows = {}
    for name, arr in samples_by_chain.items():
        arr = np.asarray(arr)
        # (chains, n, ...) -> iterate event cells
        ev_shape = arr.shape[2:]
        idxs = [()] if ev_shape == () else list(np.ndindex(*ev_shape))
        for idx in idxs:
            cell = arr[(slice(None), slice(None)) + idx]  # (chains, n)
            label = name if idx == () else f"{name}[{','.join(map(str, idx))}]"
            lo, hi = hpdi(cell, prob)
            rows[label] = {
                "mean": float(cell.mean()),
                "std": float(cell.std()),
                "median": float(np.median(cell)),
                f"{prob:.0%} hpdi lo": float(lo),
                f"{prob:.0%} hpdi hi": float(hi),
                "n_eff": effective_sample_size(cell),
                "r_hat": split_rhat(cell),
            }
    return rows


def print_summary(samples_by_chain, prob=0.9):
    rows = summary(samples_by_chain, prob)
    if not rows:
        print("(no samples)")
        return
    cols = list(next(iter(rows.values())).keys())
    name_w = max(12, max(len(k) for k in rows))
    header = " ".join([f"{'':>{name_w}}"] + [f"{c:>12}" for c in cols])
    print(header)
    for name, stats in rows.items():
        vals = " ".join(f"{v:12.3f}" if np.isfinite(v) else f"{'nan':>12}" for v in stats.values())
        print(f"{name:>{name_w}} {vals}")
