"""P-spline smoothing priors (difference penalties on spline coefficients)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["apply_difference_prior", "difference_penalty_matrix"]


def apply_difference_prior(coefs, inv_var, degree=1):
    """Gaussian random-walk (P-spline) penalty on spline coefficients.

    Returns the log-prior contribution ``-0.5 * inv_var * ||Delta^degree c||^2``
    where ``Delta^degree`` is the ``degree``-th order finite difference.

    Parity: gwinferno/models/bsplines/smoothing.py:8-28.
    """
    delta = jnp.diff(coefs, n=degree)
    return -0.5 * inv_var * jnp.sum(delta * delta)


def difference_penalty_matrix(n, degree=1):
    """Dense penalty matrix ``D^T D`` with ``D`` the order-``degree`` difference
    operator on ``n`` coefficients.  Useful for precision-matrix formulations
    of the P-spline prior (e.g. structured mass-matrix preconditioning)."""
    D = jnp.eye(n)
    for _ in range(degree):
        D = D[1:] - D[:-1]
    return D.T @ D
