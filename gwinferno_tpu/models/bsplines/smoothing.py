"""P-spline smoothing priors (difference penalties on spline coefficients)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["apply_difference_prior", "difference_penalty_matrix", "prior_precision_cholesky"]


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


def prior_precision_cholesky(n, sig, tau, degree=1, drop_first=False):
    """Lower Cholesky factor ``L`` of the combined coefficient-prior precision.

    The centered parameterization (iid ``Normal(0, sig)`` site + the
    ``apply_difference_prior`` factor) is jointly the Gaussian
    ``c ~ N(0, Lambda^{-1})`` with ``Lambda = I / sig^2 + tau * D^T D``.  Its
    Cholesky ``Lambda = L L^T`` is what the whitened (non-centered)
    parameterization transforms standard normals through: ``c = L^{-T} u``
    has exactly the prior covariance while the sampled space stays isotropic
    (the cure for the anisotropic smoothing-prior geometry under a diagonal
    mass matrix).  ``drop_first=True`` gives the precision of the free
    coefficients when the first one is pinned to zero (the redshift
    convention): with ``c = [0, z]`` the penalty is quadratic in ``z`` with
    matrix ``(D^T D)[1:, 1:]``.

    Host numpy in f64 on purpose: ``n``, ``sig``, ``tau`` are static config,
    so this runs once at trace time and embeds a small (n, n) constant.
    """
    D = np.eye(n)
    for _ in range(degree):
        D = D[1:] - D[:-1]
    P = D.T @ D
    if drop_first:
        P = P[1:, 1:]
    lam = np.eye(P.shape[0]) / float(sig) ** 2 + float(tau) * P
    return np.linalg.cholesky(lam)
