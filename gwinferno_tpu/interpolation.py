"""B-spline / M-spline basis stack, rebuilt vectorized for XLA/TPU.

The reference (gwinferno/interpolation.py) builds design matrices with a
*recursive, per-basis-function* Cox-de Boor evaluation in numpy
(interpolation.py:128-161) -- O(N * 2^k) python recursion at trace time.
Here the whole design matrix is produced by a **vectorized de Boor ladder**:
one array program over all basis indices simultaneously, k-1 fused
elementwise steps, jit/vmap/grad-safe and equally happy on host numpy-in or
on device for PPD grids.

The architectural contract preserved from the reference (SURVEY.md S3.2):
design matrices are built once at model construction; the sampled hot path is
only ``project`` -- a dense ``coefs @ design_matrix`` contraction, which is
exactly the MXU-friendly shape we want on TPU.

Out-of-bounds semantics parity: plain (M/B)-splines zero outside ``xrange``
(interpolation.py:163-175); Log-Y variants use ``-inf`` design entries and a
``nan_to_num`` guard before ``exp`` (interpolation.py:393-407).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.scipy.integrate import trapezoid
from jax.tree_util import register_pytree_node_class

from .utils.host import xp_for

__all__ = [
    "mspline_design_matrix",
    "bspline_design_matrix",
    "NaturalCubicUnivariateSpline",
    "BasisSpline",
    "BSpline",
    "LogXBSpline",
    "LogYBSpline",
    "LogXLogYBSpline",
    "RectBivariateBasisSpline",
]

_DEGENERATE_KNOT_TOL = 1e-6  # matches reference guard (interpolation.py:141)


def mspline_design_matrix(xs, knots, order):
    """All M-spline basis functions of ``order`` evaluated at ``xs``, vectorized.

    M-splines are the density-normalized B-spline basis: each basis function
    integrates to 1.  Built by the Cox-de Boor ladder run over every basis
    index at once (no recursion):

        M_{i,1}(x) = 1/(t_{i+1}-t_i) on [t_i, t_{i+1})
        M_{i,m}(x) = m [ (x-t_i) M_{i,m-1} + (t_{i+m}-x) M_{i+1,m-1} ]
                       / ( (m-1) (t_{i+m}-t_i) )

    Degenerate spans (< 1e-6) produce zero rows, matching the reference guard
    (gwinferno/interpolation.py:141-142).

    Args:
        xs: evaluation points, any shape.
        knots: knot vector, length ``N + order``.
        order: spline order (degree + 1); cubic -> 4.

    Returns:
        design matrix of shape ``(N, *xs.shape)`` with ``N = len(knots) - order``.
    """
    xp = xp_for(xs)  # host numpy at construction, jnp under trace/on device
    t = np.asarray(knots)
    xs = xp.asarray(xs)
    x = xs.reshape(-1)[None, :]  # (1, n)

    tl = t[:-1, None]
    tr = t[1:, None]
    span1 = tr - tl
    B = xp.where(
        (x >= tl) & (x < tr) & (span1 >= _DEGENERATE_KNOT_TOL),
        1.0 / np.where(span1 >= _DEGENERATE_KNOT_TOL, span1, 1.0),
        0.0,
    )
    for m in range(2, order + 1):
        span = t[m:, None] - t[:-m, None]
        num = (x - t[:-m, None]) * B[:-1] + (t[m:, None] - x) * B[1:]
        B = xp.where(
            span >= _DEGENERATE_KNOT_TOL,
            m * num / ((m - 1) * np.where(span >= _DEGENERATE_KNOT_TOL, span, 1.0)),
            0.0,
        )
    return B.reshape((t.shape[0] - order,) + xs.shape)


def bspline_design_matrix(xs, knots, order):
    """Canonical B-spline design matrix: M-splines rescaled by span/order.

    ``B_{i,k} = (t_{i+k} - t_i)/k * M_{i,k}`` (gwinferno/interpolation.py:268-278).
    """
    t = np.asarray(knots)
    M = mspline_design_matrix(xs, t, order)
    scale = (t[order:] - t[: t.shape[0] - order]) / order
    return M * scale.reshape((-1,) + (1,) * (M.ndim - 1))


@register_pytree_node_class
class NaturalCubicUnivariateSpline:
    """Natural cubic interpolating spline (scipy ``CubicSpline(bc_type='natural')``).

    Solves the standard tridiagonal system for the interior second-derivative
    coefficients with natural boundary conditions.  Registered as a pytree so
    instances can flow through jit boundaries.

    Parity: gwinferno/interpolation.py:13-69 (the reference's nonstandard
    ``tree_flatten`` returning children-only is fixed here).
    """

    def __init__(self, x, y, coefficients=None):
        x, y = jnp.atleast_1d(x), jnp.atleast_1d(y)
        if coefficients is None:
            n = x.shape[0]
            h = jnp.diff(x)
            p = jnp.diff(y)
            # Rows: natural BCs (c_0 = 0, c_{n-1} = c_{n-2} -> second row form
            # follows the reference: last row [.. -1, 1] with rhs 0).
            main = jnp.concatenate([jnp.ones(1), 2.0 * (h[:-1] + h[1:]), jnp.ones(1)])
            up = jnp.concatenate([jnp.zeros(1), h[1:]])
            lo = jnp.concatenate([h[:-1], -jnp.ones(1)])
            A = jnp.diag(main) + jnp.diag(up, k=1) + jnp.diag(lo, k=-1)
            rhs = jnp.concatenate([jnp.zeros(1), 3.0 * (p[1:] / h[1:] - p[:-1] / h[:-1]), jnp.zeros(1)])
            coefficients = jnp.linalg.solve(A, rhs)
        self.k = 3
        self._x, self._y, self._coefficients = x, y, coefficients

    def tree_flatten(self):
        return (self._x, self._y, self._coefficients), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        x, y, coefs = children
        return cls(x, y, coefficients=coefs)

    def __call__(self, x):
        knots, y, c = self._x, self._y, self._coefficients
        ind = jnp.clip(jnp.digitize(x, knots) - 1, 0, knots.shape[0] - 2)
        t = x - knots[ind]
        h = jnp.diff(knots)[ind]
        ci, c1 = c[ind], c[ind + 1]
        a, a1 = y[ind], y[ind + 1]
        b = (a1 - a) / h - (2.0 * ci + c1) * h / 3.0
        d = (c1 - ci) / (3.0 * h)
        return a + b * t + ci * t**2 + d * t**3


def _default_knots(n_df, order, xrange, interior_knots=None):
    """Uniform clamped-exterior knot layout (gwinferno/interpolation.py:98-102)."""
    if interior_knots is None:
        interior_knots = np.linspace(xrange[0], xrange[1], n_df - order + 2)
    interior_knots = np.asarray(interior_knots)
    dx = interior_knots[1] - interior_knots[0]
    knots = np.linspace(
        xrange[0] - dx * (order - 1),
        xrange[1] + dx * (order - 1),
        len(interior_knots) + (order - 1) * 2,
    )
    return knots, interior_knots


class BasisSpline:
    """M-spline basis with optional numeric normalization.

    Parity: gwinferno/interpolation.py:72-233.
    """

    def __init__(self, n_df, knots=None, interior_knots=None, xrange=(0, 1), k=4, normalize=True):
        self.order = k
        self.N = n_df
        self.xrange = tuple(xrange)
        if knots is None:
            knots, interior_knots = _default_knots(n_df, k, xrange, interior_knots)
        self.knots = np.asarray(knots)
        self.interior_knots = interior_knots
        assert self.knots.shape[0] == self.N + self.order

        self.normalize = normalize
        # construction-time caches are host numpy (utils.host convention)
        self.basis_vols = np.ones(self.N)
        if normalize:
            self.grid = np.linspace(*self.xrange, 1000)
            self.grid_bases = self.bases(self.grid)
            self.basis_vols = np.trapezoid(self.grid_bases, self.grid, axis=-1)

    def _design(self, xs):
        return mspline_design_matrix(xs, self.knots, self.order)

    def bases(self, xs):
        """Design matrix at ``xs``; zero outside ``xrange``.  Shape (N, *xs.shape)."""
        xp = xp_for(xs)
        xs = xp.asarray(xs)
        dm = self._design(xs)
        oob = xp.less(xs, self.xrange[0]) | xp.greater(xs, self.xrange[1])
        return xp.where(oob, 0.0, dm)

    def norm(self, coefs):
        """1 / integral of the projected curve (via per-basis volumes)."""
        if not self.normalize:
            return 1.0
        return 1.0 / jnp.sum(self.basis_vols * coefs.flatten())

    def project(self, bases, coefs):
        """Sum-normalized coefficient projection (interpolation.py:195-207)."""
        coefs = coefs / jnp.sum(coefs)
        return jnp.einsum("i...,i->...", bases, coefs) * self.norm(coefs)

    def eval(self, xs, coefs):
        return self.project(self.bases(xs), coefs)

    def __call__(self, xs, coefs):
        return self.eval(xs, coefs)

    def get_coefficients(self, xs, ys):
        """Least-squares fit of coefficients to 1-D data (interpolation.py:177-193)."""
        dm = self.bases(xs).T  # (n, N)
        alpha, *_ = jnp.linalg.lstsq(dm, ys, rcond=None)
        return alpha, dm @ alpha, dm


class BSpline(BasisSpline):
    """Canonical B-spline basis (partition of unity), curve-normalized.

    Parity: gwinferno/interpolation.py:236-317.
    """

    def __init__(self, n_df, knots=None, interior_knots=None, xrange=(0, 1), k=4, normalize=False):
        super().__init__(n_df, knots=knots, interior_knots=interior_knots, xrange=xrange, k=k, normalize=normalize)

    def _design(self, xs):
        return bspline_design_matrix(xs, self.knots, self.order)

    def _project(self, bases, coefs):
        return jnp.einsum("i...,i->...", bases, coefs)

    def norm(self, coefs):
        """1 / trapezoid of the projected curve over the cached grid."""
        if not self.normalize:
            return 1.0
        return 1.0 / trapezoid(self._project(self.grid_bases, coefs), self.grid)

    def project(self, bases, coefs):
        return self._project(bases, coefs) * self.norm(coefs)


class LogXBSpline(BSpline):
    """B-spline in log-domain: knots and evaluation in ``log x``.

    Parity: gwinferno/interpolation.py:320-357.
    """

    def __init__(self, n_df, knots=None, interior_knots=None, xrange=(0.01, 1), normalize=True, **kwargs):
        knots = None if knots is None else np.log(knots)
        interior_knots = None if interior_knots is None else np.log(interior_knots)
        log_xrange = tuple(np.log(xrange))
        super().__init__(n_df, knots=knots, interior_knots=interior_knots, xrange=log_xrange, normalize=False, **kwargs)
        self.normalize = normalize
        if normalize:
            # normalization grid lives in *linear* x so the trapezoid measure is dx
            self.grid = np.linspace(*np.exp(log_xrange), 1000)
            self.grid_bases = self.bases(self.grid)

    def bases(self, xs):
        return super().bases(xp_for(xs).log(xs))


class LogYBSpline(BSpline):
    """B-spline whose projected curve is ``exp(sum c_i B_i)`` (log-range).

    Out-of-range design entries are ``-inf`` and any non-finite projection
    collapses to ``exp(-inf) = 0`` (parity: interpolation.py:381-407).
    """

    def __init__(self, n_df, knots=None, interior_knots=None, xrange=(0, 1), normalize=True, **kwargs):
        super().__init__(n_df, knots=knots, interior_knots=interior_knots, xrange=xrange, normalize=False, **kwargs)
        self.normalize = normalize
        if normalize:
            self.grid = np.linspace(*self.xrange, 1000)
            self.grid_bases = self.bases(self.grid)

    def _project(self, bases, coefs):
        logvals = jnp.einsum("i...,i->...", bases, coefs)
        logvals = jnp.nan_to_num(logvals, nan=-jnp.inf, posinf=-jnp.inf)
        return jnp.exp(logvals)

    def bases(self, xs):
        xp = xp_for(xs)
        xs = xp.asarray(xs)
        dm = super().bases(xs)
        oob = xp.less(xs, self.xrange[0]) | xp.greater(xs, self.xrange[1])
        return xp.where(oob, -xp.inf, dm)


class LogXLogYBSpline(LogYBSpline):
    """B-spline in log-log space: log-domain knots and exp-projected range.

    Parity: gwinferno/interpolation.py:410-449.  This is the production
    primary-mass basis (pipeline/utils.py:104-118 in the reference).
    """

    def __init__(self, n_df, knots=None, interior_knots=None, xrange=(0.1, 1), normalize=True, **kwargs):
        knots = None if knots is None else np.log(knots)
        interior_knots = None if interior_knots is None else np.log(interior_knots)
        log_xrange = tuple(np.log(xrange))
        super().__init__(n_df, knots=knots, interior_knots=interior_knots, xrange=log_xrange, normalize=False, **kwargs)
        self.normalize = normalize
        if normalize:
            self.grid = np.linspace(*np.exp(log_xrange), 1500)
            self.grid_bases = self.bases(self.grid)

    def bases(self, xs):
        xp = xp_for(xs)
        logxs = xp.log(xs)
        dm = BSpline.bases(self, logxs)  # zero-OOB in log space
        oob = xp.less(logxs, self.xrange[0]) | xp.greater(logxs, self.xrange[1])
        return xp.where(oob, -xp.inf, dm)


class RectBivariateBasisSpline:
    """2-D tensor-product basis spline with exp-projection and 2-D normalization.

    The reference class is unusable as checked in (calls a missing
    ``reset_bases`` method, interpolation.py:525 -- SURVEY.md S7.3 item 3);
    this implements the intended semantics with an einsum outer product.
    """

    def __init__(self, xdf, ydf, xrange=(0, 1), yrange=(0, 1), kx=4, ky=4, xbasis=BSpline, ybasis=BSpline, normalize=True):
        self.xdf, self.ydf = xdf, ydf
        self.x_interpolator = xbasis(xdf, xrange=xrange, k=kx, normalize=False)
        self.y_interpolator = ybasis(ydf, xrange=yrange, k=ky, normalize=False)
        self.normalize = normalize
        if normalize:
            self.gridx = np.linspace(*xrange, 750)
            self.gridy = np.linspace(*yrange, 750)
            self.gxx, self.gyy = np.meshgrid(self.gridx, self.gridy)
            self.grid_bases = self.bases(self.gxx, self.gyy)

    def bases(self, xs, ys):
        """Outer-product design tensor, shape ``(xdf, ydf, *xs.shape)``."""
        bx = self.x_interpolator.bases(xs)
        by = self.y_interpolator.bases(ys)
        return xp_for(xs, ys).einsum("i...,j...->ij...", bx, by)

    def _project(self, bases, coefs):
        return jnp.exp(jnp.einsum("ij...,ij->...", bases, coefs))

    def norm_2d(self, coefs):
        if not self.normalize:
            return 1.0
        surface = self._project(self.grid_bases, coefs)
        return 1.0 / trapezoid(trapezoid(surface, self.gridy, axis=0), self.gridx)

    def project(self, bases, coefs):
        return self._project(bases, coefs) * self.norm_2d(coefs)
