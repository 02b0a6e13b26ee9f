"""Flat-LambdaCDM cosmology on fixed redshift grids, built for XLA.

Design: the reference (gwinferno/cosmology.py:27-138) integrates Dc(z) and
Vc(z) with a sequential trapezoid `fori_loop` *on device*.  A sequential
scalar loop is the worst possible shape for a TPU, and the tables are static
constants anyway -- so here they are built **once on the host in float64**
with vectorized cumulative-trapezoid sums, and stored HOST-side (numpy): a
table closed over by jitted code embeds as an executable constant at
compile, while a device-resident table would have to be fetched back
through the (slow) remote-TPU tunnel at every lowering
(gwinferno_tpu/utils/host.py).  Runtime queries (``dVcdz``, ``z2Dc``,
``DL2z``, ...) are pure ``interp`` lookups: ``jnp`` (vectorized, jit-safe,
differentiable) under trace / on device, plain numpy for host inputs -- so
model constructors caching per-bank dVc/dz values stay host-side too.

The trapezoid-step recursion of the reference (cosmology.py:48-63) is exactly
a cumulative trapezoid of dDc/dz (and of the pointwise dVc/dz built from the
accumulated Dc), so the tables agree with the reference to integration-rule
accuracy while being strictly more precise (f64 host build).

Constants parity: gwinferno/cosmology.py:12-24 (Planck 2015 Table 4 +
Planck-2015-LVK variants).
"""

from __future__ import annotations

import numpy as np

from .utils.host import xp_for

C_SI = 299792458.0  # m/s

PLANCK_2015_Ho = 67.74 / (1e-3)  # (km/s/Mpc) / (km/m) = m/s/Mpc
PLANCK_2015_OmegaMatter = 0.3089
PLANCK_2015_OmegaLambda = 1.0 - PLANCK_2015_OmegaMatter
PLANCK_2015_OmegaRadiation = 0.0

PLANCK_2015_LVK_Ho = 67.90 / 1e-3
PLANCK_2015_LVK_OmegaMatter = 0.3065
PLANCK_2015_LVK_OmegaLambda = 1.0 - PLANCK_2015_LVK_OmegaMatter
PLANCK_2015_LVK_OmegaRadiation = PLANCK_2015_OmegaRadiation

DEFAULT_DZ = 1e-3


def _cumtrapz0(y, dx):
    """Cumulative trapezoid with a leading zero, on the host (numpy f64)."""
    out = np.empty_like(y)
    out[0] = 0.0
    np.cumsum(0.5 * (y[1:] + y[:-1]) * dx, out=out[1:])
    return out


class Cosmology:
    """Flat-LambdaCDM distance measures from tabulated comoving integrals.

    Distances are in Mpc (SI elsewhere), matching the reference convention
    (gwinferno/cosmology.py:27-31).
    """

    def __init__(self, Ho, omega_matter, omega_radiation, omega_lambda, max_z=10.0, dz=DEFAULT_DZ):
        self.Ho = Ho
        self.c_over_Ho = C_SI / Ho
        self.OmegaMatter = omega_matter
        self.OmegaRadiation = omega_radiation
        self.OmegaLambda = omega_lambda
        self.OmegaKappa = 1.0 - (omega_matter + omega_radiation + omega_lambda)
        if abs(self.OmegaKappa) > 1e-12:
            raise ValueError("only flat cosmologies are implemented: OmegaKappa must be 0")
        self.max_z = float(max_z)
        self.dz = float(dz)
        self._build_tables(self.max_z, self.dz)

    # -- table construction (host, f64, vectorized) ------------------------

    def _E_np(self, z):
        opz = 1.0 + z
        return np.sqrt(
            self.OmegaLambda
            + self.OmegaKappa * opz**2
            + self.OmegaMatter * opz**3
            + self.OmegaRadiation * opz**4
        )

    def _build_tables(self, max_z, dz):
        z = np.arange(0.0, max_z, dz, dtype=np.float64)
        dDcdz = self.c_over_Ho / self._E_np(z)
        Dc = _cumtrapz0(dDcdz, dz)
        dVcdz = 4.0 * np.pi * Dc**2 * dDcdz
        Vc = _cumtrapz0(dVcdz, dz)
        # host-side tables (see module docstring / utils.host)
        self.z = z
        self.Dc = Dc
        self.Vc = Vc
        self._np_z, self._np_Dc = z, Dc

    def extend(self, max_z, dz=DEFAULT_DZ):
        """Rebuild tables out to ``max_z`` (parity: cosmology.py:65-77)."""
        self.max_z, self.dz = float(max_z), float(dz)
        self._build_tables(self.max_z, self.dz)

    # -- queries (host numpy or traced jnp, via xp_for) ---------------------

    @property
    def DL(self):
        return self.Dc * (1.0 + self.z)

    def z2E(self, z):
        """E(z) = sqrt(OmL + OmK (1+z)^2 + OmM (1+z)^3 + OmR (1+z)^4)."""
        opz = 1.0 + z
        return (
            self.OmegaLambda
            + self.OmegaKappa * opz**2
            + self.OmegaMatter * opz**3
            + self.OmegaRadiation * opz**4
        ) ** 0.5

    def dDcdz(self, z):
        """(c/Ho)/E(z) -- analytic, no table needed."""
        return self.c_over_Ho / self.z2E(z)

    def z2Dc(self, z, dz=DEFAULT_DZ):
        """Comoving distance via table interpolation."""
        return xp_for(z).interp(z, self.z, self.Dc)

    def dVcdz(self, z, Dc=None, dz=DEFAULT_DZ):
        """Differential comoving volume dVc/dz = 4 pi Dc(z)^2 dDc/dz."""
        if Dc is None:
            Dc = self.z2Dc(z, dz=dz)
        return 4.0 * np.pi * Dc**2 * self.dDcdz(z)

    def logdVcdz(self, z, Dc=None, dz=DEFAULT_DZ):
        """log dVc/dz, overflow-free (parity: cosmology.py:103-109)."""
        if Dc is None:
            Dc = self.z2Dc(z, dz=dz)
        xp = xp_for(z, Dc)
        return xp.log(4.0 * np.pi) + 2.0 * xp.log(Dc) + xp.log(self.dDcdz(z))

    def z2DL(self, z, dz=DEFAULT_DZ):
        """Luminosity distance DL(z) = (1+z) Dc(z)."""
        return xp_for(z).interp(z, self.z, self.DL)

    def DL2z(self, DL, dz=DEFAULT_DZ):
        """Inverse map DL -> z via interpolation on the (monotone) DL table.

        The reference's auto-extension path is broken (calls a nonexistent
        ``max_DL=`` kwarg, cosmology.py:128 -- SURVEY.md S7.3 item 4); here
        values beyond the table clamp to ``max_z``.  Build with a larger
        ``max_z`` if needed.
        """
        return xp_for(DL).interp(DL, self.DL, self.z)


PLANCK_2015_Cosmology = Cosmology(
    PLANCK_2015_Ho,
    PLANCK_2015_OmegaMatter,
    PLANCK_2015_OmegaRadiation,
    PLANCK_2015_OmegaLambda,
)

PLANCK_2015_LVK_Cosmology = Cosmology(
    PLANCK_2015_LVK_Ho,
    PLANCK_2015_LVK_OmegaMatter,
    PLANCK_2015_LVK_OmegaRadiation,
    PLANCK_2015_LVK_OmegaLambda,
)
