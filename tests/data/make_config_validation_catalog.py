"""Generate the CONFIG-PATH validation catalog: a truth-known synthetic
problem the flat config schema can express EXACTLY.

The main synthetic catalog (make_synthetic_injections.py) carries a
conditional-q, spinning powerlaw+peak truth that only the hand-built model
surface can represent; the config-driven CLI (models keyed per parameter,
independent blocks) structurally cannot, so truth recovery through the CLI
needs its own catalog.  Truth here is a PRODUCT population over
(m1, q, z), each factor one of the config-loadable population distributions
(gwinferno_tpu.population_distributions):

    m1 ~ PowerlawSmoothedPowerlaw(alpha, minimum, maximum, alpha_min,
                                  alpha_max, low, high)   [smooth breaks,
                                  FIXED support -- the geometry-sane mass
                                  model the shipped example config uses]
    q  ~ Powerlaw(beta) on fixed [0.02, 1]  (independent of m1 on purpose)
    z  ~ PowerlawRedshift(lamb): p(z) propto dVc/dz (1+z)^(lamb-1), z <= 2.3

Selection uses the same proxy-SNR search as the main catalog
(make_synthetic_injections.py), applied to both the event draws and the
injection bank, so detection effects are real and self-consistent.  PE
clouds are lognormal in m1/z (prior row 1/(m1 z)) and flat-prior truncnorm
in q -- the same measurement model (and the same prior-row pitfall
documentation) as generate_event_catalog there.

Writes tests/data/pe_inj_config_val.h5 (the pe+injection handoff artifact
consumed by the CLI's data block).  Deterministic seed.

Run from the repo root:  python tests/data/make_config_validation_catalog.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from gwinferno_tpu.cosmology import PLANCK_2015_LVK_Cosmology as cosmo  # noqa: E402
from gwinferno_tpu.utils.dataset import DataArray  # noqa: E402
from gwinferno_tpu.utils.dataset import Dataset  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
SEED = 20260821
N_GEN = 24_000_000
N_EVENTS = 69
N_PE_SAMPLES = 2000
ANALYSIS_TIME_YR = 1.0
D0_MPC = 1600.0  # same proxy-SNR horizon as the main synthetic search
ZMIN, ZMAX = 1e-4, 2.3

# truth, exactly expressible by examples/config_files/config.yml's schema
TRUE_CFG = {
    "m_alpha": -2.35, "m_min": 8.0, "m_max": 70.0,
    "m_alpha_min": 2.0, "m_alpha_max": 10.0, "m_low": 2.0, "m_high": 100.0,
    "q_beta": 1.2, "q_low": 0.02,
    "lamb": 1.7,
}

# injection-bank draw distributions (broad, known pdf)
DRAW_M_ALPHA, DRAW_M_LO, DRAW_M_HI = -2.35, 2.0, 100.0
DRAW_Q_BETA, DRAW_Q_LO = 0.0, 0.02
DRAW_LAMB_Z = 1.7


def powerlaw_icdf(u, alpha, lo, hi):
    ap1 = alpha + 1.0
    return (lo**ap1 + u * (hi**ap1 - lo**ap1)) ** (1.0 / ap1)


def powerlaw_pdf(x, alpha, lo, hi):
    ap1 = alpha + 1.0
    return ap1 * x**alpha / (hi**ap1 - lo**ap1)


def smoothed_powerlaw_pdf(x, p):
    """Independent numpy implementation of the three-segment broken powerlaw
    (continuity at the breaks, normalized on [low, high] numerically)."""
    c2 = p["m_min"] ** (p["m_alpha_min"] - p["m_alpha"])
    c3 = c2 * p["m_max"] ** (p["m_alpha"] + p["m_alpha_max"])
    shape = np.where(
        x < p["m_min"],
        x ** p["m_alpha_min"],
        np.where(x > p["m_max"], c3 * x ** (-p["m_alpha_max"]), c2 * x ** p["m_alpha"]),
    )
    return np.where((x >= p["m_low"]) & (x <= p["m_high"]), shape, 0.0)


def _grid_cdf_sampler(grid, pdf_grid):
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (pdf_grid[1:] + pdf_grid[:-1]) * np.diff(grid))])
    cdf /= cdf[-1]
    return lambda u: np.interp(u, cdf, grid)


def _detect(rng, m1, q, z):
    """The main catalog's proxy-SNR search (make_synthetic_injections.py)."""
    m2 = q * m1
    Mc = (m1 * m2) ** (3.0 / 5.0) / (m1 + m2) ** (1.0 / 5.0)
    DL = np.asarray(cosmo.z2DL(z))
    snr = 8.0 * ((Mc * (1 + z)) / 25.0) ** (5.0 / 6.0) * (D0_MPC / DL)
    w = rng.uniform(size=len(m1)) ** (1.0 / 3.0)
    return snr * w > 8.0


def _truncnorm_rejection(rng, loc, sig, lo, hi, shape):
    loc = np.broadcast_to(loc, shape)
    x = loc + sig * rng.standard_normal(shape)
    bad = (x < lo) | (x > hi)
    while bad.any():
        x[bad] = loc[bad] + sig * rng.standard_normal(bad.sum())
        bad = (x < lo) | (x > hi)
    return x


def main():
    rng = np.random.default_rng(SEED)

    zgrid = np.linspace(ZMIN, ZMAX, 4000)
    dVdz = np.asarray(cosmo.dVcdz(zgrid))

    # redshift truth pdf (PowerlawRedshift semantics: dVc/dz (1+z)^(lamb-1))
    pz_true = dVdz * (1 + zgrid) ** (TRUE_CFG["lamb"] - 1.0)
    pz_true /= np.trapezoid(pz_true, zgrid)
    draw_z_true = _grid_cdf_sampler(zgrid, pz_true)

    # injection-bank z draw pdf (same family; could differ, kept equal)
    pz_draw = dVdz * (1 + zgrid) ** (DRAW_LAMB_Z - 1.0)
    pz_draw /= np.trapezoid(pz_draw, zgrid)
    draw_z_bank = _grid_cdf_sampler(zgrid, pz_draw)

    # ---------------- injection bank ----------------
    m1 = powerlaw_icdf(rng.uniform(size=N_GEN), DRAW_M_ALPHA, DRAW_M_LO, DRAW_M_HI)
    q = powerlaw_icdf(rng.uniform(size=N_GEN), DRAW_Q_BETA, DRAW_Q_LO, 1.0)
    z = draw_z_bank(rng.uniform(size=N_GEN))
    found = _detect(rng, m1, q, z)
    prior = (
        powerlaw_pdf(m1, DRAW_M_ALPHA, DRAW_M_LO, DRAW_M_HI)
        * powerlaw_pdf(q, DRAW_Q_BETA, DRAW_Q_LO, 1.0)
        * np.interp(z, zgrid, pz_draw)
    )
    inj_cols = {
        "mass_1": m1[found], "mass_ratio": q[found], "redshift": z[found],
        "prior": prior[found],
    }
    n_found = int(found.sum())
    print(f"injections: found {n_found} / {N_GEN} ({n_found / N_GEN:.3%}), "
          f"med z_found {np.median(inj_cols['redshift']):.3f}")

    inj_table = np.stack([inj_cols[k] for k in inj_cols])
    inj_arr = DataArray(
        inj_table,
        ("param", "injection"),
        coords={"param": np.array(list(inj_cols)), "injection": np.arange(n_found)},
        attrs={"total_generated": float(N_GEN), "analysis_time": ANALYSIS_TIME_YR},
    )
    inj_ds = Dataset({"injections": inj_arr}, attrs=dict(inj_arr.attrs))

    # ---------------- event catalog ----------------
    mgrid = np.linspace(TRUE_CFG["m_low"], TRUE_CFG["m_high"], 6000)
    pm_true = smoothed_powerlaw_pdf(mgrid, TRUE_CFG)
    draw_m_true = _grid_cdf_sampler(mgrid, pm_true)

    kept = []
    while sum(len(k[0]) for k in kept) < N_EVENTS:
        n = 300_000
        em1 = draw_m_true(rng.uniform(size=n))
        eq = powerlaw_icdf(rng.uniform(size=n), TRUE_CFG["q_beta"], TRUE_CFG["q_low"], 1.0)
        ez = draw_z_true(rng.uniform(size=n))
        det = _detect(rng, em1, eq, ez)
        kept.append((em1[det], eq[det], ez[det]))
    em1, eq, ez = (np.concatenate([k[i] for k in kept])[:N_EVENTS] for i in range(3))
    print(f"events: med z {np.median(ez):.3f}, med m1 {np.median(em1):.1f}, med q {np.median(eq):.2f}")

    # PE clouds (same measurement model as the main catalog's generator)
    S = N_PE_SAMPLES
    sig_lnm, sig_q, sig_lnz = 0.08, 0.08, 0.08
    lnm_obs = np.log(em1) + sig_lnm * rng.standard_normal(N_EVENTS)
    q_obs = eq + sig_q * rng.standard_normal(N_EVENTS)
    lnz_obs = np.log(ez) + sig_lnz * rng.standard_normal(N_EVENTS)
    m1_s = np.exp(lnm_obs[:, None] + sig_lnm * rng.standard_normal((N_EVENTS, S)))
    q_s = _truncnorm_rejection(rng, q_obs[:, None], sig_q, TRUE_CFG["q_low"], 1.0, (N_EVENTS, S))
    z_s = np.exp(lnz_obs[:, None] + sig_lnz * rng.standard_normal((N_EVENTS, S)))

    params = ["redshift", "mass_1", "mass_ratio", "prior"]
    pedata = np.stack([z_s, m1_s, q_s, 1.0 / (m1_s * z_s)], axis=1)
    pe_arr = DataArray(
        pedata,
        ("event", "param", "sample"),
        coords={
            "event": np.array([f"CFG{i:03d}" for i in range(N_EVENTS)]),
            "param": np.array(params),
            "sample": np.arange(S),
        },
    )
    pe_ds = Dataset({"posteriors": pe_arr})

    from gwinferno_tpu.preprocess.data_collection import (
        save_posterior_samples_and_injection_datasets_as_idata,
    )

    out = os.path.join(HERE, "pe_inj_config_val.h5")
    save_posterior_samples_and_injection_datasets_as_idata(pe_ds, inj_ds, out)
    print(f"wrote {out}  (truth: {TRUE_CFG})")


if __name__ == "__main__":
    main()
