"""B-spline POSTERIOR-MOMENT parity: independent ensemble vs the NUTS engine.

Complements the exact density parity (independent_bspline_density.py +
tests/pipeline/test_bspline_density_parity.py) with sampler-level evidence
on a REDUCED B-spline problem (small knot counts + subsampled banks so the
pure-numpy ensemble is tractable on this 2-core host): the Goodman-Weare
stretch sampler on the independent scipy/numpy density must agree with the
framework's NUTS (whitened parameterization, c-space moments recovered from
the deterministic sites) in every coefficient/hyperparameter mean within
combined MC error.

Writes tools/parity/bspline_moment_parity.json.

Run from the repo root:  python tools/parity/run_bspline_moment_parity.py
(~30-60 min CPU; offline artifact generator, not part of the suite.)
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import bench  # noqa: E402
from tools.parity.independent_bspline_density import IndependentBSplineDensity  # noqa: E402
from tools.parity.independent_numpy_model import run_ensemble_parallel  # noqa: E402
from tools.parity.make_parity_baseline import ess_1d  # noqa: E402

N_M, N_Q, N_A, N_CT, N_Z = 10, 6, 5, 5, 5
S_SUB, INJ_SUB = 600, 8000
BLOCKS = [("mass_cs", N_M), ("q_cs", N_Q), ("a_cs", N_A), ("tilt_cs", N_CT), ("z_cs", N_Z - 1)]
DIM = sum(n for _, n in BLOCKS) + 2  # + lamb + unscaled_rate


def unpack(theta):
    p, i = {}, 0
    for name, n in BLOCKS:
        p[name] = theta[i : i + n]
        i += n
    p["lamb"] = theta[i]
    p["unscaled_rate"] = theta[i + 1]
    return p


def main():
    from gwinferno_tpu.pipeline.utils import load_base_parser, load_pe_and_injections_as_dict
    import simple_bspline_example as ex
    from utils import run_bspline_analysis

    pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(bench.ensure_data())
    rng = np.random.default_rng(5)
    idx = rng.choice(pedict["mass_1"].shape[1], size=S_SUB, replace=False)
    pedict = {k: np.ascontiguousarray(v[:, idx]) for k, v in pedict.items()}
    iidx = rng.choice(injdict["mass_1"].shape[0], size=INJ_SUB, replace=False)
    injdict = {k: np.ascontiguousarray(v[iidx]) for k, v in injdict.items()}
    # total_inj stays unchanged: mu is then miscalibrated vs the full bank,
    # but BOTH implementations see the identical banks/constants, so the
    # parity comparison is exact regardless

    # ---------------- independent ensemble ----------------
    indep = IndependentBSplineDensity(pedict, injdict, constants,
                                      n_m=N_M, n_q=N_Q, n_a=N_A, n_ct=N_CT, n_z=N_Z,
                                      mmin=3.0, mmax=100.0)

    def log_post(theta):
        if theta[-1] <= 0:
            return -np.inf
        try:
            return indep(unpack(theta))
        except FloatingPointError:
            return -np.inf

    n_walkers = int(os.environ.get("BSP_WALKERS", 80))
    n_steps = int(os.environ.get("BSP_STEPS", 4000))
    x0 = 0.05 * np.random.default_rng(11).standard_normal((n_walkers, DIM))
    x0[:, -2] += 1.7          # lamb near truth-ish
    x0[:, -1] = 69.0 + 2.0 * np.random.default_rng(12).standard_normal(n_walkers)
    t0 = time.time()
    chain, acc = run_ensemble_parallel(
        log_post, x0, n_steps=n_steps, seed=7,
        progress_every=max(1, n_steps // 20), n_procs=int(os.environ.get("PARITY_PROCS", 2)),
    )
    t_ens = time.time() - t0
    burn = n_steps // 2
    ens = chain[burn:]  # (steps, walkers, dim)
    print(f"ensemble: {n_steps} steps x {n_walkers} walkers, acc {acc:.2f}, {t_ens:.0f}s", flush=True)

    # ---------------- framework NUTS (whitened) ----------------
    argv = [
        "--m-nsplines", str(N_M), "--q-nsplines", str(N_Q), "--a-nsplines", str(N_A),
        "--tilt-nsplines", str(N_CT), "--z-nsplines", str(N_Z),
        "--mmin", "3.0", "--mmax", "100.0",
        "--warmup", os.environ.get("BSP_NUTS_WARMUP", "300"),
        "--samples", os.environ.get("BSP_NUTS_SAMPLES", "600"),
        "--chains", os.environ.get("BSP_NUTS_CHAINS", "2"),
        "--result-dir", "/tmp/bsp_parity", "--run-label", "parity",
        "--rngkey", "3", "--reparam", "whitened", "--chain-scheduler", "sync",
    ]
    args = load_base_parser().parse_args(argv)
    t0 = time.time()
    posterior, models = run_bspline_analysis(ex.model, pedict, injdict, constants, param_names, args)
    t_nuts = time.time() - t0
    mcmc = models.pop("_mcmc")

    n_chains = int(args.chains)

    # ---------------- comparison ----------------
    # Exp-projected, normalized spline blocks have an exactly-degenerate
    # LEVEL direction (adding a constant to every coefficient multiplies the
    # pdf by a constant that the trapezoid normalization removes; the
    # difference penalty is shift-invariant too), pinned only by the weak
    # iid-Normal prior -- a soft mode where the ensemble's autocorrelation
    # time (hence its mc-se) is badly underestimated and burn-in bias
    # lingers (the round-3 parametric-parity lesson).  The physically
    # meaningful SHAPE lives in the coefficient DIFFERENCES, which are
    # scored as first-class projections; levels are reported with the soft
    # flag rather than gated.
    def series_stats_ens(vec_fn):
        s = vec_fn(ens)  # (steps, walkers)
        m, sd = float(s.mean()), float(s.std())
        return m, sd / np.sqrt(max(ess_1d(s.T), 4.0))

    def series_stats_nuts(draws):  # (chains, draws)
        from gwinferno_tpu.infer.diagnostics import effective_sample_size
        m, sd = float(draws.mean()), float(draws.std())
        return m, sd / np.sqrt(max(float(effective_sample_size(draws)), 4.0))

    # raw per-block NUTS chains
    nuts_chains = {}
    for name, n in BLOCKS + [("lamb", 1), ("unscaled_rate", 1)]:
        v = np.asarray(posterior[name] if name in posterior else mcmc.get_samples()[name])
        v = v.reshape(v.shape[0], -1)
        nuts_chains[name] = v.reshape(-1, n_chains, v.shape[1]).swapaxes(0, 1)  # (chains, draws, k)

    rows, zmax_shape, zmax_all = [], 0.0, 0.0
    offset = {}
    i = 0
    for name, n in BLOCKS + [("lamb", 1), ("unscaled_rate", 1)]:
        offset[name] = i
        i += n

    def add_row(label, kind, ens_fn, nuts_draws):
        nonlocal zmax_shape, zmax_all
        em, ese = series_stats_ens(ens_fn)
        nm, nse = series_stats_nuts(nuts_draws)
        se = float(np.sqrt(ese**2 + nse**2))
        z = (nm - em) / max(se, 1e-12)
        rows.append({"param": label, "kind": kind, "nuts_mean": round(nm, 4),
                     "ens_mean": round(em, 4), "combined_se": round(se, 4), "z": round(z, 2)})
        zmax_all = max(zmax_all, abs(z))
        if kind != "soft-level":
            zmax_shape = max(zmax_shape, abs(z))

    for name, n in BLOCKS + [("lamb", 1), ("unscaled_rate", 1)]:
        o = offset[name]
        bc = nuts_chains[name]
        if n == 1:
            add_row(name, "scalar", lambda e, o=o: e[:, :, o], bc[:, :, 0])
            continue
        for j in range(n - 1):
            add_row(f"d_{name}[{j}]", "shape",
                    lambda e, o=o, j=j: e[:, :, o + j + 1] - e[:, :, o + j],
                    bc[:, :, j + 1] - bc[:, :, j])
        add_row(f"level_{name}", "soft-level",
                lambda e, o=o, n=n: e[:, :, o : o + n].mean(axis=-1),
                bc.mean(axis=-1))

    out = {
        "config": (
            f"reduced B-spline problem: knots m{N_M} q{N_Q} a{N_A} t{N_CT} z{N_Z}, "
            f"{S_SUB} PE samples/event, {INJ_SUB} injections, min_neff walls on; "
            f"ensemble {n_steps}x{n_walkers} (acc {acc:.2f}, {t_ens:.0f}s) vs NUTS whitened "
            f"{args.warmup}w+{args.samples}s x {args.chains} chains ({t_nuts:.0f}s)"
        ),
        "max_abs_z_shape": round(zmax_shape, 2),
        "max_abs_z_incl_soft_levels": round(zmax_all, 2),
        "n_projections": len(rows),
        "rows": rows,
    }
    path = os.path.join(HERE, "bspline_moment_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("config", "max_abs_z_shape", "max_abs_z_incl_soft_levels", "n_projections")}, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
