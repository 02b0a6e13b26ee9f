"""Chain-scaling efficiency measurement (VERDICT r2 item 6).

Round 2 measured a 7x ESS/s REGRESSION from 16 -> 64 vmapped chains: a
vmapped NUTS transition synchronizes every chain on the batch's deepest
tree each step, and the E[max] tail grows with the batch.  The fix is
``MCMC(chain_groups=G)``: ``lax.map`` over G sequential sub-batches, each
syncing only on its OWN deepest tree (gwinferno_tpu/infer/mcmc.py
``batched_transition``).

This script produces the evidence table: min-ESS/s at 16/32/64 chains on
the ambient platform with the group size that restores monotonic scaling,
plus the ungrouped 64-chain row that documents the regression.  Writes
``docs/chain_scaling.json``.

Run on the TPU:  python tools/measure_chain_scaling.py
(SCALE_WARMUP/SCALE_SAMPLES/SCALE_CONFIGS env overrides; each config pays
one compile, so the sweep reuses segment-cached executables per config.)
"""

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

import numpy as np  # noqa: E402

import bench  # noqa: E402
from gwinferno_tpu.infer import MCMC, NUTS  # noqa: E402
from gwinferno_tpu.infer.diagnostics import effective_sample_size  # noqa: E402
from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel  # noqa: E402
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict  # noqa: E402

WARMUP = int(os.environ.get("SCALE_WARMUP", 200))
SAMPLES = int(os.environ.get("SCALE_SAMPLES", 200))
# chains:groups[:sample_chunks[:batch[:leapfrogs]]] tuples.  groups>1 = the
# lax.map device-batch tiling workaround; sample_chunks>1 = the at-the-source
# fix (ops/chunked.py scan+checkpoint tiles INSIDE the flat vmapped
# gradient); batch>0 = MCMC(chain_batch_size=batch): sequential whole-run
# batches of the proven single-batch program; leapfrogs>1 =
# MCMC(leapfrogs_per_round=L): L masked substeps per async round, amortizing
# the transition-boundary bookkeeping (sample stream identical for every L).
DEFAULT_CONFIGS = "16:1,32:1,64:1,32:2,64:4,32:1:2,64:1:4"
CONFIGS = [
    tuple(int(v) for v in (pair.split(":") + ["1", "0", "1"])[:5])
    for pair in os.environ.get("SCALE_CONFIGS", DEFAULT_CONFIGS).split(",")
]
# SCALE_MESH=1: the multi-device variant -- chain axis sharded over all
# local devices (run under JAX_PLATFORMS=cpu
# XLA_FLAGS=--xla_force_host_platform_device_count=8) with the exact
# Chan-pooled collective adaptation on.  Walls on a 2-core host
# oversubscribed 8x are NOT efficiency evidence; the table demonstrates the
# sharded path runs + scales monotonically in ESS, with per-config walls
# for completeness.
MESH_MODE = os.environ.get("SCALE_MESH", "0") == "1"


def run_one(model, n_chains, groups, chunks=1, batch=0, leapfrogs=1):
    bench.N_CHAINS = n_chains  # make_init sizes its jitter batch from this
    mcmc = MCMC(
        NUTS(
            model,
            dense_mass=bench.DENSE_MASS,
            max_tree_depth=int(os.environ.get("BENCH_MAX_TREE_DEPTH", 6)),
            target_accept_prob=float(os.environ.get("BENCH_TARGET_ACCEPT", 0.8)),
        ),
        num_warmup=WARMUP,
        num_samples=SAMPLES,
        num_chains=n_chains,
        chain_groups=groups,
        chain_batch_size=batch if batch > 0 else None,
        leapfrogs_per_round=leapfrogs if leapfrogs > 1 else None,
        chain_scheduler=os.environ.get("SCALE_SCHEDULER", "auto"),
        chain_method="parallel" if MESH_MODE else "vectorized",
        collective_adaptation=MESH_MODE,
        progress_bar=True,
        max_steps_per_call=int(os.environ.get("BENCH_SEG", 25)),
    )
    t0 = time.time()
    mcmc.run(jax.random.PRNGKey(0), init_params=bench.make_init(0))
    jax.block_until_ready(mcmc._collected_z)
    compile_plus_first = time.time() - t0

    t0 = time.time()
    mcmc.run(jax.random.PRNGKey(1), init_params=bench.make_init(1))
    jax.block_until_ready(mcmc._collected_z)
    wall = time.time() - t0

    samples = mcmc.get_samples(group_by_chain=True)
    ess = {k: float(effective_sample_size(np.asarray(v))) for k, v in samples.items() if np.asarray(v).ndim == 2}
    min_ess = min(ess.values())
    extra = mcmc.get_extra_fields()
    return {
        "num_chains": n_chains,
        "chain_groups": groups,
        "sample_chunks": chunks,
        "chain_batch_size": batch or None,
        "leapfrogs_per_round": leapfrogs,
        "scheduler": "async" if mcmc._resolve_scheduler(batch or n_chains) else "sync",
        "seg": int(os.environ.get("BENCH_SEG", 25)),
        "wall_s": round(wall, 2),
        "compile_plus_first_run_s": round(compile_plus_first, 1),
        "min_ess": round(min_ess, 1),
        "min_ess_per_s": round(min_ess / wall, 2),
        "divergence_rate": round(float(np.mean(np.asarray(extra["diverging"]))), 4),
        "mean_tree_depth": round(float(np.mean(np.asarray(extra["tree_depth"]))), 2),
    }


def main():
    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])

    models = {}

    def model_for(chunks):
        if chunks not in models:
            os.environ["BENCH_SAMPLE_CHUNKS"] = str(chunks)
            models[chunks] = bench.make_model(pedict, injdict, constants, z_model)
            os.environ.pop("BENCH_SAMPLE_CHUNKS", None)
        return models[chunks]

    rows = []
    for n_chains, groups, chunks, batch, leapfrogs in CONFIGS:
        print(f"--- {n_chains} chains / {groups} groups / {chunks} chunks / batch {batch} / L {leapfrogs}",
              file=sys.stderr, flush=True)
        rows.append(run_one(model_for(chunks), n_chains, groups, chunks, batch, leapfrogs))
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)

    out = {
        "platform": jax.devices()[0].platform,
        "n_devices": len(jax.devices()),
        "mode": "sharded chain axis + collective adaptation" if MESH_MODE else "single chip, vectorized + chain_groups",
        "config": f"bench.py 14-hyperparameter model, {WARMUP}w+{SAMPLES}s, depth 6, dense mass",
        "rows": rows,
    }
    default_name = "chain_scaling_mesh.json" if MESH_MODE else "chain_scaling.json"
    path = os.path.join(ROOT, "docs", os.environ.get("SCALE_OUT", default_name))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
