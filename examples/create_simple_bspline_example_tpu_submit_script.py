"""Generate batch submission scripts for B-spline analyses over many rng
seeds -- the reference ships a SLURM GPU-array generator
(examples/create_simple_bspline_example_slurm_submit_script.py); this one
targets TPU fleets (GKE/queued resources via gcloud) and plain SLURM
clusters with TPU partitions.

Usage:
    python examples/create_simple_bspline_example_tpu_submit_script.py \
        --backend slurm --n-seeds 10 --outdir submit
    python examples/create_simple_bspline_example_tpu_submit_script.py \
        --backend gcloud --tpu-type v5p-8 --n-seeds 10 --outdir submit
"""

import argparse
import os
import stat

RUN_CMD = (
    "python examples/simple_bspline_example.py "
    "--pe-inj-file {data} --warmup {warmup} --samples {samples} "
    "--rngkey {seed} --run-label bspline_seed{seed} --result-dir {results}/seed{seed}"
)

SLURM_TEMPLATE = """#!/bin/bash
#SBATCH --job-name=gwinferno-bspline
#SBATCH --partition={partition}
#SBATCH --array=0-{max_idx}
#SBATCH --time={walltime}
#SBATCH --output={results}/logs/%A_%a.out

cd {repo}
export JAX_PLATFORMS=tpu
{run_cmd}
"""

GCLOUD_TEMPLATE = """#!/bin/bash
# Queued-resource submission: one TPU VM per rng seed.
set -euo pipefail
for SEED in $(seq 0 {max_idx}); do
  gcloud compute tpus queued-resources create gwinferno-seed$SEED \\
    --node-id gwinferno-seed$SEED \\
    --zone {zone} \\
    --accelerator-type {tpu_type} \\
    --runtime-version tpu-ubuntu2204-base \\
    --best-effort \\
    --metadata startup-script='#!/bin/bash
cd {repo}
{run_cmd_seeded}
'
done
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["slurm", "gcloud"], default="slurm")
    p.add_argument("--n-seeds", type=int, default=10)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--samples", type=int, default=1500)
    p.add_argument("--data", type=str, default="tests/data/pe_inj_file.h5")
    p.add_argument("--repo", type=str, default=os.getcwd())
    p.add_argument("--results", type=str, default="results/bspline_array")
    p.add_argument("--partition", type=str, default="tpu")
    p.add_argument("--walltime", type=str, default="08:00:00")
    p.add_argument("--tpu-type", type=str, default="v5p-8")
    p.add_argument("--zone", type=str, default="us-east5-a")
    p.add_argument("--outdir", type=str, default="submit")
    args = p.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    os.makedirs(os.path.join(args.results, "logs"), exist_ok=True)

    if args.backend == "slurm":
        run_cmd = RUN_CMD.format(
            data=args.data, warmup=args.warmup, samples=args.samples,
            seed="$SLURM_ARRAY_TASK_ID", results=args.results,
        )
        script = SLURM_TEMPLATE.format(
            partition=args.partition, max_idx=args.n_seeds - 1, walltime=args.walltime,
            results=args.results, repo=args.repo, run_cmd=run_cmd,
        )
        path = os.path.join(args.outdir, "submit_bspline_array.sbatch")
    else:
        run_cmd_seeded = RUN_CMD.format(
            data=args.data, warmup=args.warmup, samples=args.samples,
            seed="$SEED", results=args.results,
        )
        script = GCLOUD_TEMPLATE.format(
            max_idx=args.n_seeds - 1, zone=args.zone, tpu_type=args.tpu_type,
            repo=args.repo, run_cmd_seeded=run_cmd_seeded,
        )
        path = os.path.join(args.outdir, "submit_bspline_tpu_fleet.sh")

    with open(path, "w") as f:
        f.write(script)
    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
