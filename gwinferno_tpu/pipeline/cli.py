"""Config-driven pipeline runner (library entry point).

See bin/gwinferno_run_from_config.py for the script wrapper.
"""

import argparse
import os

import jax


from gwinferno_tpu.infer import MCMC
from gwinferno_tpu.pipeline.analysis import NP_KERNEL_MAP
from gwinferno_tpu.pipeline.analysis import construct_hierarchical_model
from gwinferno_tpu.pipeline.parser import ConfigReader
from gwinferno_tpu.pipeline.parser import load_model_from_python_file
from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
from gwinferno_tpu.pipeline.utils import posterior_dict_to_xarray
from gwinferno_tpu.utils.prof import Timer


def run_inference(config_file, inspect=False, rng_seed=0):
    timer = Timer()
    reader = ConfigReader()
    reader.parse(config_file)

    if "file_path" in reader.models:
        model = load_model_from_python_file(reader.models.pop("file_path"))
    else:
        model = construct_hierarchical_model(reader.models, reader.priors, **(reader.likelihood_kwargs or {}))

    if inspect:
        print(f"label: {reader.label}  outdir: {reader.outdir}")
        print(f"models: {list(reader.models)}")
        print(f"sampling params: {reader.sampling_params}")
        print(f"sampler: {reader.sampler_conf}")
        return None

    data_conf = reader.data_conf or {}
    pe_inj_file = data_conf.get("pe_inj_file")
    if pe_inj_file is None:
        raise ValueError("config data block must provide 'pe_inj_file' (pe+injection handoff artifact)")
    with timer("load_data"):
        pedict, injdict, constants, param_names = load_pe_and_injections_as_dict(
            pe_inj_file, ignore=data_conf.get("ignore")
        )

    sampler_conf = reader.sampler_conf or {}
    kernel_cls = NP_KERNEL_MAP[sampler_conf.get("kernel", "NUTS")]
    kernel = kernel_cls(model, **(sampler_conf.get("kernel_kwargs") or {}))
    mcmc_kwargs = sampler_conf.get("mcmc_kwargs") or {}
    mcmc = MCMC(kernel, **mcmc_kwargs)

    with timer("mcmc (compile+warmup+sample)"):
        mcmc.run(
            jax.random.PRNGKey(rng_seed),
            pedict,
            injdict,
            constants["total_inj"],
            constants["nObs"],
            constants["obs_time"],
        )
        jax.block_until_ready(mcmc._collected_z)
    mcmc.print_summary()

    os.makedirs(reader.outdir, exist_ok=True)
    from ..postprocess.plot import plot_trace

    trace_path = plot_trace(mcmc.get_samples(group_by_chain=True), label=reader.label, result_dir=reader.outdir)
    if trace_path:
        print(f"trace plot saved: {trace_path}")
    posterior = dict(mcmc.get_samples())
    posterior.update(mcmc.get_deterministic(site_names={"rate", "surveyed_hypervolume", "detection_efficiency", "log_nEff_inj"}))
    ds = posterior_dict_to_xarray(posterior)
    out = os.path.join(reader.outdir, f"{reader.label}_posterior_samples.h5")
    ds.to_hdf5(out)
    print(f"posterior saved: {out}")
    timer.report()
    return mcmc


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--inspect", action="store_true", default=False)
    parser.add_argument("--rngkey", type=int, default=0)
    args = parser.parse_args()
    run_inference(args.config, inspect=args.inspect, rng_seed=args.rngkey)


if __name__ == "__main__":
    main()
