"""Real-TPU test lane (VERDICT r1 item 6).

Runs on the ambient TPU only:

    GWINF_TPU_TESTS=1 python -m pytest tests/tpu -q

(the default suite forces CPU in tests/conftest.py and these tests skip).
Covers exactly what CPU-f64 tests cannot: the compiled (not interpreted)
Pallas kernels, f32 finiteness of the likelihood/gradient on real data, and
one NUTS transition + a 20-step mini-run executing on the device.  Parity
oracle is the same computation on this process's CPU backend (same f32
precision, different compiler/kernels).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="needs the ambient TPU (GWINF_TPU_TESTS=1)"
)


def _cpu():
    return jax.devices("cpu")[0]


@pytest.fixture(scope="module")
def bench_setup():
    import bench
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict

    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])
    model = bench.make_model(pedict, injdict, constants, z_model)
    return bench, model


def test_fused_double_logsumexp_compiled():
    """The Pallas kernel COMPILED on the TPU (not interpret mode) against the
    XLA path, forward and gradient, plain and vmapped."""
    from gwinferno_tpu.ops.fused import double_logsumexp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3, (69, 1000)).astype(np.float32))
    x = x.at[3].set(-jnp.inf)

    p1, p2 = jax.jit(lambda y: double_logsumexp(y, mode="1"))(x)
    x1, x2 = jax.jit(lambda y: double_logsumexp(y, mode="0"))(x)
    m = np.isfinite(np.asarray(x1))
    np.testing.assert_allclose(np.asarray(p1)[m], np.asarray(x1)[m], rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p2)[m], np.asarray(x2)[m], rtol=2e-5)
    assert np.asarray(p1)[3] == -np.inf

    def loss(mode):
        def f(y):
            l1, l2 = double_logsumexp(y, mode=mode)
            ok = jnp.isfinite(l1)
            return jnp.sum(jnp.where(ok, jnp.sin(l1) + 0.3 * l2, 0.0))

        return f

    gp = jax.jit(jax.grad(loss("1")))(x)
    gx = jax.jit(jax.grad(loss("0")))(x)
    mg = np.isfinite(np.asarray(gx)) & np.isfinite(np.asarray(gp))
    assert mg[np.isfinite(np.asarray(x))].all()
    np.testing.assert_allclose(np.asarray(gp)[mg], np.asarray(gx)[mg], atol=2e-4)

    xb = jnp.asarray(rng.normal(0, 2, (8, 16, 257)).astype(np.float32))
    v1, _ = jax.jit(jax.vmap(lambda y: double_logsumexp(y, mode="1")))(xb)
    w1, _ = jax.jit(jax.vmap(lambda y: double_logsumexp(y, mode="0")))(xb)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(w1), rtol=2e-5)


def test_potential_and_grad_f32_on_device(bench_setup):
    """f32 potential + gradient at the fiducial point: finite, off-wall, and
    matching the CPU backend's f32 result."""
    import jax.flatten_util

    from gwinferno_tpu.ppl.infer_util import potential_energy, unconstrain_fn

    bench, model = bench_setup
    fid = {k: jnp.asarray(v, jnp.float32) for k, v in bench.FIDUCIAL_INIT.items()}
    u = unconstrain_fn(model, (), {}, params=fid)

    def pe_and_grad(p):
        return jax.value_and_grad(lambda q: potential_energy(model, (), {}, q))(p)

    pe_tpu, grad_tpu = jax.jit(pe_and_grad)(u)
    g_tpu, _ = jax.flatten_util.ravel_pytree(grad_tpu)
    assert np.isfinite(float(pe_tpu)) and abs(float(pe_tpu)) < 1e30
    assert np.all(np.isfinite(np.asarray(g_tpu)))

    # CPU oracle: force the XLA reduction path (double_logsumexp's "auto"
    # mode keys on the global platform, which is still tpu here)
    os.environ["GWINF_FUSED"] = "0"
    try:
        with jax.default_device(_cpu()):
            u_cpu = jax.device_put(u, _cpu())
            pe_cpu, grad_cpu = jax.jit(pe_and_grad)(u_cpu)
            g_cpu, _ = jax.flatten_util.ravel_pytree(grad_cpu)
    finally:
        os.environ.pop("GWINF_FUSED", None)
    np.testing.assert_allclose(float(pe_tpu), float(pe_cpu), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_tpu), np.asarray(g_cpu), rtol=1e-2, atol=1e-3)


def test_nuts_transition_and_mini_run(bench_setup):
    """One jitted NUTS transition + a 20w+20s mini-run execute on the TPU
    with finite, moving chains."""
    import jax.flatten_util

    from gwinferno_tpu.infer import MCMC, NUTS
    from gwinferno_tpu.infer.hmc_util import identity_mass_matrix
    from gwinferno_tpu.infer.nuts import nuts_init, nuts_transition
    from gwinferno_tpu.ppl.infer_util import potential_energy, unconstrain_fn

    bench, model = bench_setup
    fid = {k: jnp.asarray(v, jnp.float32) for k, v in bench.FIDUCIAL_INIT.items()}
    u = unconstrain_fn(model, (), {}, params=fid)
    zflat, unravel = jax.flatten_util.ravel_pytree(u)

    def pot(z):
        return potential_energy(model, (), {}, unravel(z))

    mm = identity_mass_matrix(zflat.shape[0], dtype=zflat.dtype)
    st = nuts_init(pot, zflat)
    st = jax.jit(lambda s, k: nuts_transition(pot, s, mm, jnp.asarray(0.05, zflat.dtype), k))(
        st, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(st.pe)) and int(st.num_steps) >= 1

    bench.N_CHAINS = 2
    mcmc = MCMC(NUTS(model, dense_mass=True), num_warmup=20, num_samples=20, num_chains=2)
    mcmc.run(jax.random.PRNGKey(0), init_params=bench.make_init(0))
    s = mcmc.get_samples()
    flat = np.concatenate([np.asarray(v).ravel() for v in s.values()])
    assert np.all(np.isfinite(flat))
    assert np.asarray(s["alpha"]).std() > 0  # chains actually moved


def test_smc_multimodal_on_chip():
    """Adaptive-tempering SMC executes on the TPU: both modes of a
    double-well posterior populated, finite evidence (VERDICT r2 item 8;
    mirrors tests/infer/test_nuts.py::test_smc_multimodal_bspline_posterior
    which only ever ran CPU-f64)."""
    import time

    from gwinferno_tpu import ppl
    from gwinferno_tpu.infer import SMC
    from gwinferno_tpu.ppl import distributions as dist

    def bimodal():
        x = ppl.sample("x", dist.Normal(0.0, 3.0))
        ppl.factor("wells", -((x**2 - 4.0) ** 2) / 4.0)

    smc = SMC(bimodal, num_particles=3000, num_mutation_steps=5)
    t0 = time.time()
    res = smc.run(jax.random.PRNGKey(2))
    jax.block_until_ready(res.particles["x"])
    wall = time.time() - t0
    x = np.asarray(res.particles["x"])
    frac_pos = float((x > 0).mean())
    assert 0.25 < frac_pos < 0.75, f"mode collapse: {frac_pos}"
    assert abs(abs(x).mean() - 2.0) < 0.3
    assert np.isfinite(float(res.log_evidence))
    print(f"\n[tpu] SMC 3000 particles, {int(res.num_stages)} stages: {wall:.1f}s")


def test_svi_map_on_chip(bench_setup):
    """SVI AutoDelta MAP optimization of the FULL 14-hyperparameter bench
    posterior executes on the TPU and lands near the synthetic truth
    (VERDICT r2 item 8)."""
    import time

    from gwinferno_tpu.infer import SVI, Adam, AutoDelta, Trace_ELBO

    bench, model = bench_setup
    guide = AutoDelta(model, init_values=bench.FIDUCIAL_INIT)
    svi = SVI(model, guide, Adam(0.02), Trace_ELBO())
    t0 = time.time()
    result = svi.run(jax.random.PRNGKey(0), 300)
    jax.block_until_ready(result.losses)
    wall = time.time() - t0
    est = guide.median(result.params)
    assert float(result.losses[-1]) < float(result.losses[0])
    # MAP point of the well-identified params sits near truth
    assert abs(float(est["lambda_m"]) - bench.TRUTH["lambda_m"]) < 0.15
    assert abs(float(est["mu_a1"]) - bench.TRUTH["mu_a1"]) < 0.15
    # NB the joint MODE's lamb sits at ~5.5-6.5 on the round-3+ catalog (a
    # skewed, n_eff-wall-adjacent direction; CPU-f64 converges to the same
    # point, so this is the true optimum of the density, not a chip issue)
    # while the posterior BULK lives near truth -- a point estimate is the
    # wrong instrument for lamb, so only finiteness is asserted
    assert abs(float(est["lamb"])) < 20.0
    print(f"\n[tpu] SVI MAP 300 steps on the 14-param bench posterior: {wall:.1f}s")
