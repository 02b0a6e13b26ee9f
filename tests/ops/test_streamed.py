"""Parity tests for the streamed whole-chain fused summaries op
(ops/streamed.py): forward values, custom-VJP gradients, the custom_vmap
chain-batched kernels, and the flat-bank reshape path -- all against the
direct jnp computation (CPU interpret mode; the TPU lane exercises the
compiled kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gwinferno_tpu.ops.streamed import make_streamed_double_logsumexp
from gwinferno_tpu.ops.streamed import reshape_bank_rows


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    E, S = 5, 300  # deliberately unaligned -> exercises padding + masks
    banks = {
        "x": rng.normal(size=(E, S)).astype(np.float32),
        "y": rng.uniform(0.1, 2.0, size=(E, S)).astype(np.float32),
    }

    def logw_fn(b, th):
        return th["a"] * b["x"] + jnp.log(b["y"]) * th["b"] - jnp.exp(th["a"] * 0.1) * b["y"]

    def direct(th):
        lw = logw_fn({k: jnp.asarray(v) for k, v in banks.items()}, th)
        return (
            jax.scipy.special.logsumexp(lw, axis=1),
            jax.scipy.special.logsumexp(2 * lw, axis=1),
        )

    op = make_streamed_double_logsumexp(logw_fn, banks, block_rows=2)
    return banks, logw_fn, op, direct


def test_forward_parity(problem):
    _, _, op, direct = problem
    theta = {"a": jnp.float32(0.7), "b": jnp.float32(-1.3)}
    l1, l2 = op(theta)
    d1, d2 = direct(theta)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(d1), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(d2), rtol=2e-6)


def test_gradient_parity(problem):
    _, _, op, direct = problem
    theta = {"a": jnp.float32(0.7), "b": jnp.float32(-1.3)}

    def loss(f):
        def inner(th):
            a, b = f(th)
            return jnp.sum(jnp.sin(a) + 0.3 * b)

        return inner

    g1 = jax.grad(loss(op))(theta)
    g2 = jax.grad(loss(direct))(theta)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]), rtol=5e-5, err_msg=k)


def test_vmap_routes_to_chain_batched_kernel(problem):
    """vmap over theta fires the custom_vmap rule -> ONE chain-batched
    kernel invocation; values must match per-chain direct evaluation."""
    _, _, op, direct = problem
    a = jnp.linspace(0.2, 0.9, 4)
    b = jnp.linspace(-2.0, -1.0, 4)
    lv1, lv2 = jax.vmap(lambda ai, bi: op({"a": ai, "b": bi}))(a, b)
    for c in range(4):
        d1, d2 = direct({"a": a[c], "b": b[c]})
        np.testing.assert_allclose(np.asarray(lv1[c]), np.asarray(d1), rtol=2e-6)
        np.testing.assert_allclose(np.asarray(lv2[c]), np.asarray(d2), rtol=2e-6)


def test_vmap_gradient_parity(problem):
    _, _, op, direct = problem
    a = jnp.linspace(0.2, 0.9, 3)
    b = jnp.linspace(-2.0, -1.0, 3)

    def loss(f):
        return lambda ai, bi: jnp.sum(f({"a": ai, "b": bi})[0])

    go = jax.vmap(jax.grad(loss(op), argnums=(0, 1)))(a, b)
    gd = jax.vmap(jax.grad(loss(direct), argnums=(0, 1)))(a, b)
    for x, y in zip(go, gd):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4)


def test_flat_bank_reshape(problem):
    banks, logw_fn, _, _ = problem
    rng = np.random.default_rng(3)
    flat = {
        "x": rng.normal(size=(1000,)).astype(np.float32),
        "y": rng.uniform(0.1, 2.0, size=(1000,)).astype(np.float32),
    }
    rows, valid = reshape_bank_rows(flat, cols=256)
    op2 = make_streamed_double_logsumexp(logw_fn, rows, block_rows=2, valid=valid)
    theta = {"a": jnp.float32(0.4), "b": jnp.float32(-0.8)}
    f1, f2 = op2(theta)
    lwf = logw_fn({k: jnp.asarray(v) for k, v in flat.items()}, theta)
    np.testing.assert_allclose(
        float(jax.scipy.special.logsumexp(f1)), float(jax.scipy.special.logsumexp(lwf)), rtol=2e-6
    )
    np.testing.assert_allclose(
        float(jax.scipy.special.logsumexp(f2)), float(jax.scipy.special.logsumexp(2 * lwf)), rtol=2e-6
    )


def test_bench_model_streamed_matches_flat():
    """The BENCH_STREAMED=1 model must produce the same potential as the
    flat XLA model on the real synthetic catalog (the production-shape
    integration of the op)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    import bench
    from gwinferno_tpu.models.parametric.parametric import PowerlawRedshiftModel
    from gwinferno_tpu.pipeline.utils import load_pe_and_injections_as_dict
    from gwinferno_tpu.ppl.infer_util import _model_transforms
    from gwinferno_tpu.ppl.infer_util import potential_energy
    import jax.flatten_util

    pedict, injdict, constants, _ = load_pe_and_injections_as_dict(bench.ensure_data())
    pedict = {k: np.asarray(v)[:, :256] for k, v in pedict.items()}
    injdict = {k: np.asarray(v)[:3000] for k, v in injdict.items()}
    z_model = PowerlawRedshiftModel(pedict["redshift"], injdict["redshift"])

    os.environ["BENCH_STREAMED"] = "1"
    try:
        model_s = bench.make_model(pedict, injdict, constants, z_model)
    finally:
        os.environ.pop("BENCH_STREAMED", None)
    model_f = bench.make_model(pedict, injdict, constants, z_model)

    def pf(model):
        transforms, _, tr = _model_transforms(model, (), {})
        proto_u = {
            k: jnp.zeros(t.unconstrained_shape(jnp.shape(tr[k]["value"])), jnp.result_type(float))
            for k, t in transforms.items()
        }
        proto, unravel = jax.flatten_util.ravel_pytree(proto_u)
        return (lambda z: potential_energy(model, (), {}, unravel(z))), proto

    pf_s, proto = pf(model_s)
    pf_f, _ = pf(model_f)
    z = jnp.asarray(np.random.default_rng(1).uniform(-0.4, 0.4, size=(4, proto.shape[0])), proto.dtype)
    ps, gs = jax.vmap(jax.value_and_grad(pf_s))(z)
    pfv, gf = jax.vmap(jax.value_and_grad(pf_f))(z)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(pfv), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gf), rtol=2e-3, atol=1e-2)
