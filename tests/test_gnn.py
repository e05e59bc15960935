"""GNN tier tests: DiffSpmm (fixed-adjacency differentiable aggregation
through the A / A^T packs) and the GCN stack, against dense jax oracles.

The reference's app tier stops at semiring apps (unit_tests/
test_app.cpp:7-10); GNN training over the same packed substrate is the
framework's extension — aggregation must match a dense ``Â @ H`` in both
the forward and cotangent directions, and a full training step must
agree with an all-dense GCN gradient.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from hisparse_tpu.config import SpmvConfig
from hisparse_tpu.formats.csr import powerlaw_csr, uniform_sparse_csr
from hisparse_tpu.models.gnn import GCN, DiffSpmm, gcn_normalize
from hisparse_tpu.parallel.gnn import ShardedDiffSpmm, ShardedGCN


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest must force 8 CPU devices"
    return Mesh(devs, ("rows",))

BM = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128, block_major=True,
                classes_per_group=2, steal_mantissa=True, two_choice=False)


def test_gcn_normalize():
    m = powerlaw_csr(200, 200, 4.0, seed=0)
    a = gcn_normalize(m)
    A = m.to_scipy().toarray()
    Ai = A + np.eye(200)
    d = Ai.sum(axis=1)
    ref = Ai / np.sqrt(d)[:, None] / np.sqrt(d)[None, :]
    np.testing.assert_allclose(a.dense(), ref, atol=1e-6)


@pytest.mark.parametrize("cfg", [None, BM],
                         ids=["chain-default", "bm-steal"])
def test_diffspmm_forward_and_grad(cfg):
    m = powerlaw_csr(260, 260, 5.0, seed=3)
    d = DiffSpmm(m, config=cfg, interpret=True)
    A = d.m.dense().astype(np.float64)
    rng = np.random.default_rng(7)
    F = 5
    X = rng.standard_normal((d.num_cols, F)).astype(np.float32)
    G = rng.standard_normal((d.num_rows, F)).astype(np.float32)
    tol = 5e-4 if (cfg is not None and cfg.steal_mantissa) else 5e-5
    Y = np.asarray(d(X))
    ref = A @ X
    assert np.abs(Y - ref).max() <= tol * max(1.0, np.abs(ref).max())
    f, aux = d.fn()
    gx = jax.grad(lambda xx: jnp.vdot(f(xx, aux), jnp.asarray(G)))(
        jnp.asarray(X))
    gx_ref = A.T @ G
    assert np.abs(np.asarray(gx) - gx_ref).max() <= \
        tol * max(1.0, np.abs(gx_ref).max())


def test_gcn_matches_dense_and_trains():
    m = uniform_sparse_csr(256, 256, 6, seed=5)
    dims = [16, 8, 4]
    gcn = GCN(m, dims, interpret=True)
    params = gcn.init(seed=1)
    rng = np.random.default_rng(9)
    X = rng.standard_normal((256, dims[0])).astype(np.float32)
    labels = rng.integers(0, dims[-1], 256)
    onehot = jnp.asarray(np.eye(dims[-1], dtype=np.float32)[labels])

    # dense oracle with identical params
    Ahat = jnp.asarray(gcn.agg.m.dense())

    def dense_apply(params, X):
        h = jnp.asarray(X)
        for i, p in enumerate(params):
            h = Ahat @ (h @ p["w"]) + p["b"]
            if i < len(params) - 1:
                h = jax.nn.relu(h)
        return h

    apply, aux = gcn.fn()
    out = apply(params, jnp.asarray(X), aux)
    ref = dense_apply(params, X)
    scale = max(1.0, float(jnp.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5 * scale, rtol=5e-4)

    def loss(fn):
        def l(params, X):
            logits = fn(params, X) if fn is dense_apply else \
                apply(params, X, aux)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.sum(onehot * logp, axis=1))
        return l

    g_sparse = jax.grad(loss(apply))(params, jnp.asarray(X))
    g_dense = jax.grad(loss(dense_apply))(params, jnp.asarray(X))
    for gs, gd in zip(g_sparse, g_dense):
        for k in ("w", "b"):
            ref_g = np.asarray(gd[k])
            np.testing.assert_allclose(
                np.asarray(gs[k]), ref_g,
                atol=5e-5 * max(1.0, np.abs(ref_g).max()), rtol=5e-4)

    # two SGD steps on the packed model: loss decreases
    lfun = jax.jit(jax.value_and_grad(
        lambda p: loss(apply)(p, jnp.asarray(X))))
    l0, g = lfun(params)
    params2 = jax.tree.map(lambda p, gg: p - 0.5 * gg, params, g)
    l1, _ = lfun(params2)
    assert float(l1) < float(l0)


def test_sharded_diffspmm_forward_and_grad(mesh):
    """Row-sharded aggregation on the 8-device mesh vs dense: forward
    (all_gather re-replication) and dL/dX (transpose-shard packs + the
    one psum), non-square to catch row/col mixups."""
    m = powerlaw_csr(300, 260, 5.0, seed=13)
    d = ShardedDiffSpmm(m, mesh, interpret=True)
    A = d.m.dense().astype(np.float64)
    rng = np.random.default_rng(17)
    F = 4
    X = rng.standard_normal((d.num_cols, F)).astype(np.float32)
    G = rng.standard_normal((d.num_rows, F)).astype(np.float32)
    Y = np.asarray(d(X))
    ref = A @ X
    assert Y.shape == (d.num_rows, F)
    assert np.abs(Y - ref).max() <= 5e-5 * max(1.0, np.abs(ref).max())
    f, aux = d.fn()
    gx = jax.grad(lambda xx: jnp.vdot(f(xx, aux), jnp.asarray(G)))(
        jnp.asarray(X))
    gx_ref = A.T @ G
    assert np.abs(np.asarray(gx) - gx_ref).max() <= \
        5e-5 * max(1.0, np.abs(gx_ref).max())


def test_sharded_gcn_matches_single_chip(mesh):
    """ShardedGCN == single-chip GCN with the same params: outputs and
    weight gradients agree, so a trained model moves between the two
    unchanged."""
    m = uniform_sparse_csr(264, 264, 5, seed=21)
    dims = [12, 8, 3]
    local = GCN(m, dims, interpret=True)
    shard = ShardedGCN(m, mesh, dims, interpret=True)
    params = shard.init(seed=3)
    rng = np.random.default_rng(23)
    X = jnp.asarray(rng.standard_normal((264, dims[0])).astype(np.float32))
    G = jnp.asarray(rng.standard_normal((264, dims[-1])).astype(np.float32))
    apL, auxL = local.fn()
    apS, auxS = shard.fn()
    outL = np.asarray(apL(params, X, auxL))
    outS = np.asarray(apS(params, X, auxS))
    sc = max(1.0, np.abs(outL).max())
    np.testing.assert_allclose(outS, outL, atol=5e-5 * sc, rtol=5e-4)
    gL = jax.grad(lambda p: jnp.vdot(apL(p, X, auxL), G))(params)
    gS = jax.grad(lambda p: jnp.vdot(apS(p, X, auxS), G))(params)
    for a, b in zip(gS, gL):
        for k in ("w", "b"):
            ref = np.asarray(b[k])
            np.testing.assert_allclose(
                np.asarray(a[k]), ref,
                atol=5e-5 * max(1.0, np.abs(ref).max()), rtol=5e-4)
