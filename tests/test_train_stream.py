"""StreamDiffSpmv: stream-layout training — gradients computed IN the
packed layout at kernel rate (no per-step relayout).  Reference lineage:
the reference overlay is inference-only (sw/host.cpp:1-80); this is the
scale-up training form of DiffSpmv.  Checked against dense oracles and
for the load-bearing invariant: elementwise updates keep the A-layout and
T-layout parameter copies bit-consistent."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hisparse_tpu.config import SpmvConfig
from hisparse_tpu.formats.csr import powerlaw_csr, uniform_sparse_csr
from hisparse_tpu.ops.train_stream import StreamDiffSpmv

CFGS = {
    "chain": SpmvConfig(sublanes=128, bank_blocks=2, stripes=128),
    "chain_tc": SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                           two_choice=True),
    "bm_steal": SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                           block_major=True, classes_per_group=2,
                           steal_mantissa=True, two_choice=False),
    "steal_idx16": SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                              steal_mantissa=True, idx16=True,
                              two_choice=False),
}


def _refs(m, x, g):
    A = m.to_scipy()
    rows = np.repeat(np.arange(m.num_rows), np.diff(m.indptr))
    return A @ x, A.T @ g, g[rows] * x[m.indices]


@pytest.mark.parametrize("kind", sorted(CFGS))
def test_stream_forward_and_grads(kind):
    m = powerlaw_csr(900, 800, 6, seed=11)
    sd = StreamDiffSpmv(m, CFGS[kind], interpret=True)
    m = sd.m
    rng = np.random.default_rng(13)
    x = rng.standard_normal(m.num_cols).astype(np.float32)
    g = rng.standard_normal(m.num_rows).astype(np.float32)
    y_ref, gx_ref, gv_ref = _refs(m, x, g)
    tol = 5e-4 if "steal" in kind else 5e-5
    y = np.asarray(sd(x))
    assert np.abs(y - y_ref).max() <= tol * max(1, np.abs(y_ref).max())
    f, aux = sd.fn()

    def loss(vA, vT, xx):
        return jnp.vdot(f(vA, vT, xx, aux), jnp.asarray(g))

    gA, gT, gx = jax.grad(loss, argnums=(0, 1, 2))(
        sd.vA0, sd.vT0, jnp.asarray(x))
    assert np.abs(np.asarray(gx) - gx_ref).max() <= \
        tol * max(1, np.abs(gx_ref).max())
    # BOTH layout gradients are the exact pattern-restricted outer
    # product (the broadcast and the routing gather are exact; only the
    # stored VALUES carry the steal truncation)
    np.testing.assert_array_equal(sd.grads_csr(gA), gv_ref)
    gvT = np.asarray(gT).reshape(-1)[np.asarray(sd.aux["mapT"])]
    np.testing.assert_array_equal(gvT, gv_ref)


@pytest.mark.parametrize("kind", ["chain", "bm_steal"])
def test_stream_layouts_stay_bit_consistent(kind):
    """The load-bearing invariant: identical elementwise updates keep the
    two layout copies of the parameter BIT-equal (steal packs clean ->
    update -> retruncate identically), and pad slots stay at the
    identity."""
    m = powerlaw_csr(700, 640, 5, seed=17)
    sd = StreamDiffSpmv(m, CFGS[kind], interpret=True)
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.random(sd.num_cols).astype(np.float32))
    g_t = rng.standard_normal(sd.num_rows).astype(np.float32)
    f, aux = sd.fn()

    def loss(vA, vT):
        r = f(vA, vT, x, aux) - jnp.asarray(g_t)
        return 0.5 * jnp.vdot(r, r)

    vA, vT = sd.vA0, sd.vT0
    np.testing.assert_array_equal(sd.values(vA), sd.values_T(vT))
    l_prev = float(loss(vA, vT))
    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    for _ in range(4):
        gA, gT = grad(vA, vT)
        vA, vT = sd.sgd_step(vA, vT, gA, gT, 0.005)
        np.testing.assert_array_equal(sd.values(vA), sd.values_T(vT))
    l_now = float(loss(vA, vT))
    assert l_now < l_prev
    # pad-slot invariant: the clean value plane outside real slots is 0
    padA = np.asarray(vA).reshape(-1)[np.asarray(aux["maskA"]).reshape(-1)
                                      == 0.0]
    if "splantA" in aux:
        padA = (padA.view(np.uint32) & np.uint32(0xFFFFFF80)
                ).view(np.float32)
    assert np.all(padA == 0.0)


def test_stream_matches_diffspmv_values():
    """values()/grads_csr() round-trip agrees with the CSR-vector API."""
    m = uniform_sparse_csr(300, 280, 4, seed=5)
    sd = StreamDiffSpmv(m, CFGS["chain"], interpret=True)
    np.testing.assert_array_equal(sd.values(sd.vA0), sd.m.data)
    np.testing.assert_array_equal(sd.values_T(sd.vT0), sd.m.data)


def test_stream_rejects_paged(monkeypatch):
    import hisparse_tpu.ops.spmv as spmv_mod
    monkeypatch.setattr(spmv_mod, "_RESIDENT_VMEM_BUDGET", 1)
    m = uniform_sparse_csr(300, 280, 4, seed=5)
    with pytest.raises(ValueError, match="resident"):
        StreamDiffSpmv(m, CFGS["chain"], interpret=True)


def test_stream_rejects_nondiff():
    m = uniform_sparse_csr(128, 128, 3, seed=1)
    with pytest.raises(ValueError):
        StreamDiffSpmv(m, SpmvConfig(sublanes=128, bank_blocks=1,
                                     stripes=128, dtype="fixed",
                                     two_choice=False), interpret=True)
