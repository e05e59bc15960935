"""Multi-chip sharding tests on the virtual 8-device CPU mesh (the analog of
the reference's multi-cluster csim runs)."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from hisparse_tpu import SpmvConfig, powerlaw_csr, uniform_sparse_csr
from hisparse_tpu.ops.golden import spmv_f64
from hisparse_tpu.parallel.mesh import ShardedSpmv


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8])
    assert devs.size == 8, "conftest must force 8 CPU devices"
    return Mesh(devs, ("rows",))


def test_sharded_matches_golden(mesh):
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = uniform_sparse_csr(900, 1200, 8, seed=1)
    op = ShardedSpmv(m, mesh, cfg, interpret=True)
    x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


def test_sharded_powerlaw_split(mesh):
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(700, 900, 9, alpha=1.2, seed=2)
    op = ShardedSpmv(m, mesh, cfg, split_max=32, interpret=True)
    x = np.random.default_rng(1).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


def test_sharded_block_major(mesh):
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2, two_choice=True)
    m = powerlaw_csr(900, 20000, 6, seed=3)
    op = ShardedSpmv(m, mesh, cfg, interpret=True)
    x = np.random.default_rng(2).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


def test_sharded_min_plus(mesh):
    """Semiring-aware tile padding (round-1 regression: zero-valued pad
    tiles corrupted min_plus shards)."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     semiring="min_plus")
    m = powerlaw_csr(900, 1100, 7, alpha=1.2, seed=4)
    op = ShardedSpmv(m, mesh, cfg, split_max=32, interpret=True)
    x = np.random.default_rng(3).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    # golden tropical SpMV
    ref = np.full(m.num_rows, np.inf, np.float64)
    rows = np.repeat(np.arange(m.num_rows), np.diff(m.indptr))
    np.minimum.at(ref, rows,
                  m.data.astype(np.float64) + x.astype(np.float64)[m.indices])
    finite = np.isfinite(ref)
    np.testing.assert_allclose(y[finite], ref[finite], rtol=1e-5, atol=1e-5)
    assert np.isinf(y[~finite]).all()


def test_sharded_fixed_dtype(mesh):
    """Fixed-point (saturating Q8.24) SpMV on the mesh, bit-exact vs the
    golden; exercises float->fixed x conversion and uint32 tile padding."""
    from hisparse_tpu import CSRMatrix
    from hisparse_tpu.ops.golden import float_to_fixed, spmv_fixed
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     dtype="fixed", two_choice=False)
    rng = np.random.default_rng(7)
    m0 = uniform_sparse_csr(600, 800, 6, seed=7)
    m = CSRMatrix(m0.num_rows, m0.num_cols,
                  float_to_fixed(m0.data / m0.num_cols),
                  m0.indices, m0.indptr)
    op = ShardedSpmv(m, mesh, cfg, interpret=True)
    x_raw = float_to_fixed(rng.random(m.num_cols))
    y = op.unpack_y(op(x_raw))[:m.num_rows]
    ref = spmv_fixed(m, x_raw, data_raw=m.data)
    assert y.dtype == np.uint32
    np.testing.assert_array_equal(y, ref)


def test_sharded_fixed_saturation(mesh):
    """1-D sharded fixed-point with saturation FIRING (multi-event rows):
    disjoint row ownership keeps the saturating fold per-device, so the
    mesh result must stay bit-exact vs the sequential golden."""
    from hisparse_tpu import CSRMatrix
    from hisparse_tpu.ops.golden import float_to_fixed, spmv_fixed
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     dtype="fixed", two_choice=False)
    rng = np.random.default_rng(21)
    m0 = uniform_sparse_csr(500, 640, 8, seed=21)
    m = CSRMatrix(m0.num_rows, m0.num_cols,
                  float_to_fixed(np.full(m0.nnz, 120.0)),
                  m0.indices, m0.indptr)
    op = ShardedSpmv(m, mesh, cfg, interpret=True)
    x_raw = float_to_fixed(rng.random(m.num_cols) * 2.0)
    y = op.unpack_y(op(x_raw))[:m.num_rows]
    ref = spmv_fixed(m, x_raw, data_raw=m.data)
    assert (ref == np.uint32(0xFFFFFFFF)).any()     # saturation really fires
    np.testing.assert_array_equal(y, ref)


def test_ici_gbps_env_override(monkeypatch):
    """WP_ICI_GBPS calibrates the (model-only) combine term without a code
    change — the hook for the first real multi-chip measurement."""
    from hisparse_tpu.parallel.mesh import ici_allreduce_time
    base = ici_allreduce_time(1 << 20, 4)
    monkeypatch.setenv("WP_ICI_GBPS", "90.0")
    assert ici_allreduce_time(1 << 20, 4) == base / 2
    # explicit arg wins over env
    assert ici_allreduce_time(1 << 20, 4, ici_gbps=45.0) == base


def test_sharded_split_auto(mesh):
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(800, 1000, 8, alpha=1.1, seed=5)
    op = ShardedSpmv(m, mesh, cfg, split_max="auto", interpret=True)
    x = np.random.default_rng(5).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


@pytest.fixture
def mesh2d():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("rows", "cols"))


def test_sharded_2d_matches_golden(mesh2d):
    from hisparse_tpu.parallel.mesh import ShardedSpmv2D
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(900, 1100, 8, alpha=1.1, seed=3)
    op = ShardedSpmv2D(m, mesh2d, cfg, split_max="auto", interpret=True)
    x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


def test_sharded_2d_min_plus(mesh2d):
    from hisparse_tpu.parallel.mesh import ShardedSpmv2D
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64,
                     semiring="min_plus", two_choice=False)
    m = uniform_sparse_csr(600, 900, 5, seed=4)
    op = ShardedSpmv2D(m, mesh2d, cfg, interpret=True)
    x = np.random.default_rng(1).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    # dense min-plus reference
    a = m.dense()
    mask = a != 0
    cand = np.where(mask, a + x[None, :], np.inf)
    ref = cand.min(axis=1)
    ref = np.where(np.isinf(ref), np.inf, ref)
    got = np.where(np.isinf(y), np.inf, y)
    np.testing.assert_allclose(got[~np.isinf(ref)], ref[~np.isinf(ref)],
                               rtol=1e-5, atol=1e-5)


def test_sharded_paged_variant_matches(mesh):
    """The paged kernel variant under shard_map produces the same y as the
    resident variant (the dryrun's multi-chip paged check, in-tree)."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2,
                     two_choice=False, steal_mantissa=True)
    m = powerlaw_csr(1100, 3000, 7, seed=6)
    x = np.random.default_rng(4).random(m.num_cols).astype(np.float32)
    y_res = ShardedSpmv(m, mesh, cfg, interpret=True)(x)
    y_pag = ShardedSpmv(m, mesh, cfg, interpret=True, variant="paged")(x)
    np.testing.assert_array_equal(np.asarray(y_res), np.asarray(y_pag))


def test_ici_allreduce_model_shape():
    """The (model-only) ICI combine term has the ring all-reduce shape:
    zero on one device, monotone in bytes, asymptote 2*bytes/bw."""
    from hisparse_tpu.parallel.mesh import ici_allreduce_time
    assert ici_allreduce_time(1 << 20, 1) == 0.0
    t2 = ici_allreduce_time(1 << 20, 2)
    t8 = ici_allreduce_time(1 << 20, 8)
    t256 = ici_allreduce_time(1 << 20, 256)
    assert 0 < t2 < t8 < t256 < 2 * (1 << 20) / (45.0 * 1e9)
    assert ici_allreduce_time(2 << 20, 8) == 2 * t8
    # asymptote: within 1% of 2*bytes/bw at 256 devices
    assert t256 > 0.99 * 2 * (1 << 20) / (45.0 * 1e9)


def test_sharded_2d_perf_estimate_terms(mesh2d):
    """perf_estimate exposes the compute and ICI-combine terms; both are
    positive and the aggregate uses their sum."""
    from hisparse_tpu.parallel.mesh import ShardedSpmv2D
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(900, 1100, 8, alpha=1.1, seed=3)
    op = ShardedSpmv2D(m, mesh2d, cfg, split_max="auto", interpret=True)
    ests, agg, t_comp, t_comb = op.perf_estimate()
    assert t_comp > 0 and t_comb > 0
    nnz = sum(wp.nnz for row in op.grid for wp in row)
    np.testing.assert_allclose(agg, 2 * nnz / (t_comp + t_comb) / 1e9)


def test_multihost_matches_1d():
    """(hosts x chips) mesh == 1-D sharding == golden: the multi-host
    form is numerically the 2-D grid with rows over the DCN axis and the
    combine pinned to the intra-host chips axis."""
    from hisparse_tpu.parallel.mesh import ShardedSpmvMultiHost
    mesh_mh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                   ("hosts", "chips"))
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(900, 1100, 8, alpha=1.1, seed=3)
    op = ShardedSpmvMultiHost(m, mesh_mh, cfg, split_max="auto",
                              interpret=True)
    assert (op.n_hosts, op.chips_per_host) == (2, 4)
    x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
    y = op.unpack_y(op(x))[:m.num_rows]
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


def test_multihost_perf_terms(monkeypatch):
    """The multi-host estimate separates compute / ICI-combine / DCN
    terms: DCN zero when not chained, scales with WP_DCN_GBPS, and the
    aggregate uses the three-term sum."""
    from hisparse_tpu.parallel.mesh import (ShardedSpmvMultiHost,
                                            dcn_allgather_time)
    assert dcn_allgather_time(1 << 20, 1) == 0.0
    mesh_mh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                   ("hosts", "chips"))
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(900, 1100, 8, alpha=1.1, seed=3)
    op = ShardedSpmvMultiHost(m, mesh_mh, cfg, split_max="auto",
                              interpret=True)
    ests, agg, t_comp, t_ici, t_dcn = op.perf_estimate()
    assert t_comp > 0 and t_ici > 0 and t_dcn > 0
    nnz = sum(wp.nnz for row in op.grid for wp in row)
    np.testing.assert_allclose(agg, 2 * nnz / (t_comp + t_ici + t_dcn) / 1e9)
    _, _, _, _, t0 = op.perf_estimate(chained=False)
    assert t0 == 0.0
    monkeypatch.setenv("WP_DCN_GBPS", "50.0")
    _, _, _, _, t_fast = op.perf_estimate()
    np.testing.assert_allclose(t_fast, t_dcn / 2.0)


def test_multihost_needs_two_axes(mesh):
    from hisparse_tpu.parallel.mesh import ShardedSpmvMultiHost
    m = uniform_sparse_csr(300, 300, 4, seed=1)
    with pytest.raises(ValueError, match="hosts, chips"):
        ShardedSpmvMultiHost(m, mesh, SpmvConfig(), interpret=True)


@pytest.mark.parametrize("fold", ["combine", "scatter"])
def test_sharded_pagerank_matches_reference(mesh, fold):
    """One-jit mesh PageRank (device fori_loop + all_gather per
    iteration) == the numpy golden and the single-chip class, with the
    renamed->natural fold either as the kernel-rate combine pack or the
    oracle semiring scatter."""
    from hisparse_tpu.parallel.apps import ShardedPageRank
    from hisparse_tpu.models.apps import pagerank_reference
    m = powerlaw_csr(600, 600, 6.0, seed=7)
    pr = ShardedPageRank(m, mesh, interpret=True, fold=fold)
    got = pr.run(iters=15)
    ref = pagerank_reference(m, iters=15)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4 * ref.max())


def test_sharded_pagerank_combine_folds_heavy_splits(mesh):
    """Forced tiny split_max makes every device recombine multi-partial
    rows (fan-in > 1 guaranteed); the combine fold must equal the scatter
    fold bit-for-bit-free at float tolerance."""
    from hisparse_tpu.parallel.apps import ShardedPageRank
    m = powerlaw_csr(400, 400, 8.0, seed=11)
    prc = ShardedPageRank(m, mesh, interpret=True, split_max=8,
                          fold="combine")
    fan = max(int(np.bincount(
        w.perm[w.perm < prc.st.rows_per_shard].astype(np.int64)).max())
        for w in prc.st.packs)
    assert fan > 1, "fixture must exercise hub-split recombination"
    prs = ShardedPageRank(m, mesh, interpret=True, split_max=8,
                          fold="scatter")
    a, b = prc.run(iters=10), prs.run(iters=10)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("fold", ["combine", "scatter"])
def test_sharded_sssp_early_exit_matches_dijkstra(mesh, fold):
    """Mesh Bellman-Ford converges in O(diameter) device iterations (the
    while_loop early-exit) and matches scipy Dijkstra, including
    unreachable nodes — under both fold modes (min_plus combine weights
    are 0 so combine=min)."""
    from hisparse_tpu.parallel.apps import ShardedSSSP
    from hisparse_tpu.models.apps import sssp_reference
    m = uniform_sparse_csr(500, 500, 4, seed=9)
    m.data[:] = np.abs(m.data) + 0.1
    ss = ShardedSSSP(m, mesh, interpret=True, fold=fold)
    d = ss.run(0)
    ref = sssp_reference(m, 0)
    fin = np.isfinite(ref)
    assert (np.isinf(d) == ~fin).all()
    np.testing.assert_allclose(d[fin], ref[fin], rtol=1e-5, atol=1e-5)
    assert ss.iters_run < m.num_rows - 1   # early exit actually fired


@pytest.mark.parametrize("fold", ["combine", "scatter"])
def test_sharded_bfs_levels(mesh, fold):
    """Mesh BFS levels (device-side level bookkeeping) == scipy
    unweighted shortest path, -1 for unreachable — under both fold
    modes (max_times combine on 0/1 reachability)."""
    import scipy.sparse.csgraph as csgraph
    from hisparse_tpu.parallel.apps import ShardedBFS
    m = uniform_sparse_csr(500, 500, 4, seed=9)
    bf = ShardedBFS(m, mesh, interpret=True, fold=fold)
    lv = bf.run(0)
    ref = csgraph.shortest_path(m.to_scipy() != 0, unweighted=True,
                                indices=0)
    ref = np.where(np.isinf(ref), -1, ref).astype(np.int64)
    assert (lv == ref).all()


def _diff_refs(m, x, g):
    A = m.to_scipy()
    rows = np.repeat(np.arange(m.num_rows), np.diff(m.indptr))
    return A @ x, A.T @ g, g[rows] * x[m.indices]


def _diff_grads(sd, x, g_global):
    import jax.numpy as jnp
    f, aux = sd.fn()
    gp = np.zeros(sd.n_devices * sd.rows_per_shard, np.float32)
    gp[:len(g_global)] = g_global
    gp = gp.reshape(sd.n_devices, sd.rows_per_shard)

    def loss(v, xx):
        return jnp.vdot(f(v, xx, aux), jnp.asarray(gp))

    return jax.grad(loss, argnums=(0, 1))(sd.v0, jnp.asarray(x))


@pytest.mark.parametrize("cfg_kind", ["chain", "bm_steal"])
def test_sharded_diff_matches_dense(mesh, cfg_kind):
    """Distributed training step: forward, dL/dx (transpose pack + psum
    over the mesh axis) and dL/dvals (local gathers) all match dense
    references on the 8-device mesh."""
    from hisparse_tpu.parallel.train import ShardedDiffSpmv
    if cfg_kind == "chain":
        cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128)
    else:
        cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                         block_major=True, classes_per_group=2,
                         steal_mantissa=True, two_choice=False)
    m = powerlaw_csr(900, 800, 6, seed=11)
    sd = ShardedDiffSpmv(m, mesh, cfg, interpret=True)
    m = sd.m
    rng = np.random.default_rng(13)
    x = rng.standard_normal(m.num_cols).astype(np.float32)
    g = rng.standard_normal(m.num_rows).astype(np.float32)
    y_ref, gx_ref, gv_ref = _diff_refs(m, x, g)
    tol = 5e-4 if cfg_kind == "bm_steal" else 5e-5
    y = sd(x)
    assert np.abs(y - y_ref).max() <= tol * max(1, np.abs(y_ref).max())
    gv, gx = _diff_grads(sd, x, g)
    assert np.abs(np.asarray(gx) - gx_ref).max() <= \
        tol * max(1, np.abs(gx_ref).max())
    assert np.abs(sd.unstack_values(gv) - gv_ref).max() <= 1e-6


def test_sharded_diff_training_step(mesh):
    """One jitted SGD step on the mesh decreases the loss (the full
    distributed training-step pattern: sharded values, replicated x,
    psum'd gradient)."""
    import jax.numpy as jnp
    from hisparse_tpu.parallel.train import ShardedDiffSpmv
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = uniform_sparse_csr(700, 640, 5, seed=17)
    sd = ShardedDiffSpmv(m, mesh, cfg, interpret=True)
    f, aux = sd.fn()
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.random(sd.num_cols).astype(np.float32))
    y_t = jnp.asarray(rng.standard_normal(
        (sd.n_devices, sd.rows_per_shard)).astype(np.float32))

    def loss(v):
        r = f(v, x, aux) - y_t
        return 0.5 * jnp.vdot(r, r)

    lg = jax.jit(jax.value_and_grad(loss))
    v = sd.v0
    l0, gv = lg(v)
    l1, _ = lg(v - 0.05 * gv)
    assert float(l1) < float(l0)
    # value round-trip helpers
    np.testing.assert_array_equal(sd.unstack_values(sd.v0), sd.m.data)


@pytest.mark.parametrize("cfg_kind", ["chain", "bm_steal"])
def test_sharded_stream_diff_matches_dense(mesh, cfg_kind):
    """Distributed STREAM-LAYOUT training: forward, dL/dx (one psum) and
    the in-layout gradient streams of BOTH packs match dense references
    on the 8-device mesh; elementwise updates keep all layout copies
    bit-consistent."""
    import jax.numpy as jnp
    from hisparse_tpu.parallel.train import ShardedStreamDiffSpmv
    if cfg_kind == "chain":
        cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128)
    else:
        cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                         block_major=True, classes_per_group=2,
                         steal_mantissa=True, two_choice=False)
    m = powerlaw_csr(900, 800, 6, seed=11)
    sd = ShardedStreamDiffSpmv(m, mesh, cfg, interpret=True)
    m = sd.m
    rng = np.random.default_rng(13)
    x = rng.standard_normal(m.num_cols).astype(np.float32)
    g = rng.standard_normal(m.num_rows).astype(np.float32)
    y_ref, gx_ref, gv_ref = _diff_refs(m, x, g)
    tol = 5e-4 if cfg_kind == "bm_steal" else 5e-5
    y = sd(x)
    assert np.abs(y - y_ref).max() <= tol * max(1, np.abs(y_ref).max())
    f, aux = sd.fn()
    gp = np.zeros(sd.n_devices * sd.rows_per_shard, np.float32)
    gp[:len(g)] = g
    gp = jnp.asarray(gp.reshape(sd.n_devices, sd.rows_per_shard))

    def loss(vA, vT, xx):
        return jnp.vdot(f(vA, vT, xx, aux), gp)

    gA, gT, gx = jax.grad(loss, argnums=(0, 1, 2))(
        sd.vA0, sd.vT0, jnp.asarray(x))
    assert np.abs(np.asarray(gx) - gx_ref).max() <= \
        tol * max(1, np.abs(gx_ref).max())
    # the in-layout gradient streams are EXACT in both layouts
    np.testing.assert_array_equal(sd.grads_csr(gA), gv_ref)
    np.testing.assert_array_equal(sd._read(gT, sd.aux["mapT"], False),
                                  gv_ref)
    # one jitted SGD step: layouts stay bit-consistent, loss decreases
    step = jax.jit(lambda vA, vT, gA, gT: sd.sgd_step(vA, vT, gA, gT,
                                                      0.01))
    vA, vT = step(sd.vA0, sd.vT0, gA, gT)
    np.testing.assert_array_equal(sd.values(vA), sd.values_T(vT))
    assert float(loss(vA, vT, jnp.asarray(x))) < \
        float(loss(sd.vA0, sd.vT0, jnp.asarray(x)))


def test_sharded_stream_rejects_paged(mesh, monkeypatch):
    import hisparse_tpu.parallel.train as train_mod
    from hisparse_tpu.parallel.train import ShardedStreamDiffSpmv
    monkeypatch.setattr(train_mod, "_RESIDENT_VMEM_BUDGET", 1)
    m = uniform_sparse_csr(256, 256, 3, seed=2)
    with pytest.raises(ValueError, match="resident"):
        ShardedStreamDiffSpmv(m, mesh, SpmvConfig(
            sublanes=128, bank_blocks=1, stripes=128), interpret=True)


def test_sharded_diff_rejects_nondiff(mesh):
    from hisparse_tpu.parallel.train import ShardedDiffSpmv
    m = uniform_sparse_csr(128, 128, 3, seed=1)
    with pytest.raises(ValueError):
        ShardedDiffSpmv(m, mesh, SpmvConfig(
            sublanes=128, bank_blocks=1, stripes=128, dtype="fixed",
            two_choice=False))


def test_sharded_2d_rejects_fixed(mesh2d):
    from hisparse_tpu.parallel.mesh import ShardedSpmv2D
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64, dtype="fixed",
                     two_choice=False)
    m = uniform_sparse_csr(300, 400, 4, seed=5)
    with pytest.raises(ValueError):
        ShardedSpmv2D(m, mesh2d, cfg, interpret=True)
