"""Masked (SpMSpV-analog) SpMV path: tile groups outside the active
columns' (partition, class) reach are never streamed.  Reference lineage:
the GraphLily sparse-frontier module the reference ships as vestigial
tests (unit_tests/test_module_spmv_spmspv.cpp); here it is a scalar-
prefetch indirection over the same packed stream."""
import numpy as np
import pytest

from hisparse_tpu import SpmvConfig, SpmvOperator, pack, powerlaw_csr
from hisparse_tpu.formats.csr import CSRMatrix


def _sparse_x(m, k, seed=0):
    rng = np.random.default_rng(seed)
    act = rng.choice(m.num_cols, k, replace=False)
    x = np.zeros(m.num_cols, np.float32)
    x[act] = rng.random(k) + 0.5
    return x, act


@pytest.mark.parametrize("kw", [
    dict(bank_blocks=2, two_choice=False),
    dict(bank_blocks=2, two_choice=True),
    dict(bank_blocks=2, block_major=True, classes_per_group=2,
         two_choice=False, steal_mantissa=True),
])
def test_masked_matches_full(kw):
    cfg = SpmvConfig(sublanes=128, stripes=128, **kw)
    m = powerlaw_csr(3000, 40000, 6, seed=4)
    wp = pack(m, cfg, split_max=16, col_order="degree")
    op = SpmvOperator(wp, interpret=True)
    x, act = _sparse_x(m, 40)
    y_full = op(x)
    y_masked = op.masked(x, act)
    np.testing.assert_allclose(y_masked, y_full, rtol=1e-6, atol=1e-6)
    # boolean-mask form of `active` and post-pad unmasked consistency
    y_masked2 = op.masked(x, x > 0)
    np.testing.assert_allclose(y_masked2, y_full, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(op(x), y_full, rtol=0, atol=0)


def test_masked_paged_variant():
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     two_choice=False)
    m = powerlaw_csr(3000, 40000, 6, seed=5)
    wp = pack(m, cfg, split_max=16, col_order="degree")
    op = SpmvOperator(wp, interpret=True, variant="paged")
    x, act = _sparse_x(m, 30, seed=1)
    np.testing.assert_allclose(op.masked(x, act), op(x),
                               rtol=1e-6, atol=1e-6)


def test_masked_skips_groups():
    """Selectivity: activating one column leaves most groups unstreamed."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     two_choice=False)
    m = powerlaw_csr(2000, 64 * 16384, 3, seed=6)   # many partitions
    wp = pack(m, cfg, split_max=16)
    op = SpmvOperator(wp, interpret=True)
    Gn = len(op._meta_np[0]) // op.tb
    gsel = op.active_groups(np.array([5]))
    assert 0 < len(gsel) < Gn


def test_masked_min_plus():
    """min_plus masked apply with +inf (the annihilator) off-frontier."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     two_choice=False, semiring="min_plus")
    m = powerlaw_csr(2500, 30000, 5, seed=7)
    wp = pack(m, cfg, split_max=16)
    op = SpmvOperator(wp, interpret=True)
    rng = np.random.default_rng(2)
    act = rng.choice(m.num_cols, 25, replace=False)
    x = np.full(m.num_cols, np.inf, np.float32)
    x[act] = rng.random(25)
    y_full = op(x)
    y_masked = op.masked(x, act)
    np.testing.assert_allclose(y_masked, y_full, rtol=1e-6, atol=1e-6)


def test_bfs_masked_matches_dense():
    from hisparse_tpu.models.apps import BFS
    m = powerlaw_csr(3000, 3000, 4, seed=8)
    bf = BFS(m, interpret=True)
    lv_d = bf.run(source=1)
    lv_m = bf.run(source=1, masked=True)
    np.testing.assert_array_equal(lv_m, lv_d)


def test_sssp_masked_matches_dense():
    from hisparse_tpu.models.apps import SSSP
    m0 = powerlaw_csr(2000, 2000, 4, seed=9)
    sp = m0.to_scipy().copy()
    sp.sum_duplicates()
    m = CSRMatrix.from_scipy(sp.tocsr())
    ss = SSSP(m, interpret=True)
    d_dense = ss.run(source=0)
    it_dense = ss.iters_run
    d_masked = ss.run(source=0, masked=True)
    np.testing.assert_allclose(d_masked, d_dense, rtol=1e-5, atol=1e-5)
    assert ss.iters_run <= it_dense + 1
