"""Wavepack SpMM (multi-vector SpMV) tests: Y = A @ X through the packed
stream vs the scipy dense reference — the low-density multi-feature path
(GNN aggregation).  The dense-MXU SpmmOperator has its own tests in
test_dense.py; this file covers the packed-stream path the reference
lacks entirely (its overlay streams x once per SpMV,
spmv/spmv_vector_loader.cpp)."""
import numpy as np
import pytest

from hisparse_tpu import (SpmvConfig, SpmvOperator, pack, powerlaw_csr,
                          spmm, uniform_sparse_csr)

CHAIN = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
BM = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128, block_major=True,
                classes_per_group=2, steal_mantissa=True, two_choice=False)


def check(m, cfg, F=5, seed=0, tol=1e-4, renamed_check=False, **pack_kw):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((m.num_cols, F)).astype(np.float32)
    wp = pack(m, cfg, **pack_kw)
    op = SpmvOperator(wp, interpret=True)
    Y = np.asarray(op.matmul(X))
    ref = m.to_scipy().astype(np.float64) @ X.astype(np.float64)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(Y, ref, atol=tol * scale, rtol=tol)
    # each column must equal the SpMV of that column
    for f in (0, F - 1):
        np.testing.assert_allclose(Y[:, f], op(X[:, f]),
                                   atol=1e-6 * scale, rtol=1e-6)
    return op, X, Y


def test_spmm_chain():
    check(uniform_sparse_csr(256, 256, 10, seed=1), CHAIN)


def test_spmm_block_major_steal():
    check(powerlaw_csr(300, 300, 6, seed=3), BM, tol=5e-4)


def test_spmm_multipart_paged():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=32)
    m = powerlaw_csr(cfg.rows_per_block + 100, cfg.vb_cols + 300, 5, seed=4)
    wp = pack(m, cfg)
    rng = np.random.default_rng(7)
    X = rng.standard_normal((m.num_cols, 3)).astype(np.float32)
    op = SpmvOperator(wp, interpret=True, variant="paged")
    Y = np.asarray(op.matmul(X))
    ref = m.to_scipy() @ X
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(Y, ref, atol=1e-4 * scale, rtol=1e-4)


def test_spmm_chunked_matches_single(monkeypatch):
    """A tiny VMEM budget forces F-chunking; result must be identical to
    the unchunked run."""
    import hisparse_tpu.ops.spmv as spmv_mod
    m = uniform_sparse_csr(200, 200, 8, seed=5)
    rng = np.random.default_rng(8)
    X = rng.standard_normal((m.num_cols, 7)).astype(np.float32)
    wp = pack(m, CHAIN)
    op = SpmvOperator(wp, interpret=True)
    Y1 = np.asarray(op.matmul(X))
    monkeypatch.setattr(spmv_mod, "_RESIDENT_VMEM_BUDGET", 600_000)
    op2 = SpmvOperator(wp, interpret=True, variant="resident")
    Y2 = np.asarray(op2.matmul(X))
    np.testing.assert_array_equal(Y1, Y2)


def test_spmm_col_order_natural_space():
    """With a pack col_order, matmul takes natural-column-space X."""
    m = powerlaw_csr(260, 260, 5, seed=9)
    op, X, Y = check(m, CHAIN, seed=10, col_order="degree")
    assert op._colp is not None


def test_spmm_min_plus():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     semiring="min_plus")
    m = uniform_sparse_csr(128, 128, 6, seed=11)
    rng = np.random.default_rng(12)
    X = rng.random((m.num_cols, 4)).astype(np.float32)
    wp = pack(m, cfg)
    Y = np.asarray(spmm(wp, X, interpret=True))
    A = m.to_scipy().tocoo()
    ref = np.full((m.num_rows, 4), np.inf, np.float32)
    for r, c, v in zip(A.row, A.col, A.data):
        ref[r] = np.minimum(ref[r], v + X[c])
    np.testing.assert_allclose(Y, ref, atol=1e-5, rtol=1e-5)


def test_spmm_rejects_fixed_and_1d():
    from hisparse_tpu.ops.golden import float_to_fixed
    m = uniform_sparse_csr(128, 128, 4, seed=13)
    m.data = np.abs(m.data) * 0.1
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     dtype="fixed")
    wp = pack(m, cfg)
    op = SpmvOperator(wp, interpret=True)
    with pytest.raises(ValueError, match="float"):
        op.matmul(np.zeros((m.num_cols, 2), np.float32))
    wp2 = pack(m, CHAIN)
    with pytest.raises(ValueError, match="num_cols, F"):
        SpmvOperator(wp2, interpret=True).matmul(
            np.zeros(m.num_cols, np.float32))
