"""Format-layer tests, mirroring the reference's csim format coverage
(spmv_csim/csim.cpp:597-613 testcase list)."""
import numpy as np
import pytest

from hisparse_tpu import (CSRMatrix, SpmvConfig, dense_csr, uniform_sparse_csr,
                          powerlaw_csr, pack, decode, round_dims,
                          normalize_by_outdegree)
from hisparse_tpu.formats.csr import argsort_rows_by_nnz, permute_rows, csr_to_csc


def assert_same_matrix(a: CSRMatrix, b: CSRMatrix):
    A = a.to_scipy(); B = b.to_scipy()
    assert A.shape[0] <= B.shape[0] or A.shape == B.shape
    d = (A - B[:A.shape[0], :A.shape[1]]).toarray()
    assert np.abs(d).max() == 0.0


CONFIGS = [
    SpmvConfig(sublanes=128, bank_blocks=1, stripes=128),
    SpmvConfig(sublanes=256, bank_blocks=2, stripes=64),
    SpmvConfig(sublanes=256, bank_blocks=1, stripes=256),
    SpmvConfig(sublanes=128, bank_blocks=2, stripes=4),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_pack_decode_roundtrip_uniform(cfg):
    m = uniform_sparse_csr(300, 500, 10, seed=1)
    wp = pack(m, cfg)
    dec = decode(wp)
    assert_same_matrix(m, dec)
    assert wp.nnz == m.nnz
    assert 0 < wp.fill <= 1


@pytest.mark.parametrize("cfg", CONFIGS[:2])
def test_pack_decode_roundtrip_dense_small(cfg):
    m = dense_csr(40, 130, val=0.5)
    dec = decode(pack(m, cfg))
    assert_same_matrix(m, dec)


def test_pack_decode_powerlaw_multipart():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    # cols > VB forces multiple column partitions; rows > RPB multiple blocks
    m = powerlaw_csr(num_rows=cfg.rows_per_block + 77,
                     num_cols=cfg.vb_cols + 1000,
                     avg_nnz_per_row=6, seed=3)
    wp = pack(m, cfg)
    assert wp.n_blocks == 2 and wp.n_parts == 2
    assert_same_matrix(m, decode(wp))


def test_pack_empty_and_single():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = CSRMatrix(10, 10, np.zeros(0, np.float32), np.zeros(0, np.int32),
                  np.zeros(11, np.int64))
    wp = pack(m, cfg)
    assert decode(wp).nnz == 0
    m2 = CSRMatrix(1, 1, np.array([2.5], np.float32), np.array([0], np.int32),
                   np.array([0, 1], np.int64))
    assert_same_matrix(m2, decode(pack(m2, cfg)))


def test_round_dims():
    m = uniform_sparse_csr(100, 200, 5)
    r = round_dims(m, 128, 512)
    assert r.num_rows == 128 and r.num_cols == 512
    assert r.nnz == m.nnz


def test_normalize_by_outdegree():
    m = uniform_sparse_csr(50, 60, 4, seed=2)
    n = normalize_by_outdegree(m)
    outdeg = np.zeros(60); np.add.at(outdeg, m.indices, 1)
    np.testing.assert_allclose(n.data, 1.0 / outdeg[m.indices], rtol=1e-6)


def test_row_sort_and_permute():
    m = powerlaw_csr(64, 64, 4, seed=5)
    order = argsort_rows_by_nnz(m, descending=True)
    pm = permute_rows(m, order)
    nnz = pm.row_nnz()
    assert (np.diff(nnz) <= 0).all()
    # permuting back reproduces the matrix
    inv = np.empty_like(order); inv[order] = np.arange(order.size)
    assert_same_matrix(m, permute_rows(pm, inv))


def test_csr_to_csc():
    m = uniform_sparse_csr(30, 40, 3, seed=7)
    t = csr_to_csc(m)
    np.testing.assert_allclose(t.dense(), m.dense().T)


def test_schedule_constraints():
    """Every wave obeys the three scheduling invariants."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=32)
    m = powerlaw_csr(400, 2000, 8, seed=11)
    wp = pack(m, cfg)
    G = cfg.groups
    for t in range(wp.num_tiles):
        packed = (wp.idxT[t].reshape(G, 128, 128).swapaxes(1, 2)
                  .reshape(cfg.sublanes, 128))
        src = packed >> 10
        v = wp.vals[t]
        for s in range(cfg.sublanes):
            lanes = np.nonzero(v[s] != 0)[0]
            srcs = src[s, lanes]
            # distinct gather lanes per wave (constraint 1)
            assert len(np.unique(srcs)) == len(srcs)
