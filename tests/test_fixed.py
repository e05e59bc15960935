"""Fixed-point parity tests: bit-exact saturating unsigned Q8.24, matching
ap_ufixed<32,8,AP_RND,AP_SAT> (common.h:35-39).  Mirrors the reference's
fixed-bitstream verification style (values scaled into [0,1) like
sw/host.cpp:480 so saturation stays quiescent and order-independence holds).
"""
import numpy as np
import pytest

from hisparse_tpu import SpmvConfig, uniform_sparse_csr, powerlaw_csr, pack
from hisparse_tpu.ops import golden
from hisparse_tpu.ops.spmv import SpmvOperator


def fixed_case(m, cfg, seed=0):
    rng = np.random.default_rng(seed)
    xf = rng.random(m.num_cols)
    x_raw = golden.float_to_fixed(xf)
    data_raw = golden.float_to_fixed(m.data)
    m_fixed = m.astype(np.float32)
    m_fixed.data = data_raw          # raw uint32 payload for dtype='fixed'
    wp = pack(m_fixed, cfg)
    op = SpmvOperator(wp, interpret=True)
    y = op(x_raw)
    ref = golden.spmv_fixed(m, x_raw, data_raw)
    np.testing.assert_array_equal(y.astype(np.uint32), ref)


CFG_FIXED = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                       dtype="fixed")


def test_fixed_mul_golden_properties():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 1 << 32, 1000, dtype=np.uint64).astype(np.uint32)
    b = rng.integers(0, 1 << 32, 1000, dtype=np.uint64).astype(np.uint32)
    p = golden.fixed_mul(a, b)
    exact = (a.astype(np.object_) * b.astype(np.object_) + (1 << 23)) >> 24
    exact = np.minimum(exact, 0xFFFFFFFF).astype(np.uint64)
    assert (p.astype(np.uint64) == exact).all()


def test_fixed_spmv_uniform():
    m = uniform_sparse_csr(200, 300, 6, seed=2)
    m.data = (m.data / m.num_cols).astype(np.float32)   # sw/host.cpp:480
    fixed_case(m, CFG_FIXED)


def test_fixed_spmv_stripes():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=32, dtype="fixed")
    m = powerlaw_csr(150, 200, 5, seed=3)
    m.data = (m.data / m.num_cols).astype(np.float32)
    fixed_case(m, cfg)


def test_fixed_saturation_single_op():
    # a single product that saturates must clamp identically
    m_dense = uniform_sparse_csr(8, 8, 1, seed=4)
    m_dense.data = np.full(8, 200.0, np.float32)  # Q8.24 max is ~256
    fixed_case(m_dense, CFG_FIXED, seed=5)


def test_fixed_multi_saturation_accumulate():
    """>= 2 accumulation-saturation events per row: kernel == golden
    exactly.  For UNSIGNED terms the per-step AP_SAT fold equals
    min(prefix sum, MAX) at every step (golden.spmv_fixed docstring), so
    wave-order accumulation + stripe fold agree with CSR order even when
    the row sum crosses MAX repeatedly — the divergence region
    golden.py used to concede is provably empty."""
    m = uniform_sparse_csr(64, 96, 8, seed=9)
    # products ~ 120*x, eight per row: the running sum crosses 256 (MAX)
    # several times in most rows
    m.data = np.full(m.nnz, 120.0, np.float32)
    fixed_case(m, CFG_FIXED, seed=10)


def test_fixed_multi_saturation_products_and_hub_split():
    """Every PRODUCT saturates (a*x rounds past MAX) and rows are hub-split
    into virtual rows whose saturated partials recombine via unpack_y's
    min(uint64 sum, MAX) closed form — the full multi-saturation stack."""
    m = uniform_sparse_csr(48, 64, 8, seed=11)
    m.data = np.full(m.nnz, 50.0, np.float32)
    rng = np.random.default_rng(12)
    xf = rng.random(m.num_cols) * 100.0 + 100.0     # x in [100, 200)
    x_raw = golden.float_to_fixed(xf)
    data_raw = golden.float_to_fixed(m.data)
    m_fixed = m.astype(np.float32)
    m_fixed.data = data_raw
    wp = pack(m_fixed, CFG_FIXED, split_max=4)      # force virtual rows
    assert (np.bincount(wp.perm[wp.perm < m.num_rows]) > 1).any()
    op = SpmvOperator(wp, interpret=True)
    y = op(x_raw)
    # every product saturates: 50 * 100 = 5000 >> 256
    assert (golden.fixed_mul(data_raw, x_raw[m.indices])
            == np.uint32(0xFFFFFFFF)).all()
    ref = golden.spmv_fixed(m, x_raw, data_raw)
    np.testing.assert_array_equal(y.astype(np.uint32), ref)


def test_fixed_vec_golden_matches_sequential_under_saturation():
    """spmv_fixed_vec's fallback detection: with saturating rows it must
    route to the sequential reference and agree bit-exactly."""
    m = uniform_sparse_csr(32, 40, 6, seed=13)
    m.data = np.full(m.nnz, 90.0, np.float32)
    x_raw = golden.float_to_fixed(np.random.default_rng(14)
                                  .random(m.num_cols) * 3.0)
    data_raw = golden.float_to_fixed(m.data)
    np.testing.assert_array_equal(
        golden.spmv_fixed_vec(m, x_raw, data_raw),
        golden.spmv_fixed(m, x_raw, data_raw))
