"""Format-layer tests, mirroring the reference's csim format coverage
(spmv_csim/csim.cpp:597-613 testcase list)."""
import numpy as np
import pytest

from hisparse_tpu import (CSRMatrix, SpmvConfig, dense_csr, uniform_sparse_csr,
                          powerlaw_csr, pack, decode, round_dims,
                          normalize_by_outdegree)
from hisparse_tpu.formats.csr import argsort_rows_by_nnz, permute_rows, csr_to_csc


def assert_same_matrix(a: CSRMatrix, b: CSRMatrix):
    # duplicate (row,col) entries are summed on both sides; float summation
    # order may differ, so compare with a tiny relative tolerance
    A = a.to_scipy(); B = b.to_scipy()
    d = np.abs((A - B[:A.shape[0], :A.shape[1]]).toarray()).max()
    scale = max(np.abs(A.toarray()).max(), 1.0)
    assert d <= 1e-6 * scale, d


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
    """Every wave obeys the scheduling invariants: each gather slot (src
    lane) serves exactly one column; dest slots sharing a src lane share
    that column (broadcast)."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=32)
    m = powerlaw_csr(400, 2000, 8, seed=11)
    wp = pack(m, cfg)
    G = cfg.groups
    for t in range(wp.num_tiles):
        packed = (wp.idxT[t].reshape(G, 128, 128).swapaxes(1, 2)
                  .reshape(cfg.sublanes, 128))
        src = packed >> 11
        bh = packed & 0x7FF
        v = wp.vals[t]
        for s in range(cfg.sublanes):
            lanes = np.nonzero(v[s] != 0)[0]
            if lanes.size == 0:
                continue
            srcs = src[s, lanes]
            # all dest slots pulling from the same gather lane read the same
            # (b,h) there, i.e. one column per gather slot per wave
            cols = bh[s, srcs].astype(np.int64) * 128 + srcs
            pairs = set(zip(srcs.tolist(), cols.tolist()))
            assert len(pairs) == len(np.unique(srcs))


def test_rmat_generator():
    from hisparse_tpu import rmat_csr
    m = rmat_csr(2000, 2000, 8, seed=3)
    assert m.num_rows == m.num_cols == 2000
    # close to the edge target (duplicates collapse a few percent)
    assert 0.8 * 2000 * 8 <= m.nnz <= 2000 * 8
    assert m.indices.max() < 2000
    deg = m.row_nnz()
    # Kronecker skew: the top percentile dominates the median
    assert np.percentile(deg, 99) > 4 * max(np.median(deg), 1)
    # pack/decode roundtrip
    wp = pack(m, SpmvConfig(sublanes=128, bank_blocks=2, stripes=128),
              split_max="auto", col_order="degree")
    assert_same_matrix(decode(wp), m)


def test_block_structured_generator():
    from hisparse_tpu import block_structured_csr
    m = block_structured_csr(1024, 1024, block_rows=3, seed=7)
    assert m.nnz > 0
    # nonzeros confined to 3 blocks per block-row
    rows = np.repeat(np.arange(m.num_rows), m.row_nnz())
    key = (rows // 128) * (m.num_cols // 128) + m.indices // 128
    import collections
    per_brow = collections.Counter((k // (m.num_cols // 128)) for k in
                                   set(key.tolist()))
    assert max(per_brow.values()) <= 3


def test_native_matches_python_scheduler():
    """The fused native pack pipeline (_scheduler.cpp: field build, radix
    sort, wave scheduling, emission, tile metadata) is byte-identical to
    the pure-Python twin, across multi-block/multi-part geometry, split
    rows and column ordering."""
    from hisparse_tpu.formats import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = powerlaw_csr(num_rows=cfg.rows_per_block + 777,
                     num_cols=cfg.vb_cols + 3000,
                     avg_nnz_per_row=6, seed=3)
    wp_n = pack(m, cfg, split_max=16, col_order="degree")
    orig_avail = native.available
    native.available = lambda: False
    try:
        wp_p = pack(m, cfg, split_max=16, col_order="degree")
    finally:
        native.available = orig_avail
    assert wp_n.vals.tobytes() == wp_p.vals.tobytes()
    assert wp_n.idxT.tobytes() == wp_p.idxT.tobytes()
    assert np.array_equal(wp_n.perm, wp_p.perm)
    for f in ("tile_block", "tile_part", "tile_first", "tile_last"):
        assert np.array_equal(getattr(wp_n, f), getattr(wp_p, f)), f


def test_native_emission_matches_numpy():
    """The fused native emission is byte-identical to the numpy
    scatter+transpose fallback, across steal_mantissa / block_major /
    fixed / min_plus configs."""
    from hisparse_tpu.formats import native
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    from hisparse_tpu.ops.golden import float_to_fixed
    import hisparse_tpu.formats.wavepack as wpmod
    configs = [
        SpmvConfig(sublanes=128, bank_blocks=2, stripes=32),
        SpmvConfig(sublanes=256, bank_blocks=2, stripes=64,
                   steal_mantissa=True),
        SpmvConfig(sublanes=128, bank_blocks=4, stripes=128,
                   block_major=True, classes_per_group=2,
                   steal_mantissa=True),
        SpmvConfig(sublanes=128, bank_blocks=1, stripes=32, dtype="fixed",
                   two_choice=False),
        SpmvConfig(sublanes=128, bank_blocks=2, stripes=32,
                   semiring="min_plus"),
    ]
    for i, cfg in enumerate(configs):
        m = powerlaw_csr(500, 1500, 6, seed=20 + i)
        if cfg.dtype == "fixed":
            m = CSRMatrix(m.num_rows, m.num_cols,
                          float_to_fixed(np.abs(m.data) * 0.1), m.indices,
                          m.indptr)
        wp_native = pack(m, cfg)
        orig_avail = native.available
        native.available = lambda: False
        try:
            wp_numpy = pack(m, cfg)
        finally:
            native.available = orig_avail
        assert wp_native.vals.tobytes() == wp_numpy.vals.tobytes(), cfg
        assert wp_native.idxT.tobytes() == wp_numpy.idxT.tobytes(), cfg


def test_hub_split_roundtrip():
    from hisparse_tpu.formats.csr import split_rows
    m = powerlaw_csr(500, 800, 12, alpha=1.1, seed=9)
    m2, row_map = split_rows(m, 16)
    assert m2.row_nnz().max() <= 16
    assert m2.nnz == m.nnz
    # virtual rows reassemble
    import scipy.sparse as sp
    S = sp.csr_matrix((np.ones(m2.num_rows), (row_map, np.arange(m2.num_rows))),
                      shape=(m.num_rows, m2.num_rows))
    back = S @ m2.to_scipy()
    assert np.abs((back - m.to_scipy()).toarray()).max() <= 1e-6


def test_pack_with_split_decode():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = powerlaw_csr(600, 900, 10, alpha=1.1, seed=10)
    wp = pack(m, cfg, split_max=32)
    assert_same_matrix(m, decode(wp))


def test_column_hub_dedupe():
    """A single hot column must not serialize waves (gather-slot sharing)."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    rows = 1000
    # every row has the same single column 7
    m = CSRMatrix(rows, 128, np.ones(rows, np.float32),
                  np.full(rows, 7, np.int32),
                  np.arange(rows + 1, dtype=np.int64))
    wp = pack(m, cfg)
    assert wp.num_tiles == 1  # broadcast handled in one wave per stripe
    assert_same_matrix(m, decode(wp))


def test_wavepack_save_load(tmp_path):
    from hisparse_tpu.formats.wavepack import save_wavepack, load_wavepack
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(300, 400, 6, seed=12)
    wp = pack(m, cfg, split_max=32)
    p = tmp_path / "wp.npz"
    save_wavepack(p, wp)
    wp2 = load_wavepack(p)
    assert wp2.config == wp.config
    assert np.array_equal(wp2.vals, wp.vals)
    assert np.array_equal(wp2.idxT, wp.idxT)
    assert np.array_equal(wp2.perm, wp.perm)
    assert_same_matrix(decode(wp2), decode(wp))


def test_scheduler_traffic_patterns():
    """The shuffle-testbench traffic suite analog
    (unit_tests/test_shuffle.cpp:440-543: uniform / rotated / N-hot-lane
    conflict / random), applied to the wave scheduler: every pattern must
    schedule within 2x of its edge-coloring lower bound."""
    from hisparse_tpu.formats.wavepack import _schedule
    rng = np.random.default_rng(13)
    n = 128 * 64

    def run(bank, lam, addr=None):
        stripe = np.zeros(n, np.int32)
        addr = np.zeros(n, np.int32) if addr is None else addr
        order = np.lexsort((np.arange(n), addr, bank, stripe))
        k, _ch = _schedule(stripe[order], lam[order], bank[order],
                           addr[order])
        waves = int(k.max()) + 1
        rows_max = np.bincount(lam, minlength=128).max()
        cols = np.unique(np.stack([bank, addr]), axis=1)
        bank_max = np.bincount(cols[0], minlength=128).max()
        lower = max(rows_max, bank_max)
        return waves, lower

    lam = np.tile(np.arange(128, dtype=np.int32), 64)
    # uniform: bank == lane
    waves, lower = run(lam.copy(), lam)
    assert waves <= 2 * lower
    # rotated: bank = lane + 1 mod 128
    waves, lower = run(((lam + 1) % 128).astype(np.int32), lam)
    assert waves <= 2 * lower
    # conflict: all traffic to one bank, distinct addresses (no dedupe)
    addr = np.arange(n, dtype=np.int32) % 97
    waves, lower = run(np.zeros(n, np.int32), lam, addr)
    assert waves <= 2 * lower
    # random
    waves, lower = run(rng.integers(0, 128, n).astype(np.int32), lam,
                       rng.integers(0, 256, n).astype(np.int32))
    assert waves <= 2 * lower


def test_wavepack_save_load_nondefault(tmp_path):
    """Persistence must round-trip EVERY config field + the class map
    (round-1 regression: only geometry was saved, so GRAPH_CONFIG / min_plus
    / two_choice=False packs silently reloaded wrong)."""
    from hisparse_tpu.formats.wavepack import save_wavepack, load_wavepack
    m = powerlaw_csr(400, 20000, 6, seed=21)
    configs = [
        SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                   block_major=True, classes_per_group=2,
                   steal_mantissa=True),
        SpmvConfig(sublanes=128, bank_blocks=1, stripes=64,
                   semiring="min_plus", two_choice=False),
        SpmvConfig(sublanes=128, bank_blocks=1, stripes=64, dtype="fixed",
                   two_choice=False),
    ]
    for i, cfg in enumerate(configs):
        mm = m
        if cfg.dtype == "fixed":
            from hisparse_tpu.ops.golden import float_to_fixed
            mm = CSRMatrix(m.num_rows, m.num_cols, float_to_fixed(m.data),
                           m.indices, m.indptr)
        wp = pack(mm, cfg, split_max=32)
        p = tmp_path / f"wp{i}.npz"
        save_wavepack(p, wp)
        wp2 = load_wavepack(p)
        assert wp2.config == wp.config
        assert np.array_equal(wp2.vals, wp.vals)
        assert np.array_equal(wp2.idxT, wp.idxT)
        assert np.array_equal(wp2.perm, wp.perm)
        if wp.class_map is not None:
            assert np.array_equal(wp2.class_map, wp.class_map)
        else:
            assert wp2.class_map is None
        if cfg.dtype != "fixed":
            assert_same_matrix(decode(wp2), decode(wp))


def test_hybrid_multisegment_metadata():
    """pack_hybrid with several (block, part) segments: tile block/part
    metadata must come from the pre-filter segment starts (round-1
    regression: leftover filtering re-indexed bo/po under seg_starts)."""
    from hisparse_tpu.formats.wavepack import pack_hybrid
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     block_major=True, classes_per_group=2)
    # rows > RPB (16384) -> 2 blocks; cols > VB (16384) -> 2 partitions
    m = powerlaw_csr(20000, 20000, 4, alpha=1.3, seed=22)
    wp_bulk, wp_tail = pack_hybrid(m, cfg, split_max=None, stop_frac=0.5)
    assert wp_bulk.n_blocks == 2 and wp_bulk.n_parts == 2
    a = decode(wp_bulk).to_scipy() + decode(wp_tail).to_scipy()
    d = np.abs((a - m.to_scipy()).toarray()).max()
    assert d <= 1e-6, d


def test_unpack_fixed_saturating():
    """Hub-split partial recombine for the fixed dtype must saturate, not
    wrap (ap_ufixed AP_SAT semantics)."""
    from hisparse_tpu.formats.wavepack import Wavepack
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     dtype="fixed", two_choice=False)
    z = np.zeros((1, 128, 128), np.uint32)
    perm = np.full(cfg.rows_per_block, 1, np.int64)  # 1 == num_rows: padding
    perm[0] = 0
    perm[1] = 0   # two virtual rows of original row 0
    wp = Wavepack(cfg, 1, 128, 1, 1, perm, z,
                  np.zeros((1, 128, 128), np.int32),
                  np.zeros(1, np.int32), np.zeros(1, np.int32),
                  np.ones(1, np.int32), np.ones(1, np.int32), nnz=0)
    y = np.zeros(cfg.rows_per_block, np.uint32)
    y[0] = 0xF0000000
    y[1] = 0xF0000000
    out = wp.unpack_y(y)
    assert out.dtype == np.uint32
    assert out[0] == 0xFFFFFFFF   # saturates; wrapping would give 0xE0000000


def test_pack_decode_colsort():
    """Degree-descending column order round-trips through the oracle."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2)
    m = powerlaw_csr(500, 30000, 8, alpha=1.3, seed=30)
    wp = pack(m, cfg, split_max=16, col_order="degree")
    assert wp.col_order is not None
    assert_same_matrix(m, decode(wp))


def test_bf16_stream_dtype():
    """dtype='bf16' emits real bfloat16 value streams (6 bytes/slot), with
    byte-equal native/Python twins, a decode oracle within bf16 rounding,
    and save/load round-trip.  The analog of the reference's reduced-
    precision float overlays (spmv-fp/libfpga/common.h:26)."""
    import ml_dtypes
    from hisparse_tpu.formats import native
    from hisparse_tpu.formats.wavepack import save_wavepack, load_wavepack
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=64, dtype="bf16")
    m = powerlaw_csr(800, 1800, 7, seed=31)
    wp = pack(m, cfg, split_max=16)
    assert wp.vals.dtype == ml_dtypes.bfloat16
    assert wp.stream_bytes == wp.num_tiles * cfg.tile_slots * 6
    if native.available():
        orig = native.available
        native.available = lambda: False
        try:
            wp_p = pack(m, cfg, split_max=16)
        finally:
            native.available = orig
        assert wp.vals.tobytes() == wp_p.vals.tobytes()
        assert wp.idxT.tobytes() == wp_p.idxT.tobytes()
    d = np.abs((decode(wp).to_scipy() - m.to_scipy()).toarray()).max()
    assert d <= 0.005 * np.abs(m.data).max()     # one bf16 rounding
    import pytest
    with pytest.raises(ValueError):
        SpmvConfig(dtype="bf16", steal_mantissa=True)


def test_bf16_spmv_vs_golden(tmp_path):
    from hisparse_tpu.ops.spmv import SpmvOperator
    from hisparse_tpu.ops.golden import spmv_f64
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=64, dtype="bf16")
    m = powerlaw_csr(800, 1800, 7, seed=32)
    wp = pack(m, cfg, split_max=16)
    x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
    y = SpmvOperator(wp, interpret=True)(x)
    ref = spmv_f64(m, x)
    err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
    assert y.dtype == np.float32          # fp32 accumulate
    assert err < 8e-3                     # bf16 per-term rounding budget


def test_locality_row_order_roundtrip():
    """row_order='locality' (contiguous co-clustered stripes instead of the
    round-robin degree deal) round-trips through the decode oracle and
    fills at least as well as the default on a clustered-column graph."""
    from hisparse_tpu import rmat_csr
    m = rmat_csr(30000, 30000, 12, seed=17)
    cfg = SpmvConfig(sublanes=512, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2,
                     steal_mantissa=True, two_choice=False)
    wp = pack(m, cfg, split_max=16, col_order="degree",
              row_order="locality")
    d = np.abs(decode(wp).to_scipy() - m.to_scipy()).max()
    assert d <= 2e-5 * np.abs(m.data).max()
    assert 0 < wp.fill <= 1
    import pytest
    with pytest.raises(ValueError):
        pack(m, cfg, row_order="bogus")


def test_idx16_stream():
    """int16 index stream: steal_mantissa packs carry only b(4)|h(7) per
    idx word, so idx16 emits 6 B/slot (fp32 values).  Decode roundtrip,
    native/Python twin byte-equality, save/load persistence, and the
    config guard (non-steal packs need the 7-bit src field too)."""
    import pytest
    from hisparse_tpu.formats import native
    from hisparse_tpu.formats.wavepack import save_wavepack, load_wavepack
    m = powerlaw_csr(900, 1800, 8, alpha=1.2, seed=34)
    for cfg in (
        SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                   steal_mantissa=True, two_choice=True, idx16=True),
        SpmvConfig(sublanes=128, bank_blocks=4, stripes=128,
                   block_major=True, classes_per_group=2, two_choice=False,
                   steal_mantissa=True, idx16=True),
    ):
        wp = pack(m, cfg, split_max=16, col_order="degree")
        assert wp.idxT.dtype == np.int16
        assert wp.stream_bytes == wp.num_tiles * cfg.tile_slots * 6
        d = np.abs(decode(wp).to_scipy() - m.to_scipy()).max()
        assert d <= 2e-5 * np.abs(m.data).max()   # mantissa-steal budget
        if native.available():
            orig_avail = native.available
            native.available = lambda: False
            try:
                wp_p = pack(m, cfg, split_max=16, col_order="degree")
            finally:
                native.available = orig_avail
            assert wp_p.idxT.dtype == np.int16
            assert wp.vals.tobytes() == wp_p.vals.tobytes()
            assert wp.idxT.tobytes() == wp_p.idxT.tobytes()
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "wp16.npz")
        save_wavepack(p, wp)
        wp2 = load_wavepack(p)
        assert wp2.config.idx16 and wp2.idxT.dtype == np.int16
        assert np.array_equal(wp2.idxT, wp.idxT)
    with pytest.raises(ValueError):
        SpmvConfig(sublanes=128, bank_blocks=2, stripes=128, idx16=True)


def test_idx16_spmv_vs_golden():
    """End-to-end idx16 SpMV through the interpret kernel (csim oracle):
    the kernel widens the int16 tile in VMEM and decodes identically."""
    from hisparse_tpu.ops.spmv import SpmvOperator
    from hisparse_tpu.ops.golden import spmv_f64
    for cfg in (
        SpmvConfig(sublanes=128, bank_blocks=2, stripes=64,
                   steal_mantissa=True, two_choice=True, idx16=True),
        SpmvConfig(sublanes=256, bank_blocks=4, stripes=128,
                   block_major=True, classes_per_group=2, two_choice=True,
                   steal_mantissa=True, idx16=True),
    ):
        m = powerlaw_csr(900, 2500, 7, seed=35)
        wp = pack(m, cfg, split_max=16)
        x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
        y = SpmvOperator(wp, interpret=True)(x)
        ref = spmv_f64(m, x)
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
        assert err < 1e-4, err


def test_scheduler_window_twin_and_roundtrip():
    """Non-default rolling-window settings (bm_win/bm_adv) keep the C++
    and Python block-major scheduler twins byte-identical and the packed
    stream decodable — the window is a tuned per-pack parameter threaded
    to both twins, not a global constant."""
    from hisparse_tpu.formats import native
    cfg = SpmvConfig(sublanes=128, bank_blocks=4, stripes=128,
                     block_major=True, classes_per_group=2,
                     two_choice=False)
    m = powerlaw_csr(2000, 2000, 15, alpha=1.2, seed=31)
    for w, a in ((1, 1), (64, 2), (5, 3)):
        wp_n = pack(m, cfg, split_max=32, col_order="degree",
                    bm_win=w, bm_adv=a)
        assert_same_matrix(m, decode(wp_n))
        if not native.available():
            continue
        orig_avail = native.available
        native.available = lambda: False
        try:
            wp_p = pack(m, cfg, split_max=32, col_order="degree",
                        bm_win=w, bm_adv=a)
        finally:
            native.available = orig_avail
        assert wp_n.vals.tobytes() == wp_p.vals.tobytes(), (w, a)
        assert wp_n.idxT.tobytes() == wp_p.idxT.tobytes(), (w, a)
        assert np.array_equal(wp_n.class_map, wp_p.class_map), (w, a)
