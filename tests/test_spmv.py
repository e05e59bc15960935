"""End-to-end SpMV kernel tests in interpret mode vs the CPU golden,
mirroring the reference's testcase suite (spmv_csim/csim.cpp:597-613:
dense small, uniform sparse, plus skew) at tolerance 1e-4 (sw/host.cpp:62)."""
import numpy as np
import pytest

from hisparse_tpu import (SpmvConfig, dense_csr, uniform_sparse_csr,
                          powerlaw_csr, pack, spmv)
from hisparse_tpu.ops.golden import spmv_f64

CFG = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)


def check(m, cfg=CFG, seed=0, tol=1e-4):
    rng = np.random.default_rng(seed)
    x = rng.random(m.num_cols).astype(np.float32)
    wp = pack(m, cfg)
    y = spmv(wp, x, interpret=True)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y, ref, atol=tol * scale, rtol=tol)


def test_basic_dense_small():
    check(dense_csr(128, 128, val=0.25))          # test_basic (csim.cpp:600)


def test_uniform_small():
    check(uniform_sparse_csr(256, 256, 10, seed=1))  # test_medium analog


def test_uniform_rect():
    check(uniform_sparse_csr(100, 700, 7, seed=2))


def test_powerlaw():
    check(powerlaw_csr(300, 300, 6, seed=3))


def test_multipart_multiblock():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=32)
    m = powerlaw_csr(cfg.rows_per_block + 100, cfg.vb_cols + 300, 5, seed=4)
    check(m, cfg)


def test_nn_style_config():
    # dense-ish rows, few of them: stripes < sublanes exercises the
    # flush-time stripe reduction
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=4)
    m = uniform_sparse_csr(40, 1000, 120, seed=5)
    check(m, cfg)


def test_multiblock_bank2():
    cfg = SpmvConfig(sublanes=256, bank_blocks=2, stripes=32)
    m = powerlaw_csr(cfg.rows_per_block * 2 - 10, cfg.vb_cols + 17, 4, seed=6)
    check(m, cfg)


def test_zero_matrix():
    from hisparse_tpu import CSRMatrix
    m = CSRMatrix(50, 60, np.zeros(0, np.float32), np.zeros(0, np.int32),
                  np.zeros(51, np.int64))
    check(m)


def test_paged_variant_matches():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=32)
    m = powerlaw_csr(cfg.rows_per_block + 50, cfg.vb_cols + 200, 5, seed=7)
    rng = np.random.default_rng(7)
    x = rng.random(m.num_cols).astype(np.float32)
    wp = pack(m, cfg)
    y = spmv(wp, x, interpret=True, variant="paged")
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)


def test_split_hub_end_to_end():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(500, 700, 10, alpha=1.1, seed=8)
    rng = np.random.default_rng(8)
    x = rng.random(m.num_cols).astype(np.float32)
    y = spmv(pack(m, cfg, split_max=16), x, interpret=True)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)


def test_steal_mantissa_path():
    """Fast path: crossbar src lane in the values' low mantissa bits
    (<=2^-17 relative value perturbation, well inside 1e-4)."""
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     steal_mantissa=True)
    m = powerlaw_csr(400, 500, 7, seed=9)
    check(m, cfg, seed=9, tol=1e-4)


def test_block_major_variants():
    """Class-group (block-major) kernel: k gathers per group driven by the
    packed class map, cross-class two-choice."""
    for k, tc in [(1, False), (2, True), (4, True)]:
        cfg = SpmvConfig(sublanes=256, bank_blocks=2, stripes=128,
                         block_major=True, classes_per_group=k,
                         two_choice=tc)
        m = powerlaw_csr(400, 20000, 6, seed=11)
        check(m, cfg, seed=11)


def test_mxu_transpose_matches_vpu():
    """The MXU identity-matmul group transpose (hi/lo bf16 split) agrees
    with the exact VPU transpose within the steal-mantissa error budget,
    and engages only on steal_mantissa fp32 plus_times."""
    import hisparse_tpu.ops.spmv as spmv_mod
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2,
                     steal_mantissa=True, two_choice=True)
    m = powerlaw_csr(500, 3000, 6, seed=13)
    rng = np.random.default_rng(13)
    x = rng.random(m.num_cols).astype(np.float32)
    wp = pack(m, cfg)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    ys = {}
    orig = spmv_mod._TRANSPOSE_MODE
    try:
        for mode in ("vpu", "mxu"):
            spmv_mod._TRANSPOSE_MODE = mode
            spmv_mod._spmv_call.clear_cache()
            ys[mode] = spmv(wp, x, interpret=True)
            np.testing.assert_allclose(ys[mode], ref, atol=1e-4 * scale,
                                       rtol=1e-4)
    finally:
        spmv_mod._TRANSPOSE_MODE = orig
        spmv_mod._spmv_call.clear_cache()
    assert np.abs(ys["mxu"] - ys["vpu"]).max() <= 1e-4 * scale


def test_block_major_multiblock_paged():
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2, two_choice=True)
    m = powerlaw_csr(2000, cfg.vb_cols + 500, 5, seed=12)
    rng = np.random.default_rng(12)
    x = rng.random(m.num_cols).astype(np.float32)
    wp = pack(m, cfg)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    for variant in ("resident", "paged"):
        y = spmv(wp, x, interpret=True, variant=variant)
        np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)


def test_hybrid_pack_matches_golden():
    """Experimental bulk+tail hybrid: block-major bulk with early stop,
    select-chain tail, summed in shared renamed space."""
    from hisparse_tpu.formats.wavepack import pack_hybrid
    from hisparse_tpu.ops.spmv import HybridSpmv
    cfg = SpmvConfig(sublanes=128, bank_blocks=4, stripes=128,
                     block_major=True, classes_per_group=2, two_choice=True)
    m = powerlaw_csr(2000, 30000, 8, alpha=1.3, seed=5)
    wb, wt = pack_hybrid(m, cfg, stop_frac=0.3)
    assert wb.nnz + wt.nnz == m.nnz
    op = HybridSpmv(wb, wt, interpret=True)
    rng = np.random.default_rng(5)
    x = rng.random(m.num_cols).astype(np.float32)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(op(x), ref, atol=1e-4 * scale, rtol=1e-4)


def test_paged_empty_block_initialized():
    """Blocks that receive no tiles must still hold the semiring identity
    (round-1 regression: the paged kernel left them uninitialized).
    min_plus makes the identity inf, so a zero-filled buffer would fail even
    under the interpreter."""
    from hisparse_tpu import CSRMatrix
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                     semiring="min_plus")
    rows = cfg.rows_per_block + 50   # 2 blocks
    # a single nonzero row -> only block 0 receives tiles
    m = CSRMatrix(rows, 200, np.array([2.5, 1.0], np.float32),
                  np.array([3, 7], np.int32),
                  np.r_[0, 2, np.full(rows - 1, 2)].astype(np.int64))
    x = np.arange(200, dtype=np.float32)
    wp = pack(m, cfg)
    y = spmv(wp, x, interpret=True, variant="paged")
    assert y[0] == pytest.approx(min(2.5 + x[3], 1.0 + x[7]))
    assert np.isinf(y[1:]).all()   # empty rows = min over nothing = inf


def test_colsort_operator_auto_permute():
    """pack(col_order='degree') + SpmvOperator feeds natural x: the operator
    permutes x into packed column space on device."""
    from hisparse_tpu.ops.spmv import SpmvOperator
    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     block_major=True, classes_per_group=2,
                     steal_mantissa=True)
    m = powerlaw_csr(600, 30000, 8, alpha=1.3, seed=31)
    wp = pack(m, cfg, split_max=16, col_order="degree")
    rng = np.random.default_rng(31)
    x = rng.random(m.num_cols).astype(np.float32)
    y = SpmvOperator(wp, interpret=True)(x)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)


def test_unpack_device_matches_host():
    """Device-side renamed->natural unpermute (one scatter-combine over the
    stored perm, the result-drain analog) matches the host recombine for
    every non-fixed semiring, including hub-split duplicate slots."""
    import jax.numpy as jnp
    from hisparse_tpu import SpmvConfig, powerlaw_csr, pack
    from hisparse_tpu.ops.spmv import SpmvOperator
    m = powerlaw_csr(700, 900, 8, alpha=1.1, seed=9)
    for sr in ("plus_times", "min_plus", "max_times"):
        cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128,
                         semiring=sr, two_choice=False)
        wp = pack(m, cfg, split_max=8)     # tight split forces duplicates
        op = SpmvOperator(wp, interpret=True)
        x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
        yr = op(x, renamed=True)
        y_dev = np.asarray(op.unpack_device(jnp.asarray(yr)))
        y_host = wp.unpack_y(np.asarray(yr))
        np.testing.assert_allclose(y_dev, y_host, atol=1e-6), sr


def test_tiles_per_step_padding(monkeypatch):
    """The resident operator batches tb tiles per grid step and pads the
    tile count with identity tiles; results must match regardless of tb
    and of whether the pad path engages (T % tb != 0)."""
    from hisparse_tpu.ops.spmv import SpmvOperator

    cfg = SpmvConfig(sublanes=128, bank_blocks=2, stripes=128,
                     two_choice=False)
    rng = np.random.default_rng(11)
    for seed in (0, 1, 2):
        m = powerlaw_csr(900 + 37 * seed, 1100, 7, seed=seed)
        x = rng.random(m.num_cols).astype(np.float32)
        wp = pack(m, cfg)
        ref = spmv_f64(m, x)
        scale = max(np.abs(ref).max(), 1.0)
        got_pad = False
        for tb in ("1", "2", "4"):
            monkeypatch.setenv("WP_TB", tb)
            op = SpmvOperator(wp, interpret=True, variant="resident")
            assert op.vals.shape[0] % op.tb == 0
            got_pad |= op.vals.shape[0] != wp.vals.shape[0]
            y = op(x)
            np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)
    assert got_pad, "no case exercised the pad path; adjust sizes"


def test_paged_tiles_per_step(monkeypatch):
    """Paged tb batching pads the stream group-aligned (every tb-group of
    tiles shares one (block, part)); results match tb=1."""
    from hisparse_tpu.ops.spmv import SpmvOperator

    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=32)
    m = powerlaw_csr(4 * cfg.rows_per_block + 50, cfg.vb_cols + 200, 5,
                     seed=7)
    rng = np.random.default_rng(7)
    x = rng.random(m.num_cols).astype(np.float32)
    wp = pack(m, cfg)
    ref = spmv_f64(m, x)
    scale = max(np.abs(ref).max(), 1.0)
    for tb in ("1", "2", "4"):
        monkeypatch.setenv("WP_TB", tb)
        op = SpmvOperator(wp, interpret=True, variant="paged")
        assert op.tb == int(tb) or int(tb) == 1 or op.tb == 1
        if op.tb > 1:
            blk = np.asarray(op.block).reshape(-1, op.tb)
            prt = np.asarray(op.part).reshape(-1, op.tb)
            assert (blk == blk[:, :1]).all() and (prt == prt[:, :1]).all()
        y = op(x)
        np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)


def test_pad_group_aligned_edges():
    from hisparse_tpu.ops.spmv import _pad_group_aligned

    S, L = 4, 8
    T = 7
    vals = np.arange(T * S * L, dtype=np.float32).reshape(T, S, L)
    idxT = np.arange(T * S * L, dtype=np.int32).reshape(T, S, L)
    part = np.array([0, 0, 0, 1, 1, 1, 1], np.int32)
    block = np.array([0, 0, 0, 0, 1, 1, 1], np.int32)
    first = np.array([1, 0, 0, 1, 1, 0, 0], np.int32)
    cmap = np.arange(T * 2, dtype=np.int32).reshape(T, 2)
    v2, i2, p2, b2, f2, c2, src = _pad_group_aligned(
        vals, idxT, part, block, first, cmap, 4, 0.0)
    assert v2.shape[0] % 4 == 0
    # src maps final positions to original tiles, -1 at pads
    assert (src >= -1).all() and sorted(src[src >= 0]) == list(range(T))
    # every group uniform in (block, part)
    pg = p2.reshape(-1, 4)
    bg = b2.reshape(-1, 4)
    assert (pg == pg[:, :1]).all() and (bg == bg[:, :1]).all()
    # real tiles keep their content and order
    keep = [t for t in range(v2.shape[0]) if (v2[t] != 0).any()]
    np.testing.assert_array_equal(np.concatenate([v2[t].ravel()
                                                  for t in keep]),
                                  vals.reshape(T, -1).ravel())
    # pad tiles: zero vals, first=0
    padm = np.ones(v2.shape[0], bool)
    padm[keep] = False
    assert (v2[padm] == 0).all() and (f2[padm] == 0).all()
    # single-run stream: only tail padding
    p1 = np.zeros(5, np.int32)
    v2, i2, p2, b2, f2, c2, src = _pad_group_aligned(
        vals[:5], idxT[:5], p1, p1, first[:5], None, 2, 0.0)
    assert v2.shape[0] == 6 and c2 is None


def test_vmem_fallback_rebuilds_paged(monkeypatch):
    """A rejected resident compile falls back to a paged rebuild and
    still produces the correct result."""
    from hisparse_tpu.ops import spmv as sp

    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=64)
    m = powerlaw_csr(800, 900, 6, seed=5)
    x = np.random.default_rng(5).random(m.num_cols).astype(np.float32)
    wp = pack(m, cfg)
    ref = spmv_f64(m, x)
    real = sp._spmv_call
    state = {}

    def fake(*a, **kw):
        if kw.get("variant") == "resident" and "failed" not in state:
            state["failed"] = True
            raise RuntimeError("RESOURCE_EXHAUSTED: VMEM")
        return real(*a, **kw)

    monkeypatch.setattr(sp, "_spmv_call", fake)
    op = sp.SpmvOperator(wp, variant="resident")   # interpret auto on CPU
    y = op(x)
    assert state.get("failed") and op.variant == "paged"
    scale = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y, ref, atol=1e-4 * scale, rtol=1e-4)
