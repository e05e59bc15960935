"""Seeded config/matrix fuzz: every sampled design point must round-trip
the format oracle and match the golden through the real (interpreted)
kernel.  Catches cross-feature interactions (two-choice x block-major x
splitting x partitions) that targeted tests miss."""
import numpy as np
import pytest

from hisparse_tpu import SpmvConfig, powerlaw_csr, uniform_sparse_csr, pack, decode, spmv
from hisparse_tpu.ops.golden import spmv_f64

CASES = []
_rng = np.random.default_rng(2026)
for i in range(16):
    S = int(_rng.choice([128, 256]))
    bm = bool(_rng.integers(0, 2))
    R = int(_rng.choice([128] if bm else [8, 32, 128]))
    R = min(R, S)
    B = int(_rng.choice([1, 2, 4]))
    tc = bool(_rng.integers(0, 2))
    k = int(_rng.choice([1, 2, 4])) if bm else 4
    steal = bool(_rng.integers(0, 2))
    i16 = steal and bool(_rng.integers(0, 2))   # idx16 needs steal_mantissa
    split = _rng.choice([None, "auto", 16])
    CASES.append((i, S, R, B, tc, bm, k, steal, i16, split))


@pytest.mark.parametrize("i,S,R,B,tc,bm,k,steal,i16,split", CASES)
def test_fuzz_roundtrip_and_spmv(i, S, R, B, tc, bm, k, steal, i16,
                                 split):
    cfg = SpmvConfig(sublanes=S, stripes=R, bank_blocks=B, two_choice=tc,
                     block_major=bm, classes_per_group=k,
                     steal_mantissa=steal, idx16=i16)
    rng = np.random.default_rng(100 + i)
    if i % 2:
        m = powerlaw_csr(int(rng.integers(50, 900)),
                         int(rng.integers(200, cfg.vb_cols + 700)),
                         float(rng.integers(2, 12)), alpha=1.2, seed=i)
    else:
        m = uniform_sparse_csr(int(rng.integers(50, 900)),
                               int(rng.integers(200, cfg.vb_cols + 700)),
                               int(rng.integers(2, 30)), seed=i)
    wp = pack(m, cfg, split_max=None if split is None else split)
    # format oracle (steal loses 7 mantissa bits by design)
    dec = decode(wp)
    d = np.abs((m.to_scipy() - dec.to_scipy()).toarray()).max()
    scale = max(np.abs(m.data).max() if m.nnz else 1.0, 1.0)
    # duplicates sum two stolen-mantissa perturbations
    tol = 5e-5 if steal else 1e-6
    assert d <= tol * scale, f"decode mismatch {d}"
    # kernel vs golden
    x = rng.random(m.num_cols).astype(np.float32)
    y = spmv(wp, x, interpret=True)
    ref = spmv_f64(m, x)
    rs = max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(y, ref, atol=1e-4 * rs, rtol=1e-4)


@pytest.mark.parametrize("i,S,R,B,tc,bm,k,steal,i16,split", CASES[:6])
def test_fuzz_tiles_per_step(i, S, R, B, tc, bm, k, steal, i16, split,
                             monkeypatch):
    """Same sampled design points, forced tb batching on both variants."""
    from hisparse_tpu.ops.spmv import SpmvOperator

    cfg = SpmvConfig(sublanes=S, stripes=R, bank_blocks=B, two_choice=tc,
                     block_major=bm, classes_per_group=k,
                     steal_mantissa=steal, idx16=i16)
    rng = np.random.default_rng(100 + i)
    if i % 2:
        m = powerlaw_csr(int(rng.integers(50, 900)),
                         int(rng.integers(200, cfg.vb_cols + 700)),
                         float(rng.integers(2, 12)), alpha=1.2, seed=i)
    else:
        m = uniform_sparse_csr(int(rng.integers(50, 900)),
                               int(rng.integers(200, cfg.vb_cols + 700)),
                               int(rng.integers(2, 30)), seed=i)
    wp = pack(m, cfg, split_max=None if split is None else split)
    x = rng.random(m.num_cols).astype(np.float32)
    ref = spmv_f64(m, x)
    rs = max(np.abs(ref).max(), 1.0)
    monkeypatch.setenv("WP_TB", str(int(_rng.choice([2, 4]))))
    for variant in ("resident", "paged"):
        y = SpmvOperator(wp, interpret=True, variant=variant)(x)
        np.testing.assert_allclose(y, ref, atol=1e-4 * rs, rtol=1e-4,
                                   err_msg=variant)
