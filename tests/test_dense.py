"""Dense/MXU path tests (the pruned-NN regime + SpMM batch config)."""
import numpy as np

from hisparse_tpu import uniform_sparse_csr
from hisparse_tpu.ops.dense import DenseOperator, SpmmOperator, choose_format
from hisparse_tpu.ops.golden import spmv_f64


def test_dense_matvec():
    m = uniform_sparse_csr(200, 300, 30, seed=1)
    op = DenseOperator(m, dtype="fp32")
    x = np.random.default_rng(0).random(300).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op(x)), spmv_f64(m, x),
                               rtol=1e-4, atol=1e-4)


def test_dense_bf16_tolerance():
    m = uniform_sparse_csr(100, 200, 20, seed=2)
    op = DenseOperator(m, dtype="bf16")
    x = np.random.default_rng(1).random(200).astype(np.float32)
    ref = spmv_f64(m, x)
    # bf16 inputs, fp32 accumulate: ~8-bit mantissa inputs
    np.testing.assert_allclose(np.asarray(op(x)), ref, rtol=3e-2,
                               atol=3e-2 * abs(ref).max())


def test_spmm_batch():
    m = uniform_sparse_csr(150, 250, 25, seed=3)
    op = SpmmOperator(m, dtype="fp32")
    X = np.random.default_rng(2).random((250, 64)).astype(np.float32)
    Y = np.asarray(op(X))
    ref = np.stack([spmv_f64(m, X[:, k]) for k in range(64)], axis=1)
    np.testing.assert_allclose(Y, ref, rtol=1e-4, atol=1e-4 * abs(ref).max())


def test_choose_format():
    dense_m = uniform_sparse_csr(64, 64, 32, seed=4)   # 50% dense
    sparse_m = uniform_sparse_csr(1000, 10000, 5, seed=5)
    assert choose_format(dense_m) == "dense"
    assert choose_format(sparse_m) == "wavepack"


def test_choose_format_crossover_calibrated():
    """Near the dense/wavepack crossover the dispatcher re-evaluates the
    wavepack arm with the perf model on a real sampled pack instead of the
    fill-0.5 prior: the density ladder stays monotone, and in the ambiguous
    band the decision agrees with the explicit model comparison (which can
    differ from the prior's)."""
    from hisparse_tpu.ops.dense import wavepack_time_per_nnz

    picks = [choose_format(uniform_sparse_csr(512, 4096, avg, seed=8))
             for avg in (8, 2000)]
    assert picks == ["wavepack", "dense"]

    # ambiguous band: prior (16 B/nnz / 300 GB/s = 0.053 ns/nnz) and the
    # dense bound are within 2.5x, so the calibrated model must decide
    m = uniform_sparse_csr(512, 4096, 160, seed=8)
    density = m.nnz / (m.num_rows * m.num_cols)
    t_dense = (2.0 / density) / 720.0
    t_wave = wavepack_time_per_nnz(m)
    got = choose_format(m)
    if t_wave < t_dense:
        assert got == "wavepack"
    else:
        assert got in ("dense", "bcsr")


def test_bcsr_spmv():
    from hisparse_tpu.ops.bcsr import BcsrOperator
    from hisparse_tpu import powerlaw_csr
    m = powerlaw_csr(500, 700, 20, seed=6)
    op = BcsrOperator(m, interpret=True)
    x = np.random.default_rng(3).random(700).astype(np.float32)
    ref = spmv_f64(m, x)
    np.testing.assert_allclose(np.asarray(op(x)), ref, rtol=1e-4,
                               atol=1e-4 * max(abs(ref).max(), 1))


def test_bcsr_spmm_batch64():
    from hisparse_tpu.ops.bcsr import BcsrOperator
    m = uniform_sparse_csr(300, 400, 40, seed=7)
    op = BcsrOperator(m, interpret=True)
    X = np.random.default_rng(4).random((400, 64)).astype(np.float32)
    Y = np.asarray(op(X))
    ref = np.stack([spmv_f64(m, X[:, k]) for k in range(64)], axis=1)
    np.testing.assert_allclose(Y, ref, rtol=1e-4,
                               atol=1e-4 * abs(ref).max())
