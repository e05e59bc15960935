"""DiffSpmv: training-grade autodiff through the packed SpMV kernel.

The reference overlay is inference-only (sw/host.cpp:1-80 streams fixed
weights); the TPU framework additionally composes with jax.grad so the
same kernel drives fixed-mask sparse training (the pruned-transformer
suite's use case).  Checked here against dense/scipy oracles:

  * forward  y = A @ x        through the packed kernel
  * dL/dx  = A^T @ g          through a second pack of A^T
  * dL/dv[k] = g[row_k]*x[col_k]  (pattern-restricted outer product)
  * live value updates re-emit the stream (optimizer-step pattern)
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hisparse_tpu.config import SpmvConfig
from hisparse_tpu.formats.csr import uniform_sparse_csr, powerlaw_csr
from hisparse_tpu.ops.autodiff import DiffSpmv


def _grads(d, x, g):
    f, aux = d.fn()

    def loss(v, xx):
        return jnp.vdot(f(v, xx, aux), jnp.asarray(g))

    return jax.grad(loss, argnums=(0, 1))(d.v0, jnp.asarray(x))


def _refs(m, x, g):
    A = m.to_scipy()
    rows = np.repeat(np.arange(m.num_rows), np.diff(m.indptr))
    return A @ x, A.T @ g, g[rows] * x[m.indices]


@pytest.mark.parametrize("steal", [False, True])
def test_forward_and_grads(steal):
    m = powerlaw_csr(260, 301, 5.0, seed=3)
    cfg = SpmvConfig(steal_mantissa=steal)
    d = DiffSpmv(m, cfg, interpret=True)
    m = d.m  # canonical pattern (duplicates summed, zeros dropped)
    rng = np.random.default_rng(7)
    x = rng.standard_normal(m.num_cols).astype(np.float32)
    g = rng.standard_normal(m.num_rows).astype(np.float32)
    y_ref, gx_ref, gv_ref = _refs(m, x, g)
    # steal_mantissa truncates 7 mantissa bits (2^-17 relative)
    tol = 5e-4 if steal else 5e-5
    y = np.asarray(d(x))
    assert np.abs(y - y_ref).max() <= tol * max(1, np.abs(y_ref).max())
    gv, gx = _grads(d, x, g)
    assert np.abs(np.asarray(gx) - gx_ref).max() <= \
        tol * max(1, np.abs(gx_ref).max())
    # v_bar is exact gathers — no kernel, no truncation
    assert np.abs(np.asarray(gv) - gv_ref).max() <= 1e-6


def test_value_update_re_emits_stream():
    # the optimizer-step pattern: same pack, new values each call
    m = uniform_sparse_csr(190, 210, 4, seed=5)
    d = DiffSpmv(m, SpmvConfig(), interpret=True)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(m.num_cols).astype(np.float32)
    f, aux = d.fn()
    jf = jax.jit(f)
    v1 = rng.standard_normal(d.v0.shape[0]).astype(np.float32)
    s = m.to_scipy().copy()
    s.data[:] = v1
    y1 = np.asarray(jf(jnp.asarray(v1), jnp.asarray(x), aux))
    assert np.abs(y1 - s @ x).max() <= 1e-4
    # sgd step on a quadratic: loss must decrease
    y_t = rng.standard_normal(m.num_rows).astype(np.float32)

    def loss(v):
        r = f(v, jnp.asarray(x), aux) - jnp.asarray(y_t)
        return 0.5 * jnp.vdot(r, r)

    lg = jax.jit(jax.value_and_grad(loss))
    v = d.v0
    l0, gv = lg(v)
    v = v - 0.05 * gv
    l1, _ = lg(v)
    assert float(l1) < float(l0)


def test_rejects_nondiff_configs():
    m = uniform_sparse_csr(64, 64, 3, seed=1)
    with pytest.raises(ValueError):
        DiffSpmv(m, SpmvConfig(dtype="fixed"))
    with pytest.raises(ValueError):
        DiffSpmv(m, SpmvConfig(semiring="min_plus"))


def test_canonicalization_dedups_and_drops_zeros():
    import scipy.sparse as sp
    from hisparse_tpu.formats.csr import CSRMatrix
    rows = np.array([0, 0, 1, 2, 2])
    cols = np.array([1, 1, 0, 2, 3])
    vals = np.array([1.0, 2.0, 0.0, 3.0, 4.0], np.float32)
    coo = sp.coo_matrix((vals, (rows, cols)), shape=(4, 4))
    m = CSRMatrix.from_scipy(coo.tocsr())
    d = DiffSpmv(m, SpmvConfig(), interpret=True)
    # duplicates summed, explicit zero dropped -> 3 trainable values
    assert d.v0.shape[0] == 3
    x = np.arange(4, dtype=np.float32)
    y = np.asarray(d(x))
    assert np.abs(y - coo.tocsr() @ x).max() <= 1e-6
