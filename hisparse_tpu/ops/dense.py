"""Dense and block-dense (MXU) paths — the moderate-sparsity regime.

The reference's pruned-NN suite (transformer_{50..95}, 5-50% density,
bm.sh:10-17) is near the density where a dense representation wins on a
machine with a strong matmul unit: at 50% density a dense bf16 row costs
4 bytes per true nonzero vs the sparse stream's 8, and the MXU does the
multiply for free.  HiSparse has no such escape hatch (FPGA LUTs, no
systolic array); on TPU it is the idiomatic answer, so the framework
provides it as a first-class format alongside wavepack:

  * :class:`DenseOperator` — y = A @ x with A stored dense (fp32 or bf16
    with fp32 accumulation), row-padded to MXU tiles.
  * :class:`SpmmOperator` — multi-vector y = A @ X (X with k columns, the
    BCSR/SpMM batch config of BASELINE.json), same storage, full MXU
    utilization.
  * :func:`choose_format` — density-based dispatch between wavepack and
    dense (the DSE answers within-format geometry; this answers which
    format).

GOPS here still counts 2*nnz(A_sparse)/t like the reference
(benchmark.cpp:314) so the comparison stays honest.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.csr import CSRMatrix


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("prec",))
def _matvec(a, x, prec="fp32"):
    return jnp.dot(a, x, preferred_element_type=jnp.float32)


class DenseOperator:
    """y = A @ x on the MXU from a CSR input densified at pack time."""

    def __init__(self, m: CSRMatrix, dtype: str = "bf16"):
        self.num_rows, self.num_cols = m.num_rows, m.num_cols
        self.nnz = m.nnz
        rows = _round_up(max(m.num_rows, 1), 8)
        cols = _round_up(max(m.num_cols, 1), 128)
        dense = np.zeros((rows, cols), np.float32)
        r = np.repeat(np.arange(m.num_rows), m.row_nnz())
        dense[r, m.indices] = m.data
        jdt = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        self.a = jnp.asarray(dense, jdt)
        self.dtype = dtype
        self.stream_bytes = self.a.nbytes

    def __call__(self, x, renamed: bool = False):
        del renamed  # no renaming in the dense path
        xj = jnp.asarray(x, self.a.dtype)
        xp = jnp.pad(xj, (0, self.a.shape[1] - xj.shape[0]))
        y = _matvec(self.a, xp)
        return y[:self.num_rows]


class SpmmOperator:
    """Multi-vector Y = A @ X (k right-hand sides) — the dense-block MXU
    batch path (BASELINE.json config: x with 64 cols)."""

    def __init__(self, m: CSRMatrix, dtype: str = "bf16"):
        self.inner = DenseOperator(m, dtype)
        self.nnz = m.nnz

    def __call__(self, X):
        a = self.inner.a
        Xj = jnp.asarray(X, a.dtype)
        Xp = jnp.pad(Xj, ((0, a.shape[1] - Xj.shape[0]), (0, 0)))
        Y = jnp.dot(a, Xp, preferred_element_type=jnp.float32)
        return Y[:self.inner.num_rows]


def choose_format(m: CSRMatrix, dense_threshold: float = 0.02) -> str:
    """'dense' when the dense bf16 stream is cheaper than the sparse one.

    Sparse stream ~= 8 bytes/nnz (4B val + 4B idx) / fill; dense bf16
    stream = 2 bytes/cell = 2/density per nnz.  With typical fill ~0.5 the
    crossover sits near density ~1/8; the default threshold is conservative
    so graphs always stay sparse.
    """
    density = m.nnz / max(m.num_rows * m.num_cols, 1)
    return "dense" if density >= dense_threshold else "wavepack"
