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


# wavepack prior for the cheap bound: typical fill and the calibrated-table
# stream rate; only used to decide whether the decision is close enough to
# warrant a real sampled pack (see choose_format)
_WAVE_FILL_PRIOR = 0.5
_WAVE_GBPS_PRIOR = 300.0


def wavepack_time_per_nnz(m: CSRMatrix, sample_rows_max: int = 8192) -> float:
    """Model-calibrated wavepack cost in ns/nnz: pack a row sample at the
    regime-default design points and take the perf model's best time/nnz
    (models/perf_model.estimate_pack — fed with the REAL fill/alpha of the
    sampled pack and the calibrated slot-rate table, the analog of the
    reference's instrumented-csim cost, performance_model.cpp:430-444).

    Row samples overestimate fill slightly (fewer distinct columns per
    bank), so this bound is mildly optimistic for wavepack — acceptable for
    format dispatch where the dense/bcsr arms are exact byte counts."""
    from ..config import SpmvConfig
    from ..formats.wavepack import pack
    from ..models.dse import sample_rows
    from ..models.perf_model import estimate_pack

    ms = sample_rows(m, sample_rows_max)
    avg = ms.nnz / max(ms.num_rows, 1)
    cands = [
        # dense-rows regime point (bench.py density>=0.05 default)
        (SpmvConfig(sublanes=512, bank_blocks=2, stripes=4,
                    two_choice=True), "auto"),
    ]
    bm = SpmvConfig(sublanes=512, bank_blocks=8, stripes=128,
                    two_choice=False, block_major=True, classes_per_group=2,
                    steal_mantissa=True)
    if ms.num_rows >= bm.rows_per_block // 8:
        split = max(8, (1 << int(round(np.log2(max(avg, 1.0))))) // 2)
        cands.append((bm, split))
    best = np.inf
    for cfg, split in cands:
        wp = pack(ms, cfg, split_max=split, col_order="degree")
        est = estimate_pack(wp)
        best = min(best, est.time_s / max(wp.nnz, 1) * 1e9)
    return best


def choose_format(m: CSRMatrix, sample_nnz: int = 4_000_000,
                  calibrate: bool = True) -> str:
    """Three-way format dispatch: 'wavepack' | 'bcsr' | 'dense'.

    Compares estimated device time per nonzero (ns/nnz).  The dense and
    bcsr arms are exact byte counts over measured stream rates:

      dense     2 B/cell bf16 / density          @ ~720 GB/s (MXU stream)
      bcsr      32 KB per nonempty (128,128) block / nnz  @ ~700 GB/s

    The wavepack arm starts from a cheap prior (8 B/slot at fill ~0.5 over
    ~300 GB/s) and, when the prior lands within 2.5x of the best
    alternative — the regime where the prior's fixed fill constant can
    misroute — is re-evaluated by the analytical perf model on a real
    sampled pack (wavepack_time_per_nnz), so the crossover tracks the
    matrix's actual fill/alpha and the chip's calibrated slot rates
    instead of hard-coded constants.

    The nonempty-block count (the block-fill heuristic) is computed exactly
    up to ``sample_nnz`` nonzeros and estimated from an nnz sample above
    that.  Dense-vs-wavepack crossover lands near density ~5% — the regime
    where the measured dense and sparse paths tie on the pruned-NN suite;
    bcsr wins only when nonzeros cluster into few blocks (structured
    pruning)."""
    density = m.nnz / max(m.num_rows * m.num_cols, 1)
    if m.nnz == 0:
        return "wavepack"
    nbc = -(-m.num_cols // 128)
    if m.nnz <= sample_nnz:
        rows = np.repeat(np.arange(m.num_rows), m.row_nnz())
        key = (rows // 128).astype(np.int64) * nbc + m.indices // 128
        nb = np.unique(key).size
    else:
        take = np.linspace(0, m.nnz - 1, sample_nnz).astype(np.int64)
        rows = np.searchsorted(m.indptr, take, side="right") - 1
        key = (rows // 128).astype(np.int64) * nbc + m.indices[take] // 128
        # sampled distinct-block count underestimates; scale by the
        # coupon-collector correction for a uniform fallback
        nb_s = np.unique(key).size
        nb = int(nb_s * max(1.0, m.nnz / sample_nnz) ** 0.5)
    t_dense = (2.0 / max(density, 1e-12)) / 720.0
    t_bcsr = (2.0 * 128 * 128 * nb / m.nnz) / 700.0
    t_wave = (8.0 / _WAVE_FILL_PRIOR) / _WAVE_GBPS_PRIOR
    t_alt = min(t_dense, t_bcsr)
    if calibrate and t_alt / 2.5 < t_wave < t_alt * 2.5:
        t_wave = wavepack_time_per_nnz(m)
    best = min(("wavepack", t_wave), ("bcsr", t_bcsr), ("dense", t_dense),
               key=lambda kv: kv[1])
    return best[0]
