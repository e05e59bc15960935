"""Differentiable SpMV — training-grade autodiff through the wavepack kernel.

The reference overlay is inference-only (sw/host.cpp drives fixed weights
through the bitstream); a TPU-native framework must also compose with
``jax.grad`` so the same sparse kernel can sit inside a training step —
the pruned-transformer suite (paper Table 2's NN matrices) is exactly the
fixed-sparsity-training use case.  ``DiffSpmv`` wraps the packed kernel in
a ``jax.custom_vjp`` differentiable in BOTH inputs of ``y = A @ x``:

* ``dL/dx = A^T @ g`` — runs through a second wavepack of ``A^T`` (the
  ``csr2csc`` transpose, data_loader.h:92-157), so the backward pass is
  the same conflict-free gather kernel at the same measured rate as the
  forward, not a scalar fallback;
* ``dL/dvals[k] = g[row_k] * x[col_k]`` — per-nonzero gradients need no
  kernel at all: two device gathers and a multiply over the CSR
  coordinate arrays.

The matrix values are a LIVE argument in CSR order: each call re-emits the
packed ``vals`` stream from them on device (one scatter through the
``slot_coords`` provenance map; steal-mantissa ``src`` bits are OR'd back
in), so an optimizer steps the values while the pack — schedule, index
streams, renaming — is built once.  The schedule is value-independent
(sort keys and the wave walk read only the sparsity pattern), which is
what makes the one-time pack sound under training.

All stream arrays ride as explicit jit arguments (closing over device
arrays would embed them as HLO constants — see utils/bench.py on the
remote-compile size limit).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix, csr_to_csc
from ..formats.wavepack import pack, slot_coords
from .spmv import SpmvOperator, _spmv_call


def canonicalize(m: CSRMatrix) -> CSRMatrix:
    """Sorted-indices, duplicate-summed, explicit-zero-free CSR (zero
    entries are not part of a trainable pattern: they are indistinguishable
    from pad slots in the stream)."""
    s = m.to_scipy().copy()
    s.sum_duplicates()
    s.eliminate_zeros()
    s.sort_indices()
    return CSRMatrix.from_scipy(s)


def wp_stream_map(wp):
    """(lin, rows, cols) in the matrix's CSR order for a wavepack: lin[k]
    is the flat slot position in the (T, S, 128) stream holding CSR nonzero
    k.  Valid for any stream whose REAL tiles sit at the same positions as
    ``wp``'s (tail-padding the tile count, as `_pad_tiles` does, preserves
    it)."""
    lin, rows, cols, _ = slot_coords(wp)
    order = np.lexsort((cols, rows))
    return lin[order], rows[order], cols[order]


def steal_src_bits(vals) -> np.ndarray:
    """The stolen-src low-bits plane of a steal-mantissa vals stream
    (flat int32; OR'd back into re-emitted value bits on device)."""
    bits = np.asarray(vals).view(np.uint32) & np.uint32(0x7F)
    return bits.astype(np.int32).reshape(-1)


def _stream_map(op: SpmvOperator):
    """(scatter_idx, rows, cols, src_bits) for an operator: scatter_idx[k]
    is the flat position in the PADDED operator stream holding CSR nonzero
    k (CSR order of the operator's own matrix); src_bits is the stolen-src
    low-bits plane for steal-mantissa packs (zeros elsewhere)."""
    wp = op.wp
    lin, rows, cols = wp_stream_map(wp)
    # translate wp tile space -> padded operator stream space
    S, L = wp.config.sublanes, 128
    tile_src = op.tile_src
    new_of_old = np.full(wp.num_tiles, -1, np.int64)
    real = tile_src >= 0
    new_of_old[tile_src[real]] = np.nonzero(real)[0]
    t_old = lin // (S * L)
    assert (new_of_old[t_old] >= 0).all()
    lin = lin + (new_of_old[t_old] - t_old) * (S * L)
    if op.cfg.steal_mantissa:
        src_bits = steal_src_bits(op.vals)
    else:
        src_bits = np.zeros(1, np.int32)
    return lin, rows, cols, src_bits


def _emit_vals(v, scat, src_bits, steal: bool, shape):
    """Scatter CSR-order values into the padded stream layout; pad slots
    stay at the plus_times identity (0).  Steal-mantissa packs re-plant the
    src field in the low 7 mantissa bits (the kernel reads the crossbar map
    from there) — same 2^-17 value truncation the format always has."""
    n = int(np.prod(shape))
    flat = jnp.zeros(n, jnp.float32).at[scat].set(v.astype(jnp.float32))
    if steal:
        bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
        bits = (bits & jnp.int32(-128)) | src_bits
        flat = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return flat.reshape(shape)


def _run_op(op: SpmvOperator, vals_stream, x_packed, idxT, part, block,
            first, cmap):
    return _spmv_call(vals_stream, idxT, part, block, first, x_packed,
                      cmap, cfg=op.cfg, n_blocks=op.wp.n_blocks,
                      n_parts=op.wp.n_parts, interpret=op.interpret,
                      variant=op.variant, tiles_per_step=op.tb)


def _zero_ct(p):
    if jnp.issubdtype(p.dtype, jnp.inexact):
        return jnp.zeros_like(p)
    return np.zeros(p.shape, jax.dtypes.float0)


class DiffSpmv:
    """``y = A @ x`` as a jax-differentiable function of ``(vals, x)``.

    ``vals`` is the CSR-order (canonical: row-major, sorted columns, no
    explicit zeros) nonzero value vector; the sparsity pattern is fixed at
    construction (the fixed-mask sparse-training regime).  plus_times fp32
    only — gradients through min/max semirings are subgradient games the
    app tier doesn't need, and fixed-point has no tangent space.

    ``fn()`` returns ``(f, aux)`` with ``f(vals, x, aux) -> y`` jittable
    and differentiable; ``aux`` is a dict pytree of device arrays (streams,
    maps, permutations) that must be passed through — its cotangents are
    zero/float0.
    """

    def __init__(self, m: CSRMatrix, config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None,
                 interpret: bool = False, split_max="auto",
                 col_order=None, col_orderT=None):
        m = canonicalize(m.astype(np.float32))
        cfg = config or SpmvConfig()
        if cfg.semiring != "plus_times" or cfg.dtype != "fp32":
            raise ValueError("DiffSpmv supports plus_times fp32 packs only")
        cfgT = configT or cfg
        if cfgT.semiring != "plus_times" or cfgT.dtype != "fp32":
            raise ValueError("DiffSpmv supports plus_times fp32 packs only")
        self.m = m
        self.num_rows, self.num_cols = m.num_rows, m.num_cols
        self.wp = pack(m, cfg, split_max=split_max, col_order=col_order)
        self.op = SpmvOperator(self.wp, interpret=interpret,
                               permute_x=False)
        mT = csr_to_csc(m)           # A^T as CSR over the transposed shape
        self.wpT = pack(mT, cfgT, split_max=split_max,
                        col_order=col_orderT)
        self.opT = SpmvOperator(self.wpT, interpret=interpret,
                                permute_x=False)

        linA, rowsA, colsA, srcA = _stream_map(self.op)
        # sanity: slot provenance must enumerate exactly the CSR pattern
        rows_csr = np.repeat(np.arange(m.num_rows),
                             np.diff(m.indptr).astype(np.int64))
        assert np.array_equal(rowsA, rows_csr), "slot map rows mismatch"
        assert np.array_equal(colsA, m.indices.astype(np.int64)), \
            "slot map cols mismatch"
        linT, rowsT, colsT, srcT = _stream_map(self.opT)
        # wpT is CSR over (colsA-major) order; re-sort to m's CSR order so
        # ONE vals vector drives both streams
        ordT = np.lexsort((rowsT, colsT))
        assert np.array_equal(colsT[ordT], rows_csr), "T slot map mismatch"
        linT = linT[ordT]

        def dev(a, dt=None):
            return jnp.asarray(a if dt is None else a.astype(dt))

        aux = {
            "mapA": dev(linA, np.int32) if linA.max(initial=0) < 2**31
            else dev(linA),
            "mapT": dev(linT, np.int32) if linT.max(initial=0) < 2**31
            else dev(linT),
            "srcA": dev(srcA), "srcT": dev(srcT),
            "rows": dev(rows_csr, np.int32),
            "cols": dev(m.indices, np.int32),
            "permA": dev(self.wp.perm, np.int32),
            "permT": dev(self.wpT.perm, np.int32),
            "idxTA": self.op.idxT, "partA": self.op.part,
            "blockA": self.op.block, "firstA": self.op.first,
            "idxTT": self.opT.idxT, "partT": self.opT.part,
            "blockT": self.opT.block, "firstT": self.opT.first,
        }
        if self.op.cmap is not None:
            aux["cmapA"] = self.op.cmap
        if self.opT.cmap is not None:
            aux["cmapT"] = self.opT.cmap
        if self.wp.col_order is not None:
            aux["colpA"] = dev(self.wp.col_order, np.int32)
        if self.wpT.col_order is not None:
            aux["colpT"] = dev(self.wpT.col_order, np.int32)
        self.aux = aux
        self.v0 = jnp.asarray(m.data.astype(np.float32))
        self._apply = self._build()

    def _build(self):
        opA, opT = self.op, self.opT
        n_rows, n_cols = self.num_rows, self.num_cols
        stealA = opA.cfg.steal_mantissa
        stealT = opT.cfg.steal_mantissa
        shapeA = tuple(opA.vals.shape)
        shapeT = tuple(opT.vals.shape)

        def _forward(v, x, aux):
            va = _emit_vals(v, aux["mapA"], aux["srcA"], stealA, shapeA)
            xp = x[aux["colpA"]] if "colpA" in aux else x
            y_ren = _run_op(opA, va, xp, aux["idxTA"], aux["partA"],
                            aux["blockA"], aux["firstA"],
                            aux.get("cmapA")).reshape(-1)
            y = jnp.zeros(n_rows + 1, y_ren.dtype)
            return y.at[aux["permA"]].add(y_ren)[:n_rows]

        @jax.custom_vjp
        def apply(v, x, aux):
            return _forward(v, x, aux)

        def fwd(v, x, aux):
            return _forward(v, x, aux), (v, x, aux)

        def bwd(res, g):
            v, x, aux = res
            # x_bar = A^T g through the transpose pack
            vt = _emit_vals(v, aux["mapT"], aux["srcT"], stealT, shapeT)
            gp = g[aux["colpT"]] if "colpT" in aux else g
            xb_ren = _run_op(opT, vt, gp, aux["idxTT"], aux["partT"],
                             aux["blockT"], aux["firstT"],
                             aux.get("cmapT")).reshape(-1)
            x_bar = jnp.zeros(n_cols + 1, xb_ren.dtype)
            x_bar = x_bar.at[aux["permT"]].add(xb_ren)[:n_cols]
            # v_bar[k] = g[row_k] * x[col_k] — the outer product restricted
            # to the pattern; pure gathers, no kernel
            v_bar = g[aux["rows"]] * x[aux["cols"]]
            return (v_bar.astype(v.dtype), x_bar.astype(x.dtype),
                    {k: _zero_ct(p) for k, p in aux.items()})

        apply.defvjp(fwd, bwd)
        return apply

    def fn(self):
        """(f, aux): ``f(vals, x, aux) -> y`` jittable + differentiable."""
        return self._apply, self.aux

    def __call__(self, x, vals=None):
        v = self.v0 if vals is None else jnp.asarray(vals)
        return self._apply(v, jnp.asarray(np.asarray(x, np.float32)),
                           self.aux)
