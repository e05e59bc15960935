"""GNN layer tier: differentiable packed-stream aggregation + GCN.

The reference's app tier (GraphLily lineage, unit_tests/test_app.cpp:7-10)
stops at semiring iteration apps (PageRank/SSSP/BFS); the natural modern
consumer of the same SpMV substrate is GNN training, where the adjacency
is FIXED and the dense features/weights train.  This module composes the
packed-stream SpMM (`SpmvOperator.matmul` — one matrix-stream pass feeds
all F feature columns) with the MXU for the weight projections:

* :class:`DiffSpmm` — ``Y = A @ X`` differentiable in ``X`` through a
  fixed pack of ``A`` (forward) and of ``A^T`` (cotangent,
  ``dL/dX = A^T @ G`` — the csr2csc transpose, sw/data_loader.h:92-157),
  so BOTH passes run the conflict-free gather kernel at stream rate.
  The adjacency values are baked into the streams at pack time (no
  per-step re-emission — contrast ops/autodiff.DiffSpmv, which trains
  the VALUES and pays the emission).
* :class:`GCN` — Kipf-Welling graph convolution stack
  ``H' = relu(Â H W + b)`` with ``Â = D^-1/2 (A+I) D^-1/2``
  (:func:`gcn_normalize`); aggregation via DiffSpmm, projections via
  ``jnp.dot`` (MXU).  Per layer the cheaper order of the two
  mathematically identical forms ``Â(HW)`` / ``(ÂH)W`` is chosen
  statically, so the packed stream always feeds the narrower feature
  width.

All stream arrays ride as explicit jit arguments through the ``aux``
pytree (closing over device arrays would embed them as HLO constants —
see utils/bench.py on the remote-compile size limit).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix, csr_to_csc
from ..formats.wavepack import pack
from ..ops.autodiff import canonicalize, _zero_ct
from ..ops.spmv import (SpmvOperator, _spmm_call, spmm_bytes,
                        _RESIDENT_VMEM_BUDGET)


def gcn_normalize(m: CSRMatrix) -> CSRMatrix:
    """Symmetric GCN normalization ``Â = D^-1/2 (A + I) D^-1/2`` with
    self-loops (Kipf & Welling 2017).  Isolated vertices get a self-loop
    like everyone else, so no row is all-zero."""
    if m.num_rows != m.num_cols:
        raise ValueError("gcn_normalize needs a square adjacency")
    import scipy.sparse as sp
    s = m.to_scipy().astype(np.float64).tocsr()
    s = s + sp.identity(m.num_rows, format="csr")
    d = np.asarray(s.sum(axis=1)).ravel()
    dinv = np.where(d > 0, 1.0 / np.sqrt(np.maximum(d, 1e-30)), 0.0)
    s = sp.diags(dinv) @ s @ sp.diags(dinv)
    return CSRMatrix.from_scipy(s.tocsr().astype(np.float32))


def _op_aux(op: SpmvOperator, suffix: str) -> dict:
    """The operator's stream arrays as an aux sub-dict (jit arguments)."""
    aux = {"vals" + suffix: op.vals, "idxT" + suffix: op.idxT,
           "part" + suffix: op.part, "block" + suffix: op.block,
           "first" + suffix: op.first}
    if op.cmap is not None:
        aux["cmap" + suffix] = op.cmap
    if op._colp is not None:
        aux["colp" + suffix] = op._colp
    aux["perm" + suffix] = jnp.asarray(op.wp.perm, jnp.int32)
    return aux


def _spmm_natural(op: SpmvOperator, X, aux, suffix: str):
    """``A @ X -> (num_rows, F)`` natural order, streams from ``aux``.

    Functional mirror of :meth:`SpmvOperator.matmul` (same feature
    chunking under the VMEM budget, same per-feature renamed->natural
    scatter) with every stream array an explicit argument."""
    cfg, wp = op.cfg, op.wp
    if "colp" + suffix in aux:
        X = X[aux["colp" + suffix], :]
    F = X.shape[1]
    fc = 1
    while fc < min(F, 16) and spmm_bytes(
            cfg, wp.n_blocks, wp.n_parts, 2 * fc, op.tb,
            op.variant) <= _RESIDENT_VMEM_BUDGET:
        fc *= 2
    outs = []
    f0 = 0
    while f0 < F:
        f1 = min(f0 + fc, F)
        outs.append(_spmm_call(
            aux["vals" + suffix], aux["idxT" + suffix],
            aux["part" + suffix], aux["block" + suffix],
            aux["first" + suffix], X[:, f0:f1],
            aux.get("cmap" + suffix), cfg=cfg, n_blocks=wp.n_blocks,
            n_parts=wp.n_parts, interpret=op.interpret,
            variant=op.variant, tiles_per_step=op.tb))
        f0 = f1
    y_ren = jnp.concatenate(outs, axis=0)        # (F, renamed)
    n = wp.num_rows
    out = jnp.zeros((F, n + 1), y_ren.dtype)
    out = out.at[:, aux["perm" + suffix]].add(y_ren)
    return out[:, :n].T


def gcn_init_params(dims, seed: int = 0):
    """He-initialized GCN parameter pytree: [{'w','b'}, ...]."""
    rng = np.random.default_rng(seed)
    params = []
    for din, dout in zip(dims[:-1], dims[1:]):
        w = (rng.standard_normal((din, dout))
             * np.sqrt(2.0 / din)).astype(np.float32)
        params.append({"w": jnp.asarray(w),
                       "b": jnp.zeros(dout, jnp.float32)})
    return params


def gcn_apply_fn(f, dims):
    """The GCN forward over any aggregation ``f(H, aux) -> Â H`` (local
    DiffSpmm or the mesh-sharded form): per layer the cheaper of the two
    mathematically identical orders ``Â (H W)`` / ``(Â H) W`` is chosen
    statically by feature width; relu between layers, final layer
    linear."""
    nl = len(dims) - 1

    def apply(params, X, aux):
        h = X
        for i, p in enumerate(params):
            if dims[i + 1] < dims[i]:       # narrow first: Â (H W)
                h = f(h @ p["w"], aux) + p["b"]
            else:                            # (Â H) W
                h = f(h, aux) @ p["w"] + p["b"]
            if i < nl - 1:
                h = jax.nn.relu(h)
        return h

    return apply


class DiffSpmm:
    """``Y = A @ X`` (X: (num_cols, F) features) differentiable in X.

    The sparsity pattern AND values of ``A`` are fixed at construction
    (the GNN-aggregation regime: Â never trains); the cotangent
    ``dL/dX = A^T @ G`` runs through a second wavepack of ``A^T``.
    plus_times fp32 only.  ``fn()`` returns ``(f, aux)`` with
    ``f(X, aux) -> Y`` jittable + differentiable; ``aux`` cotangents are
    zero/float0.
    """

    def __init__(self, m: CSRMatrix, config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None,
                 interpret: bool = False, split_max="auto",
                 col_order=None, col_orderT=None):
        m = canonicalize(m.astype(np.float32))
        cfg = config or SpmvConfig()
        cfgT = configT or cfg
        for c in (cfg, cfgT):
            if c.semiring != "plus_times" or c.dtype != "fp32":
                raise ValueError(
                    "DiffSpmm supports plus_times fp32 packs only")
        self.m = m
        self.num_rows, self.num_cols = m.num_rows, m.num_cols
        self.wp = pack(m, cfg, split_max=split_max, col_order=col_order)
        self.op = SpmvOperator(self.wp, interpret=interpret,
                               permute_x=False)
        mT = csr_to_csc(m)          # A^T as CSR (carries A's values)
        self.wpT = pack(mT, cfgT, split_max=split_max,
                        col_order=col_orderT)
        self.opT = SpmvOperator(self.wpT, interpret=interpret,
                                permute_x=False)
        self.aux = {**_op_aux(self.op, "A"), **_op_aux(self.opT, "T")}
        self._apply = self._build()

    def _build(self):
        opA, opT = self.op, self.opT

        @jax.custom_vjp
        def apply(X, aux):
            return _spmm_natural(opA, X, aux, "A")

        def fwd(X, aux):
            return apply(X, aux), aux

        def bwd(aux, G):
            X_bar = _spmm_natural(opT, G, aux, "T")
            return (X_bar, {k: _zero_ct(p) for k, p in aux.items()})

        apply.defvjp(fwd, bwd)
        return apply

    def fn(self):
        """(f, aux): ``f(X, aux) -> Y`` jittable + differentiable in X."""
        return self._apply, self.aux

    def __call__(self, X):
        return self._apply(jnp.asarray(np.asarray(X, np.float32)),
                           self.aux)


class GCN:
    """Graph convolutional network over a packed adjacency.

    ``dims = [d_in, d_hidden, ..., d_out]``; layer ``i`` computes
    ``H' = relu(Â H W_i + b_i)`` (final layer linear — feed logits to the
    caller's loss).  ``Â`` is packed ONCE (both directions); every
    training step streams it at kernel rate.  The per-layer aggregation/
    projection order is chosen by feature width: ``Â (H W)`` when the
    layer narrows, ``(Â H) W`` when it widens — identical math
    (linearity), cheaper stream.
    """

    def __init__(self, adj: CSRMatrix, dims, config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None, interpret: bool = False,
                 normalize: bool = True, split_max="auto"):
        if len(dims) < 2:
            raise ValueError("dims needs at least [d_in, d_out]")
        a = gcn_normalize(adj) if normalize else adj
        self.agg = DiffSpmm(a, config=config, configT=configT,
                            interpret=interpret, split_max=split_max)
        self.dims = list(dims)
        self.num_nodes = self.agg.num_rows
        self._apply = self._build()

    def init(self, seed: int = 0):
        """He-initialized parameter pytree: [{'w','b'}, ...]."""
        return gcn_init_params(self.dims, seed)

    def _build(self):
        return gcn_apply_fn(self.agg.fn()[0], self.dims)

    def fn(self):
        """(apply, aux): ``apply(params, X, aux) -> logits`` jittable +
        differentiable in params and X."""
        return self._apply, self.agg.aux

    def __call__(self, params, X):
        return self._apply(params, jnp.asarray(np.asarray(X, np.float32)),
                           self.agg.aux)
