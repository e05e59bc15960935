"""Distributed GNN training — row-sharded aggregation over the device mesh.

The reference's scale-out is a fixed-function inference pipeline (16
clusters, spmv.ini:15-30); the framework's GNN tier must also train at
scale.  ``ShardedDiffSpmm`` is the mesh form of
:class:`~..models.gnn.DiffSpmm`: the normalized adjacency is row-sharded
like :class:`~.mesh.ShardedSpmv`, features stay replicated (full-batch
GCN's standard mesh layout):

  * forward ``Y = Â H``: device d streams its packed shard ``Â_d``
    against the replicated features (one vals/idxT pass feeds all F
    columns — the packed-stream SpMM), then ONE ``all_gather`` over ICI
    re-replicates the aggregated features for the next layer's MXU
    projection;
  * cotangent ``dL/dH = Âᵀ G``: device d runs its transpose-shard pack
    on its own row slice of the (replicated) cotangent, and the
    full-length partials combine with ONE ``psum`` — the DP gradient
    all-reduce, riding ICI;
  * the adjacency is fixed (values baked into the streams at pack time),
    so there is no value plumbing at all — contrast
    :class:`~.train.ShardedDiffSpmv`, which trains the values.

``ShardedGCN`` stacks it with replicated MXU weight projections via the
same :func:`~..models.gnn.gcn_apply_fn` the single-chip GCN uses — the
weight gradients come out replicated for free because every device runs
the identical projection on identical (all-gathered) activations.

Collectives are written explicitly inside the per-device functions
(``jax.lax.all_gather`` / ``psum``) because Pallas-under-shard_map needs
``check_vma=False``, which disables the implicit-transposition
bookkeeping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix, csr_to_csc
from ..models.gnn import gcn_apply_fn, gcn_init_params, gcn_normalize
from ..ops.autodiff import canonicalize, _zero_ct
from ..ops.spmv import _spmm_call, spmm_bytes, _RESIDENT_VMEM_BUDGET
from .mesh import _pack_shards, _pad_tiles
from .train import _row_shards


class ShardedDiffSpmm:
    """``Y = A @ X`` (X: (num_cols, F) replicated features) with A
    row-sharded over a 1-D mesh, differentiable in X.  plus_times fp32.

    ``fn()`` returns ``(f, aux)`` with ``f(X, aux) -> Y`` jittable and
    differentiable; ``Y`` is the full (num_rows, F) result, replicated
    (one ``all_gather`` per forward, one ``psum`` per backward).  ``aux``
    holds the stacked per-device streams — values included, baked at pack
    time — sharded over the mesh.
    """

    def __init__(self, m: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None,
                 split_max: int | None | str = "auto",
                 interpret: bool = False):
        cfg = config or SpmvConfig()
        cfgT = configT or cfg
        for c in (cfg, cfgT):
            if c.semiring != "plus_times" or c.dtype != "fp32":
                raise ValueError(
                    "ShardedDiffSpmm supports plus_times fp32 packs only")
        m = canonicalize(m.astype(np.float32))
        self.m = m
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.cfg, self.cfgT = cfg, cfgT
        self.interpret = interpret
        nd = mesh.devices.size
        self.n_devices = nd
        subs, rows_per_shard = _row_shards(m, nd)
        self.rows_per_shard = rows_per_shard
        self.num_rows, self.num_cols = m.num_rows, m.num_cols

        packsA = _pack_shards(subs, cfg, split_max)
        packsT = _pack_shards([csr_to_csc(s) for s in subs], cfgT,
                              split_max)
        TA = max(w.num_tiles for w in packsA)
        NBA = max(w.n_blocks for w in packsA)
        TT = max(w.num_tiles for w in packsT)
        NBT = max(w.n_blocks for w in packsT)
        self.packsA = [_pad_tiles(w, TA, NBA) for w in packsA]
        self.packsT = [_pad_tiles(w, TT, NBT) for w in packsT]
        self.NBA, self.NPA = NBA, self.packsA[0].n_parts
        self.NBT, self.NPT = NBT, self.packsT[0].n_parts
        if any(w.col_order is not None
               for w in self.packsA + self.packsT):
            raise ValueError("col_order reordering is resolved by the "
                             "caller for sharded packs")

        spec = NamedSharding(mesh, P(self.axis))
        stack = lambda packs, f: jax.device_put(
            np.stack([f(w) for w in packs]), spec)
        aux = {}
        for tag, packs in (("A", self.packsA), ("T", self.packsT)):
            aux["vals" + tag] = stack(packs, lambda w: np.asarray(w.vals))
            aux["idxT" + tag] = stack(packs, lambda w: np.asarray(w.idxT))
            aux["part" + tag] = stack(packs, lambda w: w.tile_part)
            aux["block" + tag] = stack(packs, lambda w: w.tile_block)
            aux["first" + tag] = stack(packs, lambda w: w.tile_first)
            aux["perm" + tag] = stack(packs,
                                      lambda w: w.perm.astype(np.int32))
            if packs[0].class_map is not None:
                aux["cmap" + tag] = stack(
                    packs, lambda w: w.class_map.reshape(-1))
        self.aux = aux
        self._apply = self._build()

    def _build(self):
        cfg, cfgT = self.cfg, self.cfgT
        NBA, NPA, NBT, NPT = self.NBA, self.NPA, self.NBT, self.NPT
        rows_per_shard = self.rows_per_shard
        num_rows, num_cols = self.num_rows, self.num_cols
        nd, axis, mesh = self.n_devices, self.axis, self.mesh
        interpret = self.interpret
        has_cmap = {k: (k in self.aux) for k in ("cmapA", "cmapT")}

        def smap(f, in_specs, out_specs):
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)

        def run_spmm(aux, tag, X, c, nb, npts, cm):
            """Chunked packed-stream SpMM on the local shard -> (F, ren)."""
            F = X.shape[1]
            fc = 1
            while fc < min(F, 16) and spmm_bytes(
                    c, nb, npts, 2 * fc, 1,
                    "resident") <= _RESIDENT_VMEM_BUDGET:
                fc *= 2
            outs, f0 = [], 0
            while f0 < F:
                f1 = min(f0 + fc, F)
                outs.append(_spmm_call(
                    aux["vals" + tag][0], aux["idxT" + tag][0],
                    aux["part" + tag][0], aux["block" + tag][0],
                    aux["first" + tag][0], X[:, f0:f1],
                    aux["cmap" + tag][0] if cm else None,
                    cfg=c, n_blocks=nb, n_parts=npts,
                    interpret=interpret))
                f0 = f1
            return jnp.concatenate(outs, axis=0)

        def fwd_local(X, aux):
            y_ren = run_spmm(aux, "A", X, cfg, NBA, NPA, has_cmap["cmapA"])
            F = X.shape[1]
            out = jnp.zeros((F, rows_per_shard + 1), y_ren.dtype)
            y_d = out.at[:, aux["permA"][0]].add(
                y_ren)[:, :rows_per_shard].T
            # re-replicate the aggregated features for the next layer
            return jax.lax.all_gather(y_d, axis, axis=0, tiled=True)

        def bwd_local(g, aux):
            # device d owns rows [d*rps, (d+1)*rps) of the cotangent
            d = jax.lax.axis_index(axis)
            g_d = jax.lax.dynamic_slice_in_dim(
                g, d * rows_per_shard, rows_per_shard, 0)
            xb_ren = run_spmm(aux, "T", g_d, cfgT, NBT, NPT,
                              has_cmap["cmapT"])
            F = g.shape[1]
            xb = jnp.zeros((F, num_cols + 1), xb_ren.dtype)
            xb = xb.at[:, aux["permT"][0]].add(xb_ren)[:, :num_cols].T
            return jax.lax.psum(xb, axis)   # the DP gradient all-reduce

        sh = P(axis)
        aux_specs = {k: sh for k in self.aux}
        f_fwd = smap(fwd_local, (P(), aux_specs), P())
        f_bwd = smap(bwd_local, (P(), aux_specs), P())

        @jax.custom_vjp
        def apply(X, aux):
            return f_fwd(X, aux)[:num_rows]

        def fwd(X, aux):
            return f_fwd(X, aux)[:num_rows], aux

        def bwd(aux, g):
            gp = jnp.zeros((nd * rows_per_shard, g.shape[1]), g.dtype)
            gp = gp.at[:num_rows].set(g)
            return (f_bwd(gp, aux),
                    {k: _zero_ct(p) for k, p in aux.items()})

        apply.defvjp(fwd, bwd)
        return apply

    def fn(self):
        """(f, aux): ``f(X, aux) -> Y`` jittable + differentiable in X."""
        return self._apply, self.aux

    def __call__(self, X):
        return self._apply(jnp.asarray(np.asarray(X, np.float32)),
                           self.aux)


class ShardedGCN:
    """GCN over a row-sharded packed adjacency: per layer, one sharded
    packed-stream aggregation (+ all_gather), one replicated MXU
    projection.  Same parameter pytree and apply semantics as the
    single-chip :class:`~..models.gnn.GCN`, so a trained single-chip
    model loads unchanged."""

    def __init__(self, adj: CSRMatrix, mesh: Mesh, dims,
                 config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None,
                 interpret: bool = False, normalize: bool = True,
                 split_max: int | None | str = "auto"):
        if len(dims) < 2:
            raise ValueError("dims needs at least [d_in, d_out]")
        a = gcn_normalize(adj) if normalize else adj
        self.agg = ShardedDiffSpmm(a, mesh, config=config, configT=configT,
                                   interpret=interpret,
                                   split_max=split_max)
        self.dims = list(dims)
        self.num_nodes = self.agg.num_rows
        self._apply = gcn_apply_fn(self.agg.fn()[0], self.dims)

    def init(self, seed: int = 0):
        return gcn_init_params(self.dims, seed)

    def fn(self):
        """(apply, aux): ``apply(params, X, aux) -> logits``."""
        return self._apply, self.agg.aux

    def __call__(self, params, X):
        return self._apply(params, jnp.asarray(np.asarray(X, np.float32)),
                           self.agg.aux)
