"""Distributed training step — sharded differentiable SpMV over a mesh.

The reference's scale-out is inference-only (16 clusters streaming fixed
weights, spmv.ini:15-30); a TPU framework must also train at scale.
``ShardedDiffSpmv`` is the mesh form of :class:`~..ops.autodiff.DiffSpmv`:
``y = A @ x`` differentiable in both ``vals`` and ``x``, with A row-sharded
over a 1-D device mesh exactly like :class:`~.mesh.ShardedSpmv`:

  * forward: device d runs the packed kernel on its row shard A_d with x
    replicated; y comes back sharded by rows (disjoint ownership, no
    collective — the channel-merge analog);
  * ``dL/dx = Aᵀ g``: device d runs a SECOND pack of A_dᵀ on its local
    cotangent shard g_d, producing a full-length partial that combines
    with one ``psum`` over ICI (Aᵀ is column-sharded when A is
    row-sharded, so the reduction is over the row axis — the classic
    data-parallel gradient all-reduce, riding ICI not DCN);
  * ``dL/dvals``: two local gathers per device, no kernel and no
    collective (row-sharded values are disjoint).

The collectives are written EXPLICITLY in the per-device backward
functions (``jax.lax.psum``) rather than left to ``shard_map``
transposition, because Pallas-under-shard_map requires
``check_vma=False`` which disables the replication bookkeeping the
implicit path relies on.

Values ride as a live (n_devices, nnz_max) stacked jit argument in the
global matrix's CSR order (rows are contiguous shards, so the global
value vector is the concatenation of the shard slices); each call
re-scatters them into the packed streams through per-shard
``wp_stream_map`` provenance — the pack is built once, the optimizer
steps the values.  Streams run at tiles_per_step=1 (the stacked SPMD
arrays must be rectangular across shards; the tb amortization is a
single-chip dispatch-cost lever, irrelevant to the CPU-mesh validation
path and recoverable later by padding tile counts to a common multiple).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix, csr_to_csc
from ..formats.wavepack import pack
from ..ops.autodiff import (canonicalize, steal_src_bits, wp_stream_map,
                            _emit_vals)
from ..ops.spmv import (_spmv_call, _gradstream_call, resident_bytes,
                        _RESIDENT_VMEM_BUDGET)
from ..ops.train_stream import _bcast_to_acc
from .mesh import _pack_shards, _pad_tiles


def _row_shards(m: CSRMatrix, nd: int):
    """Contiguous row shards, each PADDED to a uniform rows_per_shard row
    count (empty rows cost zero slots; uniformity makes every per-shard
    pack geometry — n_parts of the transpose, perm length, output buffer —
    identical, which SPMD tracing requires)."""
    rows_per_shard = -(-m.num_rows // nd)
    subs = []
    for d in range(nd):
        r0 = min(m.num_rows, d * rows_per_shard)
        r1 = min(m.num_rows, r0 + rows_per_shard)
        indptr = m.indptr[r0:r1 + 1] - m.indptr[r0]
        indptr = np.concatenate(
            [indptr, np.full(rows_per_shard - (r1 - r0), indptr[-1],
                             indptr.dtype)])
        subs.append(CSRMatrix(rows_per_shard, m.num_cols,
                              m.data[m.indptr[r0]:m.indptr[r1]],
                              m.indices[m.indptr[r0]:m.indptr[r1]],
                              np.asarray(indptr)))
    return subs, rows_per_shard


class ShardedDiffSpmv:
    """Row-sharded differentiable SpMV (plus_times fp32; fixed-point has
    no tangent space and min/max gradients are subgradient games).

    ``fn()`` returns ``(f, aux)`` with ``f(v_stacked, x, aux) -> y_padded``
    jittable and differentiable; ``y_padded`` is ``(n_devices,
    rows_per_shard)`` natural-order rows, sharded over the mesh (global y =
    ``y_padded.reshape(-1)[:num_rows]``).  ``v_stacked`` is the
    ``(n_devices, nnz_max)`` stacked value argument — see
    :meth:`stack_values` / :meth:`unstack_values`.
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
                    "ShardedDiffSpmv supports plus_times fp32 packs only")
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
        # provenance maps BEFORE padding (tail padding preserves positions)
        mapsA, mapsT, rowsv, colsv = [], [], [], []
        for sub, wa, wt in zip(subs, packsA, packsT):
            linA, rowsA, colsA = wp_stream_map(wa)
            rows_csr = np.repeat(np.arange(sub.num_rows),
                                 np.diff(sub.indptr).astype(np.int64))
            assert np.array_equal(rowsA, rows_csr), "slot map rows mismatch"
            assert np.array_equal(colsA, sub.indices.astype(np.int64))
            linT, rowsT, colsT = wp_stream_map(wt)
            ordT = np.lexsort((rowsT, colsT))
            assert np.array_equal(colsT[ordT], rows_csr), "T slot mismatch"
            mapsA.append(linA)
            mapsT.append(linT[ordT])
            rowsv.append(rows_csr)
            colsv.append(sub.indices.astype(np.int64))
        self.packsA = [_pad_tiles(w, TA, NBA) for w in packsA]
        self.packsT = [_pad_tiles(w, TT, NBT) for w in packsT]
        self.NBA, self.NPA = NBA, self.packsA[0].n_parts
        self.NBT, self.NPT = NBT, self.packsT[0].n_parts
        self.shapeA = self.packsA[0].vals.shape
        self.shapeT = self.packsT[0].vals.shape

        self.nnz_shard = [len(v) for v in mapsA]
        nnz_max = max(self.nnz_shard)
        self.nnz_max = nnz_max

        def padmap(ms, oob):
            return np.stack([np.concatenate(
                [v, np.full(nnz_max - len(v), oob, np.int64)])
                for v in ms]).astype(np.int64)

        spec = NamedSharding(mesh, P(self.axis))
        put = functools.partial(jax.device_put, device=spec)
        stack = lambda packs, f: put(np.stack([f(w) for w in packs]))
        aux = {
            # scatter maps: out-of-bounds pads DROP on scatter
            "mapA": put(padmap(mapsA, int(np.prod(self.shapeA)))),
            "mapT": put(padmap(mapsT, int(np.prod(self.shapeT)))),
            # gather maps: out-of-bounds pads FILL 0 (mode='fill')
            "rows": put(padmap(rowsv, rows_per_shard).astype(np.int32)),
            "cols": put(padmap(colsv, m.num_cols).astype(np.int32)),
            "permA": stack(self.packsA, lambda w: w.perm.astype(np.int32)),
            "permT": stack(self.packsT, lambda w: w.perm.astype(np.int32)),
            "idxTA": stack(self.packsA, lambda w: w.idxT),
            "partA": stack(self.packsA, lambda w: w.tile_part),
            "blockA": stack(self.packsA, lambda w: w.tile_block),
            "firstA": stack(self.packsA, lambda w: w.tile_first),
            "idxTT": stack(self.packsT, lambda w: w.idxT),
            "partT": stack(self.packsT, lambda w: w.tile_part),
            "blockT": stack(self.packsT, lambda w: w.tile_block),
            "firstT": stack(self.packsT, lambda w: w.tile_first),
        }
        if cfg.steal_mantissa:
            aux["srcA"] = stack(self.packsA,
                                lambda w: steal_src_bits(w.vals))
        if cfgT.steal_mantissa:
            aux["srcT"] = stack(self.packsT,
                                lambda w: steal_src_bits(w.vals))
        if self.packsA[0].class_map is not None:
            aux["cmapA"] = stack(self.packsA,
                                 lambda w: w.class_map.reshape(-1))
        if self.packsT[0].class_map is not None:
            aux["cmapT"] = stack(self.packsT,
                                 lambda w: w.class_map.reshape(-1))
        if any(w.col_order is not None for w in self.packsA):
            raise ValueError("col_order reordering is resolved by the "
                             "caller for sharded packs")
        self.aux = aux
        self.v0 = self.stack_values(m.data)
        self._apply = self._build()

    # -- value layout helpers ------------------------------------------
    def stack_values(self, v_global) -> jax.Array:
        """Global CSR-order values -> (n_devices, nnz_max) stacked/sharded
        argument (rows are contiguous shards, so shard slices concatenate
        back to the global vector)."""
        v_global = np.asarray(v_global, np.float32)
        out = np.zeros((self.n_devices, self.nnz_max), np.float32)
        off = 0
        for d, n in enumerate(self.nnz_shard):
            out[d, :n] = v_global[off:off + n]
            off += n
        return jax.device_put(out, NamedSharding(self.mesh, P(self.axis)))

    def unstack_values(self, v_stacked) -> np.ndarray:
        vs = np.asarray(v_stacked)
        return np.concatenate(
            [vs[d, :n] for d, n in enumerate(self.nnz_shard)])

    # -- the differentiable sharded step -------------------------------
    def _build(self):
        cfg, cfgT = self.cfg, self.cfgT
        NBA, NPA, NBT, NPT = self.NBA, self.NPA, self.NBT, self.NPT
        shapeA, shapeT = self.shapeA, self.shapeT
        rows_per_shard, num_cols = self.rows_per_shard, self.num_cols
        axis = self.axis
        interpret = self.interpret
        mesh = self.mesh
        has = {k: (k in self.aux)
               for k in ("srcA", "srcT", "cmapA", "cmapT")}

        def smap(f, in_specs, out_specs):
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)

        def fwd_local(v, x, aux):
            va = _emit_vals(v[0], aux["mapA"][0],
                            aux["srcA"][0] if has["srcA"] else None,
                            cfg.steal_mantissa, shapeA)
            y_ren = _spmv_call(
                va, aux["idxTA"][0], aux["partA"][0], aux["blockA"][0],
                aux["firstA"][0], x,
                aux["cmapA"][0] if has["cmapA"] else None,
                cfg=cfg, n_blocks=NBA, n_parts=NPA,
                interpret=interpret).reshape(-1)
            y = jnp.zeros(rows_per_shard + 1, y_ren.dtype)
            return y.at[aux["permA"][0]].add(y_ren)[None, :rows_per_shard]

        def bwd_x_local(v, g, aux):
            vt = _emit_vals(v[0], aux["mapT"][0],
                            aux["srcT"][0] if has["srcT"] else None,
                            cfgT.steal_mantissa, shapeT)
            xb_ren = _spmv_call(
                vt, aux["idxTT"][0], aux["partT"][0], aux["blockT"][0],
                aux["firstT"][0], g[0],
                aux["cmapT"][0] if has["cmapT"] else None,
                cfg=cfgT, n_blocks=NBT, n_parts=NPT,
                interpret=interpret).reshape(-1)
            xb = jnp.zeros(num_cols + 1, xb_ren.dtype)
            xb = xb.at[aux["permT"][0]].add(xb_ren)[:num_cols]
            return jax.lax.psum(xb, axis)   # the DP gradient all-reduce

        def bwd_v_local(g, x, aux):
            gr = jnp.take(g[0], aux["rows"][0], mode="fill", fill_value=0.0)
            xc = jnp.take(x, aux["cols"][0], mode="fill", fill_value=0.0)
            return (gr * xc)[None]

        sh = P(axis)
        aux_specs = {k: sh for k in self.aux}
        f_fwd = smap(fwd_local, (sh, P(), aux_specs), sh)
        f_bx = smap(bwd_x_local, (sh, sh, aux_specs), P())
        f_bv = smap(bwd_v_local, (sh, P(), aux_specs), sh)

        def _zero_ct(p):
            if jnp.issubdtype(p.dtype, jnp.inexact):
                return jnp.zeros_like(p)
            return np.zeros(p.shape, jax.dtypes.float0)

        @jax.custom_vjp
        def apply(v, x, aux):
            return f_fwd(v, x, aux)

        def fwd(v, x, aux):
            return f_fwd(v, x, aux), (v, x, aux)

        def bwd(res, g):
            v, x, aux = res
            x_bar = f_bx(v, g, aux)
            v_bar = f_bv(g, x, aux)
            return (v_bar.astype(v.dtype), x_bar.astype(x.dtype),
                    {k: _zero_ct(p) for k, p in aux.items()})

        apply.defvjp(fwd, bwd)
        return apply

    def fn(self):
        """(f, aux): ``f(v_stacked, x, aux) -> y_padded`` jittable and
        differentiable; aux cotangents are zero/float0."""
        return self._apply, self.aux

    def __call__(self, x, v_stacked=None) -> np.ndarray:
        """Global natural-order y (host assembly of the sharded step)."""
        v = self.v0 if v_stacked is None else v_stacked
        y = self._apply(v, jnp.asarray(np.asarray(x, np.float32)),
                        self.aux)
        return np.asarray(y).reshape(-1)[:self.num_rows]


class ShardedStreamDiffSpmv(ShardedDiffSpmv):
    """Distributed STREAM-LAYOUT training: the mesh form of
    :class:`~..ops.train_stream.StreamDiffSpmv`.

    ``ShardedDiffSpmv`` re-emits each device's packed streams from the
    stacked value vector every call — an arbitrary relayout that XLA's
    TPU scatter/gather runs at ~0.15 Gelem/s (scratch/probe_emit.py),
    dominating a real-chip training step.  Here each device's trainable
    parameters ARE its two packed value streams (``vA``/``vT``, stacked
    and row-sharded over the mesh), gradients arrive already in each
    layout from the gradient-stream Pallas kernel, and the only
    collective stays the one ``psum`` for ``dL/dx``.  Elementwise
    updates (:meth:`sgd_step`) keep all 2*n_devices layout copies
    bit-consistent — see train_stream.py for the invariant.

    Resident-variant shard packs only (the gradient-stream kernel keeps
    the whole accumulator-geometry cotangent in VMEM)."""

    def __init__(self, m: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 configT: SpmvConfig | None = None,
                 split_max: int | None | str = "auto",
                 interpret: bool = False):
        super().__init__(m, mesh, config, configT, split_max, interpret)
        for tag, cfg, nb, npp in (("A", self.cfg, self.NBA, self.NPA),
                                  ("T", self.cfgT, self.NBT, self.NPT)):
            if resident_bytes(cfg, nb, npp) > _RESIDENT_VMEM_BUDGET:
                raise ValueError(
                    f"ShardedStreamDiffSpmv needs resident shard packs; "
                    f"the {tag} packs exceed the VMEM budget — use "
                    "ShardedDiffSpmv")
        spec = NamedSharding(self.mesh, P(self.axis))
        put = functools.partial(jax.device_put, device=spec)

        def mask_stack(packs, maps, shape):
            n = int(np.prod(shape))
            mk = np.zeros((self.n_devices, n), np.float32)
            for d, nnz in enumerate(self.nnz_shard):
                mk[d, np.asarray(maps)[d, :nnz]] = 1.0
            return put(mk.reshape((self.n_devices,) + shape))

        aux = dict(self.aux)
        aux["maskA"] = mask_stack(self.packsA, aux["mapA"], self.shapeA)
        aux["maskT"] = mask_stack(self.packsT, aux["mapT"], self.shapeT)
        if self.cfg.steal_mantissa:
            aux["splantA"] = put(np.stack(
                [steal_src_bits(w.vals).reshape(self.shapeA)
                 for w in self.packsA]))
        if self.cfgT.steal_mantissa:
            aux["splantT"] = put(np.stack(
                [steal_src_bits(w.vals).reshape(self.shapeT)
                 for w in self.packsT]))
        self.aux = aux
        # parameters: the packed streams themselves, stacked + sharded
        self.vA0 = put(np.stack([w.vals for w in self.packsA]))
        self.vT0 = put(np.stack([w.vals for w in self.packsT]))
        self._apply = self._build_stream()

    # -- value plumbing --------------------------------------------------
    def _read(self, v, maps, steal):
        vs = np.asarray(v).reshape(self.n_devices, -1)
        maps = np.asarray(maps)
        out = np.concatenate([vs[d, maps[d, :n]]
                              for d, n in enumerate(self.nnz_shard)])
        if steal:
            out = (out.view(np.uint32)
                   & np.uint32(0xFFFFFF80)).view(np.float32)
        return out

    def values(self, vA) -> np.ndarray:
        """Global CSR-order values read back from the A-layout streams."""
        return self._read(vA, self.aux["mapA"], self.cfg.steal_mantissa)

    def values_T(self, vT) -> np.ndarray:
        return self._read(vT, self.aux["mapT"], self.cfgT.steal_mantissa)

    def grads_csr(self, gA) -> np.ndarray:
        return self._read(gA, self.aux["mapA"], False)

    # -- elementwise updates ---------------------------------------------
    def clean(self, vA, vT):
        aux = self.aux
        if "splantA" in aux:
            vA = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(vA, jnp.int32)
                & jnp.int32(-128), jnp.float32)
        if "splantT" in aux:
            vT = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(vT, jnp.int32)
                & jnp.int32(-128), jnp.float32)
        return vA, vT

    def replant(self, vA, vT):
        aux = self.aux
        if "splantA" in aux:
            bits = jax.lax.bitcast_convert_type(vA, jnp.int32)
            vA = jax.lax.bitcast_convert_type(
                (bits & jnp.int32(-128)) | aux["splantA"], jnp.float32)
        if "splantT" in aux:
            bits = jax.lax.bitcast_convert_type(vT, jnp.int32)
            vT = jax.lax.bitcast_convert_type(
                (bits & jnp.int32(-128)) | aux["splantT"], jnp.float32)
        return vA, vT

    def sgd_step(self, vA, vT, gA, gT, lr):
        vA, vT = self.clean(vA, vT)
        return self.replant(vA - lr * gA, vT - lr * gT)

    # -- the differentiable sharded stream step --------------------------
    def _build_stream(self):
        cfg, cfgT = self.cfg, self.cfgT
        NBA, NPA, NBT, NPT = self.NBA, self.NPA, self.NBT, self.NPT
        SA, RA = cfg.sublanes, cfg.stripes
        ST, RT = cfgT.sublanes, cfgT.stripes
        rows_per_shard, num_cols = self.rows_per_shard, self.num_cols
        axis = self.axis
        interpret = self.interpret
        mesh = self.mesh
        has_cmap = {k: (k in self.aux) for k in ("cmapA", "cmapT")}

        def smap(f, in_specs, out_specs):
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)

        def fwd_local(vA, x, aux):
            y_ren = _spmv_call(
                vA[0], aux["idxTA"][0], aux["partA"][0], aux["blockA"][0],
                aux["firstA"][0], x,
                aux["cmapA"][0] if has_cmap["cmapA"] else None,
                cfg=cfg, n_blocks=NBA, n_parts=NPA,
                interpret=interpret).reshape(-1)
            y = jnp.zeros(rows_per_shard + 1, y_ren.dtype)
            return y.at[aux["permA"][0]].add(y_ren)[None, :rows_per_shard]

        def bwd_local(vA, vT, x, g, aux):
            # dL/dx: transpose-pack kernel + the one DP all-reduce
            xb_ren = _spmv_call(
                vT[0], aux["idxTT"][0], aux["partT"][0], aux["blockT"][0],
                aux["firstT"][0], g[0],
                aux["cmapT"][0] if has_cmap["cmapT"] else None,
                cfg=cfgT, n_blocks=NBT, n_parts=NPT,
                interpret=interpret).reshape(-1)
            xb = jnp.zeros(num_cols + 1, xb_ren.dtype)
            xb = xb.at[aux["permT"][0]].add(xb_ren)[:num_cols]
            xb = jax.lax.psum(xb, axis)
            # in-layout gradient streams, no relayout, no collective
            g_ext = jnp.concatenate([g[0], jnp.zeros(1, g.dtype)])
            gbA = _bcast_to_acc(g_ext, aux["permA"][0], NBA, SA, RA)
            gA = _gradstream_call(
                vA[0], aux["idxTA"][0], aux["maskA"][0], aux["partA"][0],
                aux["blockA"][0], gbA, x,
                aux["cmapA"][0] if has_cmap["cmapA"] else None,
                cfg=cfg, n_blocks=NBA, n_parts=NPA, interpret=interpret)
            x_ext = jnp.concatenate(
                [x.astype(jnp.float32), jnp.zeros(1, jnp.float32)])
            gbT = _bcast_to_acc(x_ext, aux["permT"][0], NBT, ST, RT)
            gT = _gradstream_call(
                vT[0], aux["idxTT"][0], aux["maskT"][0], aux["partT"][0],
                aux["blockT"][0], gbT, g[0],
                aux["cmapT"][0] if has_cmap["cmapT"] else None,
                cfg=cfgT, n_blocks=NBT, n_parts=NPT, interpret=interpret)
            return gA[None], gT[None], xb

        sh = P(axis)
        aux_specs = {k: sh for k in self.aux}
        f_fwd = smap(fwd_local, (sh, P(), aux_specs), sh)
        f_bwd = smap(bwd_local, (sh, sh, P(), sh, aux_specs),
                     (sh, sh, P()))

        def _zero_ct(p):
            if jnp.issubdtype(p.dtype, jnp.inexact):
                return jnp.zeros_like(p)
            return np.zeros(p.shape, jax.dtypes.float0)

        @jax.custom_vjp
        def apply(vA, vT, x, aux):
            return f_fwd(vA, x, aux)

        def fwd(vA, vT, x, aux):
            return f_fwd(vA, x, aux), (vA, vT, x, aux)

        def bwd(res, g):
            vA, vT, x, aux = res
            gA, gT, x_bar = f_bwd(vA, vT, x, g, aux)
            return (gA, gT, x_bar.astype(x.dtype),
                    {k: _zero_ct(p) for k, p in aux.items()})

        apply.defvjp(fwd, bwd)
        return apply

    def fn(self):
        """(f, aux): ``f(vA, vT, x, aux) -> y_padded``.  ``(vA, vT)`` are
        two views of ONE parameter (see train_stream.py): update both
        elementwise (``sgd_step``) to keep them bit-consistent."""
        return self._apply, self.aux

    def __call__(self, x, vA=None) -> np.ndarray:
        v = self.vA0 if vA is None else vA
        y = self._apply(v, self.vT0,
                        jnp.asarray(np.asarray(x, np.float32)), self.aux)
        return np.asarray(y).reshape(-1)[:self.num_rows]
