"""Multi-chip SpMV — the analog of the reference's channel/cluster scale-out.

The reference scales by instantiating 16 clusters, each bound to one HBM
pseudo-channel with rows assigned cyclically (spmv.ini:15-30,
data_formatter.h:410) and the dense vector broadcast to every cluster
(axis_duplicate, stream_utils.h:8-26; vector loader broadcast,
spmv_vector_loader.cpp:95-119); results merge round-robin (axis_merge,
stream_utils.h:35-75).  On TPU the same structure maps to SPMD over a
device mesh:

  * cluster        -> device (mesh axis "rows")
  * row assignment -> contiguous row shards, packed per device
  * x broadcast    -> replicated x (jax.lax collectives move it over ICI)
  * result merge   -> per-device disjoint y shards (no reduction needed,
                      row ownership is disjoint, exactly like the channels)

Each device gets its own wavepack stream (padded to a common tile count so
the stacked arrays are SPMD-rectangular) and runs the identical kernel via
``shard_map``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import LANES, SpmvConfig
from ..formats.csr import CSRMatrix
from ..formats.wavepack import Wavepack, pack
from ..ops.spmv import _spmv_call


def _pack_one(args):
    sub, cfg, split_max = args
    return pack(sub, cfg, split_max=split_max)


def _pack_shards(subs, cfg, split_max):
    """Pack every shard, in a process pool when the host has cores to
    spare (the shards are independent (channel-deal) units, exactly like
    the reference's per-channel packing, sw/data_formatter.h:410); packs
    serially on single-core hosts where pool IPC would only add copies."""
    import os
    workers = min(len(subs), os.cpu_count() or 1)
    if workers <= 1 or len(subs) <= 1:
        return [pack(sub, cfg, split_max=split_max) for sub in subs]
    from concurrent.futures import ProcessPoolExecutor
    with ProcessPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(_pack_one,
                           [(sub, cfg, split_max) for sub in subs]))


def _pad_tiles(wp: Wavepack, T: int, n_blocks: int) -> Wavepack:
    """Pad a wavepack stream to exactly T tiles / n_blocks blocks with inert
    tiles (semiring-identity values, matching pack()'s pad_val; scheduled as
    extra tiles of the last block)."""
    extra = T - wp.num_tiles
    if extra == 0 and wp.n_blocks == n_blocks:
        return wp
    S = wp.config.sublanes
    pad_val = (np.inf if wp.config.semiring == "min_plus" else 0)
    vals = np.concatenate([wp.vals,
                           np.full((extra, S, LANES), pad_val,
                                   wp.vals.dtype)])
    idxT = np.concatenate([wp.idxT,
                           np.zeros((extra, S, LANES), np.int32)])
    lastb = wp.n_blocks - 1
    tile_part = np.concatenate([wp.tile_part, np.zeros(extra, np.int32)])
    tile_block = np.concatenate([wp.tile_block,
                                 np.full(extra, lastb, np.int32)])
    tile_first = np.concatenate([wp.tile_first, np.zeros(extra, np.int32)])
    tile_last = np.concatenate([wp.tile_last, np.zeros(extra, np.int32)])
    if extra > 0 and wp.num_tiles > 0:
        # move the "last" flag of the final block to the final padded tile
        tile_last[wp.num_tiles - 1] = 0
        tile_last[-1] = 1
    class_map = wp.class_map
    if class_map is not None:
        class_map = np.concatenate(
            [class_map, np.zeros((extra,) + class_map.shape[1:], np.int32)])
    perm = wp.perm
    rpb = wp.config.rows_per_block
    if wp.n_blocks < n_blocks:
        perm = np.concatenate([perm, np.full((n_blocks - wp.n_blocks) * rpb,
                                             wp.num_rows, np.int64)])
    return Wavepack(wp.config, wp.num_rows, wp.num_cols, n_blocks,
                    wp.n_parts, perm, vals, idxT, tile_part, tile_block,
                    tile_first, tile_last, wp.nnz,
                    col_order=wp.col_order, class_map=class_map)


class ShardedSpmv:
    """Row-sharded SpMV over a 1-D device mesh (axis "rows").

    Rows are split into ``n_devices`` contiguous shards (the cyclic channel
    assignment of the reference is unnecessary here because the packer
    load-balances within each shard by nnz-sorting); each shard is packed
    independently and the stacked streams are sharded over the mesh.  x is
    replicated; y comes back as per-device renamed blocks.
    """

    def __init__(self, m: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 split_max: int | None | str = None,
                 interpret: bool = False):
        cfg = config or SpmvConfig()
        self.cfg = cfg
        self.mesh = mesh
        self.interpret = interpret
        axis = mesh.axis_names[0]
        self.axis = axis
        nd = mesh.devices.size
        rows_per_shard = -(-m.num_rows // nd)
        self.rows_per_shard = rows_per_shard
        subs = []
        for d in range(nd):
            r0 = d * rows_per_shard
            r1 = min(m.num_rows, r0 + rows_per_shard)
            r1 = max(r1, r0)
            indptr = m.indptr[r0:r1 + 1] - m.indptr[r0]
            subs.append(CSRMatrix(r1 - r0, m.num_cols,
                                  m.data[m.indptr[r0]:m.indptr[r1]],
                                  m.indices[m.indptr[r0]:m.indptr[r1]],
                                  np.asarray(indptr)))
        shards = _pack_shards(subs, cfg, split_max)
        T = max(wp.num_tiles for wp in shards)
        NB = max(wp.n_blocks for wp in shards)
        self.shards = [_pad_tiles(wp, T, NB) for wp in shards]
        self.n_blocks, self.n_parts = NB, shards[0].n_parts
        st = self.shards
        dev = functools.partial(jax.device_put)
        stack = lambda f: dev(np.stack([f(w) for w in st]))
        self.vals = stack(lambda w: w.vals)
        self.idxT = stack(lambda w: w.idxT)
        self.part = stack(lambda w: w.tile_part)
        self.block = stack(lambda w: w.tile_block)
        self.first = stack(lambda w: w.tile_first)
        self.cmap = (stack(lambda w: w.class_map.reshape(-1))
                     if st[0].class_map is not None else None)
        spec = NamedSharding(mesh, P(axis))
        names = ["vals", "idxT", "part", "block", "first"]
        if self.cmap is not None:
            names.append("cmap")
        for name in names:
            setattr(self, name, jax.device_put(getattr(self, name), spec))
        self._build()

    def _build(self):
        cfg, NB, NP = self.cfg, self.n_blocks, self.n_parts
        interpret = self.interpret
        axis = self.axis

        has_cmap = self.cmap is not None

        def local(vals, idxT, part, block, first, x, *cm):
            cmap = cm[0][0] if has_cmap else None
            y = _spmv_call(vals[0], idxT[0], part[0], block[0], first[0],
                           x, cmap, cfg=cfg, n_blocks=NB,
                           n_parts=NP, interpret=interpret)
            return y[None]

        in_specs = [P(axis)] * 5 + [P()] + ([P(axis)] if has_cmap else [])
        self._sharded = jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=tuple(in_specs),
            out_specs=P(axis), check_vma=False))

    def __call__(self, x) -> jax.Array:
        """Returns per-device renamed y blocks, shape
        (n_devices, n_blocks, stripes, 128), sharded over the mesh."""
        if self.cfg.dtype == "fixed" and np.asarray(x).dtype != np.uint32:
            from ..ops.golden import float_to_fixed
            x = float_to_fixed(np.asarray(x))
        extra = (self.cmap,) if self.cmap is not None else ()
        return self._sharded(self.vals, self.idxT, self.part, self.block,
                             self.first, jnp.asarray(x), *extra)

    def perf_estimate(self, hbm_gbps: float = 819.0):
        """Per-device modeled estimates plus the aggregate step rate the
        mesh would sustain (the slowest shard binds the SPMD step) — the
        multi-chip perf prediction the CPU-mesh path provides in lieu of
        real multi-chip hardware."""
        from ..models.perf_model import estimate_pack
        ests = [estimate_pack(wp, hbm_gbps) for wp in self.shards]
        t_step = max(e.time_s for e in ests)
        nnz = sum(wp.nnz for wp in self.shards)
        return ests, 2 * nnz / t_step / 1e9

    def unpack_y(self, y_sharded) -> np.ndarray:
        """Assemble the global y on host from per-device renamed blocks."""
        ys = np.asarray(y_sharded)
        out_parts = []
        for d, wp in enumerate(self.shards):
            out_parts.append(wp.unpack_y(ys[d].reshape(-1)))
        total = sum(p.shape[0] for p in out_parts)
        out = np.zeros(total, ys.dtype)
        off = 0
        for p_ in out_parts:
            out[off:off + p_.shape[0]] = p_
            off += p_.shape[0]
        return out
