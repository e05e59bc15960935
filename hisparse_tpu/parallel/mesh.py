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


def default_ici_gbps() -> float:
    """ICI per-link bandwidth for the combine model.  The built-in 45 GB/s
    is the public per-link v5e figure and is UNVALIDATED here (no
    multi-chip hardware attached); the first real multi-chip run can
    calibrate it without a code change by setting WP_ICI_GBPS (or passing
    ici_gbps explicitly to perf_estimate)."""
    import os
    return float(os.environ.get("WP_ICI_GBPS", 45.0))


def ici_allreduce_time(bytes_per_device: int, n_devices: int,
                       ici_gbps: float | None = None) -> float:
    """Modeled ring all-reduce time over one ICI axis.

    MODEL-ONLY — no multi-chip hardware is attached to validate it; the
    default constant is the public per-link v5e ICI figure (~45 GB/s
    usable per direction, overridable via WP_ICI_GBPS — see
    default_ici_gbps) and the shape is the standard bidirectional-ring
    reduce-scatter + all-gather cost 2*(n-1)/n * bytes / bw (the
    scaling-book recipe).  Latency per hop is ignored (y shards here are
    >= tens of KB, bandwidth-dominated).  Validated only for shape:
    monotone in bytes, ~2x bytes/bw as n grows, zero for n == 1
    (tests/test_parallel.py)."""
    if n_devices <= 1:
        return 0.0
    if ici_gbps is None:
        ici_gbps = default_ici_gbps()
    return (2 * (n_devices - 1) / n_devices) * bytes_per_device \
        / (ici_gbps * 1e9)


def default_dcn_gbps() -> float:
    """Per-host DCN bandwidth for the multi-host model.  The built-in
    25 GB/s is the public per-host v5e data-center-network figure (the
    scaling-book planning number) and is UNVALIDATED here (single-host
    environment); override with WP_DCN_GBPS or the dcn_gbps argument the
    first time a real multi-host run can calibrate it."""
    import os
    return float(os.environ.get("WP_DCN_GBPS", 25.0))


def dcn_allgather_time(bytes_total: int, n_hosts: int,
                       dcn_gbps: float | None = None) -> float:
    """Modeled ring all-gather of ``bytes_total`` (the full vector, built
    from per-host shards) over the DCN axis.  MODEL-ONLY, same caveats as
    :func:`ici_allreduce_time`: standard ring cost (n-1)/n * bytes / bw,
    per-hop latency ignored (the redistributed vectors here are MBs,
    bandwidth-dominated over a ~25 GB/s NIC)."""
    if n_hosts <= 1:
        return 0.0
    if dcn_gbps is None:
        dcn_gbps = default_dcn_gbps()
    return ((n_hosts - 1) / n_hosts) * bytes_total / (dcn_gbps * 1e9)


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
                           np.zeros((extra, S, LANES), wp.idxT.dtype)])
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
                    col_order=wp.col_order, class_map=class_map,
                    opt_waves=wp.opt_waves)


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
                 interpret: bool = False, variant: str = "auto"):
        cfg = config or SpmvConfig()
        self.cfg = cfg
        self.mesh = mesh
        self.interpret = interpret
        self.variant = variant
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
        variant = self.variant
        axis = self.axis

        has_cmap = self.cmap is not None

        def local(vals, idxT, part, block, first, x, *cm):
            cmap = cm[0][0] if has_cmap else None
            y = _spmv_call(vals[0], idxT[0], part[0], block[0], first[0],
                           x, cmap, cfg=cfg, n_blocks=NB,
                           n_parts=NP, interpret=interpret, variant=variant)
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


class ShardedSpmv2D:
    """Row x column sharded SpMV over a 2-D device mesh (axes
    (rows, cols)) — the distributed form of the reference's 2-D tiling
    (row partitions x column partitions, sw/host.cpp:150-151): device
    (i, j) owns row shard i restricted to column shard j, x is sharded
    over "cols" (each device holds only its x_j slice), and the partial
    y_i contributions combine with the semiring's additive collective
    over the "cols" axis (psum / pmin / pmax riding ICI) — the
    reduction the 1-D form never needs.

    The renamed row layout must be IDENTICAL across a row shard's column
    shards for the collective to be meaningful, so hub splitting and the
    row ordering are resolved once per row shard (on the full shard, not
    per (i, j) piece) and passed to every column piece's pack as an
    explicit row_order with splitting disabled.
    """

    def __init__(self, m: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 split_max: int | None | str = None,
                 interpret: bool = False):
        cfg = config or SpmvConfig()
        if cfg.dtype == "fixed":
            raise ValueError("2-D sharding combines partials with a "
                             "collective; fixed-point recombine saturates "
                             "(use ShardedSpmv + host unpack)")
        self.cfg = cfg
        self.mesh = mesh
        self.interpret = interpret
        ar, ac = mesh.axis_names
        self.ar, self.ac = ar, ac
        nr, nc = mesh.devices.shape
        from ..formats.csr import argsort_rows_by_nnz, split_rows
        if split_max == "auto":
            mean = max(float(m.nnz) / max(m.num_rows, 1), 1.0)
            split_max = max(8, 1 << int(round(np.log2(mean))))
        rows_per_shard = -(-m.num_rows // nr)
        cols_per_shard = -(-m.num_cols // nc)
        self.cols_per_shard = cols_per_shard
        grid, self.row_maps, self.row_counts = [], [], []
        for i in range(nr):
            r0 = min(m.num_rows, i * rows_per_shard)
            r1 = min(m.num_rows, r0 + rows_per_shard)
            indptr = m.indptr[r0:r1 + 1] - m.indptr[r0]
            sub = CSRMatrix(r1 - r0, m.num_cols,
                            m.data[m.indptr[r0]:m.indptr[r1]],
                            m.indices[m.indptr[r0]:m.indptr[r1]],
                            np.asarray(indptr))
            # split + order ONCE per row shard -> common renamed layout
            if split_max is not None:
                sub, row_map = split_rows(sub, split_max)
            else:
                row_map = np.arange(sub.num_rows, dtype=np.int64)
            order = argsort_rows_by_nnz(sub, descending=True)
            self.row_maps.append(row_map)
            self.row_counts.append(r1 - r0)
            row = []
            for j in range(nc):
                c0 = min(m.num_cols, j * cols_per_shard)
                c1 = min(m.num_cols, c0 + cols_per_shard)
                sel = (sub.indices >= c0) & (sub.indices < c1)
                cnt = np.zeros(sub.num_rows, np.int64)
                np.add.at(cnt, np.repeat(np.arange(sub.num_rows),
                                         np.diff(sub.indptr))[sel], 1)
                piece = CSRMatrix(
                    sub.num_rows, max(c1 - c0, 1),
                    sub.data[sel], sub.indices[sel] - c0,
                    np.concatenate([[0], np.cumsum(cnt)]))
                row.append(pack(piece, cfg, row_order=order,
                                split_max=None))
            grid.append(row)
        T = max(wp.num_tiles for row in grid for wp in row)
        NB = max(wp.n_blocks for row in grid for wp in row)
        self.n_blocks = NB
        self.n_parts = max(wp.n_parts for row in grid for wp in row)
        self.grid = [[_pad_tiles(wp, T, NB) for wp in row] for row in grid]
        g = self.grid
        stack = lambda f: jax.device_put(
            np.stack([np.stack([f(w) for w in row]) for row in g]))
        self.vals = stack(lambda w: w.vals)
        self.idxT = stack(lambda w: w.idxT)
        self.part = stack(lambda w: w.tile_part)
        self.block = stack(lambda w: w.tile_block)
        self.first = stack(lambda w: w.tile_first)
        self.cmap = (stack(lambda w: w.class_map.reshape(-1))
                     if g[0][0].class_map is not None else None)
        spec = NamedSharding(mesh, P(ar, ac))
        names = ["vals", "idxT", "part", "block", "first"]
        if self.cmap is not None:
            names.append("cmap")
        for name in names:
            setattr(self, name, jax.device_put(getattr(self, name), spec))
        self._build()

    def _build(self):
        cfg, NB, NP = self.cfg, self.n_blocks, self.n_parts
        interpret = self.interpret
        ar, ac = self.ar, self.ac
        has_cmap = self.cmap is not None
        comb = {"plus_times": jax.lax.psum, "min_plus": jax.lax.pmin,
                "max_times": jax.lax.pmax}[cfg.semiring]

        def local(vals, idxT, part, block, first, x, *cm):
            cmap = cm[0][0, 0] if has_cmap else None
            y = _spmv_call(vals[0, 0], idxT[0, 0], part[0, 0], block[0, 0],
                           first[0, 0], x[0], cmap, cfg=cfg, n_blocks=NB,
                           n_parts=NP, interpret=interpret)
            return comb(y, ac)[None]

        in_specs = [P(ar, ac)] * 5 + [P(ac)] + ([P(ar, ac)]
                                                if has_cmap else [])
        self._sharded = jax.jit(jax.shard_map(
            local, mesh=self.mesh, in_specs=tuple(in_specs),
            out_specs=P(ar), check_vma=False))

    def shard_x(self, x) -> np.ndarray:
        """Slice the natural-order x into the (n_cols_shards, width)
        stacked layout the sharded step consumes."""
        nc = self.mesh.devices.shape[1]
        w = self.cols_per_shard
        out = np.zeros((nc, w), np.asarray(x).dtype)
        for j in range(nc):
            c0 = j * w
            c1 = min(np.asarray(x).shape[0], c0 + w)
            if c1 > c0:
                out[j, :c1 - c0] = np.asarray(x)[c0:c1]
        return out

    def __call__(self, x) -> jax.Array:
        """x: natural-order vector (sliced internally) or a pre-stacked
        (n_col_shards, width) array.  Returns per-row-shard renamed y
        blocks, shape (n_row_shards, n_blocks, stripes, 128)."""
        x = np.asarray(x)
        if x.ndim == 1:
            x = self.shard_x(x)
        extra = (self.cmap,) if self.cmap is not None else ()
        return self._sharded(self.vals, self.idxT, self.part, self.block,
                             self.first, jnp.asarray(x), *extra)

    def perf_estimate(self, hbm_gbps: float = 819.0,
                      ici_gbps: float | None = None):
        """Modeled step rate: the slowest (i, j) piece binds the SPMD
        step, plus the cols-axis combine (ici_allreduce_time).

        Returns (per-piece estimates, aggregate GOPS, t_compute_s,
        t_combine_s) so callers can print the ICI term next to the
        compute term."""
        from ..models.perf_model import estimate_pack
        ests = [[estimate_pack(wp, hbm_gbps) for wp in row]
                for row in self.grid]
        t_comp = max(e.time_s for row in ests for e in row)
        nc = self.mesh.devices.shape[1]
        # stripe-folded y shard: (n_blocks, stripes, 128) fp32
        y_bytes = self.n_blocks * self.cfg.stripes * LANES * 4
        t_comb = ici_allreduce_time(y_bytes, nc, ici_gbps)
        nnz = sum(wp.nnz for row in self.grid for wp in row)
        return ests, 2 * nnz / (t_comp + t_comb) / 1e9, t_comp, t_comb

    def unpack_y(self, y_sharded) -> np.ndarray:
        """Assemble natural-order y on host: per row shard, undo the
        common perm then combine hub-split partials over row_map."""
        ys = np.asarray(y_sharded)
        init = {"plus_times": 0.0, "min_plus": np.inf,
                "max_times": -np.inf}[self.cfg.semiring]
        outs = []
        for i, row in enumerate(self.grid):
            wp = row[0]
            y_split = wp.unpack_y(ys[i].reshape(-1))
            n = self.row_counts[i]
            out = np.full(n, init, ys.dtype)
            rm = self.row_maps[i][:y_split.shape[0]]
            if self.cfg.semiring == "plus_times":
                np.add.at(out, rm, y_split)
            elif self.cfg.semiring == "min_plus":
                np.minimum.at(out, rm, y_split)
            else:
                np.maximum.at(out, rm, y_split)
                out = np.maximum(out, 0.0)
            outs.append(out)
        return np.concatenate(outs)


class ShardedSpmvMultiHost(ShardedSpmv2D):
    """Multi-host scale-out: a (hosts x chips-per-host) mesh where the
    FIRST axis spans the data-center network and the second stays inside
    each host's ICI domain.

    The reference never leaves one card (its 16 clusters share one U280,
    spmv.ini:15-30), so multi-host is a framework-native extension; the
    design rule is the scaling-book one — lay shardings out so the hot
    collective rides ICI, never DCN:

      * rows shard over the HOST axis.  Row ownership is disjoint (the
        same argument as the reference's channel merge,
        stream_utils.h:35-75), so the step needs NO cross-host
        collective at all;
      * columns shard over the CHIP axis, and the semiring partial
        combine (psum / pmin / pmax) runs over "chips" only — by
        construction it rides ICI;
      * the only DCN traffic is x redistribution BETWEEN steps (each
        host's y shard all-gathered to every host when iterations
        chain, e.g. PageRank), modeled by :func:`dcn_allgather_time`
        and reported separately by :meth:`perf_estimate`.

    Functionally this is :class:`ShardedSpmv2D` with (rows, cols) ->
    (hosts, chips); the subclass pins the axis semantics and adds the
    DCN term.  Numerics are identical — validated against the 1-D form
    in tests and the driver dryrun.  The environment has one host, so
    like the ICI constant the DCN figure is a labeled model default
    (WP_DCN_GBPS) awaiting a real multi-host calibration run.
    """

    def __init__(self, m: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 split_max: int | None | str = None,
                 interpret: bool = False,
                 dcn_gbps: float | None = None):
        if len(mesh.axis_names) != 2:
            raise ValueError(
                "multi-host mesh needs exactly (hosts, chips) axes")
        self.dcn_gbps = dcn_gbps
        super().__init__(m, mesh, config=config, split_max=split_max,
                         interpret=interpret)
        self.n_hosts, self.chips_per_host = mesh.devices.shape

    def perf_estimate(self, hbm_gbps: float = 819.0,
                      ici_gbps: float | None = None,
                      dcn_gbps: float | None = None,
                      chained: bool = True):
        """(per-piece estimates, aggregate GOPS, t_compute_s, t_ici_s,
        t_dcn_s).  ``t_ici_s`` is the chips-axis combine (inherited
        model); ``t_dcn_s`` is the inter-step x redistribution over
        hosts — zero when ``chained=False`` (one-shot x already
        distributed) or on a single host."""
        ests, _, t_comp, t_ici = super().perf_estimate(hbm_gbps, ici_gbps)
        t_dcn = 0.0
        if chained:
            itemsize = 2 if self.cfg.dtype == "bf16" else 4
            x_bytes = self.grid[0][0].num_cols \
                * self.mesh.devices.shape[1] * itemsize
            t_dcn = dcn_allgather_time(
                x_bytes, self.mesh.devices.shape[0],
                dcn_gbps if dcn_gbps is not None else self.dcn_gbps)
        nnz = sum(wp.nnz for row in self.grid for wp in row)
        gops = 2 * nnz / (t_comp + t_ici + t_dcn) / 1e9
        return ests, gops, t_comp, t_ici, t_dcn
