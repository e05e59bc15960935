"""Distributed graph apps — the GraphLily-lineage app tier over the mesh.

The reference's apps (PageRank / SSSP / BFS, unit_tests/test_app.cpp)
run on its single-card 16-cluster pipeline; the framework's app tier
must also scale past one chip.  Each app here row-shards its (semiring)
matrix like :class:`~.mesh.ShardedSpmv` and chains iterations ENTIRELY
on the mesh — one ``jit`` per run, the iteration loop a device-side
``fori_loop`` / ``while_loop`` (SSSP and BFS keep their convergence
early-exit inside the loop condition), and one ``all_gather`` per
iteration re-replicating the new vector over ICI.

Unlike the single-chip apps (models/apps.py), which chain iterations in
the RENAMED space via the P A Pᵀ column-permuted pack, the mesh forms
keep the iterate in NATURAL order (the all_gather'd vector means the
same thing on every device).  The renamed-y -> natural-shard fold is
itself a packed SpMV (``fold="combine"``, the default): each device
builds ONE 0/1 selection pack mapping its rank-layout partials to its
natural row shard — ``row_order=arange`` makes the combine's rank
layout literally natural order — so hub-split partials recombine at
kernel rate and the iteration never touches XLA's TPU scatter (the
measured ~0.15 Gelem/s soft spot, scratch/probe_emit.py).
``fold="scatter"`` keeps the one-semiring-scatter form
(`.at[].add/min/max` over the pack's perm) as the simple oracle both
paths are tested against.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix, csr_to_csc, normalize_by_outdegree
from ..ops.spmv import _spmv_call
from .mesh import _pack_shards, _pad_tiles
from .train import _row_shards

_SCATTER = {
    "plus_times": lambda out, idx, v: out.at[idx].add(v),
    "min_plus": lambda out, idx, v: out.at[idx].min(v),
    # max_times app values are nonnegative (0/1 reachability), so 0 is
    # the identity exactly like the host unpack's final max(out, 0)
    "max_times": lambda out, idx, v: out.at[idx].max(v),
}
_IDENT = {"plus_times": 0.0, "min_plus": np.inf, "max_times": 0.0}


class _ShardedSemiringStep:
    """One mesh-wide ``y = A (x)`` step over a row-sharded semiring pack:
    per device the packed-stream kernel, one semiring scatter to the
    natural row shard, one ``all_gather``.  ``step(x_full) -> y_full``
    with both vectors natural-order, padded to ``n_devices *
    rows_per_shard``, replicated."""

    def __init__(self, m: CSRMatrix, mesh: Mesh, cfg: SpmvConfig,
                 split_max, interpret: bool, fold: str = "combine"):
        if fold not in ("combine", "scatter"):
            raise ValueError(f"unknown fold mode {fold!r}")
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        self.cfg = cfg
        self.fold = fold
        self.interpret = interpret
        nd = mesh.devices.size
        self.n_devices = nd
        subs, rps = _row_shards(m, nd)
        self.rows_per_shard = rps
        self.num_rows, self.num_cols = m.num_rows, m.num_cols
        packs = _pack_shards(subs, cfg, split_max)
        T = max(w.num_tiles for w in packs)
        NB = max(w.n_blocks for w in packs)
        self.packs = [_pad_tiles(w, T, NB) for w in packs]
        self.n_blocks, self.n_parts = NB, self.packs[0].n_parts
        spec = NamedSharding(mesh, P(self.axis))
        stack = lambda f: jax.device_put(
            np.stack([f(w) for w in self.packs]), spec)
        aux = {
            "vals": stack(lambda w: np.asarray(w.vals)),
            "idxT": stack(lambda w: np.asarray(w.idxT)),
            "part": stack(lambda w: w.tile_part),
            "block": stack(lambda w: w.tile_block),
            "first": stack(lambda w: w.tile_first),
            "perm": stack(lambda w: w.perm.astype(np.int32)),
        }
        if self.packs[0].class_map is not None:
            aux["cmap"] = stack(lambda w: w.class_map.reshape(-1))
        if fold == "combine":
            # one 0/1 selection pack per device folding its rank-layout
            # partials straight to the natural local row shard: fanout_cap
            # above the worst hub-split fan-in forces a SINGLE level, and
            # row_order=arange makes the combine's rank layout == natural
            # order (models/apps.py:build_combine builds the matrix)
            from ..models.apps import build_combine
            fan = 1
            for w in self.packs:
                p = w.perm[w.perm < rps].astype(np.int64)
                if p.size:
                    fan = max(fan, int(np.bincount(p).max()))
            levels = [build_combine(w, rps, np.arange(rps), cfg.semiring,
                                    interpret, fanout_cap=max(fan + 1, 32))
                      for w in self.packs]
            assert all(len(lv) == 1 for lv in levels), \
                "mesh combine must be single-level by fanout_cap choice"
            cpk = [lv[0][0] for lv in levels]
            TC = max(w.num_tiles for w in cpk)
            NBC = max(w.n_blocks for w in cpk)
            cpk = [_pad_tiles(w, TC, NBC) for w in cpk]
            assert len({w.n_parts for w in cpk}) == 1    # common width
            self.c_cfg = cpk[0].config
            self.c_blocks, self.c_parts = NBC, cpk[0].n_parts
            cstack = lambda f: jax.device_put(
                np.stack([f(w) for w in cpk]), spec)
            aux["c_vals"] = cstack(lambda w: np.asarray(w.vals))
            aux["c_idxT"] = cstack(lambda w: np.asarray(w.idxT))
            aux["c_part"] = cstack(lambda w: w.tile_part)
            aux["c_block"] = cstack(lambda w: w.tile_block)
            aux["c_first"] = cstack(lambda w: w.tile_first)
        self.aux = aux

    def local_step(self):
        """The per-device step body (for composing inside a caller's
        shard_map loop): ``f(x_full, aux) -> y_full``."""
        cfg, NB, NP = self.cfg, self.n_blocks, self.n_parts
        n, rps, axis = self.num_cols, self.rows_per_shard, self.axis
        interpret = self.interpret
        has_cmap = "cmap" in self.aux
        combine = self.fold == "combine"
        if combine:
            c_cfg, CB, CP = self.c_cfg, self.c_blocks, self.c_parts
        scatter = _SCATTER[cfg.semiring]
        ident = _IDENT[cfg.semiring]

        def f(x, aux):
            y = _spmv_call(aux["vals"][0], aux["idxT"][0], aux["part"][0],
                           aux["block"][0], aux["first"][0], x[:n],
                           aux["cmap"][0] if has_cmap else None,
                           cfg=cfg, n_blocks=NB, n_parts=NP,
                           interpret=interpret)
            if combine:
                # rank layout of A's y feeds the selection pack; the
                # combine's own rank layout IS the natural local shard
                xr = y.reshape(NB, cfg.stripes, 128).transpose(2, 1, 0)
                yc = _spmv_call(aux["c_vals"][0], aux["c_idxT"][0],
                                aux["c_part"][0], aux["c_block"][0],
                                aux["c_first"][0], xr.reshape(-1),
                                cfg=c_cfg, n_blocks=CB, n_parts=CP,
                                interpret=interpret)
                y_d = yc.reshape(CB, c_cfg.stripes, 128) \
                        .transpose(2, 1, 0).reshape(-1)[:rps]
            else:
                out = jnp.full((rps + 1,), ident, y.dtype)
                y_d = scatter(out, aux["perm"][0], y.reshape(-1))[:rps]
            return jax.lax.all_gather(y_d, axis, tiled=True)

        return f

    def smap(self, f, nargs):
        """shard_map ``f(*replicated_args, aux)`` (aux LAST, sharded over
        the mesh; everything else replicated, including outputs).
        ``nargs`` counts all of f's arguments, aux included."""
        aux_specs = {k: P(self.axis) for k in self.aux}
        in_specs = tuple([P()] * (nargs - 1) + [aux_specs])
        return jax.shard_map(f, mesh=self.mesh, in_specs=in_specs,
                             out_specs=P(), check_vma=False)


class ShardedPageRank:
    """Power-iteration PageRank over the mesh: the whole run is ONE jit —
    a device-side ``fori_loop`` whose body is {packed SpMV on the local
    row shard, scatter-fold to natural order, all_gather, damped
    update}.  Matches :func:`~..models.apps.pagerank_reference` and the
    single-chip :class:`~..models.apps.PageRank`."""

    def __init__(self, adj: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None, damping: float = 0.85,
                 interpret: bool = False, split_max="auto",
                 fold: str = "combine"):
        if adj.num_rows != adj.num_cols:
            raise ValueError("PageRank needs a square adjacency matrix")
        cfg = config or SpmvConfig()
        if cfg.semiring != "plus_times" or cfg.dtype == "fixed":
            raise ValueError("PageRank runs on the plus_times float path")
        self.n = adj.num_rows
        self.damping = damping
        m = normalize_by_outdegree(adj.astype(np.float32))
        self.st = _ShardedSemiringStep(m, mesh, cfg, split_max, interpret,
                                       fold)
        nd, rps = self.st.n_devices, self.st.rows_per_shard
        valid = np.zeros(nd * rps, np.float32)
        valid[:self.n] = 1.0
        self._valid = jnp.asarray(valid)
        step = self.st.local_step()
        n_f, damp = float(self.n), damping

        def run(iters, x0, valid, aux):
            def body(_, x):
                y = step(x, aux)
                return damp * y + (1.0 - damp) / n_f * valid

            return jax.lax.fori_loop(0, iters, body, x0)

        self._run = jax.jit(self.st.smap(run, 4))

    def run(self, iters: int = 20,
            x0: np.ndarray | None = None) -> np.ndarray:
        """Returns the PageRank vector in original row order."""
        nd, rps = self.st.n_devices, self.st.rows_per_shard
        xf = np.zeros(nd * rps, np.float32)
        xf[:self.n] = (1.0 / self.n) if x0 is None else x0
        out = self._run(jnp.int32(iters), jnp.asarray(xf), self._valid,
                        self.st.aux)
        return np.asarray(out)[:self.n]


class ShardedSSSP:
    """Bellman-Ford (min,+) over the mesh with the device-side
    convergence early-exit: one jit, a ``while_loop`` that stops as soon
    as no distance improves (O(diameter) iterations).  The matrix is
    transposed at build time so y[v] folds over in-edges, exactly like
    the single-chip :class:`~..models.apps.SSSP`."""

    def __init__(self, adj: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 interpret: bool = False, split_max="auto",
                 fold: str = "combine"):
        import dataclasses as _dc
        if adj.num_rows != adj.num_cols:
            raise ValueError("SSSP needs a square weighted adjacency matrix")
        cfg = config or SpmvConfig()
        cfg = _dc.replace(cfg, semiring="min_plus", dtype="fp32",
                          steal_mantissa=False)
        self.n = adj.num_rows
        at = csr_to_csc(adj.astype(np.float32))
        self.st = _ShardedSemiringStep(at, mesh, cfg, split_max, interpret,
                                       fold)
        step = self.st.local_step()

        def run(max_iters, d0, aux):
            def cond(state):
                _, changed, it = state
                return jnp.logical_and(changed, it < max_iters)

            def body(state):
                d, _, it = state
                y = step(d, aux)
                d2 = jnp.minimum(d, y)
                return d2, jnp.any(d2 < d), it + 1

            d, _, it = jax.lax.while_loop(
                cond, body, (d0, jnp.bool_(True), jnp.int32(0)))
            return d, it

        self._run = jax.jit(self.st.smap(run, 3))

    def run(self, source: int, iters: int | None = None) -> np.ndarray:
        """Distances from ``source`` in original row order (inf =
        unreachable); ``self.iters_run`` records the device loop count."""
        iters = iters if iters is not None else self.n - 1
        nd, rps = self.st.n_devices, self.st.rows_per_shard
        d0 = np.full(nd * rps, np.inf, np.float32)
        d0[source] = 0.0
        d, it = self._run(jnp.int32(iters), jnp.asarray(d0), self.st.aux)
        self.iters_run = int(it)
        return np.asarray(d)[:self.n]


class ShardedBFS:
    """Frontier BFS (max,times on 0/1 weights) over the mesh: one jit,
    the level bookkeeping kept on device inside the ``while_loop`` (the
    single-chip form round-trips each frontier to host)."""

    def __init__(self, adj: CSRMatrix, mesh: Mesh,
                 config: SpmvConfig | None = None,
                 interpret: bool = False, split_max="auto",
                 fold: str = "combine"):
        import dataclasses as _dc
        cfg = config or SpmvConfig()
        cfg = _dc.replace(cfg, semiring="max_times", dtype="fp32",
                          steal_mantissa=False)
        self.n = adj.num_rows
        at = csr_to_csc(adj)
        at = CSRMatrix(at.num_rows, at.num_cols,
                       np.ones(at.nnz, np.float32), at.indices, at.indptr)
        self.st = _ShardedSemiringStep(at, mesh, cfg, split_max, interpret,
                                       fold)
        step = self.st.local_step()

        def run(max_iters, frontier0, reached0, level0, aux):
            def cond(state):
                frontier, _, _, it = state
                return jnp.logical_and(jnp.any(frontier > 0),
                                       it <= max_iters)

            def body(state):
                frontier, reached, level, it = state
                y = step(frontier, aux)
                hit = y > 0
                newly = jnp.logical_and(hit, jnp.logical_not(reached > 0))
                level = jnp.where(newly, it, level)
                reached = jnp.maximum(reached, hit.astype(reached.dtype))
                return (newly.astype(frontier.dtype), reached, level,
                        it + 1)

            _, _, level, _ = jax.lax.while_loop(
                cond, body,
                (frontier0, reached0, level0, jnp.int32(1)))
            return level

        self._run = jax.jit(self.st.smap(run, 5))

    def run(self, source: int, max_iters: int | None = None) -> np.ndarray:
        """BFS level per node in original row order (-1 = unreachable)."""
        max_iters = max_iters if max_iters is not None else self.n
        nd, rps = self.st.n_devices, self.st.rows_per_shard
        frontier = np.zeros(nd * rps, np.float32)
        frontier[source] = 1.0
        level = np.full(nd * rps, -1, np.int32)
        level[source] = 0
        out = self._run(jnp.int32(max_iters), jnp.asarray(frontier),
                        jnp.asarray(frontier.copy()), jnp.asarray(level),
                        self.st.aux)
        return np.asarray(out)[:self.n]
