"""Graph apps on top of SpMV — the GraphLily-lineage application layer.

The reference's unit_tests/test_app.cpp (vestigial gtest from GraphLily)
documents BFS / PageRank / SSSP apps built on the SpMV/SpMSpV overlay; the
shipped host normalizes matrices PageRank-style (sw/data_formatter.h:32-47,
sw/host.cpp:480).  PageRank is the flagship here: it exercises repeated
y = A @ x on the device with the iteration chained entirely in the renamed
(packed) space via the P A P^T column-permuted pack.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpmvConfig
from ..formats.csr import CSRMatrix, argsort_rows_by_nnz, normalize_by_outdegree
from ..formats.wavepack import pack


def build_combine(wp_A, n_rows, order_rows, semiring, interpret,
                  fanout_cap: int = 32):
    """Build the on-device partial-combine pipeline: wavepack SpMVs over
    0/1 selection matrices folding A's partials back to rank layout, with
    the semiring's identity weights (0 for min_plus so combine=min, 1
    otherwise).

    The combine consumes A's y in RANK layout (one free transpose away):
    there a row's virtual partials sit at consecutive positions, so the
    selection columns spread across banks instead of aliasing one bank
    (stride-128 y-slot columns share bank j = c % 128).

    Heavily-split hub rows would make the selection matrix itself hubby
    (one wave per partial), so the combine is a TREE: levels reduce each
    row's partials in chunks of fanout_cap until one value per row remains
    (at most 2 levels in practice).  Returns a list of (Wavepack,
    SpmvOperator); apply in order with y_to_rank between levels.
    """
    import scipy.sparse as sp
    from ..config import SpmvConfig as _SC
    from ..formats.csr import CSRMatrix as _CM
    perm = wp_A.perm
    n_slots_y = perm.shape[0]
    cfgA = wp_A.config
    NB, R = wp_A.n_blocks, cfgA.stripes
    # rank r lives at y slot (r%NB)*RPB + ((r//NB)%R)*128 + (r//NB)//R
    ranks = np.arange(n_slots_y)
    yslot_of_rank = ((ranks % NB) * cfgA.rows_per_block
                     + ((ranks // NB) % R) * 128 + (ranks // NB) // R)
    perm_rank = perm[yslot_of_rank]

    # current layer: for each input position, its target original row
    # (-1 = padding); positions of one row are consecutive in rank order
    target = np.where(perm_rank < n_rows, perm_rank, -1)
    levels = []
    c_cfg = _SC(sublanes=512, bank_blocks=8, stripes=512, two_choice=True,
                semiring=semiring)
    width = n_slots_y
    while True:
        valid = np.nonzero(target >= 0)[0]
        rows_t = target[valid]
        # chunk each row's positions into groups of fanout_cap
        order_pos = np.lexsort((valid, rows_t))
        rt, vp = rows_t[order_pos], valid[order_pos]
        new_row = np.r_[True, rt[1:] != rt[:-1]]
        within = np.arange(rt.size) - np.maximum.accumulate(
            np.where(new_row, np.arange(rt.size), 0))
        chunk = within // fanout_cap
        last_level = (chunk == 0).all()
        if last_level:
            group_ids = rt            # final: group = original row
            n_groups = n_rows
            row_of_group = None
        else:
            key = rt.astype(np.int64) * (within.max() // fanout_cap + 1) + chunk
            uniq, group_ids = np.unique(key, return_inverse=True)
            n_groups = uniq.size
            row_of_group = (uniq // (within.max() // fanout_cap + 1))
        w = (np.zeros(vp.size, np.float32) if semiring == "min_plus"
             else np.ones(vp.size, np.float32))
        C = sp.csr_matrix((w, (group_ids, vp)), shape=(n_groups, width))
        ro = order_rows if last_level else None
        wp_C = pack(_CM(n_groups, width, np.asarray(C.data, np.float32),
                        np.asarray(C.indices, np.int32),
                        np.asarray(C.indptr, np.int64)),
                    c_cfg, row_order=ro)
        levels.append((wp_C, SpmvOperator(wp_C, interpret=interpret, permute_x=False)))
        if last_level:
            return levels
        # next layer input = this level's rank-layout output
        width = wp_C.n_blocks * c_cfg.rows_per_block
        permC = wp_C.perm
        ranksC = np.arange(width)
        yslotC = ((ranksC % wp_C.n_blocks) * c_cfg.rows_per_block
                  + ((ranksC // wp_C.n_blocks) % c_cfg.stripes) * 128
                  + (ranksC // wp_C.n_blocks) // c_cfg.stripes)
        grp_rank = permC[yslotC]
        ok = grp_rank < n_groups
        target = np.where(
            ok, row_of_group[np.minimum(grp_rank, n_groups - 1)], -1)


def apply_combine(levels, y_rank, op_args_list=None):
    """Fold partials through the combine tree; input and output are rank
    layouts."""
    x = y_rank
    for i, (wp_C, op_C) in enumerate(levels):
        if op_args_list is not None:
            x = _op_call(op_C, x, op_args_list[i]).reshape(-1)
        else:
            x = op_C(x, renamed=True)
        x = y_to_rank(wp_C, x)
    return x


def y_to_rank(wp, y_renamed):
    """Transpose a y-layout result into rank layout (free on device):
    rank rho lives at y slot (rho % n_blocks, (rho//n_blocks) % R,
    (rho//n_blocks) // R), so rank order = transpose to (lam, sigma, block)
    then flatten."""
    cfg = wp.config
    yb = y_renamed.reshape(wp.n_blocks, cfg.stripes, 128)
    return yb.transpose(2, 1, 0).reshape(-1)
from ..ops.spmv import SpmvOperator, _spmv_call


def _op_args(op):
    base = (op.vals, op.idxT, op.part, op.block, op.first)
    return base + ((op.cmap,) if op.cmap is not None else ())


def _op_call(op, x, args):
    if op.cmap is not None:
        *arr, cmap = args
    else:
        arr, cmap = args, None
    return _spmv_call(*arr, x, cmap, cfg=op.cfg, n_blocks=op.wp.n_blocks,
                      n_parts=op.wp.n_parts, interpret=op.interpret,
                      variant=op.variant,
                      tiles_per_step=getattr(op, "tb", 1))


class PageRank:
    """Power-iteration PageRank on a square adjacency matrix.

    The matrix is column-normalized (1/outdegree, data_formatter.h:32-47)
    and packed as P A P^T with matched row/column renaming so each iteration
    feeds y straight back as x on device — no per-iteration permutation or
    host round trip.

    Hub rows are split into virtual rows by the packer; their partial sums
    are recombined ON DEVICE by a second (tiny) wavepack SpMV over the 0/1
    selection matrix mapping y slots back to the column-rank layout — the
    combine is itself just SpMV, so the whole iteration stays two kernel
    launches.
    """

    def __init__(self, adj: CSRMatrix, config: SpmvConfig | None = None,
                 damping: float = 0.85, interpret: bool = False,
                 split_max="auto"):
        if adj.num_rows != adj.num_cols:
            raise ValueError("PageRank needs a square adjacency matrix")
        self.n = adj.num_rows
        self.damping = damping
        m = normalize_by_outdegree(adj.astype(np.float32))
        order_cols = argsort_rows_by_nnz(m, descending=True)
        self.wp = pack(m, config, split_max=split_max, col_order=order_cols)
        self.op = SpmvOperator(self.wp, interpret=interpret, permute_x=False)
        cfg = self.wp.config
        self.n_slots_y = self.wp.n_blocks * cfg.rows_per_block
        # column-rank layout: slot i holds original row order_cols[i]
        self.inv = np.empty(self.n, np.int64)
        self.inv[order_cols] = np.arange(self.n)
        self.combine = build_combine(self.wp, self.n, order_cols,
                                     "plus_times", interpret)
        wp_last = self.combine[-1][0]
        self.n_slots_rank = (wp_last.n_blocks
                             * wp_last.config.rows_per_block)
        valid_rank = np.zeros(self.n_slots_rank, np.float32)
        valid_rank[:self.n] = 1.0
        self.valid = jnp.asarray(valid_rank)
        self._uses_combine = True

    def step_fn(self):
        """(fn, args): a jittable step taking the stream arrays as explicit
        arguments (closing over device arrays would embed gigabytes of
        constants in the compiled module)."""
        nA = len(_op_args(self.op))
        opA, combine = self.op, self.combine
        n, damping, valid = self.n, self.damping, self.valid
        wp_A = self.wp
        c_lens = [len(_op_args(op)) for _, op in combine]

        def fn(x, *arrs):
            a_args = arrs[:nA]
            rest = arrs[nA:]
            c_args = []
            off = 0
            for ln in c_lens:
                c_args.append(rest[off:off + ln])
                off += ln
            y = _op_call(opA, x[:n], a_args).reshape(-1)
            xr = y_to_rank(wp_A, y)
            xr = apply_combine(combine, xr, c_args)
            return damping * xr + (1.0 - damping) / n * valid

        args = _op_args(self.op)
        for _, op in combine:
            args = args + _op_args(op)
        return fn, args

    def run(self, iters: int = 20, x0: np.ndarray | None = None) -> np.ndarray:
        """Run power iterations; returns the PageRank vector in original
        row order."""
        xr = np.zeros(self.n_slots_rank, np.float32)
        if x0 is None:
            xr[:self.n] = 1.0 / self.n
        else:
            # rank slot i holds original row order_cols[i]
            xr[self.inv] = x0
        x = jnp.asarray(xr)
        fn, args = self.step_fn()
        step = jax.jit(fn) if not self.op.interpret else fn
        for _ in range(iters):
            x = step(x, *args)
        out = np.asarray(x)
        return out[self.inv]


def pagerank(adj: CSRMatrix, iters: int = 20,
             config: SpmvConfig | None = None, damping: float = 0.85,
             interpret: bool = False) -> np.ndarray:
    return PageRank(adj, config, damping, interpret=interpret).run(iters)


def pagerank_reference(adj: CSRMatrix, iters: int = 20,
                       damping: float = 0.85) -> np.ndarray:
    """Numpy golden PageRank (the CPU-model analog)."""
    m = normalize_by_outdegree(adj.astype(np.float64))
    sp = m.to_scipy()
    n = adj.num_rows
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        x = damping * (sp @ x) + (1 - damping) / n
    return x


class SSSP:
    """Single-source shortest paths by Bellman-Ford over the tropical
    (min,+) semiring: d' = min(d, A_minplus @ d).  The SpMV-as-semiring app
    tier of the GraphLily lineage (unit_tests/test_app.cpp)."""

    def __init__(self, adj: CSRMatrix, config: SpmvConfig | None = None,
                 interpret: bool = False):
        import dataclasses as _dc
        if adj.num_rows != adj.num_cols:
            raise ValueError("SSSP needs a square weighted adjacency matrix")
        cfg = config or SpmvConfig()
        cfg = _dc.replace(cfg, semiring="min_plus", dtype="fp32",
                          steal_mantissa=False)
        self.n = adj.num_rows
        # transpose so y[v] = min over in-edges (u,v): w(u,v) + d[u]
        from ..formats.csr import csr_to_csc
        at = csr_to_csc(adj.astype(np.float32))
        order = argsort_rows_by_nnz(at, descending=True)
        self.wp = pack(at, cfg, split_max="auto", col_order=order)
        self.op = SpmvOperator(self.wp, interpret=interpret, permute_x=False)
        self.inv = np.empty(self.n, np.int64)
        self.inv[order] = np.arange(self.n)
        self.combine = build_combine(self.wp, self.n, order,
                                     "min_plus", interpret)
        wp_last = self.combine[-1][0]
        self.n_slots = wp_last.n_blocks * wp_last.config.rows_per_block

    def step_fn(self):
        """(fn, args): a jittable relaxation step taking the stream arrays
        as explicit arguments (closing over device arrays would embed
        gigabytes of constants in the compiled module — the HTTP-413
        remote-compile hazard).  ``fn(x, *args) -> (x_new, changed)``."""
        nA = len(_op_args(self.op))
        opA, combine = self.op, self.combine
        n, wp_A = self.n, self.wp
        c_lens = [len(_op_args(op)) for _, op in combine]

        def fn(x, *arrs):
            a_args = arrs[:nA]
            rest = arrs[nA:]
            c_args = []
            off = 0
            for ln in c_lens:
                c_args.append(rest[off:off + ln])
                off += ln
            y = _op_call(opA, x[:n], a_args).reshape(-1)
            y_rank = y_to_rank(wp_A, y)
            x_new = jnp.minimum(x, apply_combine(combine, y_rank, c_args))
            return x_new, jnp.any(x_new < x)

        args = _op_args(self.op)
        for _, op in combine:
            args = args + _op_args(op)
        return fn, args

    def run(self, source: int, iters: int | None = None,
            masked: bool = False) -> np.ndarray:
        """Bellman-Ford with a device-side convergence check: each step
        also returns whether any distance improved (the relaxation
        fixpoint test), so the loop exits after O(diameter) iterations
        instead of the n-1 worst case — the same early-exit BFS gets from
        its empty-frontier check.  ``iters`` caps the iteration count
        (defaults to the Bellman-Ford bound n-1).

        ``masked=True`` runs sparse Bellman-Ford (the SpMSpV analog):
        each step streams only the tile groups reachable from distances
        that CHANGED last step.  Correct because distances are monotone
        non-increasing — contributions of unchanged columns are already
        folded into the running minimum — the GraphLily sparse-frontier
        pattern (unit_tests/test_module_spmv_spmspv.cpp)."""
        iters = iters if iters is not None else self.n - 1
        d = np.full(self.n_slots, np.inf, np.float32)
        d[self.inv[source]] = 0.0
        self.iters_run = 0
        if masked:
            x = d
            changed = np.zeros(self.n_slots, bool)
            changed[self.inv[source]] = True
            for _ in range(iters):
                act = np.nonzero(changed[:self.n])[0]
                if len(act) == 0:
                    break
                y = self.op.masked(jnp.asarray(x[:self.n]), act,
                                   renamed=True)
                y_rank = np.asarray(
                    apply_combine(self.combine, y_to_rank(self.wp, y)))
                x_new = np.minimum(x, y_rank)
                changed = x_new < x
                x = x_new
                self.iters_run += 1
            return x[self.inv]
        x = jnp.asarray(d)
        fn, args = self.step_fn()
        step = jax.jit(fn) if not self.op.interpret else fn
        for _ in range(iters):
            x, changed = step(x, *args)
            self.iters_run += 1
            if not bool(np.asarray(changed)):
                break
        out = np.asarray(x)[self.inv]
        return out


def sssp_reference(adj: CSRMatrix, source: int) -> np.ndarray:
    import scipy.sparse.csgraph as csgraph
    return csgraph.dijkstra(adj.to_scipy(), indices=source)


class BFS:
    """Breadth-first search by frontier iteration over max-times on 0/1
    weights (boolean or-and): reached' = reached | (A^T and frontier)."""

    def __init__(self, adj: CSRMatrix, config: SpmvConfig | None = None,
                 interpret: bool = False):
        import dataclasses as _dc
        cfg = config or SpmvConfig()
        cfg = _dc.replace(cfg, semiring="max_times", dtype="fp32",
                          steal_mantissa=False)
        self.n = adj.num_rows
        from ..formats.csr import csr_to_csc
        at = csr_to_csc(adj)
        at = CSRMatrix(at.num_rows, at.num_cols,
                       np.ones(at.nnz, np.float32), at.indices, at.indptr)
        order = argsort_rows_by_nnz(at, descending=True)
        self.wp = pack(at, cfg, split_max="auto", col_order=order)
        self.op = SpmvOperator(self.wp, interpret=interpret, permute_x=False)
        self.inv = np.empty(self.n, np.int64)
        self.inv[order] = np.arange(self.n)
        self.combine = build_combine(self.wp, self.n, order,
                                     "max_times", interpret)
        wp_last = self.combine[-1][0]
        self.n_slots = wp_last.n_blocks * wp_last.config.rows_per_block

    def step_fn(self):
        """(fn, args): jittable frontier step with stream arrays as
        explicit arguments (see SSSP.step_fn for why).
        ``fn(frontier, reached, *args) -> (next_frontier, reached, newly)``.
        """
        nA = len(_op_args(self.op))
        opA, combine = self.op, self.combine
        n, wp_A = self.n, self.wp
        c_lens = [len(_op_args(op)) for _, op in combine]

        def fn(frontier, reached, *arrs):
            a_args = arrs[:nA]
            rest = arrs[nA:]
            c_args = []
            off = 0
            for ln in c_lens:
                c_args.append(rest[off:off + ln])
                off += ln
            raw = _op_call(opA, frontier[:n], a_args).reshape(-1)
            raw_rank = y_to_rank(wp_A, raw)
            y = apply_combine(combine, raw_rank, c_args)
            y = jnp.where(y > 0, 1.0, 0.0)
            newly = jnp.maximum(y - reached, 0.0)
            reached2 = jnp.maximum(reached, y)
            return newly, reached2, newly

        args = _op_args(self.op)
        for _, op in combine:
            args = args + _op_args(op)
        return fn, args

    def run(self, source: int, max_iters: int | None = None,
            masked: bool = False) -> np.ndarray:
        """Returns BFS level per node (-1 = unreachable).

        ``masked=True`` streams only the tile groups the current frontier
        can touch (sparse-frontier SpMSpV analog) — on high-diameter
        graphs early frontiers are tiny and most of the matrix never
        leaves HBM."""
        max_iters = max_iters if max_iters is not None else self.n
        level = np.full(self.n, -1, np.int64)
        level[source] = 0
        if masked:
            frontier = np.zeros(self.n_slots, np.float32)
            frontier[self.inv[source]] = 1.0
            reached = frontier.copy()
            for it in range(1, max_iters + 1):
                act = np.nonzero(frontier[:self.n])[0]
                if len(act) == 0:
                    break
                raw = self.op.masked(jnp.asarray(frontier[:self.n]), act,
                                     renamed=True)
                y = np.asarray(apply_combine(
                    self.combine, y_to_rank(self.wp, raw)))
                y = (y > 0).astype(np.float32)
                newly = np.maximum(y - reached, 0.0)
                if not newly.any():
                    break
                reached = np.maximum(reached, y)
                frontier = newly
                level[self._rank_to_orig(np.nonzero(newly > 0)[0])] = it
            return level
        frontier = np.zeros(self.n_slots, np.float32)
        frontier[self.inv[source]] = 1.0
        reached = frontier.copy()
        x = jnp.asarray(frontier)
        reached_j = jnp.asarray(reached)
        sfn, args = self.step_fn()
        fn = jax.jit(sfn) if not self.op.interpret else sfn
        for it in range(1, max_iters + 1):
            x, reached_j, newly = fn(x, reached_j, *args)
            new_np = np.asarray(newly)
            if not new_np.any():
                break
            level[self._rank_to_orig(np.nonzero(new_np > 0)[0])] = it
        return level

    def _rank_to_orig(self, ranks):
        order = np.empty(self.n_slots, np.int64)
        order.fill(-1)
        order[self.inv] = np.arange(self.n)
        ids = order[ranks]
        return ids[ids >= 0]
