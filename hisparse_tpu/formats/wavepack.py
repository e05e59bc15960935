"""Wavepack — the TPU-native successor of the reference's CPSR format.

The reference turns SpMV into fully-sequential HBM streams with a custom
format (CPSR: ``csr2cpsr``, sw/data_formatter.h:465-544) and resolves the
x-gather / y-scatter conflicts **at run time** with an arbitrated 8x8
crossbar ("shuffler", spmv/libfpga/shuffle.h:211-377) and stall-free PEs
(spmv/libfpga/pe.h:22-90).  A TPU has no arbitrated crossbar, but its VPU
has a *static* per-sublane 128-lane crossbar (``tpu.dynamic_gather`` along
lanes).  Wavepack therefore moves the entire arbitration into the
preprocessor: nonzeros are scheduled into conflict-free "waves" offline, so
the kernel executes pure data-independent vector ops at line rate.

Format geometry (see config.SpmvConfig):

  * A **wave** is one sublane of a streamed (S, 128) tile: 128 slots.
  * **Gather slot** (w, j): lane j is the *column bank*; the nonzero placed
    there must have ``col % 128 == j``.  Its in-bank address
    ``a = col//128`` splits into source block ``b = a//128`` and offset
    ``h = a%128``; the kernel gathers ``x_bank[a, j]`` with one lane-gather
    per (128-sublane group, block) from a pre-transposed x tile.
    This is the analog of the banked vector buffer + col-shuffle
    (vecbuf_access_unit.h:18-84, shuffle keyed on col shuffle.h:24-99).
  * **Dest slot** (w, lam): lane lam is the *row lane*; the row placed there
    must satisfy ``renamed_row % 128 == lam`` and its stripe
    ``sigma = renamed_row//128`` must satisfy ``sigma == (w % S) % R``.
    Products are routed gather-slot -> dest-slot by a second lane-gather
    (the analog of the row-shuffle, shuffle.h:102-177) and accumulated into
    a resident (S,128) accumulator; a block flush reduces sublanes
    ``s = sigma mod R`` into the (R,128) output tile (the PE output stage,
    pe.h:95-116).
  * Rows are renamed by descending nnz before assignment (the load-balance
    reordering the reference ships but leaves unused,
    data_formatter.h:337-368 — here it is load-bearing).
  * Tiles stream per (row block, column partition), the analog of the
    row/col partition loops (sw/host.cpp:335-357, spmv_vector_loader.cpp:22-68).

Scheduling constraints per wave (all enforced here, offline):
  1. at most one nonzero per gather slot  (distinct banks)
  2. at most one nonzero per dest slot    (distinct row lanes)
  3. wave sublane s only hosts rows of stripe ``s % R``

Stream encoding per tile:
  * ``vals``  (S,128) value dtype, at DEST slots (multiply happens after the
    row-crossbar).  Padding slots hold 0.
  * ``idxT``  (S,128) int32, holding for slot (s,j) the packed fields
    ``src(7) << 10 | b(3) << 7 | h(7)`` **stored at the per-group transposed
    position** (g*128 + j, s mod 128 ...) so the kernel's gathers consume
    them without an extra transpose.  ``h``/``b`` describe the slot's
    gather role; ``src`` describes its dest role (which gather lane feeds
    this dest slot).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import LANES, SpmvConfig
from .csr import CSRMatrix, argsort_rows_by_nnz


@dataclasses.dataclass
class Wavepack:
    """A packed matrix: streams + schedule metadata (CPSRMatrix analog,
    data_formatter.h:195-238)."""

    config: SpmvConfig
    num_rows: int              # original (unpadded) dims
    num_cols: int
    n_blocks: int
    n_parts: int
    perm: np.ndarray           # (n_blocks*R*128,) renamed -> original row id
                               #  (entries >= num_rows are padding rows)
    vals: np.ndarray           # (T, S, 128) float32 / uint32(fixed)
    idxT: np.ndarray           # (T, S, 128) int32, transposed-layout fields
    tile_part: np.ndarray      # (T,) int32  column partition of each tile
    tile_block: np.ndarray     # (T,) int32  row block of each tile
    tile_first: np.ndarray     # (T,) int32  1 on the first tile of a block
    tile_last: np.ndarray      # (T,) int32  1 on the last tile of a block
    nnz: int

    @property
    def num_tiles(self) -> int:
        return self.vals.shape[0]

    @property
    def fill(self) -> float:
        """Slot occupancy — the analog of the reference's beta padding ratio
        (performance_model.cpp:430-444)."""
        return self.nnz / max(self.num_tiles * self.config.tile_slots, 1)

    @property
    def stream_bytes(self) -> int:
        return self.vals.nbytes + self.idxT.nbytes

    def inv_perm(self) -> np.ndarray:
        inv = np.full(self.perm.shape[0], -1, np.int64)
        inv[self.perm] = np.arange(self.perm.shape[0])
        return inv[:self.num_rows]


def pack(m: CSRMatrix, config: SpmvConfig | None = None,
         row_order: np.ndarray | None = None) -> Wavepack:
    """Pack a CSR matrix into wavepack streams (csr2cpsr analog,
    data_formatter.h:465-544).

    This is the numpy reference packer; `hisparse_tpu.formats.native` holds
    the C++ production packer with identical output (validated against this
    one in tests).
    """
    cfg = config or SpmvConfig()
    S, R, B = cfg.sublanes, cfg.stripes, cfg.bank_blocks
    RPB = cfg.rows_per_block          # rows per block
    VB = cfg.vb_cols                  # cols per partition
    n_blocks = max(1, -(-m.num_rows // RPB))
    n_parts = max(1, -(-m.num_cols // VB))

    # --- row renaming: sort by nnz descending (data_formatter.h:337-368) ---
    if row_order is None:
        row_order = argsort_rows_by_nnz(m, descending=True)
    perm = np.concatenate([row_order,
                           np.arange(m.num_rows, n_blocks * RPB)]).astype(np.int64)

    # renamed id of each original row
    rank = np.empty(n_blocks * RPB, np.int64)
    rank[perm] = np.arange(n_blocks * RPB)

    nnz_total = m.nnz
    row_of_nz = np.repeat(np.arange(m.num_rows), np.diff(m.indptr))
    rho_all = rank[row_of_nz]                       # renamed row per nonzero
    col_all = m.indices.astype(np.int64)
    part_all = col_all // VB
    c_in = col_all % VB
    bank_all = (c_in % LANES).astype(np.int32)      # gather lane j
    a_all = (c_in // LANES).astype(np.int32)        # in-bank address
    blk_of_nz = (rho_all // RPB).astype(np.int32)   # row block

    tiles_v, tiles_i = [], []
    t_part, t_block = [], []
    val_dtype = m.data.dtype if cfg.dtype == "fixed" else np.float32
    G = cfg.groups

    for bk in range(n_blocks):
        for p in range(n_parts):
            sel = np.nonzero((blk_of_nz == bk) & (part_all == p))[0]
            if sel.size == 0:
                continue
            rho = (rho_all[sel] % RPB).astype(np.int64)
            lam = (rho % LANES).astype(np.int64)
            sigma = (rho // LANES).astype(np.int64)
            j = bank_all[sel]
            a = a_all[sel]
            vals_nz = m.data[sel].astype(val_dtype)

            # process rows heavy-first for first-fit quality
            order = np.lexsort((np.arange(sel.size),))  # stable original order
            # per-row counts to sort rows by in-part nnz desc
            counts = np.bincount(rho, minlength=RPB)
            row_heavy_rank = np.argsort(-counts, kind="stable")
            row_pos = np.empty(RPB, np.int64)
            row_pos[row_heavy_rank] = np.arange(RPB)
            order = np.lexsort((order, row_pos[rho]))

            K_CHUNK = 64
            dest_occ = np.zeros((K_CHUNK, R, LANES), bool)
            src_occ = np.zeros((K_CHUNK, R, LANES), bool)
            k_of = np.empty(sel.size, np.int64)
            row_k = {}
            K_cap = K_CHUNK
            max_k = -1
            for idx in order:
                sg, lm, jj = int(sigma[idx]), int(lam[idx]), int(j[idx])
                k = row_k.get((sg, lm), 0)
                while True:
                    if k >= K_cap:
                        grow = np.zeros((K_cap, R, LANES), bool)
                        dest_occ = np.concatenate([dest_occ, grow])
                        src_occ = np.concatenate([src_occ, grow.copy()])
                        K_cap *= 2
                    if not dest_occ[k, sg, lm] and not src_occ[k, sg, jj]:
                        break
                    k += 1
                dest_occ[k, sg, lm] = True
                src_occ[k, sg, jj] = True
                row_k[(sg, lm)] = k + 1
                k_of[idx] = k
                if k > max_k:
                    max_k = k

            # wave index w = sigma + k*R ; tiles of S waves
            w = sigma + k_of * R
            W = int(w.max()) + 1
            T_bp = -(-W // S)
            t_loc = (w // S).astype(np.int64)
            s_loc = (w % S).astype(np.int64)

            va = np.zeros((T_bp, S, LANES), val_dtype)
            ha = np.zeros((T_bp, S, LANES), np.int32)
            ba = np.zeros((T_bp, S, LANES), np.int32)
            sa = np.zeros((T_bp, S, LANES), np.int32)
            # gather-role fields at (t, s, bank)
            ha[t_loc, s_loc, j] = a % 128
            ba[t_loc, s_loc, j] = a // 128
            # dest-role fields at (t, s, row lane)
            va[t_loc, s_loc, lam] = vals_nz
            sa[t_loc, s_loc, lam] = j

            packed = (sa << 10) | (ba << 7) | ha
            idxT = (packed.reshape(T_bp, G, 128, 128)
                    .swapaxes(2, 3).reshape(T_bp, S, LANES))
            tiles_v.append(va)
            tiles_i.append(idxT.astype(np.int32))
            t_part.extend([p] * T_bp)
            t_block.extend([bk] * T_bp)

    if not tiles_v:  # fully-empty matrix: one all-padding tile
        tiles_v = [np.zeros((1, S, LANES), val_dtype)]
        tiles_i = [np.zeros((1, S, LANES), np.int32)]
        t_part, t_block = [0], [0]

    vals = np.concatenate(tiles_v)
    idxT = np.concatenate(tiles_i)
    t_block_arr = np.asarray(t_block, np.int32)
    t_part_arr = np.asarray(t_part, np.int32)
    first = np.zeros(len(t_block), np.int32)
    last = np.zeros(len(t_block), np.int32)
    prev = None
    for i, bkk in enumerate(t_block):
        if bkk != prev:
            first[i] = 1
            if i:
                last[i - 1] = 1
            prev = bkk
    last[-1] = 1

    return Wavepack(cfg, m.num_rows, m.num_cols, n_blocks, n_parts, perm,
                    vals, idxT, t_part_arr, t_block_arr, first, last,
                    nnz=nnz_total)


def decode(wp: Wavepack) -> CSRMatrix:
    """Golden stream decoder — reconstruct the matrix the streams encode.

    The analog of the reference's csim as a *format* oracle
    (spmv_csim/csim.cpp:22-136): it exercises the encoding/schedule,
    catching packing bugs the math model cannot.  Nonzeros with value 0 are
    dropped on both sides of the comparison.
    """
    cfg = wp.config
    S, R, G = cfg.sublanes, cfg.stripes, cfg.groups
    RPB, VB = cfg.rows_per_block, cfg.vb_cols
    rows, cols, vals = [], [], []
    for t in range(wp.num_tiles):
        bk = int(wp.tile_block[t])
        p = int(wp.tile_part[t])
        packed = (wp.idxT[t].reshape(G, 128, 128)
                  .swapaxes(1, 2).reshape(S, LANES).astype(np.int64))
        h = packed & 0x7F
        b = (packed >> 7) & 0x7
        src = (packed >> 10) & 0x7F
        v = wp.vals[t]
        s_idx, lam_idx = np.nonzero(v != 0)
        jj = src[s_idx, lam_idx]
        a = b[s_idx, jj] * 128 + h[s_idx, jj]
        col = p * VB + a * LANES + jj
        sigma = s_idx % R
        rho = bk * RPB + sigma * LANES + lam_idx
        rows.append(wp.perm[rho])
        cols.append(col)
        vals.append(v[s_idx, lam_idx])
    if rows:
        rows = np.concatenate(rows)
        cols = np.concatenate(cols)
        vals = np.concatenate(vals)
    else:
        rows = np.zeros(0, np.int64); cols = np.zeros(0, np.int64)
        vals = np.zeros(0, wp.vals.dtype)
    import scipy.sparse as sp
    coo = sp.coo_matrix((vals, (rows, cols)),
                        shape=(max(wp.num_rows, 1), max(wp.num_cols, 1)))
    return CSRMatrix.from_scipy(coo.tocsr())
