"""The SpMV Pallas kernels — the analog of the reference's device dataflow.

One grid step consumes one wavepack tile and performs, in order, the roles
of the reference's five pipeline stages (SURVEY.md section 3.3):

  stage                         reference                      here
  ----------------------------- ------------------------------ ----------------
  vector load / broadcast       spmv_vector_loader.cpp:7-121   resident XT tile
  matrix stream                 spmv_cluster.h:34-107          vals/idxT DMA
  col shuffle + vecbuf gather   shuffle.h:24-99 + vau:18-84    lane-gather from
                                                               transposed x-bank
                                                               blocks + select
  row shuffle                   shuffle.h:102-177              lane-gather of
                                                               gathered x by the
                                                               pack-time src map
  PE accumulate                 pe.h:22-90                     acc += vals*routed
  PE output / result drain      pe.h:95-116, result_drain      stripe-reduce
                                                               (outside kernel)

All conflict arbitration happened at pack time (formats/wavepack.py), so the
kernel is branch-free at line rate: two dynamic lane-gathers, one transpose,
B-1 selects per 128-row group, one FMA, one accumulate.

Two execution variants, chosen automatically by VMEM footprint:

  * resident — the whole banked vector buffer (all column partitions) and
    the whole y accumulator live in VMEM; tile metadata (partition/block
    ids) are SMEM arrays indexed per grid step.  This is the fast path: the
    TPU's VMEM (~16 MB) plays the role of the U280's URAM (45 MB in 512
    banks) but holds x AND y entirely for every matrix of the FPGA'22 suite
    up to ~1M rows+cols — no vector reloads at all (the reference re-streams
    x per row partition, spmv_vector_loader.cpp:22-68; its TV cost term
    disappears here).
  * paged — x partitions and y blocks are paged by the Pallas pipeline via
    scalar-prefetched indices (PrefetchScalarGridSpec).  Handles matrices of
    any size at ~half the slot rate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANES, SpmvConfig
from ..formats.wavepack import Wavepack

# conservative usable-VMEM budget for the resident variant (bytes);
# WP_VMEM_BUDGET overrides for probing the true Mosaic limit (the
# operator falls back to paged if a resident compile is rejected)
import os as _os

_RESIDENT_VMEM_BUDGET = int(_os.environ.get("WP_VMEM_BUDGET",
                                            10 * 1024 * 1024))

# per-group transpose implementation (WP_TMODE env override, experiments
# only): "auto" (MXU when the config's error budget allows, else VPU) |
# "vpu" (lax.transpose) | "mxu" (identity dot_general — runs on the
# otherwise-idle MXU, overlapping the VPU gather pipeline; +8-11% measured
# slot rate).  Probe-only modes from rounds 2-3 ("skip", "mxu_hp") were
# removed: "skip" gave wrong results and "mxu_hp" measured slower than the
# manual hi/lo split (49.6 vs 54.4 Gslot/s, ROADMAP round 3).
_TRANSPOSE_MODE = _os.environ.get("WP_TMODE", "auto")


def _group_t(e, mxu_ok: bool = False):
    mode = _TRANSPOSE_MODE
    if mode == "auto":
        mode = "mxu" if mxu_ok else "vpu"
    if mode == "mxu" and jnp.issubdtype(e.dtype, jnp.floating):
        # identity matmul = transpose on the otherwise-idle MXU (+8-11%
        # slot rate); a manual hi/lo bf16 split bounds the error at
        # ~2^-16 relative (Mosaic's default f32 dot rounds operands to
        # bf16, ~2^-8).  Combined with the steal_mantissa 2^-17 the total
        # is ~2^-15.5 — still orders of magnitude under the 1e-4 test
        # tolerance, which is the gate that actually matters (mxu_ok
        # restricts this path to steal_mantissa fp32 plus_times)
        ident = ((jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                  == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1))
                 .astype(jnp.bfloat16))
        e_hi = e.astype(jnp.bfloat16)
        e_lo = (e - e_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        return (jax.lax.dot_general(e_hi, ident, dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(e_lo, ident, dn,
                                      preferred_element_type=jnp.float32))
    return e.T


def _route_x(idx, block_get, n_ops: int, cfg: SpmvConfig, src_dest=None,
             wrap: bool = False):
    """Shared per-tile gather pipeline: decode -> banked gather -> row
    crossbar.  ``block_get(g, i)`` returns the (128,128) transposed x block
    that sublane group g's operand i gathers from — for the select-chain
    path that is simply bank block i (same for every group); for block-major
    it is a class-map-indexed ref read (Mosaic supports dynamic ref reads
    but not array dynamic_slice).  ``n_ops`` is the gather-operand count per
    group (total_blocks or classes_per_group).  Returns the (S, 128) routed
    x values in dest-slot layout.  ``src_dest`` carries the crossbar map
    already in dest layout (steal_mantissa fast path); else it is decoded
    from the transposed index word and transposed back.

    ``wrap``: Mosaic's lane dynamic_gather uses only the low 7 bits of the
    index (wraps mod 128 — verified on v5e incl. negative/high-bit words,
    scratch/probe_gatherwrap.py), so the compiled path skips the `& 0x7F`
    decode masks and feeds raw index words to the gathers.  XLA's gather
    (interpret mode, the csim oracle) clamps instead, so interpret keeps
    the masks.  The MXU hi/lo-split transpose is likewise compiled-only
    (gated on ``wrap``): on v5e it is measured near-exact (4.95e-06 vs the
    f64 golden, scratch/probe_parity_fail.py), but XLA:CPU's emulation of
    the same HLO loses ~1.5e-04, so the oracle keeps the exact lax
    transpose — matching the csim role of being at least as accurate as
    hardware."""
    G = cfg.groups
    mxu_ok = (wrap and cfg.steal_mantissa and cfg.dtype == "fp32"
              and cfg.semiring == "plus_times")
    hT = idx if wrap else idx & 0x7F
    gx_groups, src_groups = [], []
    if src_dest is None:
        bT = (idx >> 7) & 0xF
        srcT = (idx >> 11) if wrap else ((idx >> 11) & 0x7F)
    else:
        # steal_mantissa: src rides in the values, so the whole idx word is
        # exactly b*128 + h — the class select can threshold the RAW word
        # (idx >= i*128 selects ascending b), saving the per-tile shift
        bT = None
    for g in range(G):
        sl = slice(g * 128, (g + 1) * 128)
        hg = hT[sl]
        e = jnp.take_along_axis(block_get(g, 0), hg, axis=1)
        for i in range(1, n_ops):
            ei = jnp.take_along_axis(block_get(g, i), hg, axis=1)
            sel = (bT[sl] == i) if bT is not None else (idx[sl] >= i * 128)
            e = jnp.where(sel, ei, e)
        gx_groups.append(_group_t(e, mxu_ok))
        if src_dest is None:
            src_groups.append(srcT[sl].T)
    gx = jnp.concatenate(gx_groups, axis=0) if G > 1 else gx_groups[0]
    if src_dest is None:
        src_dest = (jnp.concatenate(src_groups, axis=0) if G > 1
                    else src_groups[0])
    return jnp.take_along_axis(gx, src_dest, axis=1)


def _fixed_madd(acc, a, b):
    """Saturating unsigned Q8.24 multiply-accumulate, bit-exact with
    ap_ufixed<32,8,AP_RND,AP_SAT> (common.h:35-39; product evaluated wide,
    AP_RND round-half-up to 24 frac bits, AP_SAT clamp; accumulate clamps).

    64-bit product emulated with 16-bit limb products on uint32 (exact mod
    2^32 with explicit carries; the true high word fits 32 bits so modular
    carry propagation is exact).
    """
    u16 = jnp.uint32(0xFFFF)
    al, ah = a & u16, a >> 16
    bl, bh = b & u16, b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    cmid = (mid < lh).astype(jnp.uint32)
    lo = ll + (mid << 16)
    clo = (lo < ll).astype(jnp.uint32)
    hi = hh + (mid >> 16) + (cmid << 16) + clo
    half = jnp.uint32(1 << 23)
    lo_r = lo + half
    c_r = (lo_r < lo).astype(jnp.uint32)
    hi_r = hi + c_r
    prod = (lo_r >> 24) | (hi_r << 8)
    sat = hi_r >= jnp.uint32(1 << 24)
    ones = jnp.uint32(0xFFFFFFFF)
    prod = jnp.where(sat, ones, prod)
    s = acc + prod
    return jnp.where(s < acc, ones, s)


def fixed_sat_sum(x, axis):
    """Saturating-unsigned fold along an axis (PE output-stage semantics)."""
    n = x.shape[axis]
    acc = jax.lax.index_in_dim(x, 0, axis, keepdims=False)
    ones = jnp.uint32(0xFFFFFFFF)
    for i in range(1, n):
        term = jax.lax.index_in_dim(x, i, axis, keepdims=False)
        s = acc + term
        acc = jnp.where(s < acc, ones, s)
    return acc


def _acc_init(cfg: SpmvConfig, like):
    if cfg.semiring == "min_plus":
        return jnp.full_like(like, jnp.inf)
    if cfg.semiring == "max_times":
        return jnp.full_like(like, -jnp.inf)
    return jnp.zeros_like(like)


def _tile_routed(vals, idx, xt, cfg: SpmvConfig, cls_ids=None,
                 wrap: bool = False):
    """Decode + banked-gather pipeline shared by the FMA body and the
    gradient-stream kernel: returns ``(vals', routed)`` — the (possibly
    steal-cleaned / widened) tile values and the per-slot routed x.
    ``xt`` is the loaded (CT,128,128) block array for the select-chain
    path, or a ref-getter function c -> (128,128) for block-major."""
    if idx.dtype != jnp.int32:
        # idx16 stream: widen once in VMEM (values are 11-bit nonnegative,
        # so the sign-extension is a no-op); HBM traffic stays 2 B/slot
        idx = idx.astype(jnp.int32)
    if cfg.block_major:
        n_ops = cfg.classes_per_group
        get = lambda cast: lambda g, i: cast(xt(cls_ids[g][i]))
    else:
        n_ops = cfg.total_blocks
        get = lambda cast: lambda g, i: cast(xt[i])
    route = functools.partial(_route_x, n_ops=n_ops, cfg=cfg, wrap=wrap)
    if cfg.dtype == "fixed":
        xi = route(idx, get(pltpu_bitcast_i32))
        return vals, pltpu_bitcast_u32(xi)
    if cfg.steal_mantissa:
        vbits = pltpu_bitcast_i32(vals)
        # wrap: the crossbar gather reads only the low 7 bits, which ARE
        # the stolen src field — feed the raw value bits as the index
        src_dest = vbits if wrap else vbits & 0x7F
        vals = jax.lax.bitcast_convert_type(vbits & jnp.int32(-128),
                                            jnp.float32)
        routed = route(idx, get(lambda b: b), src_dest=src_dest)
    else:
        routed = route(idx, get(lambda b: b))
    if vals.dtype == jnp.bfloat16:
        vals = vals.astype(jnp.float32)
    return vals, routed


def _tile_body(vals, idx, xt, acc, cfg: SpmvConfig, cls_ids=None,
               wrap: bool = False):
    vals, routed = _tile_routed(vals, idx, xt, cfg, cls_ids, wrap=wrap)
    if cfg.dtype == "fixed":
        return _fixed_madd(acc, vals, routed)
    if cfg.semiring == "min_plus":
        return jnp.minimum(acc, vals + routed)
    if cfg.semiring == "max_times":
        return jnp.maximum(acc, vals * routed)
    return acc + vals * routed


def pltpu_bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def pltpu_bitcast_u32(x):
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _resident_kernel(part_ref, block_ref, cmap_ref, vals_ref, idxT_ref,
                     xt_ref, out_ref, *, cfg: SpmvConfig,
                     wrap: bool = False, tb: int = 1):
    """``tb`` = tiles per grid step: the streamed block carries tb
    consecutive (S, 128) tiles and the body is unrolled over them.  The
    per-grid-step fixed cost (~0.2-0.25 us on v5e: scalar reads, DMA
    issue, grid bookkeeping) is ~20% of a single-tile step at S=512
    (measured: K=1 rate 61.6 -> 74.6 Gslot/s going S=512 -> 2048); tall
    tiles buy the same amortization but lose fill to segment
    quantization, so batching the STREAM while scheduling stays at S=512
    captures the rate without the fill loss.  The operator pads the tile
    count to a multiple of tb with identity tiles (same pad conventions
    as the in-tile pad slots)."""
    S, G, K = cfg.sublanes, cfg.groups, cfg.classes_per_group
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = _acc_init(cfg, out_ref)

    for j in range(tb):
        tile = t * tb + j
        pid = part_ref[tile]
        bid = block_ref[tile]
        cls_ids = None
        if cfg.block_major:
            xt = lambda c, pid=pid: xt_ref[pid, c]
            cls_ids = [[cmap_ref[(tile * G + g) * K + i] for i in range(K)]
                       for g in range(G)]
        else:
            xt = xt_ref[pid]
        off = pl.multiple_of(bid * S, S)
        acc = out_ref[pl.ds(off, S), :]
        out_ref[pl.ds(off, S), :] = _tile_body(vals_ref[j], idxT_ref[j], xt,
                                               acc, cfg, cls_ids, wrap=wrap)


def _paged_kernel(part_ref, block_ref, first_ref, cmap_ref, vals_ref,
                  idxT_ref, xt_ref, out_ref, *, cfg: SpmvConfig,
                  wrap: bool = False, tb: int = 1):
    """``tb`` > 1 streams tb consecutive tiles per grid step (see
    _resident_kernel).  The out/xt index maps read the step's FIRST tile,
    so the operator pads the stream group-aligned: every tb-group shares
    one (block, part) — pad tiles inherit the group's ids and carry
    identity values, appended after the group's real tiles so the block
    is already initialized when they run."""
    G, K = cfg.groups, cfg.classes_per_group
    t = pl.program_id(0)

    for j in range(tb):
        tile = t * tb + j

        @pl.when(first_ref[tile] == 1)
        def _():
            out_ref[0] = _acc_init(cfg, out_ref[0])

        cls_ids = None
        if cfg.block_major:
            xt = lambda c: xt_ref[0, c]
            cls_ids = [[cmap_ref[(tile * G + g) * K + i] for i in range(K)]
                       for g in range(G)]
        else:
            xt = xt_ref[0]
        out_ref[0] = _tile_body(vals_ref[j], idxT_ref[j], xt, out_ref[0],
                                cfg, cls_ids, wrap=wrap)


def _resident_spmm_kernel(part_ref, block_ref, cmap_ref, vals_ref,
                          idxT_ref, xt_ref, out_ref, *, cfg: SpmvConfig,
                          wrap: bool = False, tb: int = 1, F: int = 1):
    """Multi-vector (SpMM) resident body: one vals/idxT stream pass feeds
    ``F`` feature columns.  ``xt_ref`` is the F-stacked bank-block array
    (n_parts, F, CT, 128, 128); ``out_ref`` the F-stacked accumulator
    (F, n_blocks*S, 128).  The matrix stream (8 B/slot) is DMA'd ONCE for
    all F features — the gather/route pipeline repeats per feature on
    VMEM-resident data, so arithmetic intensity scales with F where SpMV
    is stream-bound.  This is the aggregation primitive (y = A @ X) of
    GNN layers over the packed graph; the reference has no multi-vector
    path (its overlay streams x once per SpMV, spmv_vector_loader.cpp)."""
    S, G, K = cfg.sublanes, cfg.groups, cfg.classes_per_group
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = _acc_init(cfg, out_ref)

    for j in range(tb):
        tile = t * tb + j
        pid = part_ref[tile]
        bid = block_ref[tile]
        cls_ids = None
        if cfg.block_major:
            cls_ids = [[cmap_ref[(tile * G + g) * K + i] for i in range(K)]
                       for g in range(G)]
        off = pl.multiple_of(bid * S, S)
        for f in range(F):
            if cfg.block_major:
                xt = lambda c, pid=pid, f=f: xt_ref[pid, f, c]
            else:
                xt = xt_ref[pid, f]
            acc = out_ref[f, pl.ds(off, S), :]
            out_ref[f, pl.ds(off, S), :] = _tile_body(
                vals_ref[j], idxT_ref[j], xt, acc, cfg, cls_ids, wrap=wrap)


def _paged_spmm_kernel(part_ref, block_ref, first_ref, cmap_ref, vals_ref,
                       idxT_ref, xt_ref, out_ref, *, cfg: SpmvConfig,
                       wrap: bool = False, tb: int = 1, F: int = 1):
    """Paged SpMM body: the y block (F, S, 128) and the x partition
    (1, F, CT, 128, 128) page by the prefetched ids (see _paged_kernel for
    the group-alignment contract)."""
    G, K = cfg.groups, cfg.classes_per_group
    t = pl.program_id(0)
    for j in range(tb):
        tile = t * tb + j

        @pl.when(first_ref[tile] == 1)
        def _():
            out_ref[0] = _acc_init(cfg, out_ref[0])

        cls_ids = None
        if cfg.block_major:
            cls_ids = [[cmap_ref[(tile * G + g) * K + i] for i in range(K)]
                       for g in range(G)]
        for f in range(F):
            if cfg.block_major:
                xt = lambda c, f=f: xt_ref[0, f, c]
            else:
                xt = xt_ref[0, f]
            out_ref[0, f] = _tile_body(vals_ref[j], idxT_ref[j], xt,
                                       out_ref[0, f], cfg, cls_ids,
                                       wrap=wrap)


def _build_xt_multi(X, cfg: SpmvConfig, n_parts: int):
    """F-stacked vector-loader: (num_cols, F) -> (n_parts, F, CT, 128, 128)
    (partition-leading so the paged variant pages whole per-partition
    F-stacks)."""
    return jax.vmap(lambda xf: _build_xt(xf, cfg, n_parts),
                    in_axes=1, out_axes=1)(X)


def spmm_bytes(cfg: SpmvConfig, n_blocks: int, n_parts: int, F: int,
               tiles_per_step: int = 1, variant: str = "resident") -> int:
    """VMEM footprint of an F-feature SpMM step (chunking bound)."""
    xt_page = cfg.total_blocks * 128 * 128 * 4
    streams = 4 * cfg.sublanes * LANES * 4 * 2 * tiles_per_step
    if variant == "resident":
        return (n_parts * F * xt_page + F * n_blocks * cfg.sublanes
                * LANES * 4 + streams)
    xt = F * xt_page * (1 if n_parts == 1 else 2)
    return xt + 2 * F * cfg.sublanes * LANES * 4 + streams


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_parts",
                                             "interpret", "variant",
                                             "tiles_per_step"))
def _spmm_call(vals, idxT, part, block, first, X, cmap=None, *,
               cfg: SpmvConfig, n_blocks: int, n_parts: int,
               interpret: bool = False, variant: str = "resident",
               tiles_per_step: int = 1):
    """Multi-vector SpMV over a packed stream: X is (num_cols, F) in the
    pack's column space; returns per-feature renamed y blocks
    (F, n_blocks * R * LANES after stripe fold).  F is static via X's
    shape."""
    S, R = cfg.sublanes, cfg.stripes
    T = vals.shape[0]
    F = X.shape[1]
    interpret = interpret or jax.default_backend() == "cpu"
    XT = _build_xt_multi(X, cfg, n_parts)
    if cfg.block_major:
        assert cmap is not None
        cmap = cmap.reshape(-1)
    tb = tiles_per_step if T % tiles_per_step == 0 else 1
    cmap_arg = cmap if cmap is not None else jnp.zeros(1, jnp.int32)
    if variant == "resident":
        out = pl.pallas_call(
            functools.partial(_resident_spmm_kernel, cfg=cfg,
                              wrap=not interpret, tb=tb, F=F),
            grid=(T // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((F, n_blocks * S, LANES),
                                   lambda t: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, n_blocks * S, LANES),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(part, block, cmap_arg, vals, idxT, XT)
        return _stripe_fold(out.reshape(F * n_blocks, S // R, R, LANES),
                            cfg).reshape(F, n_blocks * R * LANES)
    xt_spec = (pl.BlockSpec(memory_space=pltpu.VMEM)
               if n_parts == 1 else
               pl.BlockSpec((1, F, cfg.total_blocks, 128, 128),
                            lambda t, pr, br, fr, cm: (pr[t * tb],
                                                       0, 0, 0, 0),
                            memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T // tb,),
        in_specs=[
            pl.BlockSpec((tb, S, LANES), lambda t, pr, br, fr, cm: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, S, LANES), lambda t, pr, br, fr, cm: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            xt_spec,
        ],
        out_specs=pl.BlockSpec((1, F, S, LANES),
                               lambda t, pr, br, fr, cm: (br[t * tb],
                                                          0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_paged_spmm_kernel, cfg=cfg, wrap=not interpret,
                          tb=tb, F=F),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, F, S, LANES),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(part, block, first, cmap_arg, vals, idxT, XT)
    touched = jnp.zeros((n_blocks,), jnp.bool_).at[block].set(True)
    out = jnp.where(touched[:, None, None, None], out, _acc_init(cfg, out))
    out = out.transpose(1, 0, 2, 3)     # (F, n_blocks, S, LANES)
    return _stripe_fold(out.reshape(F * n_blocks, S // R, R, LANES),
                        cfg).reshape(F, n_blocks * R * LANES)


def _resident_masked_kernel(tsel_ref, part_ref, block_ref, cmap_ref,
                            vals_ref, idxT_ref, xt_ref, out_ref, *,
                            cfg: SpmvConfig, wrap: bool = False,
                            tb: int = 1):
    """Resident body under a scalar-prefetch grid: ``tsel`` is consumed by
    the stream index maps only (it redirects the vals/idxT DMA at the
    selected tile groups); the body is the plain resident kernel over the
    subset metadata."""
    _resident_kernel(part_ref, block_ref, cmap_ref, vals_ref, idxT_ref,
                     xt_ref, out_ref, cfg=cfg, wrap=wrap, tb=tb)


def _paged_masked_kernel(tsel_ref, part_ref, block_ref, first_ref,
                         cmap_ref, vals_ref, idxT_ref, xt_ref, out_ref, *,
                         cfg: SpmvConfig, wrap: bool = False, tb: int = 1):
    _paged_kernel(part_ref, block_ref, first_ref, cmap_ref, vals_ref,
                  idxT_ref, xt_ref, out_ref, cfg=cfg, wrap=wrap, tb=tb)


def _gradstream_kernel(part_ref, block_ref, cmap_ref, vals_ref, idxT_ref,
                       mask_ref, gb_ref, xt_ref, out_ref, *,
                       cfg: SpmvConfig, wrap: bool = False, tb: int = 1):
    """Per-slot gradient stream: ``out[slot] = g[row(slot)] *
    x_routed[slot] * is_real[slot]``.

    The forward kernel's row accumulation is POSITIONAL (slot (s, l) of a
    block-``b`` tile adds into accumulator row (b*S + s, l), folded to
    output row (b, s % R, l) by `_stripe_fold`) — so the row-broadcast of
    the output cotangent g is the exact transpose of that accumulation: a
    VMEM slice of ``gb`` (g pre-broadcast to the (n_blocks*S, 128)
    accumulator geometry).  No gather, no scatter: this is what makes
    in-layout gradients run at kernel rate where an XLA gather/scatter
    relayout of the same stream measures ~0.15 Gelem/s on v5e
    (scratch/probe_emit.py).  x-routing reuses the forward's
    `_route_x` pipeline; ``mask`` zeroes pad slots so stream-layout
    parameters keep their pads at the identity under elementwise
    optimizer updates."""
    S = cfg.sublanes
    G, K = cfg.groups, cfg.classes_per_group
    t = pl.program_id(0)
    for j in range(tb):
        tile = t * tb + j
        pid = part_ref[tile]
        bid = block_ref[tile]
        cls_ids = None
        if cfg.block_major:
            xt = lambda c, pid=pid: xt_ref[pid, c]
            cls_ids = [[cmap_ref[(tile * G + g) * K + i] for i in range(K)]
                       for g in range(G)]
        else:
            xt = xt_ref[pid]
        _, routed = _tile_routed(vals_ref[j], idxT_ref[j], xt, cfg,
                                 cls_ids, wrap=wrap)
        off = pl.multiple_of(bid * S, S)
        out_ref[j] = gb_ref[pl.ds(off, S), :] * routed * mask_ref[j]


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_parts",
                                             "interpret", "tiles_per_step"))
def _gradstream_call(vals, idxT, mask, part, block, g_acc, x, cmap=None, *,
                     cfg: SpmvConfig, n_blocks: int, n_parts: int,
                     interpret: bool = False, tiles_per_step: int = 1):
    """Gradient-stream kernel over a RESIDENT pack: returns dL/dvals in
    the pack's own stream layout (same shape as ``vals``).  ``g_acc`` is
    the output cotangent already broadcast to the (n_blocks*S, 128)
    accumulator geometry; ``mask`` is the static real-slot 0/1 stream.
    ``vals`` is read only for the steal-mantissa crossbar source bits
    (plus_times fp32 training packs only).  The >VMEM paged regime keeps
    the DiffSpmv vector-argument path instead."""
    S = cfg.sublanes
    T = vals.shape[0]
    interpret = interpret or jax.default_backend() == "cpu"
    XT = _build_xt(x, cfg, n_parts)
    if cfg.block_major:
        assert cmap is not None
        cmap = cmap.reshape(-1)
    tb = tiles_per_step if T % tiles_per_step == 0 else 1
    return pl.pallas_call(
        functools.partial(_gradstream_kernel, cfg=cfg, wrap=not interpret,
                          tb=tb),
        grid=(T // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, S, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(part, block,
      cmap if cmap is not None else jnp.zeros(1, jnp.int32),
      vals, idxT, mask, g_acc, XT)


def resident_bytes(cfg: SpmvConfig, n_blocks: int, n_parts: int,
                   tiles_per_step: int = 1) -> int:
    """VMEM footprint of the resident variant (XT + y + stream buffers)."""
    xt = n_parts * cfg.total_blocks * 128 * 128 * 4
    y = n_blocks * cfg.sublanes * LANES * 4
    # vals+idx, double-buffered, tiles_per_step tiles per block
    streams = 4 * cfg.sublanes * LANES * 4 * 2 * tiles_per_step
    return xt + y + streams


def _build_xt(x, cfg: SpmvConfig, n_parts: int):
    """Vector-loader analog: pre-transpose x into per-partition bank
    blocks XT[p, b, l, h] = x[p*VB + (b*128 + h)*128 + l] (plus the
    two-choice second copy when configured)."""
    B = cfg.bank_blocks
    if cfg.dtype == "fixed":
        assert x.dtype == jnp.uint32, "fixed-point SpMV takes raw Q8.24 x"
        x_cast = x
    else:
        # bf16 streams compress the matrix values only; x and the
        # accumulator stay fp32 (one bf16 rounding per term)
        x_cast = x.astype(jnp.float32)
    x_padded = jnp.pad(x_cast, (0, n_parts * cfg.vb_cols - x.shape[0]))
    XT = x_padded.reshape(n_parts, B, 128, LANES).transpose(0, 1, 3, 2)
    if cfg.two_choice:
        from ..formats.wavepack import bank_shift
        if cfg.block_major:
            # cross-class second copy: class B+b' holds columns a = h2*B+b'
            # at address h2 with a per-class lane rotation (stride layout)
            x2 = x_padded.reshape(n_parts, 128, B, LANES)
            second = [jnp.roll(x2[:, :, b, :], bank_shift(b),
                               axis=2).transpose(0, 2, 1)
                      for b in range(B)]
        else:
            second = [jnp.roll(XT[:, b], bank_shift(b), axis=1)
                      for b in range(B)]
        XT = jnp.concatenate([XT, jnp.stack(second, axis=1)], axis=1)
    return XT


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_parts",
                                             "interpret", "variant",
                                             "tiles_per_step"))
def _spmv_masked_call(vals, idxT, tsel, part_s, block_s, first_s, x,
                      cmap_s=None, *, cfg: SpmvConfig, n_blocks: int,
                      n_parts: int, interpret: bool = False,
                      variant: str = "paged", tiles_per_step: int = 1):
    """Masked (SpMSpV-analog) SpMV: stream ONLY the tile groups listed in
    ``tsel`` (original tb-group indices).  The full vals/idxT arrays stay
    in HBM untouched; the scalar-prefetched index maps point each grid
    step's DMA at its selected group, so skipped tiles cost zero HBM
    bandwidth — the TPU re-design of GraphLily's sparse-frontier SpMSpV
    module (reference: unit_tests/test_module_spmv_spmspv.cpp, which the
    reference ships only as vestigial tests).  ``part_s/block_s/first_s/
    cmap_s`` are the host-subset per-selected-tile metadata."""
    S, R = cfg.sublanes, cfg.stripes
    interpret = interpret or jax.default_backend() == "cpu"
    acc_dtype = vals.dtype if cfg.dtype == "fixed" else jnp.float32
    XT = _build_xt(x, cfg, n_parts)
    tb = tiles_per_step
    Gsel = tsel.shape[0]
    cmap_arg = (cmap_s if cmap_s is not None else jnp.zeros(1, jnp.int32))
    if variant == "resident":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,            # tsel, part, block, cmap
            grid=(Gsel,),
            in_specs=[
                pl.BlockSpec((tb, S, LANES),
                             lambda t, ts, pr, br, cm: (ts[t], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, S, LANES),
                             lambda t, ts, pr, br, cm: (ts[t], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_blocks * S, LANES),
                                   lambda t, ts, pr, br, cm: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_resident_masked_kernel, cfg=cfg,
                              wrap=not interpret, tb=tb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks * S, LANES), acc_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(tsel, part_s, block_s, cmap_arg, vals, idxT, XT)
        return _stripe_fold(out.reshape(n_blocks, S // R, R, LANES), cfg)
    xt_spec = (pl.BlockSpec(memory_space=pltpu.VMEM)
               if n_parts == 1 else
               pl.BlockSpec((1, cfg.total_blocks, 128, 128),
                            lambda t, ts, pr, br, fr, cm: (pr[t * tb],
                                                           0, 0, 0),
                            memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,        # tsel, part, block, first, cmap
        grid=(Gsel,),
        in_specs=[
            pl.BlockSpec((tb, S, LANES),
                         lambda t, ts, pr, br, fr, cm: (ts[t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, S, LANES),
                         lambda t, ts, pr, br, fr, cm: (ts[t], 0, 0),
                         memory_space=pltpu.VMEM),
            xt_spec,
        ],
        out_specs=pl.BlockSpec((1, S, LANES),
                               lambda t, ts, pr, br, fr, cm: (br[t * tb],
                                                              0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_paged_masked_kernel, cfg=cfg,
                          wrap=not interpret, tb=tb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, S, LANES), acc_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tsel, part_s, block_s, first_s, cmap_arg, vals, idxT, XT)
    touched = jnp.zeros((n_blocks,), jnp.bool_).at[block_s].set(True)
    out = jnp.where(touched[:, None, None], out, _acc_init(cfg, out))
    return _stripe_fold(out.reshape(n_blocks, S // R, R, LANES), cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_parts",
                                             "interpret", "variant",
                                             "tiles_per_step"))
def _spmv_call(vals, idxT, part, block, first, x, cmap=None, *,
               cfg: SpmvConfig, n_blocks: int, n_parts: int,
               interpret: bool = False, variant: str = "auto",
               tiles_per_step: int = 1):
    S, R = cfg.sublanes, cfg.stripes
    T = vals.shape[0]
    # compiled Pallas needs a TPU; on CPU backends fall back to the
    # interpreter (the csim analog) automatically
    interpret = interpret or jax.default_backend() == "cpu"
    acc_dtype = vals.dtype if cfg.dtype == "fixed" else jnp.float32
    XT = _build_xt(x, cfg, n_parts)
    if cfg.block_major:
        assert cmap is not None
        cmap = cmap.reshape(-1)

    if variant == "auto":
        variant = ("resident"
                   if resident_bytes(cfg, n_blocks, n_parts)
                   <= _RESIDENT_VMEM_BUDGET else "paged")

    if variant == "resident":
        tb = tiles_per_step if T % tiles_per_step == 0 else 1
        out = pl.pallas_call(
            functools.partial(_resident_kernel, cfg=cfg,
                              wrap=not interpret, tb=tb),
            grid=(T // tb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, S, LANES), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_blocks * S, LANES), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_blocks * S, LANES), acc_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(part, block,
          cmap if cmap is not None else jnp.zeros(1, jnp.int32),
          vals, idxT, XT)
        y_blocks = _stripe_fold(out.reshape(n_blocks, S // R, R, LANES), cfg)
    else:
        # single-partition packs (large-B block-major collapses the column
        # partitioning) keep the whole XT resident in VMEM un-double-
        # buffered; only the y blocks page.  Multi-partition packs page XT
        # per tile by the prefetched partition id.
        # group-aligned stream batching: the operator guarantees every
        # tb-group of consecutive tiles shares one (block, part), so the
        # out/xt maps can read the step's first tile
        tb = tiles_per_step if T % tiles_per_step == 0 else 1
        xt_spec = (pl.BlockSpec(memory_space=pltpu.VMEM)
                   if n_parts == 1 else
                   pl.BlockSpec((1, cfg.total_blocks, 128, 128),
                                lambda t, pr, br, fr, cm: (pr[t * tb],
                                                           0, 0, 0),
                                memory_space=pltpu.VMEM))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(T // tb,),
            in_specs=[
                pl.BlockSpec((tb, S, LANES),
                             lambda t, pr, br, fr, cm: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, S, LANES),
                             lambda t, pr, br, fr, cm: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                xt_spec,
            ],
            out_specs=pl.BlockSpec((1, S, LANES),
                                   lambda t, pr, br, fr, cm: (br[t * tb],
                                                              0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_paged_kernel, cfg=cfg,
                              wrap=not interpret, tb=tb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, S, LANES), acc_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(part, block, first,
          cmap if cmap is not None else jnp.zeros(1, jnp.int32),
          vals, idxT, XT)
        # blocks that received no tiles were never written by the kernel;
        # fill them with the semiring identity (the resident variant
        # initializes the whole accumulator at t == 0)
        touched = jnp.zeros((n_blocks,), jnp.bool_).at[block].set(True)
        out = jnp.where(touched[:, None, None], out, _acc_init(cfg, out))
        y_blocks = _stripe_fold(out.reshape(n_blocks, S // R, R, LANES), cfg)
    return y_blocks


def _stripe_fold(folded, cfg: SpmvConfig):
    if cfg.dtype == "fixed":
        return fixed_sat_sum(folded, 1)
    if cfg.semiring == "min_plus":
        return folded.min(axis=1)
    if cfg.semiring == "max_times":
        return folded.max(axis=1)
    return folded.sum(axis=1)


def _pad_group_aligned(vals, idxT, part, block, first, cmap, tb, pad0):
    """Pad the tile stream so every run of equal (block, part) tiles has a
    multiple-of-tb length: each tb-group then shares one (block, part) and
    the paged out/xt index maps can read the step's first tile.  Pad tiles
    carry identity values, inherit their run's ids, and follow the run's
    real tiles (first=0 — the block is already initialized)."""
    T = vals.shape[0]
    chg = np.nonzero((np.diff(block) != 0) | (np.diff(part) != 0))[0] + 1
    bounds = np.concatenate([[0], chg, [T]])
    src = []
    for a, b in zip(bounds[:-1], bounds[1:]):
        src.extend(range(a, b))
        src.extend([-1] * ((-(b - a)) % tb))
    src = np.asarray(src, np.int64)
    real = src >= 0

    def take(arr, fillval):
        out = np.empty((len(src),) + arr.shape[1:], arr.dtype)
        out[real] = arr[src[real]]
        out[~real] = fillval
        return out

    ff = np.maximum.accumulate(np.where(real, src, -1))  # run's last real
    return (take(vals, pad0), take(idxT, 0), part[ff], block[ff],
            take(first, 0), take(cmap, 0) if cmap is not None else None,
            src)


class SpmvOperator:
    """Device-resident packed matrix + compiled SpMV.

    The analog of the programmed overlay + per-channel HBM buffers
    (sw/host.cpp:263-299): construct once from a Wavepack, then call with
    dense vectors.  ``renamed=True`` returns y in the packed row order
    (for chained iteration in permuted space, e.g. PageRank); otherwise the
    row permutation is undone on the host.
    """

    def __init__(self, wp: Wavepack, interpret: bool = False,
                 variant: str = "auto", permute_x: bool = True):
        """permute_x: when the pack used a ``col_order``, permute the natural
        x into packed column space on device (one gather).  Callers that
        chain iterations in renamed space (models/apps.py) feed x already
        permuted and pass False."""
        self.wp = wp
        self.cfg = wp.config
        self.interpret = interpret
        if variant == "auto":
            variant = ("resident"
                       if resident_bytes(wp.config, wp.n_blocks, wp.n_parts)
                       <= _RESIDENT_VMEM_BUDGET else "paged")
        self.variant = variant
        self._colp = (jnp.asarray(wp.col_order)
                      if permute_x and wp.col_order is not None else None)
        self._prepare(variant)

    def _prepare(self, variant):
        """Resolve tb and build the (possibly padded) device stream arrays
        for ``variant``.  Re-invoked by the VMEM fallback to rebuild for
        the paged variant."""
        wp = self.wp
        vals, idxT = wp.vals, wp.idxT
        part, block = wp.tile_part, wp.tile_block
        first, cmap = wp.tile_first, wp.class_map
        # tiles per grid step: amortize the per-step fixed cost.  Largest
        # of 4/2 that keeps the doubled stream buffers under the VMEM
        # budget; identity pad tiles (same conventions as in-tile pad
        # slots) round the tile count up.  Resident pads at the end (the
        # full accumulator init at step 0 makes any order safe); paged
        # pads group-aligned so every tb-group shares one (block, part)
        # and the pad tiles follow their group's real tiles.
        self.tb = 1
        T = vals.shape[0]
        # final stream position -> original wp tile (-1 = pad tile); lets
        # ops/autodiff.py translate slot_coords() positions into the padded
        # operator stream
        tile_src = np.arange(T, dtype=np.int64)
        import os
        env_tb = os.environ.get("WP_TB")
        cands = ([int(env_tb)] if env_tb else [4, 2])
        cfg = wp.config
        pad0 = np.inf if cfg.semiring == "min_plus" else 0
        if variant == "resident":
            for cand in cands:
                if cand > 1 and T >= 4 * cand and resident_bytes(
                        cfg, wp.n_blocks, wp.n_parts,
                        cand) <= _RESIDENT_VMEM_BUDGET:
                    self.tb = cand
                    break
            padn = (-T) % self.tb
            if padn:
                tile_src = np.concatenate(
                    [tile_src, np.full(padn, -1, np.int64)])
                vals = np.concatenate(
                    [vals, np.full((padn,) + vals.shape[1:], pad0,
                                   vals.dtype)])
                idxT = np.concatenate(
                    [idxT, np.zeros((padn,) + idxT.shape[1:], idxT.dtype)])
                zpad = np.zeros(padn, part.dtype)
                part = np.concatenate([part, zpad])
                block = np.concatenate([block, zpad])
                first = np.concatenate([first, zpad])
                if cmap is not None:
                    cmap = np.concatenate(
                        [cmap, np.zeros((padn,) + cmap.shape[1:],
                                        cmap.dtype)])
        elif variant == "paged":
            S = cfg.sublanes
            xt_page = cfg.total_blocks * 128 * 128 * 4
            fixed_b = (xt_page * (1 if wp.n_parts == 1 else 2)
                       + 2 * S * LANES * 4)
            for cand in cands:
                if (cand > 1 and T >= 4 * cand
                        and fixed_b + 16 * S * LANES * cand
                        <= _RESIDENT_VMEM_BUDGET):
                    self.tb = cand
                    break
            if self.tb > 1:
                (vals, idxT, part, block, first, cmap,
                 tile_src) = _pad_group_aligned(
                    vals, idxT, part, block, first, cmap, self.tb, pad0)
        self.tile_src = tile_src
        self.vals = jnp.asarray(vals)
        self.idxT = jnp.asarray(idxT)
        self.part = jnp.asarray(part)
        self.block = jnp.asarray(block)
        self.first = jnp.asarray(first)
        self.cmap = (jnp.asarray(cmap.reshape(-1))
                     if cmap is not None else None)
        # host copies of the (small) per-tile metadata for the masked
        # (SpMSpV) path's host-side tile selection
        G, K = self.cfg.groups, self.cfg.classes_per_group
        self._meta_np = (np.asarray(part), np.asarray(block),
                         np.asarray(first),
                         np.asarray(cmap).reshape(-1, G * K)
                         if cmap is not None else None)
        self._pad_gid = None

    def _ensure_pad_group(self):
        """Append ONE identity tile group for the masked path's
        selection padding (device-side concat; no host round trip).  The
        unmasked stream then carries one extra identity group — harmless
        (identity slots, block 0, first=0) and ~1/G of a percent of the
        stream."""
        if self._pad_gid is not None:
            return
        cfg, tb = self.cfg, self.tb
        S = cfg.sublanes
        pad0 = (jnp.inf if cfg.semiring == "min_plus" else 0)
        T = self.vals.shape[0]
        self.vals = jnp.concatenate(
            [self.vals, jnp.full((tb, S, LANES), pad0, self.vals.dtype)])
        self.idxT = jnp.concatenate(
            [self.idxT, jnp.zeros((tb, S, LANES), self.idxT.dtype)])
        part_np, block_np, first_np, cmap_np = self._meta_np
        zpad = np.zeros(tb, part_np.dtype)
        part_np = np.concatenate([part_np, zpad])
        block_np = np.concatenate([block_np, zpad.astype(block_np.dtype)])
        first_np = np.concatenate([first_np, zpad.astype(first_np.dtype)])
        if cmap_np is not None:
            cmap_np = np.concatenate(
                [cmap_np, np.zeros((tb, cmap_np.shape[1]), cmap_np.dtype)])
        self._meta_np = (part_np, block_np, first_np, cmap_np)
        self.tile_src = np.concatenate(
            [self.tile_src, np.full(tb, -1, np.int64)])
        self.part = jnp.asarray(part_np)
        self.block = jnp.asarray(block_np)
        self.first = jnp.asarray(first_np)
        if cmap_np is not None:
            self.cmap = jnp.asarray(cmap_np.reshape(-1))
        self._pad_gid = T // tb

    def active_groups(self, active):
        """Tile-group selection for ``masked``: a tb-group is active iff
        any of its tiles' gather operands can touch an active column —
        for block-major, the tile's selected (partition, class) pairs;
        for the select-chain path, the tile's partition (every block of
        the partition is an operand).  ``active`` is a bool mask or index
        array over the PACKED column space (same space as the x the
        operator consumes)."""
        cfg = self.cfg
        part_np, block_np, first_np, cmap_np = self._meta_np
        tb = self.tb
        Gn = len(part_np) // tb
        ac = np.asarray(active)
        if ac.dtype == np.bool_:
            ac = np.nonzero(ac)[0]
        vb = cfg.vb_cols
        p = ac // vb
        if cfg.block_major:
            a = (ac % vb) // 128
            cls = a // 128
            B = cfg.bank_blocks
            CT = 2 * B if cfg.two_choice else B
            act = np.zeros(self.wp.n_parts * CT, bool)
            act[p * CT + cls] = True
            if cfg.two_choice:
                # second-copy classes re-bank columns across classes;
                # treat them as conservatively active (superset = correct)
                act.reshape(self.wp.n_parts, CT)[:, B:] = True
            keys = part_np[:, None] * CT + cmap_np
            tile_act = act[keys].any(axis=1)
        else:
            act = np.zeros(self.wp.n_parts, bool)
            act[p] = True
            tile_act = act[part_np]
        if self._pad_gid is not None:
            tile_act[self._pad_gid * tb:] = False
        return np.nonzero(tile_act.reshape(Gn, tb).any(axis=1))[0]

    def masked(self, x, active, renamed: bool = False):
        """SpMSpV-analog masked apply: y = A @ x computed by streaming
        ONLY the tile groups that can touch an active column; all other
        tiles cost zero HBM bandwidth.  Correct whenever x holds the
        semiring's multiplicative annihilator outside ``active`` (0 for
        plus_times, +inf for min_plus; for max_times, 0 with the
        nonnegative-data convention the app tier already uses) — the
        sparse-frontier iteration pattern of the GraphLily app tier
        (unit_tests/test_module_spmv_spmspv.cpp).  The selection is
        padded to a power of two with identity groups so recompiles are
        O(log T) over a run."""
        cfg = self.cfg
        if cfg.dtype == "fixed":
            raise ValueError("masked path supports float packs only")
        self._ensure_pad_group()
        if self._colp is not None:
            # natural-space x and active: map both into packed space
            x = jnp.asarray(x)[self._colp]
            co = np.asarray(self.wp.col_order)
            inv = np.empty(len(co), np.int64)
            inv[co] = np.arange(len(co))
            ac = np.asarray(active)
            if ac.dtype == np.bool_:
                ac = np.nonzero(ac)[0]
            active = inv[ac]
        gsel = self.active_groups(active)
        n = max(1, len(gsel))
        npow = 1 << (n - 1).bit_length()
        gsel_p = np.concatenate(
            [gsel, np.full(npow - len(gsel), self._pad_gid, np.int64)])
        tb = self.tb
        part_np, block_np, first_np, cmap_np = self._meta_np
        tiles = (gsel_p[:, None] * tb + np.arange(tb)).reshape(-1)
        part_s = part_np[tiles]
        block_s = block_np[tiles]
        # first flags re-derive for the subset: the first selected tile
        # of each block initializes it (group alignment holds — whole
        # groups are selected)
        first_s = np.zeros(len(tiles), first_np.dtype)
        _, fidx = np.unique(block_s, return_index=True)
        first_s[fidx] = 1
        cmap_s = (jnp.asarray(cmap_np[tiles].reshape(-1))
                  if cmap_np is not None else None)
        y_blocks = _spmv_masked_call(
            self.vals, self.idxT, jnp.asarray(gsel_p, jnp.int32),
            jnp.asarray(part_s), jnp.asarray(block_s),
            jnp.asarray(first_s), jnp.asarray(x), cmap_s,
            cfg=cfg, n_blocks=self.wp.n_blocks, n_parts=self.wp.n_parts,
            interpret=self.interpret, variant=self.variant,
            tiles_per_step=tb)
        y_renamed = y_blocks.reshape(-1)
        if renamed:
            return y_renamed
        return self.wp.unpack_y(np.asarray(y_renamed))

    def matmul(self, X, renamed: bool = False):
        """Multi-vector SpMM ``Y = A @ X`` through the PACKED stream
        (X: (num_cols, F) dense features; returns (num_rows, F)).

        One vals/idxT stream pass feeds every feature column in the
        chunk, so arithmetic intensity scales with F where SpMV is
        stream-bound — the aggregation primitive of a GNN layer over the
        packed graph (the dense-MXU :class:`~..ops.dense.SpmmOperator`
        covers the moderate-density regime; this is the low-density one).
        Features are chunked so the F-stacked XT + accumulator stay under
        the VMEM budget; each chunk re-streams the matrix once."""
        cfg = self.cfg
        if cfg.dtype == "fixed":
            raise ValueError("matmul supports float packs only")
        X = jnp.asarray(X)
        if X.ndim != 2:
            raise ValueError("matmul takes (num_cols, F) features")
        if self._colp is not None:
            X = X[self._colp, :]
        F = X.shape[1]
        wp = self.wp
        # scalar-prefetch bound: part/block/first + the block-major cmap
        # live in SMEM (~1 MB window); a pathological pack (huge tile
        # count at tiny fill) overflows it with an opaque compile error,
        # so fail early with the actionable message instead.
        smem_words = wp.num_tiles * (3 + (cfg.groups * cfg.classes_per_group
                                          if cfg.block_major else 0))
        if not self.interpret and smem_words > 240_000:
            raise ValueError(
                f"pack has {wp.num_tiles} tiles -> {smem_words} scalar-"
                "prefetch words, over the ~1 MB SMEM window; repack with "
                "larger tiles (fewer sublanes splits) or higher fill")
        fc = 1
        while fc < min(F, 16) and spmm_bytes(
                cfg, wp.n_blocks, wp.n_parts, 2 * fc, self.tb,
                self.variant) <= _RESIDENT_VMEM_BUDGET:
            fc *= 2
        outs = []
        f0 = 0
        while f0 < F:
            f1 = min(f0 + fc, F)
            outs.append(_spmm_call(
                self.vals, self.idxT, self.part, self.block, self.first,
                X[:, f0:f1], self.cmap, cfg=cfg, n_blocks=wp.n_blocks,
                n_parts=wp.n_parts, interpret=self.interpret,
                variant=self.variant, tiles_per_step=self.tb))
            f0 = f1
        y_ren = jnp.concatenate(outs, axis=0)    # (F, renamed)
        if renamed:
            return y_ren
        # per-feature renamed -> natural rows, one vectorized scatter
        perm = jnp.asarray(wp.perm)
        n = wp.num_rows
        sr = cfg.semiring
        init = {"plus_times": 0.0, "min_plus": jnp.inf,
                "max_times": -jnp.inf}[sr]
        out = jnp.full((F, n + 1), init, y_ren.dtype)
        if sr == "plus_times":
            out = out.at[:, perm].add(y_ren)
        elif sr == "min_plus":
            out = out.at[:, perm].min(y_ren)
        else:
            out = jnp.maximum(out.at[:, perm].max(y_ren), 0.0)
        return out[:, :n].T

    def unpack_device(self, y_renamed):
        """Renamed -> natural-row-order y entirely on device: one scatter
        over the stored perm combining hub-split partials with the
        semiring's additive op (the analog of spmv_result_drain writing
        natural-order y to HBM, spmv/spmv_result_drain.cpp:11-126).
        Fixed-point packs need the saturating host recombine (unpack_y)."""
        if self.cfg.dtype == "fixed":
            raise ValueError("fixed-point recombine saturates; use "
                             "wp.unpack_y on host")
        perm = jnp.asarray(self.wp.perm)     # padding slots == num_rows
        n = self.wp.num_rows
        sr = self.cfg.semiring
        init = {"plus_times": 0.0, "min_plus": jnp.inf,
                "max_times": -jnp.inf}[sr]
        out = jnp.full(n + 1, init, y_renamed.dtype)
        if sr == "plus_times":
            out = out.at[perm].add(y_renamed)
        elif sr == "min_plus":
            out = out.at[perm].min(y_renamed)
        else:
            out = out.at[perm].max(y_renamed)
            out = jnp.maximum(out, 0.0)      # empty rows -> 0
        return out[:n]

    def __call__(self, x, renamed: bool = False):
        if self.cfg.dtype == "fixed" and np.asarray(x).dtype != np.uint32:
            from .golden import float_to_fixed
            x = float_to_fixed(np.asarray(x))
        if self._colp is not None:
            x = jnp.asarray(x)[self._colp]
        try:
            return self._run(x, renamed)
        except Exception:                                 # noqa: BLE001
            # VMEM-overflow fallback (the 256 MB channel-guard analog,
            # sw/benchmark.cpp:238-243): a resident compile near the
            # budget edge can still be rejected by Mosaic — rebuild the
            # stream for the paged variant and retry once
            if self.variant != "resident" or self.interpret:
                raise
            from ..utils.tracing import log_phase
            log_phase("resident compile failed; falling back to paged")
            self.variant = "paged"
            self._prepare("paged")
            return self._run(x, renamed)

    def _run(self, x, renamed):
        y_blocks = _spmv_call(
            self.vals, self.idxT, self.part, self.block, self.first,
            jnp.asarray(x), self.cmap,
            cfg=self.cfg, n_blocks=self.wp.n_blocks,
            n_parts=self.wp.n_parts, interpret=self.interpret,
            variant=self.variant, tiles_per_step=self.tb)
        y_renamed = y_blocks.reshape(-1)
        if renamed:
            return y_renamed
        return self.wp.unpack_y(np.asarray(y_renamed))


def spmv(wp: Wavepack, x, interpret: bool = False, variant: str = "auto"):
    """One-shot SpMV y = A @ x from a packed matrix."""
    return SpmvOperator(wp, interpret=interpret, variant=variant)(x)


def spmm(wp: Wavepack, X, interpret: bool = False, variant: str = "auto"):
    """One-shot multi-vector SpMM Y = A @ X (X: (num_cols, F)) through the
    packed stream — see :meth:`SpmvOperator.matmul`."""
    return SpmvOperator(wp, interpret=interpret, variant=variant).matmul(X)


class HybridSpmv:
    """Bulk (block-major) + tail (select-chain) operator pair sharing one
    y geometry; y = y_bulk + y_tail (see formats.wavepack.pack_hybrid)."""

    def __init__(self, wp_bulk, wp_tail, interpret: bool = False):
        self.bulk = SpmvOperator(wp_bulk, interpret=interpret)
        self.tail = SpmvOperator(wp_tail, interpret=interpret)
        self.wp = wp_bulk
        self.nnz = wp_bulk.nnz + wp_tail.nnz
        self.stream_bytes = wp_bulk.stream_bytes + wp_tail.stream_bytes

    @property
    def fill(self):
        slots = ((self.bulk.wp.num_tiles + self.tail.wp.num_tiles)
                 * self.wp.config.tile_slots)
        return self.nnz / max(slots, 1)

    def __call__(self, x, renamed: bool = False):
        y = (self.bulk(x, renamed=True) + self.tail(x, renamed=True))
        if renamed:
            return y
        return self.wp.unpack_y(np.asarray(y))
