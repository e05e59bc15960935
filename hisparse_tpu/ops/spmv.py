"""The SpMV Pallas kernel — the analog of the reference's device dataflow.

One grid step consumes one wavepack tile and performs, in order, the roles
of the reference's five pipeline stages (SURVEY.md section 3.3):

  stage                         reference                      here
  ----------------------------- ------------------------------ ----------------
  vector load / broadcast       spmv_vector_loader.cpp:7-121   XT tile revisit
  matrix stream                 spmv_cluster.h:34-107          vals/idxT DMA
  col shuffle + vecbuf gather   shuffle.h:24-99 + vau:18-84    lane-gather from
                                                               transposed x-bank
                                                               blocks + select
  row shuffle                   shuffle.h:102-177              lane-gather of
                                                               gathered x by the
                                                               pack-time src map
  PE accumulate                 pe.h:22-90                     acc += vals*routed
  PE output / result drain      pe.h:95-116, result_drain      stripe-reduce
                                                               flush on block end

All conflict arbitration happened at pack time (formats/wavepack.py), so the
kernel is branch-free at line rate: two dynamic lane-gathers, one transpose,
B-1 selects per 128-row group, one FMA, one accumulate.
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


def _spmv_kernel(part_ref, block_ref, first_ref, last_ref,
                 vals_ref, idxT_ref, xt_ref, out_ref, acc_ref,
                 *, cfg: SpmvConfig):
    S, R, B, G = cfg.sublanes, cfg.stripes, cfg.bank_blocks, cfg.groups
    t = pl.program_id(0)

    @pl.when(first_ref[t] == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    idx = idxT_ref[0]
    hT = idx & 0x7F
    bT = (idx >> 7) & 0x7
    srcT = idx >> 10

    gx_groups = []
    src_groups = []
    for g in range(G):
        sl = slice(g * 128, (g + 1) * 128)
        hg = hT[sl]
        e = jnp.take_along_axis(xt_ref[0, 0], hg, axis=1)
        for b in range(1, B):
            eb = jnp.take_along_axis(xt_ref[0, b], hg, axis=1)
            e = jnp.where(bT[sl] == b, eb, e)
        gx_groups.append(e.T)
        src_groups.append(srcT[sl].T)
    gx = jnp.concatenate(gx_groups, axis=0) if G > 1 else gx_groups[0]
    src = jnp.concatenate(src_groups, axis=0) if G > 1 else src_groups[0]

    routed = jnp.take_along_axis(gx, src, axis=1)
    acc_ref[:] = acc_ref[:] + vals_ref[0] * routed

    @pl.when(last_ref[t] == 1)
    def _():
        if R == S:
            out_ref[0] = acc_ref[:]
        else:
            out_ref[0] = acc_ref[:].reshape(S // R, R, LANES).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "n_blocks", "n_parts",
                                             "interpret"))
def _spmv_call(vals, idxT, part, block, first, last, x, *,
               cfg: SpmvConfig, n_blocks: int, n_parts: int,
               interpret: bool = False):
    S, B = cfg.sublanes, cfg.bank_blocks
    T = vals.shape[0]
    x_padded = jnp.pad(x.astype(vals.dtype),
                       (0, n_parts * cfg.vb_cols - x.shape[0]))
    # vector-loader analog: pre-transpose x into per-partition bank blocks
    # XT[p, b, l, h] = x[p*VB + (b*128 + h)*128 + l]
    XT = x_padded.reshape(n_parts, B, 128, LANES).transpose(0, 1, 3, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, LANES), lambda t, pr, br, fr, lr: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, LANES), lambda t, pr, br, fr, lr: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 128, 128),
                         lambda t, pr, br, fr, lr: (pr[t], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cfg.stripes, LANES),
                               lambda t, pr, br, fr, lr: (br[t], 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((S, LANES), vals.dtype)],
    )
    return pl.pallas_call(
        functools.partial(_spmv_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks, cfg.stripes, LANES),
                                       vals.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(part, block, first, last, vals, idxT, XT)


class SpmvOperator:
    """Device-resident packed matrix + compiled SpMV.

    The analog of the programmed overlay + per-channel HBM buffers
    (sw/host.cpp:263-299): construct once from a Wavepack, then call with
    dense vectors.  ``renamed=True`` returns y in the packed row order
    (for chained iteration in permuted space, e.g. PageRank); otherwise the
    row permutation is undone on the host.
    """

    def __init__(self, wp: Wavepack, interpret: bool = False):
        self.wp = wp
        self.cfg = wp.config
        self.interpret = interpret
        self.vals = jnp.asarray(wp.vals)
        self.idxT = jnp.asarray(wp.idxT)
        self.part = jnp.asarray(wp.tile_part)
        self.block = jnp.asarray(wp.tile_block)
        self.first = jnp.asarray(wp.tile_first)
        self.last = jnp.asarray(wp.tile_last)
    def __call__(self, x, renamed: bool = False):
        y_blocks = _spmv_call(
            self.vals, self.idxT, self.part, self.block, self.first,
            self.last, jnp.asarray(x),
            cfg=self.cfg, n_blocks=self.wp.n_blocks,
            n_parts=self.wp.n_parts, interpret=self.interpret)
        y_renamed = y_blocks.reshape(-1)
        if renamed:
            return y_renamed
        return self.wp.unpack_y(np.asarray(y_renamed))


def spmv(wp: Wavepack, x, interpret: bool = False):
    """One-shot SpMV y = A @ x from a packed matrix."""
    return SpmvOperator(wp, interpret=interpret)(x)
