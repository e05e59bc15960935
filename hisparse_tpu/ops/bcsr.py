"""BCSR (block-sparse rows) MXU path — dense (128,128) blocks on the
systolic array.

The middle regime between wavepack (unstructured, VPU gathers) and the
fully dense path: matrices whose nonzeros cluster into dense-ish tiles
(the BASELINE.json SpMM batch config: "Multi-vector SpMM batch on BCSR
tiles (dense-block MXU path, x with 64 cols)").  Each stored block is a
dense (128,128) tile; the kernel streams blocks in block-row order,
multiplies on the MXU against the VMEM-resident x tile at the block's
column, and accumulates into a resident y.

GOPS still counts 2*nnz(A)/t of the true nonzeros so comparisons with the
sparse paths stay honest.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.csr import CSRMatrix

BS = 128  # block edge


def pack_bcsr(m: CSRMatrix, dtype=jnp.float32):
    """Densify the nonempty (128,128) blocks of a CSR matrix.

    Returns (blocks, brow, bcol, meta) with blocks (nb,128,128), block ids
    sorted by (brow, bcol).
    """
    nbr = -(-m.num_rows // BS)
    nbc = -(-m.num_cols // BS)
    rows = np.repeat(np.arange(m.num_rows), m.row_nnz())
    br = rows // BS
    bc = m.indices // BS
    key = br.astype(np.int64) * nbc + bc
    uniq, inv = np.unique(key, return_inverse=True)
    nb = uniq.size
    blocks = np.zeros((max(nb, 1), BS, BS), np.float32)
    # duplicates sum (SpMV semantics)
    np.add.at(blocks, (inv, rows % BS, m.indices % BS), m.data)
    brow = (uniq // nbc).astype(np.int32)
    bcol = (uniq % nbc).astype(np.int32)
    if nb == 0:
        brow = np.zeros(1, np.int32)
        bcol = np.zeros(1, np.int32)
    return (jnp.asarray(blocks, dtype), jnp.asarray(brow),
            jnp.asarray(bcol), (nbr, nbc, m.nnz))


def _bcsr_kernel(brow_ref, bcol_ref, blocks_ref, x_ref, out_ref, *, nk):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    br = brow_ref[t]
    bc = bcol_ref[t]
    a = blocks_ref[0]
    xb = x_ref[pl.ds(pl.multiple_of(bc * BS, BS), BS), :]
    off = pl.multiple_of(br * BS, BS)
    out_ref[pl.ds(off, BS), :] = (
        out_ref[pl.ds(off, BS), :]
        + jnp.dot(a, xb, preferred_element_type=jnp.float32))


@functools.partial(jax.jit, static_argnames=("nbr", "nbc", "nk",
                                             "interpret"))
def _bcsr_call(blocks, brow, bcol, x, *, nbr, nbc, nk, interpret=False):
    interpret = interpret or jax.default_backend() == "cpu"
    nb = blocks.shape[0]
    xp = jnp.pad(x.astype(blocks.dtype),
                 ((0, nbc * BS - x.shape[0]), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_bcsr_kernel, nk=nk),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, BS, BS), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nbr * BS, nk), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr * BS, nk), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(brow, bcol, blocks, xp)
    return out


class BcsrOperator:
    """y = A @ x (or Y = A @ X with k right-hand sides) over dense-block
    BCSR storage, blocks on the MXU."""

    def __init__(self, m: CSRMatrix, dtype=jnp.float32,
                 interpret: bool = False):
        self.blocks, self.brow, self.bcol, (self.nbr, self.nbc, self.nnz) \
            = pack_bcsr(m, dtype)
        self.num_rows, self.num_cols = m.num_rows, m.num_cols
        self.interpret = interpret
        self.stream_bytes = self.blocks.nbytes

    @property
    def block_fill(self) -> float:
        return self.nnz / max(self.blocks.size, 1)

    def __call__(self, x):
        x = jnp.asarray(x)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        orig_k = x.shape[1]
        nk = max(8, -(-orig_k // 8) * 8)
        if orig_k < nk:
            x = jnp.pad(x, ((0, 0), (0, nk - orig_k)))
        out = _bcsr_call(self.blocks, self.brow, self.bcol, x,
                         nbr=self.nbr, nbc=self.nbc, nk=nk,
                         interpret=self.interpret)
        out = out[:self.num_rows]
        return out[:, 0] if squeeze else out[:, :orig_k]
