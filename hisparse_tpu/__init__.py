"""hisparse_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch rebuild of the capabilities of cornell-zhang/HiSparse
(FPGA'22) for TPU: the CPSR pack-streams preprocessor becomes the wavepack
scheduler (formats/wavepack.py), the banked vector buffer + arbitrated
shuffle + stall-free PEs become a branch-free Pallas kernel over
statically-scheduled waves (ops/spmv.py), with fp32 / saturating fixed-point
Q8.24 / dense-MXU paths, multi-chip sharding (parallel/), an analytical
performance model and design-space explorer (models/).
"""
from .utils.hostmem import tune_allocator as _tune_allocator

_tune_allocator()   # page-fault-bound hosts: see utils/hostmem.py

from .config import LANES, SpmvConfig, GRAPH_CONFIG, NN_CONFIG
from .formats.csr import (CSRMatrix, load_npz, save_npz, round_dims,
                          normalize_by_outdegree, dense_csr,
                          uniform_sparse_csr, powerlaw_csr,
                          rmat_csr, block_structured_csr)
from .formats.wavepack import (Wavepack, pack, decode, save_wavepack,
                               load_wavepack)
from .ops.spmv import SpmvOperator, spmv, spmm
from .ops.dense import DenseOperator, SpmmOperator, choose_format
from .ops.autodiff import DiffSpmv

__all__ = [
    "LANES", "SpmvConfig", "GRAPH_CONFIG", "NN_CONFIG",
    "CSRMatrix", "load_npz", "save_npz", "round_dims",
    "normalize_by_outdegree", "dense_csr", "uniform_sparse_csr",
    "powerlaw_csr", "rmat_csr", "block_structured_csr", "Wavepack", "pack", "decode", "save_wavepack",
    "load_wavepack", "SpmvOperator", "spmv", "spmm", "DenseOperator",
    "SpmmOperator",
    "choose_format", "DiffSpmv",
]
__version__ = "0.1.0"
