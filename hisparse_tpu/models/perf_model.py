"""Analytical performance model — the port of performance_model.cpp:430-444.

The reference models one SpMV as
    T = max(TM, TV) + TW,   p = min(alpha, beta) * total_lanes,
with alpha = shuffle efficiency (ideal/actual iterations), beta = payload
fraction of the padded CPSR stream, TM = matrix stream time, TV = vector
reload time, TW = result writeback time (cycles at 237 MHz over 16 channels).

TPU mapping:
  * beta  -> wavepack fill (true nnz / padded slots), computed exactly by
    the packer.
  * alpha -> wave-scheduling efficiency: optimum waves / scheduled waves,
    where the optimum per (segment, stripe) is
    max(max row nnz, max per-bank distinct-column load) — the bipartite
    edge-coloring lower bound.
  * TM -> stream bytes / HBM bandwidth; compute bound -> slots / slot_rate
    (slot_rate calibrated per bank_blocks count); TV -> x (re)load traffic
    (zero reloads for the resident variant); TW -> y writeback traffic.

The model predicts GOPS and names the binding resource, and is the cost
function for the design-space explorer (models/dse.py).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..config import LANES, SpmvConfig
from ..formats.csr import CSRMatrix
from ..formats.wavepack import Wavepack
from ..ops.spmv import resident_bytes, _RESIDENT_VMEM_BUDGET

# fallback sustained slot rates (Gslot/s), measured on TPU v5e
# (scripts/tpu_bench2.py); keyed by gather-operand count: select-chain path
# by total_blocks, block-major path by classes_per_group.  Linear
# interpolation elsewhere.  ``scripts/calibrate_slot_rates.py`` re-measures
# the curve on the attached chip and writes slot_rates.json next to this
# module, which takes precedence — the analog of the reference's
# instrumented-csim calibration (performance_model/include/shuffle.h:199).
SLOT_RATE_GSLOTS = {1: 62.0, 2: 52.0, 4: 48.0, 8: 23.0, 16: 12.0}
# round-3: tiles-per-step batching lifted bm K=1 to 71.2 Gslot/s
# (scratch/probe_wrap_rate.py); K=2/K=4 unchanged within noise
SLOT_RATE_BM_GSLOTS = {1: 71.0, 2: 53.0, 4: 38.0, 8: 23.0}
# two-choice rate multipliers beyond operand count (tc doubles the x tile
# and slows the gathers); round-2/3 point measurements, superseded by the
# measured values in slot_rates.json when calibrate_slot_rates.py has run
TC_MULT_CHAIN = 0.77
TC_MULT_BM = 0.94

_RATES_PATH = __file__.rsplit("/", 1)[0] + "/slot_rates.json"
_loaded_rates = None


def _rate_tables():
    global _loaded_rates
    if _loaded_rates is None:
        tables = (SLOT_RATE_GSLOTS, SLOT_RATE_BM_GSLOTS, None, None,
                  TC_MULT_CHAIN, TC_MULT_BM)
        try:
            import json
            with open(_RATES_PATH) as f:
                d = json.load(f)

            def t(key):
                if key not in d:
                    return None
                return {int(k): float(v) for k, v in d[key].items()}
            tables = (t("select_chain"), t("block_major"),
                      t("select_chain_idx16"), t("block_major_idx16"),
                      float(d.get("tc_mult_chain", TC_MULT_CHAIN)),
                      float(d.get("tc_mult_bm", TC_MULT_BM)))
        except (OSError, KeyError, ValueError):
            pass
        _loaded_rates = tables
    return _loaded_rates


def tc_multiplier(block_major: bool) -> float:
    """Measured two-choice slot-rate multiplier (beyond operand count)."""
    tabs = _rate_tables()
    return tabs[5] if block_major else tabs[4]


def slot_rate(n_operands: int, block_major: bool = False,
              idx16: bool = False) -> float:
    """Calibrated sustained slot rate.  idx16 streams use their own
    measured table when the calibration has one (the int16 widen adds a
    VMEM op but halves idx DMA); otherwise the idx32 table — a neutral
    assumption until scripts/calibrate_slot_rates.py runs on-chip."""
    chain_tbl, bm_tbl, chain16, bm16 = _rate_tables()[:4]
    if idx16:
        table = (bm16 if block_major else chain16)
        if table is None:
            table = bm_tbl if block_major else chain_tbl
    else:
        table = bm_tbl if block_major else chain_tbl
    ks = sorted(table)
    if n_operands in table:
        return table[n_operands]
    lo = max([k for k in ks if k < n_operands], default=ks[0])
    hi = min([k for k in ks if k > n_operands], default=ks[-1])
    if lo == hi:
        return table[lo]
    f = (n_operands - lo) / (hi - lo)
    return table[lo] * (1 - f) + table[hi] * f


@dataclasses.dataclass
class PerfEstimate:
    gops: float
    time_s: float
    bound: str            # 'hbm-stream' | 'compute' | 'x-reload'
    alpha: float          # scheduling efficiency
    beta: float           # fill
    tm_s: float
    tv_s: float
    tw_s: float

    def row(self) -> str:
        return (f"est {self.gops:7.1f} GOPS  bound={self.bound:10s} "
                f"alpha={self.alpha:.2f} beta={self.beta:.2f} "
                f"TM={self.tm_s*1e6:.1f}us TV={self.tv_s*1e6:.1f}us "
                f"TW={self.tw_s*1e6:.1f}us")


def estimate(m: CSRMatrix, cfg: SpmvConfig, wp: Wavepack,
             hbm_gbps: float = 819.0) -> PerfEstimate:
    return estimate_pack(wp, hbm_gbps)


def estimate_pack(wp: Wavepack, hbm_gbps: float = 819.0) -> PerfEstimate:
    """Estimate from the pack alone (everything needed is on the Wavepack:
    nnz, fill, measured alpha, stream bytes, geometry)."""
    cfg = wp.config
    nnz = wp.nnz
    slots = wp.num_tiles * cfg.tile_slots
    beta = wp.fill
    # exact measured schedule efficiency, computed by the packer from the
    # per-(segment, stripe) edge-coloring lower bound (Wavepack.alpha) —
    # the analog of the reference's instrumented-csim iteration counts
    # (performance_model/include/shuffle.h:199,279)
    alpha = wp.alpha

    tm = wp.stream_bytes / (hbm_gbps * 1e9)
    n_ops = (cfg.classes_per_group if cfg.block_major
             else cfg.total_blocks)
    rate = slot_rate(n_ops, cfg.block_major, getattr(cfg, "idx16", False))
    # measured on v5e: two-choice doubles the x tile and slows the gathers
    # beyond what operand count alone predicts; block-major large B does
    # NOT (B=32/K=4 measured at 38.2 Gslot/s, equal to B=8 — round 3,
    # single-partition paged path).  The multiplier is re-measured by
    # calibrate_slot_rates.py (slot_rates.json) when available.
    if cfg.two_choice:
        rate *= tc_multiplier(cfg.block_major)
    tc = slots / (rate * 1e9)
    resident = (resident_bytes(cfg, wp.n_blocks, wp.n_parts)
                <= _RESIDENT_VMEM_BUDGET)
    # single-partition packs keep XT fully resident even in the paged
    # variant (only y pages), so x loads once either way
    x_once = resident or wp.n_parts == 1
    x_bytes = wp.n_parts * cfg.vb_cols * 4 * (1 if x_once else wp.n_blocks)
    tv = x_bytes / (hbm_gbps * 1e9)
    tw = wp.n_blocks * cfg.stripes * LANES * 4 / (hbm_gbps * 1e9)

    terms = [(tm, "hbm-stream"), (tc, "compute"), (tv, "x-reload")]
    stream_t, bound = max(terms, key=lambda e: e[0])
    t = stream_t + tw
    return PerfEstimate(gops=2 * nnz / t / 1e9, time_s=t, bound=bound,
                        alpha=alpha, beta=beta, tm_s=tm, tv_s=tv, tw_s=tw)
