"""Benchmark utilities — the analog of the reference's benchmark host
(sw/benchmark.cpp:29,311-346: NUM_RUNS=50 timed repetitions of the device
loop, GBPS = nnz*8/t, GOPS = 2*nnz/t).

Timing methodology: the host->device tunnel in some environments adds tens
of milliseconds of noisy per-round-trip latency, so wall-clocking single
dispatches is useless for sub-millisecond kernels.  Instead the repetition
loop runs ON DEVICE inside one jitted ``lax.fori_loop`` (the input vector is
perturbed per iteration so XLA cannot hoist the loop body), and the
per-iteration time is the slope between two repetition counts — immune to
both dispatch latency and compile time.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# v5e HBM bandwidth; used only for roofline reporting.
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v4": 1228.0, "TPU v6 lite": 1640.0}


def device_hbm_gbps() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in HBM_GBPS.items():
        if kind.startswith(k):
            return v
    return 819.0


_PEAK_EFF = {}


def measured_peak_gbps() -> float:
    """Effective (achievable) HBM read bandwidth of THIS device, measured
    once per process: a streaming elementwise-max reduction over a 256 MB
    fp32 array (far beyond VMEM, read-dominant like the SpMV streams) timed
    with the same on-device fori-loop slope as every other number here.
    ``max`` (not ``+``/``*``) so XLA's algebraic simplifier cannot hoist
    the scalar out of the reduce and skip the read.  BASELINE.md's stated
    bar is a fraction of *effective* bandwidth; the theoretical spec sheet
    number (HBM_GBPS) is reported alongside, never replaced."""
    dev = jax.devices()[0]
    # keyed on stable device identity, not the Python object id: a backend
    # re-init (tunnel reconnect) can GC the old device object and reuse its
    # id(), aliasing a stale measurement
    key = (getattr(dev, "id", 0), dev.device_kind)
    if key not in _PEAK_EFF:
        a = jnp.asarray(np.random.default_rng(0)
                        .random((2 ** 19, 128), np.float32))
        x = jnp.zeros(8, jnp.float32)
        dt = device_loop_time(
            lambda xx, aa: jnp.sum(jnp.maximum(aa, xx[0])), x, a)
        _PEAK_EFF[key] = a.size * 4 / dt / 1e9
    return _PEAK_EFF[key]


def _sync(v) -> None:
    np.asarray(jnp.sum(v))


def device_loop_time(fn: Callable, x: jax.Array, *args,
                     target_spread_s: float = 2.0) -> float:
    """Marginal per-iteration device time of ``fn(x, *args) -> array``.

    Builds ``lax.fori_loop(0, reps, ...)`` around fn with a per-iteration
    input perturbation, then returns the slope (T(r2)-T(r1))/(r2-r1) with
    rep counts auto-calibrated so the spread dwarfs round-trip latency
    noise (tens of ms through a tunneled device).  All arrays must be
    passed via ``args`` (not closed over), otherwise jit embeds them as
    constants in the compiled module.
    """
    @jax.jit
    def run(x, reps, *args):
        floating = jnp.issubdtype(x.dtype, jnp.floating)

        def body(i, carry):
            acc, xx = carry
            y = fn(xx, *args)
            # perturb the input each iteration so XLA cannot hoist the
            # body; the delta must survive the dtype (1e-12 rounds away in
            # bf16 and the loop body gets hoisted -> impossible numbers)
            if floating:
                xx = xx + ((i % 2) * 0.5).astype(x.dtype)
            else:
                xx = xx + (i % 2).astype(x.dtype)
            return acc + y.reshape(-1)[0].astype(jnp.float32), xx
        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), x))
        return acc

    def timed(reps):
        t0 = time.perf_counter()
        _sync(run(x, reps, *args))
        return time.perf_counter() - t0

    timed(4)                           # single compile + warm
    est = max((min(timed(32), timed(32)) - 0.03) / 32, 1e-7)
    r1 = 16
    r2 = r1 + max(64, min(int(target_spread_s / est), 80000))
    # the tunnel round trip is ~30 ms with spikes to ~160 ms; on a
    # microsecond kernel a single spiked ta at r1=16 shifts the slope by
    # (spike / (r2-r1)) — with a 0.5 s spread that was a 25% error
    # (measured: a 121%-of-HBM "roofline" reading).  A 2 s spread plus
    # median-of-5 bounds one spike's pull under ~2%.
    slopes = []
    for _ in range(5):
        ta = timed(r1)
        tb = timed(r2)
        slopes.append((tb - ta) / (r2 - r1))
    return max(float(np.median(slopes)), 1e-9)


@dataclasses.dataclass
class SpmvMetrics:
    """The reference's benchmark_result struct (sw/benchmark.cpp:73-87)."""
    name: str
    preproc_s: float
    spmv_ms: float
    gbps: float          # nnz * 8 bytes / t   (benchmark.cpp:313)
    gops: float          # 2 * nnz / t         (benchmark.cpp:314)
    stream_gbps: float   # actual packed bytes / t
    fill: float
    roofline_frac: float        # vs the spec-sheet peak (HBM_GBPS)
    roofline_eff: float = 0.0   # vs the measured achievable read bandwidth

    def row(self) -> str:
        eff = (f"/{100*self.roofline_eff:4.1f}% eff"
               if self.roofline_eff else "")
        return (f"{self.name:28s} preproc {self.preproc_s:7.2f} s | "
                f"SpMV {self.spmv_ms:8.4f} ms | {self.gbps:7.1f} GBPS | "
                f"{self.gops:7.1f} GOPS | stream {self.stream_gbps:6.1f} GB/s "
                f"({100*self.roofline_frac:4.1f}% roofline{eff}) | "
                f"fill {self.fill:.2f}")


def measure_spmv(name: str, op, x, nnz: int, stream_bytes: int,
                 preproc_s: float = 0.0, fill: float = 0.0) -> SpmvMetrics:
    from ..ops.spmv import _spmv_call

    if op.cmap is not None:
        def fn(xx, vals, idxT, part, block, first, cmap):
            y = _spmv_call(vals, idxT, part, block, first, xx, cmap,
                           cfg=op.cfg, n_blocks=op.wp.n_blocks,
                           n_parts=op.wp.n_parts, interpret=op.interpret,
                           variant=op.variant,
                           tiles_per_step=getattr(op, "tb", 1))
            return y.reshape(-1)
        args = (op.vals, op.idxT, op.part, op.block, op.first, op.cmap)
    else:
        def fn(xx, vals, idxT, part, block, first):
            y = _spmv_call(vals, idxT, part, block, first, xx,
                           cfg=op.cfg, n_blocks=op.wp.n_blocks,
                           n_parts=op.wp.n_parts, interpret=op.interpret,
                           variant=op.variant,
                           tiles_per_step=getattr(op, "tb", 1))
            return y.reshape(-1)
        args = (op.vals, op.idxT, op.part, op.block, op.first)
    dt = device_loop_time(fn, jnp.asarray(x), *args)
    sg = stream_bytes / dt / 1e9
    try:
        eff = sg / measured_peak_gbps() if not op.interpret else 0.0
    except Exception:                                     # noqa: BLE001
        eff = 0.0
    return SpmvMetrics(
        name=name, preproc_s=preproc_s, spmv_ms=dt * 1e3,
        gbps=nnz * 8 / dt / 1e9, gops=2 * nnz / dt / 1e9,
        stream_gbps=sg, fill=fill,
        roofline_frac=sg / device_hbm_gbps(), roofline_eff=eff)


def geomean(vals) -> float:
    vals = [v for v in vals if v > 0]
    return float(np.exp(np.mean(np.log(vals)))) if vals else 0.0
