#!/usr/bin/env python
"""Round benchmark — prints ONE JSON line for the driver.

Mirrors the reference's benchmark flow (sw/benchmark.cpp + sw/bm.sh): pack a
suite of matrices, run the repeated device SpMV loop, report GOPS
(= 2*nnz/t, benchmark.cpp:314) with preprocessing timed separately
(benchmark.cpp:109-197).

Suite: synthetic stand-ins for the FPGA'22 graph + pruned-NN regimes, sized
so host->device staging stays within the round budget (the tunnel moves
~16 MB/s; real-dataset runs use scripts/bench_datasets.py).

vs_baseline compares against the reference's overall geomean of 16.7 GOPS
on the U280 (BASELINE.md, paper Table 3).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BASELINE_GOPS = 16.7


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from hisparse_tpu import (SpmvConfig, uniform_sparse_csr, powerlaw_csr,
                              pack, SpmvOperator)
    from hisparse_tpu.ops.golden import spmv_f64
    from hisparse_tpu.utils.bench import measure_spmv, geomean

    on_tpu = jax.devices()[0].platform != "cpu"
    suite = []
    # graph-regime synthetics (power-law skew like gplus/pokec) + uniform
    cfg_g = SpmvConfig(sublanes=512, bank_blocks=2, stripes=512)
    suite.append(("uniform-60k-d16", uniform_sparse_csr(60000, 60000, 16, seed=1),
                  cfg_g, None))
    suite.append(("powerlaw-100k-d10", powerlaw_csr(100000, 100000, 10,
                                                    alpha=1.3, seed=2),
                  cfg_g, "auto"))
    # pruned-NN regime: few dense rows (transformer-90-ish density)
    cfg_n = SpmvConfig(sublanes=512, bank_blocks=2, stripes=4)
    suite.append(("pruned-nn-512x33k-d10%",
                  uniform_sparse_csr(512, 33280, 3328, seed=3), cfg_n, None))

    rows = []
    gops_list = []
    for name, m, cfg, split in suite:
        t0 = time.perf_counter()
        wp = pack(m, cfg, split_max=split)
        pre = time.perf_counter() - t0
        op = SpmvOperator(wp, interpret=not on_tpu)
        x = jax.device_put(
            np.random.default_rng(0).random(m.num_cols).astype(np.float32))
        y = op(x)
        ref = spmv_f64(m, np.asarray(x))
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
        ok = err < 1e-4
        met = measure_spmv(name, op, x, m.nnz, wp.stream_bytes,
                           preproc_s=pre, fill=wp.fill)
        rows.append(("OK  " if ok else "BAD ") + met.row())
        gops_list.append(met.gops if ok else 0.0)
        print(rows[-1], file=sys.stderr, flush=True)

    g = geomean(gops_list)
    print(json.dumps({
        "metric": "spmv_gops_geomean",
        "value": round(g, 2),
        "unit": "GOPS",
        "vs_baseline": round(g / BASELINE_GOPS, 3),
    }))


if __name__ == "__main__":
    main()
