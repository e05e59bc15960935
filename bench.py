#!/usr/bin/env python
"""Round benchmark — prints ONE JSON line for the driver.

Mirrors the reference's benchmark flow (sw/benchmark.cpp + sw/bm.sh): pack a
suite of matrices, run the repeated device SpMV loop, report GOPS
(= 2*nnz/t, benchmark.cpp:314) with preprocessing timed separately
(benchmark.cpp:109-197).  Each matrix is auto-tuned over a small design grid
with the analytical model (the reference's DSE, design_space_exp.cpp) before
measuring; the pruned-NN entry additionally reports the dense-MXU path and
keeps the better one, since format choice is part of this framework.

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


def tune_grid(num_rows=None):
    """Design points for the auto-tuner; stripes scale with the row count
    so small matrices don't drown in empty block slots."""
    from hisparse_tpu import SpmvConfig
    if num_rows is None:
        r_big = [512]
    else:
        want = max(1, -(-num_rows // 128))
        r_big = sorted({min(512, 1 << max(7, (want - 1).bit_length())),
                        512})
    pts = []
    for R in r_big:
        for B, K in ((4, 4), (8, 4), (16, 4), (4, 2), (8, 2)):
            pts.append((SpmvConfig(sublanes=512, bank_blocks=B, stripes=R,
                                   two_choice=True, block_major=True,
                                   classes_per_group=K,
                                   steal_mantissa=True), "auto"))
        pts.append((SpmvConfig(sublanes=512, bank_blocks=2, stripes=R,
                               two_choice=True, steal_mantissa=True),
                    "auto"))
        pts.append((SpmvConfig(sublanes=512, bank_blocks=8, stripes=R,
                               two_choice=False), "auto"))
    # small/dense-rows regimes
    for R in (4, 16, 32):
        pts.append((SpmvConfig(sublanes=512, bank_blocks=2, stripes=R,
                               two_choice=True), None))
    return pts


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from hisparse_tpu import (uniform_sparse_csr, powerlaw_csr, pack,
                              SpmvOperator)
    from hisparse_tpu.models.dse import best_config
    from hisparse_tpu.ops.dense import DenseOperator, choose_format
    from hisparse_tpu.ops.golden import spmv_f64
    from hisparse_tpu.utils.bench import (measure_spmv, geomean,
                                          device_loop_time)

    on_tpu = jax.devices()[0].platform != "cpu"
    suite = [
        ("uniform-60k-d16", uniform_sparse_csr(60000, 60000, 16, seed=1)),
        ("powerlaw-100k-d10", powerlaw_csr(100000, 100000, 10, alpha=1.3,
                                           seed=2)),
        ("pruned-nn-512x33k-d10%", uniform_sparse_csr(512, 33280, 3328,
                                                      seed=3)),
    ]

    gops_list = []
    for name, m in suite:
        t0 = time.perf_counter()
        density = m.nnz / max(m.num_rows * m.num_cols, 1)
        if density >= 0.05:
            # dense-rows regime: the DSE answer is known (many slots per
            # row); skip the per-config packs, they dominate preprocessing
            from hisparse_tpu import SpmvConfig as _SC
            cfg, split = _SC(sublanes=512, bank_blocks=2, stripes=4,
                             two_choice=True), None
            co = None
        else:
            co = "degree"    # hub columns into the first classes
            cfg, split = best_config(m, grid=tune_grid(m.num_rows),
                                     sample_max_rows=50000,
                                     col_order=co)
        wp = pack(m, cfg, split_max=split, col_order=co)
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
        tag = (f"cfg S={cfg.sublanes} B={cfg.bank_blocks} R={cfg.stripes} "
               f"tc={int(cfg.two_choice)}")
        print(("OK  " if ok else "BAD ") + met.row() + " | " + tag,
              file=sys.stderr, flush=True)
        best_gops = met.gops if ok else 0.0

        if choose_format(m) == "dense":
            import jax.numpy as jnp
            dop = DenseOperator(m, dtype="bf16")
            yd = np.asarray(dop(x))
            errd = np.abs(yd - ref).max() / max(np.abs(ref).max(), 1)
            dt = device_loop_time(
                lambda xx, a: jnp.dot(a, xx,
                                      preferred_element_type=jnp.float32),
                jnp.asarray(np.asarray(op_pad(x, dop)), dop.a.dtype), dop.a)
            if dop.stream_bytes / dt / 1e9 > 900:   # above HBM: flaky read
                dt = device_loop_time(
                    lambda xx, a: jnp.dot(a, xx,
                                          preferred_element_type=jnp.float32),
                    jnp.asarray(np.asarray(op_pad(x, dop)), dop.a.dtype),
                    dop.a)
            dgops = 2 * m.nnz / dt / 1e9
            print(f"    dense-bf16 path: {dt*1e3:.4f} ms | {dgops:7.1f} GOPS"
                  f" | stream {dop.stream_bytes/dt/1e9:6.1f} GB/s | "
                  f"err {errd:.1e}", file=sys.stderr, flush=True)
            if errd < 3e-2 and dgops > best_gops:
                best_gops = dgops
        gops_list.append(best_gops)

    g = geomean(gops_list)
    print(json.dumps({
        "metric": "spmv_gops_geomean",
        "value": round(g, 2),
        "unit": "GOPS",
        "vs_baseline": round(g / BASELINE_GOPS, 3),
    }))


def op_pad(x, dop):
    x = np.asarray(x)
    return np.pad(x, (0, dop.a.shape[1] - x.shape[0]))


if __name__ == "__main__":
    main()
