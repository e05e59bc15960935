#!/usr/bin/env python
"""On-chip design sweep: measured GOPS per (matrix, config family) to map
the real slot-rate/fill frontier.  Results feed the perf-model tables
(models/perf_model.py) and the bench tuning grid (bench.py::tune_grid).

Round-2 conclusions recorded from this sweep:
  * slot rate by classes_per_group K (bm): 2 -> ~52-58, 4 -> ~38, 8 -> ~23
    Gslot/s; select-chain by total operand blocks; B=16 ~0.77x, two-choice
    ~0.94x (bm) / ~0.77x (chain).
  * degree-sorted columns make two-choice nearly free fill-wise.
  * full-coverage configs (K == total classes, e.g. B4 K4 tc0) do NOT win:
    the smaller vector buffer splits columns into more partitions and the
    quantization eats the starvation gain.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from hisparse_tpu import (uniform_sparse_csr, powerlaw_csr, pack,
                              SpmvConfig, SpmvOperator)
    from hisparse_tpu.models.perf_model import estimate_pack
    from hisparse_tpu.ops.golden import spmv_f64
    from hisparse_tpu.utils.bench import measure_spmv

    mats = [
        ("uniform-60k", uniform_sparse_csr(60000, 60000, 16, seed=1)),
        ("powerlaw-100k", powerlaw_csr(100000, 100000, 10, alpha=1.3,
                                       seed=2)),
        ("gplus-30k", powerlaw_csr(30000, 30000, 127, alpha=1.2, seed=4)),
    ]
    cfgs = []
    for B, K, tc, R in ((8, 2, False, 128), (8, 2, False, 512),
                        (8, 2, True, 512), (4, 2, True, 512),
                        (16, 2, True, 512), (8, 4, False, 128),
                        (8, 4, True, 512), (8, 1, True, 512)):
        cfgs.append((f"bm B={B} K={K} tc={int(tc)} R={R}",
                     SpmvConfig(sublanes=512, bank_blocks=B, stripes=R,
                                two_choice=tc, block_major=True,
                                classes_per_group=K, steal_mantissa=True)))
    for B, tc in ((1, False), (2, False), (2, True)):
        cfgs.append((f"chain B={B} tc={int(tc)} R=512",
                     SpmvConfig(sublanes=512, bank_blocks=B, stripes=512,
                                two_choice=tc, steal_mantissa=True)))

    for mname, m in mats:
        x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
        ref = spmv_f64(m, x)
        for cname, cfg in cfgs:
            try:
                t0 = time.perf_counter()
                wp = pack(m, cfg, split_max="auto", col_order="degree")
                pre = time.perf_counter() - t0
                op = SpmvOperator(wp)
                y = op(x)
                err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
                met = measure_spmv(mname, op, x, m.nnz, wp.stream_bytes,
                                   preproc_s=pre, fill=wp.fill)
                slots = wp.num_tiles * cfg.tile_slots
                gslot = slots / (met.spmv_ms * 1e-3) / 1e9
                est = estimate_pack(wp)
                mdl = (f"model {est.gops:5.1f} "
                       f"({met.gops / max(est.gops, 1e-9):4.2f}x)")
                print(f"{mname:14s} {cname:16s} fill {wp.fill:.3f} | "
                      f"{met.gops:6.1f} GOPS | {gslot:5.1f} Gslot/s | "
                      f"stream {met.stream_gbps:5.0f} GB/s | {mdl} | "
                      f"pack {pre:5.1f}s"
                      f" | {'OK' if err < 1e-4 else 'BAD ' + str(err)}",
                      flush=True)
            except Exception as e:                        # noqa: BLE001
                print(f"{mname:14s} {cname:16s} FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
