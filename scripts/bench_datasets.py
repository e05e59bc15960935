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
                                           127.0, 1.2, seed=11)))
    from hisparse_tpu import rmat_csr
    out.append(("pokec", rmat_csr(s(1632000), s(1632000), 19.0, seed=12)))
    # hollywood at published shape: 1.07M rows, 113M nnz (sw/bm.sh:4-17,
    # run on hw by sw/host.cpp:335-357) — the >=100M-nnz scale tier
    out.append(("hollywood", rmat_csr(s(1069000), s(1069000), 106.0,
                                      seed=13)))
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
    from hisparse_tpu.ops.dense import DenseOperator, choose_format
    from hisparse_tpu.utils.bench import geomean, device_loop_time
    from bench import bench_entry

    on_tpu = jax.devices()[0].platform != "cpu"
    ours, theirs = [], []
    for name, m in suite(args.scale):
        met, ok, cfg, wp = bench_entry(name, m, on_tpu)
        best = met.gops if ok else 0.0
        if choose_format(m) == "dense":
            import jax.numpy as jnp
            x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
            dop = DenseOperator(m, dtype="bf16")
            xp = np.pad(x, (0, dop.a.shape[1] - m.num_cols))
            dt = device_loop_time(
                lambda xx, a: jnp.dot(a, xx,
                                      preferred_element_type=jnp.float32),
                jnp.asarray(xp, dop.a.dtype), dop.a)
            best = max(best, 2 * m.nnz / dt / 1e9)
        rg = REF_GOPS.get(name, float("nan"))
        print(f"    best {best:7.1f} GOPS | U280 ref {rg:5.1f} GOPS",
              flush=True)
        ours.append(best)
        theirs.append(rg)
    print(f"geomean: ours {geomean(ours):.1f} GOPS | "
          f"U280 {geomean([t for t in theirs if t == t]):.1f} GOPS")


if __name__ == "__main__":
    main()
