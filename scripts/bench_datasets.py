"""FPGA'22-shaped benchmark sweep — the bm.sh analog (sw/bm.sh:1-35).

The real datasets are unreachable here (zero network egress), so each entry
is a synthetic stand-in with the published shape and density (paper
Table 2): the full 12-entry suite — 6 graphs including the
ogbn-products-shape 124M-nnz and hollywood-shape 113M-nnz tiers, and the 6
pruned-NN layers at full published size.  Reference per-dataset GOPS from
paper Table 3 are printed alongside (BASELINE.md), and the whole run is
recorded to BENCH_DATASETS.json at the repo root.

Usage: python scripts/bench_datasets.py [--scale 1.0] [--only NAME ...]
"""
import argparse
import json
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


def suite(scale: float, only=None, npz_dir=None):
    """Yields (name, matrix) lazily — one giant matrix in memory at a
    time.  Published shapes/densities per paper Table 2; graph character
    per family: power-law skew for the social graphs, R-MAT (skew + edge
    locality) for pokec/hollywood/products, near-uniform rows for
    ogbl-ppa.

    ``npz_dir``: when set, each suite entry first looks for
    ``<npz_dir>/<name>.npz`` (the scipy format the reference's
    datasets/download.sh fetches) and uses the REAL matrix if present,
    falling back to the synthetic stand-in otherwise — so the day an
    egress path exists, the published-dataset run is one command:
    ``python scripts/bench_datasets.py --npz-dir datasets/graph``."""
    import os
    from hisparse_tpu import uniform_sparse_csr, powerlaw_csr, rmat_csr
    from hisparse_tpu.formats.csr import load_npz
    s = lambda n: max(1, int(n * scale)) if n > 200000 else n
    gens = [
        ("mouse_gene", lambda: powerlaw_csr(45000, 45000, 639.0, 1.4,
                                            seed=10)),
        ("googleplus", lambda: powerlaw_csr(108000, 108000, 127.0, 1.2,
                                            seed=11)),
        ("ogbl_ppa", lambda: uniform_sparse_csr(s(576000), s(576000), 73,
                                                seed=15)),
        ("pokec", lambda: rmat_csr(s(1632000), s(1632000), 19.0, seed=12)),
        # hollywood at published shape: 1.07M rows, 113M nnz (sw/bm.sh)
        ("hollywood", lambda: rmat_csr(s(1069000), s(1069000), 106.0,
                                       seed=13)),
        # ogbn-products at published shape: 2.45M rows, 124M nnz — the
        # reference's largest benchmark (paper Tables 3/8)
        ("ogbn_products", lambda: rmat_csr(s(2449000), s(2449000), 50.7,
                                           seed=14)),
    ]
    # pruned-NN suite, full size (512 x 33288 at 50..5% density)
    for pct in (50, 60, 70, 80, 90, 95):
        d = (100 - pct) / 100.0
        gens.append((f"transformer_{pct}",
                     lambda d=d, pct=pct: uniform_sparse_csr(
                         512, 33288, int(33288 * d), seed=pct)))
    for name, gen in gens:
        if only and name not in only:
            continue
        if npz_dir:
            p = os.path.join(npz_dir, f"{name}.npz")
            if os.path.exists(p):
                print(f"    {name}: real dataset {p}", file=sys.stderr)
                yield name, load_npz(p), True
                continue
        yield name, gen(), False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="graph size scale factor (1.0 = published sizes)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="run only these entries")
    ap.add_argument("--npz-dir", default=None,
                    help="directory of real <name>.npz datasets; entries "
                         "found there run the real matrix instead of the "
                         "synthetic stand-in")
    ap.add_argument("--out", default="/root/repo/BENCH_DATASETS.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from hisparse_tpu.ops.dense import DenseOperator, choose_format
    from hisparse_tpu.utils.bench import geomean, device_loop_time
    from bench import bench_entry, wait_for_backend

    on_tpu = wait_for_backend() != "cpu"
    # resume/merge: the giants run in a separate pass from the small
    # entries (host-memory discipline: one working set at a time), so a
    # later --only invocation must extend the artifact, not replace it
    rec = {"scale": args.scale, "on_tpu": on_tpu, "entries": {}}
    try:
        with open(args.out) as f:
            prev = json.load(f)
        # merge only same-scale AND same-backend prior entries: numbers
        # from a CPU fallback pass must not blend into a TPU geomean
        if (prev.get("scale") == args.scale
                and prev.get("on_tpu") == on_tpu):
            rec["entries"].update(prev.get("entries", {}))
    except (OSError, ValueError):
        pass
    for name, m, real in suite(args.scale, args.only, npz_dir=args.npz_dir):
        t0 = time.perf_counter()
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
        rg = REF_GOPS.get(name)      # None (not NaN) keeps the JSON strict
        print(f"    best {best:7.1f} GOPS | U280 ref "
              f"{rg if rg is not None else float('nan'):5.1f} GOPS",
              file=sys.stderr, flush=True)
        rec["entries"][name] = {
            "rows": m.num_rows, "cols": m.num_cols, "nnz": int(m.nnz),
            "ok": bool(ok), "gops": round(best, 2), "ref_gops": rg,
            "preproc_s": round(met.preproc_s, 2),
            "spmv_ms": round(met.spmv_ms, 4),
            "fill": round(met.fill, 3),
            "roofline_frac": round(met.roofline_frac, 3),
            "roofline_eff": round(getattr(met, "roofline_eff", 0.0), 3),
            "real_npz": real,
            "wall_s": round(time.perf_counter() - t0, 1)}
        del m, wp
        with open(args.out, "w") as f:       # checkpoint after each entry
            json.dump(rec, f, indent=1)
    # geomean over EVERY recorded entry (incl. merged-in prior passes);
    # failed entries (gops 0) are dropped by geomean — flag them honestly
    # like bench.py does
    ours = [e["gops"] for e in rec["entries"].values()]
    theirs = [e["ref_gops"] for e in rec["entries"].values()]
    failed = sum(1 for e in rec["entries"].values() if not e["ok"])
    rec["geomean_gops"] = round(geomean(ours), 2)
    rec["ref_geomean_gops"] = round(
        geomean([t for t in theirs if t is not None]), 2)
    if failed:
        rec["failed_entries"] = failed
        rec["geomean_partial"] = True
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"geomean: ours {rec['geomean_gops']:.1f} GOPS | "
          f"U280 {rec['ref_geomean_gops']:.1f} GOPS -> {args.out}")


if __name__ == "__main__":
    main()
