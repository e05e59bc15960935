"""FPGA'22-shaped benchmark sweep CLI — the bm.sh analog (sw/bm.sh:1-35).

The 12-entry published-size suite itself lives in bench.py
(``dataset_suite`` / ``run_dataset_suite``) because it IS the round
headline artifact; this wrapper adds the knobs useful for manual runs:
``--scale`` for cheap smoke passes, ``--only`` for two-pass host-memory
discipline on the giants, and ``--npz-dir`` to run the REAL datasets the
day an egress path exists (datasets/download.sh analog).

Usage: python scripts/bench_datasets.py [--scale 1.0] [--only NAME ...]
                                        [--npz-dir DIR] [--out PATH]
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")


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
    from bench import run_dataset_suite, wait_for_backend

    on_tpu = wait_for_backend() != "cpu"
    run_dataset_suite(on_tpu, out_path=args.out, scale=args.scale,
                      only=args.only, npz_dir=args.npz_dir)


if __name__ == "__main__":
    main()
