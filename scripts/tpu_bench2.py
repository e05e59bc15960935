"""Real-chip config comparison: v2 (select-chain) vs block-major variants."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp, numpy as np
from hisparse_tpu import SpmvConfig, uniform_sparse_csr, powerlaw_csr, pack, SpmvOperator
from hisparse_tpu.ops.golden import spmv_f64
from hisparse_tpu.utils.bench import measure_spmv

CASES = {
  "uniform": (uniform_sparse_csr(60000, 60000, 16, seed=1), [
      ("v2 B2 tc0", SpmvConfig(512, 2, 512, two_choice=False), None),
      ("v2 B2 tc1 steal", SpmvConfig(512, 2, 512, two_choice=True, steal_mantissa=True), None),
      ("bm B4 k4 tc1", SpmvConfig(512, 4, 512, two_choice=True, block_major=True, classes_per_group=4), None),
      ("bm B4 k4 tc1 steal", SpmvConfig(512, 4, 512, two_choice=True, block_major=True, classes_per_group=4, steal_mantissa=True), None),
  ]),
  "powerlaw": (powerlaw_csr(100000, 100000, 10, alpha=1.3, seed=2), [
      ("v2 B8 tc0", SpmvConfig(512, 8, 512, two_choice=False), "auto"),
      ("bm B16 k4 tc0", SpmvConfig(512, 16, 512, two_choice=False, block_major=True, classes_per_group=4), "auto"),
      ("bm B16 k8 tc0", SpmvConfig(512, 16, 512, two_choice=False, block_major=True, classes_per_group=8), "auto"),
      ("bm B16 k4 tc1 steal", SpmvConfig(512, 16, 512, two_choice=True, block_major=True, classes_per_group=4, steal_mantissa=True), "auto"),
  ]),
}

for mname, (m, configs) in CASES.items():
    x = jax.device_put(np.random.default_rng(0).random(m.num_cols).astype(np.float32))
    ref = spmv_f64(m, np.asarray(x)); scale = max(abs(ref).max(), 1)
    for cname, cfg, split in configs:
        try:
            t0 = time.perf_counter()
            wp = pack(m, cfg, split_max=split)
            pre = time.perf_counter() - t0
            op = SpmvOperator(wp)
            y = op(x)
            err = np.abs(y - ref).max() / scale
            met = measure_spmv(f"{mname}/{cname}", op, x, m.nnz,
                               wp.stream_bytes, preproc_s=pre, fill=wp.fill)
            print(("OK  " if err < 1e-4 else f"BAD({err:.0e}) ") + met.row(),
                  flush=True)
        except Exception as e:
            print(f"FAIL {mname}/{cname}: {type(e).__name__} {str(e)[:140]}",
                  flush=True)
