"""Real-chip smoke + perf check for the SpMV kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import numpy as np

from hisparse_tpu import SpmvConfig, uniform_sparse_csr, powerlaw_csr, pack, SpmvOperator
from hisparse_tpu.ops.golden import spmv_f64

cfg = SpmvConfig(sublanes=512, bank_blocks=2, stripes=512)
print("packing...", flush=True)
t0 = time.perf_counter()
m = uniform_sparse_csr(60000, 60000, 16, seed=1)   # ~1M nnz
wp = pack(m, cfg)
print(f"pack: {time.perf_counter()-t0:.1f}s  tiles={wp.num_tiles} fill={wp.fill:.3f}", flush=True)

op = SpmvOperator(wp)
x = jax.device_put(np.random.default_rng(0).random(m.num_cols).astype(np.float32))
t0 = time.perf_counter()
y = op(x)
print(f"first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)
ref = spmv_f64(m, x)
scale = max(abs(ref).max(), 1)
err = np.abs(y - ref).max() / scale
print("CORRECT" if err < 1e-4 else "WRONG", "err", err, flush=True)

# slope timing of the jitted call (renamed=True to avoid host unpermute)
def run(reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        o = op(x, renamed=True)
    np.asarray(jnp.sum(o))
    return time.perf_counter() - t0
run(2); t1 = run(4); t2 = run(24)
dt = (t2 - t1) / 20
nnz = m.nnz
slots = wp.num_tiles * cfg.tile_slots
print(f"kernel: {dt*1e3:.3f} ms | {nnz*8/dt/1e9:.1f} GBPS | {2*nnz/dt/1e9:.1f} GOPS | "
      f"slot rate {slots/dt/1e9:.1f} Gslot/s | stream {wp.stream_bytes/dt/1e9:.1f} GB/s", flush=True)
