import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from hisparse_tpu import SpmvConfig, uniform_sparse_csr, pack, SpmvOperator
from hisparse_tpu.ops.golden import spmv_f64
from hisparse_tpu.utils.bench import measure_spmv

cfg = SpmvConfig(sublanes=512, bank_blocks=2, stripes=512)
t0 = time.perf_counter()
m = uniform_sparse_csr(60000, 60000, 16, seed=1)
wp = pack(m, cfg)
pre = time.perf_counter() - t0
print(f"pack: {pre:.1f}s tiles={wp.num_tiles} fill={wp.fill:.3f}", flush=True)

x = jax.device_put(np.random.default_rng(0).random(m.num_cols).astype(np.float32))
ref = spmv_f64(m, np.asarray(x)); scale = max(abs(ref).max(), 1)

for variant in ["resident", "paged"]:
    op = SpmvOperator(wp, variant=variant)
    y = op(x)
    err = np.abs(y - ref).max() / scale
    met = measure_spmv(f"uniform60k-16/{variant}", op, x, m.nnz, wp.stream_bytes,
                       preproc_s=pre, fill=wp.fill)
    print(("OK  " if err < 1e-4 else "BAD ") + met.row(), flush=True)
