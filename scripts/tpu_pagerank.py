"""Flagship app perf: PageRank iterations fully on device."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
from hisparse_tpu import SpmvConfig, powerlaw_csr
from hisparse_tpu.models.apps import PageRank, pagerank_reference
from hisparse_tpu.utils.bench import device_loop_time

m = powerlaw_csr(100000, 100000, 12, alpha=1.3, seed=4)
cfg = SpmvConfig(sublanes=512, bank_blocks=8, stripes=512, two_choice=True,
                 block_major=True, classes_per_group=4)
t0 = time.perf_counter()
pr = PageRank(m, cfg)
print(f"build+pack: {time.perf_counter()-t0:.1f}s fill {pr.wp.fill:.3f}", flush=True)
got = pr.run(iters=15)
ref = pagerank_reference(m, iters=15)
err = np.abs(got - ref).max() / ref.max()
print("PageRank correct:", err < 2e-3, f"(rel {err:.1e})", flush=True)

# time one fused step (spmv + combine + damped update)
fn, args = pr.step_fn()
x0 = jnp.asarray(np.random.default_rng(0).random(pr.n_slots_rank).astype(np.float32) / pr.n)
dt = device_loop_time(fn, x0, *args)
gops = 2 * m.nnz / dt / 1e9
print(f"PageRank step: {dt*1e3:.3f} ms | {gops:.1f} GOPS | "
      f"{1/dt:.0f} iters/s on {m.nnz/1e6:.1f}M-edge graph", flush=True)
