#!/usr/bin/env python
"""Round benchmark — prints ONE JSON line for the driver.

Mirrors the reference's benchmark flow (sw/benchmark.cpp + sw/bm.sh): pack a
suite of matrices, run the repeated device SpMV loop, report GOPS
(= 2*nnz/t, benchmark.cpp:314) with preprocessing timed separately
(benchmark.cpp:109-197).  Each matrix is auto-tuned over a small design grid
with the analytical model (the reference's DSE, design_space_exp.cpp) before
measuring; entries where the format dispatcher picks a dense/MXU format
additionally report that path and keep the better one, since format choice
is part of this framework.

Suite: the FULL published-size 12-entry FPGA'22 suite (sw/bm.sh:4-17,
paper Table 2) as synthetic stand-ins at published shape and density
(zero-egress environment; real .npz datasets are used automatically when
present — see ``dataset_suite``): the 6 graphs (mouse_gene, googleplus,
ogbl_ppa, pokec, hollywood, ogbn_products — up to 124M nnz, exercising
the paged kernel) and the 6 pruned-NN transformer layers.  Per-entry
results checkpoint to BENCH_DATASETS.json; the stdout JSON line's value
is the suite geomean — the same metric, suite, and sizes as the paper's
Table 3 geomean (the round-4 artifact split the 6-entry driver subset
from the published-size sweep; VERDICT r4 asked for one story).

Stderr-only tracking rows (not in the geomean): fixed-point Q8.24 on a
saturation-free uniform-60k fixture (paper Table 7's fixed-vs-float
comparison), the BCSR/SpMM dense-block MXU path, and timed PageRank /
SSSP / BFS application rows (the GraphLily app tier,
unit_tests/test_app.cpp:51-63).

vs_baseline compares against the reference's overall geomean of 16.7 GOPS
on the U280 (BASELINE.md, paper Table 3).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

BASELINE_GOPS = 16.7

# reference per-dataset GOPS, paper Table 3 / BASELINE.md
REF_GOPS = {
    "mouse_gene": 27.2, "googleplus": 21.2, "ogbl_ppa": 24.4,
    "hollywood": 24.9, "pokec": 11.2, "ogbn_products": 20.6,
    "transformer_50": 21.9, "transformer_60": 18.9, "transformer_70": 16.5,
    "transformer_80": 14.8, "transformer_90": 9.7, "transformer_95": 5.7,
}


def tune_grid(num_rows=None, avg_nnz=None):
    """Design points for the auto-tuner, pruned by regime: stripes scale
    with the row count so small matrices don't drown in empty block slots,
    and points whose per-row slot quota can't fill (S/R >> row nnz) are
    dropped."""
    from hisparse_tpu import SpmvConfig
    if num_rows is None:
        r_big = [512]
    else:
        want = max(1, -(-num_rows // 128))
        r_big = sorted({min(512, 1 << max(7, (want - 1).bit_length())),
                        512})
    # R=128 gives hub-heavy graphs 4 slots/row/tile (measured +30% fill on
    # the gplus stand-in) and lets the tuner see block-major points on
    # small row samples of dense-row graphs
    r_big = sorted(set(r_big) | {128})
    # sampled tuner packs use a half-mean split: measured at-or-near the
    # best fill on every hub-heavy stand-in and several times faster to
    # pack than the rounded-mean auto value
    s_tune = ("auto" if avg_nnz is None else
              max(8, (1 << int(round(np.log2(max(avg_nnz, 1.0))))) // 2))
    pts = []
    for R in r_big:
        # (B, K, two_choice) winners from the round-2 on-chip sweep
        # (scripts/tpu_sweep.py): K=2 for slot rate, tc0 halves the x
        # tile at equal fill under degree ordering, K=4/8 for
        # spread-column graphs where the per-group class choice starves
        # (8, 1, *) joined in round 3: tiles-per-step batching lifted
        # K=1 to 71.2 Gslot/s, putting it on the frontier for high-fill
        # regimes
        for B, K, tc in ((4, 2, True), (8, 2, False), (8, 4, False),
                         (16, 4, True), (8, 1, True)):
            pts.append((SpmvConfig(sublanes=512, bank_blocks=B, stripes=R,
                                   two_choice=tc, block_major=True,
                                   classes_per_group=K,
                                   steal_mantissa=True), s_tune))
        pts.append((SpmvConfig(sublanes=512, bank_blocks=2, stripes=R,
                               two_choice=True, steal_mantissa=True),
                    s_tune))
        pts.append((SpmvConfig(sublanes=512, bank_blocks=8, stripes=R,
                               two_choice=False), s_tune))
    # small/dense-rows regimes ("auto" split is a no-op for uniform rows
    # but keeps hub-heavy samples from packing unbounded hub rows)
    for R in (4, 16, 32):
        pts.append((SpmvConfig(sublanes=512, bank_blocks=2, stripes=R,
                               two_choice=True), "auto"))
    if avg_nnz is not None:
        pts = [(c, s) for (c, s) in pts
               if c.sublanes // c.stripes <= 8 * max(avg_nnz, 1)]
    return pts


TUNE_CACHE_PATH = "/root/repo/bench_tuned.json"


def wait_for_backend(max_wait_s=2400):
    """Bounded retry for the axon tunnel before any in-process backend init.

    The tunnel has gone UNAVAILABLE for multi-hour stretches and a bare
    in-process ``jax.devices()`` can block ~25 min and then raise, burning
    the whole round's perf artifact (round 3).  Probe in a subprocess (so a
    hung init is killable), with exponential backoff up to ``max_wait_s``;
    return the platform string once a device answers.  Raises only after
    the full budget — i.e. only a genuine full-window outage yields rc!=0.
    Mirrors scratch/wait_tpu.sh; reference analog: the host's hard exit on
    a missing device (sw/host.cpp:566-569) made capture-proof.
    """
    import subprocess
    probe = ("import jax, jax.numpy as jnp\n"
             "d = jax.devices()\n"
             "jnp.ones(8).sum().block_until_ready()\n"
             "print('PLATFORM=' + d[0].platform)\n")
    deadline = time.monotonic() + max_wait_s
    attempt, sleep_s = 0, 15
    while True:
        attempt += 1
        budget = max(60, min(300, deadline - time.monotonic()))
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, text=True,
                               timeout=budget)
            for ln in r.stdout.splitlines():
                if ln.startswith("PLATFORM="):
                    plat = ln.split("=", 1)[1]
                    if attempt > 1:
                        print(f"backend up after {attempt} probes",
                              file=sys.stderr, flush=True)
                    return plat
            msg = (r.stderr or r.stdout).strip().splitlines()
            msg = msg[-1] if msg else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            msg = f"probe timed out after {budget:.0f}s"
        left = deadline - time.monotonic()
        print(f"backend probe {attempt} failed ({msg}); "
              f"{left:.0f}s left in retry budget", file=sys.stderr,
              flush=True)
        if left <= sleep_s:
            raise RuntimeError(
                f"TPU backend unavailable after {attempt} probes over "
                f"{max_wait_s}s — tunnel outage spanned the whole retry "
                "budget")
        time.sleep(sleep_s)
        sleep_s = min(120, sleep_s * 2)


def _tune_cache_load():
    try:
        with open(TUNE_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _rates_fingerprint():
    """Identity of the calibration tables the tuner ranked with.  A cached
    design point chosen under a different slot-rate calibration re-tunes
    (the model's cost function changed under it) — the analog of
    re-running the reference's DSE after re-characterizing the overlay."""
    import hashlib
    from hisparse_tpu.models import perf_model
    try:
        with open(perf_model._RATES_PATH, "rb") as f:
            return hashlib.sha1(f.read()).hexdigest()[:12]
    except OSError:
        return "fallback"


def _tune_cache_store(key, cfg, split, co, ro=None, bm_win=None,
                      bm_adv=None, tune_s=None):
    d = _tune_cache_load()
    import dataclasses as _dc
    d[key] = {"cfg": _dc.asdict(cfg), "split": split,
              "col_order": co if isinstance(co, (str, type(None))) else None,
              "row_order": ro, "bm_win": bm_win, "bm_adv": bm_adv,
              "rates": _rates_fingerprint(),
              # the one-time tuning wall clock, recorded so the baked
              # design point's cost exists in an artifact (the analog of
              # the reference's DSE + bitstream build time)
              "tune_s": None if tune_s is None else round(tune_s, 1)}
    with open(TUNE_CACHE_PATH, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)


def bench_entry(name, m, on_tpu, col_order="degree", dtype="fp32",
                retune=False):
    """Tune, pack, verify and measure one matrix.  Returns (metrics, ok,
    config, wavepack).

    Tuned design points persist in bench_tuned.json keyed by the matrix
    identity — the analog of the reference baking its DSE-chosen bank
    sizes into the bitstream (design_space_exp.cpp): tuning is a one-time
    per-matrix cost; packing, upload, verification and measurement always
    run live.  Pass retune=True (or delete the file) to re-tune."""
    import jax
    from hisparse_tpu import pack, SpmvConfig, SpmvOperator
    from hisparse_tpu.models.dse import best_config
    from hisparse_tpu.ops.golden import (spmv_f64, float_to_fixed,
                                         spmv_fixed_vec)
    from hisparse_tpu.utils.bench import measure_spmv

    t0 = time.perf_counter()
    density = m.nnz / max(m.num_rows * m.num_cols, 1)
    avg = m.nnz / max(m.num_rows, 1)
    wp = None
    ckey = f"{name}:{m.num_rows}x{m.num_cols}:{m.nnz}:{dtype}"
    cached = None if retune else _tune_cache_load().get(ckey)
    if cached is not None and cached.get("rates") != _rates_fingerprint():
        cached = None                 # stale calibration -> re-tune
    ro = None
    bw = ba = None
    if cached is not None:
        cfg = SpmvConfig(**cached["cfg"])
        split, co = cached["split"], cached["col_order"]
        ro = cached.get("row_order")
        bw, ba = cached.get("bm_win"), cached.get("bm_adv")
    elif density >= 0.05:
        # dense-rows regime (the pruned-NN layers): rows are uniform and
        # packs are tiny, so tune with a handful of REAL packs ranked by
        # the calibrated model.  Low operand counts run far faster (the
        # calibrated curve: 1 op 74.9 Gslot/s vs the tc pair's 4-op 37.6)
        # and dense uniform rows keep fill high even without two-choice
        # banking — the round-4 hardcoded (B=2, tc) point left ~2x on the
        # table whenever B=1 fill held
        from hisparse_tpu import pack as _pack
        from hisparse_tpu.models.perf_model import estimate as _est
        co = None
        best = None
        for cfg_c in (
                # steal_mantissa rides the crossbar src in the value bits
                # (the calibration fixture's configuration — rate tables
                # are steal-pack measurements) and unlocks the MXU
                # transpose + the idx16 A/B downstream
                SpmvConfig(sublanes=512, bank_blocks=1, stripes=4,
                           two_choice=False, steal_mantissa=True),
                SpmvConfig(sublanes=512, bank_blocks=2, stripes=4,
                           two_choice=False, steal_mantissa=True),
                SpmvConfig(sublanes=512, bank_blocks=2, stripes=4,
                           two_choice=True, steal_mantissa=True),
                SpmvConfig(sublanes=512, bank_blocks=1, stripes=4,
                           two_choice=True, steal_mantissa=True),
                # the round-4 baked point, as the no-regression fallback
                SpmvConfig(sublanes=512, bank_blocks=2, stripes=4,
                           two_choice=True)):
            try:
                wp_c = _pack(m, cfg_c, split_max=None)
            except ValueError:
                continue
            g = _est(m, cfg_c, wp_c).gops
            if best is None or g > best[0]:
                best = (g, cfg_c)
            wp_c = None
        cfg, split = best[1], None
    elif m.num_rows > 400_000:
        # huge graphs: a row sample holds ~1 row block and cannot see the
        # (block, partition) segment quantization of the full matrix, so
        # the sampled tuner is structurally blind.  Use full-pack
        # candidates from the measured frontier (scripts/tpu_sweep.py):
        # large VB + large row blocks minimize segment count.
        co = col_order
        from hisparse_tpu.models.perf_model import estimate
        base = max(8, 1 << int(round(np.log2(max(avg, 1.0)))))
        # large B collapses the column partitioning (B_fit = one partition
        # for the whole x; XT is a reshape of x, VMEM-small), and the
        # locality row order clusters each wave's rows onto the same few
        # x-blocks — together they lift spread-column-graph fill 0.12 ->
        # 0.27 at full slot rate (measured on-chip, round 3)
        # B cap 100 = the largest XT page measured good on the chip
        # (pokec, 26 MB resident in the paged kernel); beyond that is
        # untested VMEM territory and a compile failure would zero the
        # entry (ogbn-products-scale inputs hit this cap)
        B_fit = min(100, max(8, -(-m.num_cols // 16384)))
        cands = [
            (SpmvConfig(sublanes=512, bank_blocks=B_fit, stripes=512,
                        two_choice=False, block_major=True,
                        classes_per_group=4, steal_mantissa=True),
             2 * base, "locality"),
            (SpmvConfig(sublanes=512, bank_blocks=B_fit, stripes=512,
                        two_choice=False, block_major=True,
                        classes_per_group=4, steal_mantissa=True),
             base, "locality"),
            (SpmvConfig(sublanes=512, bank_blocks=B_fit, stripes=512,
                        two_choice=False, block_major=True,
                        classes_per_group=4, steal_mantissa=True),
             base, None),
            (SpmvConfig(sublanes=512, bank_blocks=8, stripes=512,
                        two_choice=False, block_major=True,
                        classes_per_group=4, steal_mantissa=True),
             base, None),
            # K=2 runs ~1.5x the K=4 slot rate (53.9 vs 36 Gslot/s with
            # tile batching); wins whenever its fill holds >= ~2/3 of K=4
            (SpmvConfig(sublanes=512, bank_blocks=B_fit, stripes=512,
                        two_choice=False, block_major=True,
                        classes_per_group=2, steal_mantissa=True),
             2 * base, "locality"),
        ]
        best = None
        wp_c = None
        for cfg_c, sm, ro_c in dict.fromkeys(cands):
            wp_c = None       # free before repacking (heap reuse — see
            #                   the window-ladder comment below)
            wp_c = pack(m, cfg_c, split_max=sm, col_order=co,
                        row_order=ro_c)
            g = estimate(m, cfg_c, wp_c).gops
            if best is None or g > best[0]:
                best = (g, cfg_c, sm, ro_c)
        wp_c = None
        _, cfg, split, ro = best
    else:
        co = col_order    # hub columns into the first classes
        from hisparse_tpu.models.dse import explore
        from hisparse_tpu.models.perf_model import estimate
        pts = explore([(name, m)], grid=tune_grid(m.num_rows, avg),
                      sample_max_rows=16384, col_order=co)
        # row-sampled packs overestimate fill (fewer distinct columns per
        # bank), so verify the finalists with full packs and keep the
        # model-best on REAL stats; the winning pack is reused directly.
        # The hub-split bound is the strongest fill knob (pokec 0.20->0.22,
        # gplus 0.40->0.52 measured), so the top candidate is also tried
        # at 2x and 1/2x its auto split.
        big = m.nnz > 4_000_000
        base_split = max(8, 1 << int(round(np.log2(max(avg, 1.0)))))
        # tighter splits measured best on every hub-heavy stand-in
        # (gplus base//2, pokec base) and also pack several times faster
        splits = ((base_split, max(8, base_split // 2),
                   max(8, base_split // 4)) if big else
                  (base_split, 2 * base_split, max(8, base_split // 2)))
        # finalists, two stages of full packs — the row sample
        # systematically misranks large-R points (stripes starve below
        # ~R*128 rows) and the best split is family-dependent, so neither
        # axis can be trusted from sampled stats.  Stage 1: the top config
        # families and their R variants at the base split.  Stage 2: the
        # split ladder on the stage-1 winner.
        def fam(c):
            return (c.block_major,
                    c.classes_per_group if c.block_major else 0,
                    c.two_choice)
        # very large matrices afford fewer full packs: fewer families and
        # one R variant each (each pack is tens of seconds at 30M nnz)
        huge = m.nnz > 20_000_000
        n_fams = 2 if big else 3
        r_variants = 1 if huge else 2
        fams = []
        for p in pts:
            if fam(p.cfg) not in fams:
                fams.append(fam(p.cfg))
            if len(fams) == n_fams:
                break
        cands, seen_cfg = [], set()
        per_fam = {}
        for p in pts:
            f = fam(p.cfg)
            if (f in fams and p.cfg not in seen_cfg
                    and per_fam.get(f, 0) < r_variants):
                seen_cfg.add(p.cfg)
                per_fam[f] = per_fam.get(f, 0) + 1
                cands.append((p.cfg, splits[0]))
        stage1 = []
        wp_c = None
        for cfg_c, sm in cands:
            wp_c = None       # free before repacking (heap reuse)
            wp_c = pack(m, cfg_c, split_max=sm, col_order=co)
            g = estimate(m, cfg_c, wp_c).gops
            stage1.append((g, cfg_c, sm))
        stage1.sort(key=lambda e: -e[0])
        best = stage1[0]
        # stage 2: split ladder on the best config of each of the top two
        # families — the optimal split is family-dependent (K=4 wants a
        # looser bound than K=2), so laddering only the stage-1 winner can
        # lock in the wrong family
        ladder, seen_f = [], set()
        for g, cfg_c, sm in stage1:
            if fam(cfg_c) not in seen_f:
                seen_f.add(fam(cfg_c))
                ladder.append(cfg_c)
            if len(ladder) == 2:
                break
        for cfg_c in ladder:
            for sm in splits[1:]:
                wp_c = None   # free before repacking (heap reuse)
                wp_c = pack(m, cfg_c, split_max=sm, col_order=co)
                g = estimate(m, cfg_c, wp_c).gops
                if g > best[0]:
                    best = (g, cfg_c, sm)
        wp_c = None
        _, cfg, split = best
    if cfg.block_major and (cached is None or bw is None):
        # scheduler-window ladder on the chosen design point: the rolling
        # window trades pack speed for fill, and the best point is
        # matrix-dependent (spread-column graphs want the adaptive (1,1);
        # dense-fill regimes want a deep window) — full packs, judged by
        # modeled GOPS; near-ties (<0.5%) keep the earliest candidate
        from hisparse_tpu.models.perf_model import estimate as _est
        wbest = None
        wp = wp_c = None      # free any tuner pack BEFORE packing again:
        # holding two packs alive doubles the heap high-water, and on
        # these hosts memory past the first few GB is provisioned at
        # 10-100 MB/s (utils/hostmem.py) — reuse beats growth by 10-100x
        for bw_c, ba_c in ((1, 1), (16, 4), (64, 2)):
            tw = time.perf_counter()
            wp_c = None
            wp_c = pack(m, cfg, split_max=split, col_order=co, row_order=ro,
                        bm_win=bw_c, bm_adv=ba_c)
            g = _est(m, cfg, wp_c).gops
            dtw = time.perf_counter() - tw
            if wbest is None or g > wbest[0] * 1.005:
                wbest = (g, bw_c, ba_c, dtw)
        _, bw, ba, _ = wbest
        wp_c = None
    if dtype == "fixed":
        import dataclasses as _dc
        cfg = _dc.replace(cfg, dtype="fixed", steal_mantissa=False)
        # scale so no row sum can saturate: bit-exactness is then checkable
        # order-independently (spmv_fixed_vec)
        m = _dc.replace(m, data=float_to_fixed(np.abs(m.data) / (4 * avg)))
        wp = None
    tune_s = time.perf_counter() - t0
    # reference-analog preprocessing cost = one pack at the chosen design
    # point (the reference re-runs csr2cpsr per benchmark with the design
    # baked into the bitstream; auto-tuning has no analog there and is a
    # one-time per-matrix cost, reported separately in the tag)
    t1 = time.perf_counter()
    wp = None                 # free the tuner's pack first (heap reuse)
    wp = pack(m, cfg, split_max=split, col_order=co, row_order=ro,
              bm_win=bw, bm_adv=ba)
    pre = time.perf_counter() - t1
    op = SpmvOperator(wp, interpret=not on_tpu)
    x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
    if dtype == "fixed":
        x = float_to_fixed(x)
        y = op(jax.device_put(x))
        ref = spmv_fixed_vec(m, x, data_raw=m.data)
        ok = bool(np.array_equal(y, ref))
        err = 0.0 if ok else 1.0
    else:
        x = jax.device_put(x)
        y = op(x)
        ref = spmv_f64(m, np.asarray(x))
        err = np.abs(y - ref).max() / max(np.abs(ref).max(), 1)
        ok = err < 1e-4
    # persist the tuned point only once the config verified good, so a BAD
    # design point is never silently reused from the cache
    if ok and (cached is None or (cfg.block_major
                                   and cached.get("bm_win") is None)):
        _tune_cache_store(ckey, cfg, split, co, ro, bw, ba, tune_s)
    met = measure_spmv(name, op, x, m.nnz, wp.stream_bytes,
                       preproc_s=pre, fill=wp.fill)
    if ok and cfg.steal_mantissa and not cfg.idx16 and dtype != "fixed":
        # idx16 A/B: steal packs carry only b|h = 11 bits per idx word, so
        # the SAME schedule re-emits as int16 by a plain downcast
        # (6 B/slot).  Measured head-to-head (not modeled) and the better
        # variant goes into the artifact + cache.
        import dataclasses as _dc
        cfg16 = _dc.replace(cfg, idx16=True)
        wp16 = _dc.replace(wp, config=cfg16,
                           idxT=wp.idxT.astype(np.int16))
        try:
            op16 = SpmvOperator(wp16, interpret=not on_tpu)
            y16 = op16(x)
            err16 = np.abs(y16 - ref).max() / max(np.abs(ref).max(), 1)
            if err16 < 1e-4:
                met16 = measure_spmv(name, op16, x, m.nnz,
                                     wp16.stream_bytes, preproc_s=pre,
                                     fill=wp16.fill)
                print(f"    idx16 A/B: {met16.spmv_ms:.4f} ms "
                      f"({met16.gops:6.1f} GOPS, stream "
                      f"{met16.stream_gbps:6.1f} GB/s) vs idx32 "
                      f"{met.spmv_ms:.4f} ms ({met.gops:6.1f} GOPS)",
                      file=sys.stderr, flush=True)
                if met16.gops > met.gops:
                    met, cfg, wp, op = met16, cfg16, wp16, op16
                    _tune_cache_store(ckey, cfg, split, co, ro, bw, ba,
                                      tune_s)
        except Exception as e:                            # noqa: BLE001
            print(f"    idx16 A/B failed: {e!r}", file=sys.stderr,
                  flush=True)
    tag = (f"cfg S={cfg.sublanes} B={cfg.bank_blocks} R={cfg.stripes} "
           f"tc={int(cfg.two_choice)}"
           + (f" bm/K={cfg.classes_per_group}" if cfg.block_major else "")
           + (" i16" if cfg.idx16 else "")
           + (" fixed" if dtype == "fixed" else "")
           + (f" | tune {tune_s:5.1f} s" if cached is None else
              f" | tune cached ({cached.get('tune_s', '?')} s one-time)"))
    print(("OK  " if ok else "BAD ") + met.row() + " | " + tag,
          file=sys.stderr, flush=True)
    return met, ok, cfg, wp


def dataset_suite(scale: float = 1.0, only=None, npz_dir=None):
    """Yields (name, matrix, is_real_npz) lazily — one giant matrix in
    memory at a time (1-vCPU host discipline).  Published shapes/densities
    per paper Table 2; graph character per family: power-law skew for the
    social graphs, R-MAT (skew + edge locality) for pokec/hollywood/
    products, near-uniform rows for ogbl-ppa.

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


def _dense_ab(m, best_gops):
    """MXU dense-path A/B for entries the format dispatcher calls dense
    (the pruned-NN layers).  Format choice is part of this framework, so
    the better path's GOPS goes into the artifact — gated on the same
    1e-4 correctness bar every sparse entry passes (sw/host.cpp:62)."""
    import jax.numpy as jnp
    from hisparse_tpu.ops.dense import DenseOperator, choose_format
    from hisparse_tpu.ops.golden import spmv_f64
    from hisparse_tpu.utils.bench import device_loop_time
    if choose_format(m) != "dense":
        return best_gops
    x = np.random.default_rng(0).random(m.num_cols).astype(np.float32)
    ref = spmv_f64(m, x)
    dop = DenseOperator(m, dtype="bf16")
    yd = np.asarray(dop(x))
    errd = np.abs(yd - ref).max() / max(np.abs(ref).max(), 1)
    xp = np.pad(x, (0, dop.a.shape[1] - x.shape[0]))
    fn = lambda xx, a: jnp.dot(a, xx,                     # noqa: E731
                               preferred_element_type=jnp.float32)
    dt = device_loop_time(fn, jnp.asarray(xp, dop.a.dtype), dop.a)
    if dop.stream_bytes / dt / 1e9 > 900:       # above HBM: flaky read
        dt = device_loop_time(fn, jnp.asarray(xp, dop.a.dtype), dop.a)
    dgops = 2 * m.nnz / dt / 1e9
    print(f"    dense-bf16 path: {dt*1e3:.4f} ms | {dgops:7.1f} GOPS"
          f" | stream {dop.stream_bytes/dt/1e9:6.1f} GB/s | "
          f"err {errd:.1e}", file=sys.stderr, flush=True)
    if errd < 1e-4 and dgops > best_gops:
        return dgops
    return best_gops


def run_dataset_suite(on_tpu, out_path="/root/repo/BENCH_DATASETS.json",
                      scale=1.0, only=None, npz_dir=None):
    """Run the published-size suite, maintaining the BENCH_DATASETS.json
    artifact (checkpointed per entry; prior same-scale same-backend
    entries merge in, so an interrupted pass resumes).  Returns the
    artifact dict."""
    from hisparse_tpu.ops.spmv import resident_bytes, _RESIDENT_VMEM_BUDGET
    from hisparse_tpu.utils.bench import geomean

    rec = {"scale": scale, "on_tpu": on_tpu, "entries": {}}
    try:
        with open(out_path) as f:
            prev = json.load(f)
        # merge only same-scale AND same-backend prior entries: numbers
        # from a CPU fallback pass must not blend into a TPU geomean
        if (prev.get("scale") == scale and prev.get("on_tpu") == on_tpu):
            rec["entries"].update(prev.get("entries", {}))
    except (OSError, ValueError):
        pass
    for name, m, real in dataset_suite(scale, only, npz_dir=npz_dir):
        t0 = time.perf_counter()
        # one retry per entry: a transient tunnel blip mid-suite should
        # cost one entry attempt, not the whole round's artifact
        met = None
        err = None
        for attempt in range(2):
            try:
                met, ok, cfg, wp = bench_entry(name, m, on_tpu)
                break
            except Exception as e:                        # noqa: BLE001
                err = e
                print(f"entry {name} attempt {attempt} failed: {e!r}",
                      file=sys.stderr, flush=True)
                if attempt == 0:
                    time.sleep(30)
        if met is None:
            rec["entries"][name] = {
                "rows": m.num_rows, "cols": m.num_cols, "nnz": int(m.nnz),
                "ok": False, "gops": 0.0, "ref_gops": REF_GOPS.get(name),
                "error": repr(err), "real_npz": real,
                "wall_s": round(time.perf_counter() - t0, 1)}
            del m
            continue
        if name == "pokec" and scale == 1.0:
            assert resident_bytes(cfg, wp.n_blocks, wp.n_parts) \
                > _RESIDENT_VMEM_BUDGET, "pokec entry must exercise paged"
        best = met.gops if ok else 0.0
        best = _dense_ab(m, best)
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
        with open(out_path, "w") as f:       # checkpoint after each entry
            json.dump(rec, f, indent=1)
    # geomean over EVERY recorded entry (incl. merged-in prior passes);
    # failed entries (gops 0) are dropped by geomean — flag them honestly
    ours = [e["gops"] for e in rec["entries"].values()]
    theirs = [e["ref_gops"] for e in rec["entries"].values()]
    failed = sum(1 for e in rec["entries"].values() if not e["ok"])
    rec["geomean_gops"] = round(geomean(ours), 2)
    rec["ref_geomean_gops"] = round(
        geomean([t for t in theirs if t is not None]), 2)
    if failed:
        rec["failed_entries"] = failed
        rec["geomean_partial"] = True
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"geomean: ours {rec['geomean_gops']:.1f} GOPS | "
          f"U280 {rec['ref_geomean_gops']:.1f} GOPS -> {out_path}",
          file=sys.stderr, flush=True)
    return rec


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from hisparse_tpu import uniform_sparse_csr

    on_tpu = wait_for_backend() != "cpu"
    rec = run_dataset_suite(on_tpu)

    # --- tracking rows (stderr only, not in the geomean) ------------------
    try:
        fixed_m = uniform_sparse_csr(60000, 60000, 16, seed=1)
        bench_entry("fixed-q8.24-uniform-60k", fixed_m, on_tpu,
                    dtype="fixed")
        del fixed_m
    except Exception as e:                                # noqa: BLE001
        print(f"fixed-point row failed: {e!r}", file=sys.stderr, flush=True)
    try:
        bcsr_tracking_row(on_tpu)
    except Exception as e:                                # noqa: BLE001
        print(f"bcsr row failed: {e!r}", file=sys.stderr, flush=True)
    try:
        spmm_tracking_row(on_tpu)
    except Exception as e:                                # noqa: BLE001
        print(f"spmm row failed: {e!r}", file=sys.stderr, flush=True)
    try:
        pagerank_tracking_row(on_tpu)
    except Exception as e:                                # noqa: BLE001
        print(f"pagerank row failed: {e!r}", file=sys.stderr, flush=True)
    try:
        sssp_bfs_tracking_rows(on_tpu)
    except Exception as e:                                # noqa: BLE001
        print(f"sssp/bfs rows failed: {e!r}", file=sys.stderr, flush=True)
    try:
        diffspmv_tracking_row(on_tpu)
    except Exception as e:                                # noqa: BLE001
        print(f"diffspmv row failed: {e!r}", file=sys.stderr, flush=True)

    g = rec["geomean_gops"]
    entries = rec["entries"]
    eff_list = [e.get("roofline_eff", 0.0) for e in entries.values()
                if e.get("ok")]
    out = {
        "metric": "spmv_gops_geomean",
        "value": round(g, 2),
        "unit": "GOPS",
        "vs_baseline": round(g / BASELINE_GOPS, 3),
        "suite": f"published-size-{len(entries)}",
    }
    if any(e > 0 for e in eff_list):
        # fraction of the MEASURED achievable read bandwidth (BASELINE.md's
        # "effective GB/s" bar); the spec-sheet fraction stays in the
        # stderr rows
        from hisparse_tpu.utils.bench import measured_peak_gbps
        out["roofline_eff_max"] = round(max(eff_list), 3)
        try:
            out["hbm_eff_gbps_measured"] = round(measured_peak_gbps(), 1)
        except Exception:                                 # noqa: BLE001
            pass
    failed = rec.get("failed_entries", 0)
    if failed:
        # geomean() drops zeros, so the value covers the surviving
        # entries only — flag that loudly rather than hide it
        out["entries_failed"] = failed
        print(f"WARNING: {failed} entries failed; geomean covers "
              f"{len(entries) - failed} entries only",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


def pagerank_tracking_row(on_tpu):
    """Timed app-level row: full PageRank iterations chained on device in
    renamed space (matrix apply + hub-split combine + damping — everything
    a consumer of the result pays per iteration).  The one-shot SpMV rows
    above report the renamed-layout contract documented in BASELINE.md;
    this row is the end-to-end check that the contract costs nothing for
    iterative apps."""
    import jax
    from hisparse_tpu import powerlaw_csr
    from hisparse_tpu.models.apps import PageRank, pagerank_reference
    from hisparse_tpu.utils.bench import device_loop_time
    m = powerlaw_csr(100000, 100000, 10, alpha=1.3, seed=2)
    pr = PageRank(m, interpret=not on_tpu)
    r = pr.run(iters=20)
    ref = pagerank_reference(m, iters=20)
    err = np.abs(r - ref).max() / max(np.abs(ref).max(), 1e-30)
    fn, args = pr.step_fn()
    import jax.numpy as jnp
    x0 = jnp.zeros(pr.n_slots_rank, jnp.float32).at[:pr.n].set(1.0 / pr.n)
    dt = device_loop_time(fn, x0, *args)
    gops = 2 * m.nnz / dt / 1e9
    print(f"    pagerank-100k: {dt*1e3:.4f} ms/iter | {1/dt:7.1f} iters/s | "
          f"{gops:6.1f} GOPS | err {err:.1e}", file=sys.stderr, flush=True)


def sssp_bfs_tracking_rows(on_tpu):
    """Timed semiring app rows (the GraphLily app tier,
    unit_tests/test_app.cpp:51-63): SSSP Bellman-Ford with the device-side
    convergence early-exit on the pokec-shape stand-in (min_plus), and BFS
    frontier iteration (max_times) on the 100k power-law graph.  Reported:
    iterations to converge, per-iteration device time, effective GOPS."""
    from hisparse_tpu import rmat_csr, powerlaw_csr
    from hisparse_tpu.models.apps import SSSP, BFS
    from hisparse_tpu.utils.bench import device_loop_time
    import jax.numpy as jnp

    m = rmat_csr(1632000, 1632000, 19, seed=6)
    t0 = time.perf_counter()
    ss = SSSP(m, interpret=not on_tpu)
    pre = time.perf_counter() - t0
    d = ss.run(source=0)
    reach = float(np.isfinite(d).mean())
    fn, args = ss.step_fn()
    x0 = jnp.full(ss.n_slots, jnp.inf, jnp.float32).at[ss.inv[0]].set(0.0)
    dt = device_loop_time(lambda x, *a: fn(x, *a)[0], x0, *args)
    gops = 2 * m.nnz / dt / 1e9
    print(f"    sssp-pokec-1.6m: {ss.iters_run} iters to fixpoint | "
          f"{dt*1e3:.4f} ms/iter | {1/dt:6.1f} iters/s | {gops:6.1f} GOPS"
          f" | reach {reach:.2f} | preproc {pre:.1f} s",
          file=sys.stderr, flush=True)
    del m, ss, args

    m = powerlaw_csr(100000, 100000, 10, alpha=1.3, seed=2)
    t0 = time.perf_counter()
    bf = BFS(m, interpret=not on_tpu)
    pre = time.perf_counter() - t0
    lv = bf.run(source=0)
    fn, args = bf.step_fn()
    f0 = jnp.zeros(bf.n_slots, jnp.float32).at[bf.inv[0]].set(1.0)
    dt = device_loop_time(lambda f, r, *a: fn(f, r, *a)[0], f0, f0, *args)
    gops = 2 * m.nnz / dt / 1e9
    print(f"    bfs-100k: depth {lv.max()} | {dt*1e3:.4f} ms/iter | "
          f"{1/dt:6.1f} iters/s | {gops:6.1f} GOPS | "
          f"reached {(lv >= 0).mean():.2f} | preproc {pre:.1f} s",
          file=sys.stderr, flush=True)


def diffspmv_tracking_row(on_tpu):
    """Timed training row — the regime the reference cannot serve at all
    (its overlay streams fixed weights, sw/host.cpp:1-80): stream-layout
    training (StreamDiffSpmv) on the transformer-70 stand-in (512 x
    33288, 30% density, the tuned idx16-steal config).  The full gradient
    step is 4 kernel-rate passes (forward, dL/dx through the A^T pack,
    and one in-layout gradient stream per pack) with NO relayout — the
    CSR-vector DiffSpmv path pays ~30 ms per 5M-slot XLA scatter/gather
    relayout instead (scratch/probe_emit.py: 0.15 Gelem/s)."""
    import jax
    import jax.numpy as jnp
    from hisparse_tpu import uniform_sparse_csr
    from hisparse_tpu.config import SpmvConfig
    from hisparse_tpu.ops.train_stream import StreamDiffSpmv
    from hisparse_tpu.utils.bench import device_loop_time

    m = uniform_sparse_csr(512, 33288, int(33288 * 0.30), seed=70)
    cfg = SpmvConfig(sublanes=512, bank_blocks=1, stripes=4,
                     steal_mantissa=True, idx16=True, two_choice=False)
    # the tall-thin A^T pack needs stripes == sublanes to stay resident
    cfgT = SpmvConfig(sublanes=512, bank_blocks=1, stripes=512,
                      steal_mantissa=True, idx16=True, two_choice=False)
    t0 = time.perf_counter()
    sd = StreamDiffSpmv(m, cfg, cfgT, interpret=not on_tpu,
                        split_max=None)
    pre = time.perf_counter() - t0
    nnz = sd.m.nnz
    f, aux = sd.fn()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(sd.num_cols).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal(sd.num_rows).astype(np.float32))

    dt_f = device_loop_time(lambda xx, vA, vT, a: f(vA, vT, xx, a),
                            x, sd.vA0, sd.vT0, aux)

    def step(vA, xx, vT, a, g):
        y, vjp = jax.vjp(lambda vv, vt, xv: f(vv, vt, xv, a), vA, vT, xx)
        gA, gT, gx = vjp(g)
        return (gA.reshape(-1)[0] + gT.reshape(-1)[0] + gx[0] + y[0])

    dt_s = device_loop_time(step, sd.vA0, x, sd.vT0, aux, ct)
    print(f"    train-transformer70 (stream-layout): fwd {dt_f*1e3:.4f} ms"
          f" ({2*nnz/dt_f/1e9:6.1f} GOPS) | grad step {dt_s*1e3:.4f} ms "
          f"({8*nnz/dt_s/1e9:6.1f} GOPS over 4 kernel passes, "
          f"{dt_s/dt_f:.2f}x fwd) | pack(A)+pack(A^T) {pre:.1f} s",
          file=sys.stderr, flush=True)


def spmm_tracking_row(on_tpu):
    """Timed packed-stream SpMM row: Y = A @ X with F=16 feature columns
    through the wavepack kernel on the transformer-70 stand-in (tuned
    idx16-steal config) — one vals/idxT stream pass feeds all features
    (ops/spmv.py::matmul; the dense-MXU bcsr row below covers the
    block-structured regime)."""
    import jax.numpy as jnp
    from hisparse_tpu import uniform_sparse_csr, pack, SpmvOperator
    from hisparse_tpu.config import SpmvConfig
    from hisparse_tpu.ops.spmv import _spmm_call
    from hisparse_tpu.utils.bench import device_loop_time

    # off-TPU this is a no-crash check only: interpret-mode Pallas costs
    # seconds per call, so shrink the matrix/F and accept a loose slope
    F = 16 if on_tpu else 4
    nc = 33288 if on_tpu else 4096
    m = uniform_sparse_csr(512, nc, int(nc * 0.30), seed=70)
    cfg = SpmvConfig(sublanes=512, bank_blocks=1, stripes=4,
                     steal_mantissa=True, idx16=True, two_choice=False)
    t0 = time.perf_counter()
    wp = pack(m, cfg)
    pre = time.perf_counter() - t0
    op = SpmvOperator(wp, interpret=not on_tpu)
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.standard_normal((m.num_cols, F))
                    .astype(np.float32))
    Y = np.asarray(op.matmul(np.asarray(X)))
    ref = m.to_scipy() @ np.asarray(X)
    err = np.abs(Y - ref).max() / max(np.abs(ref).max(), 1)

    def fn(XX, vals, idxT, part, block, first):
        return _spmm_call(vals, idxT, part, block, first, XX, None,
                          cfg=cfg, n_blocks=wp.n_blocks,
                          n_parts=wp.n_parts, interpret=op.interpret,
                          variant=op.variant, tiles_per_step=op.tb)

    dt = device_loop_time(fn, X, op.vals, op.idxT, op.part, op.block,
                          op.first,
                          target_spread_s=2.0 if on_tpu else 0.1)
    gops = 2 * m.nnz * F / dt / 1e9
    print(f"    spmm-transformer70 (F={F}): {dt*1e3:.4f} ms | "
          f"{gops:7.1f} GOPS | stream {wp.stream_bytes/dt/1e9:6.1f} GB/s"
          f" (one pass for all {F} cols) | err {err:.1e} | "
          f"pack {pre:.1f} s", file=sys.stderr, flush=True)


def bcsr_tracking_row(on_tpu):
    """Block-structured SpMM on the MXU (the BASELINE.json batch config)."""
    import jax.numpy as jnp
    from hisparse_tpu.formats.csr import block_structured_csr
    from hisparse_tpu.ops.bcsr import BcsrOperator, _bcsr_call
    from hisparse_tpu.ops.dense import choose_format
    from hisparse_tpu.utils.bench import device_loop_time
    m = block_structured_csr(16384, 16384, block_rows=24, seed=7)
    fmt = choose_format(m)
    op = BcsrOperator(m, dtype=jnp.bfloat16, interpret=not on_tpu)
    X = np.random.default_rng(1).random((m.num_cols, 64)).astype(np.float32)
    Y = np.asarray(op(jnp.asarray(X)))
    ref = m.to_scipy() @ X
    err = np.abs(Y - ref).max() / max(np.abs(ref).max(), 1)

    def fn(xx, blocks, brow, bcol):
        return _bcsr_call(blocks, brow, bcol, xx, nbr=op.nbr, nbc=op.nbc,
                          nk=64, interpret=op.interpret).reshape(-1)
    Xp = jnp.asarray(np.pad(X, ((0, op.nbc * 128 - m.num_cols), (0, 0))),
                     jnp.bfloat16)
    dt = device_loop_time(fn, Xp, op.blocks, op.brow, op.bcol)
    gops = 2 * m.nnz * 64 / dt / 1e9
    print(f"    bcsr-spmm-16k (64 rhs): {dt*1e3:.4f} ms | {gops:7.1f} GOPS "
          f"| stream {op.stream_bytes/dt/1e9:6.1f} GB/s | err {err:.1e} | "
          f"choose_format={fmt}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
