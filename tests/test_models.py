"""Perf-model and DSE tests (the performance_model/ + design_space_exp
tower, performance_model.cpp:430-444, design_space_exp.cpp:496-547)."""
import numpy as np

from hisparse_tpu import SpmvConfig, uniform_sparse_csr, powerlaw_csr, pack
from hisparse_tpu.models.perf_model import estimate, slot_rate
from hisparse_tpu.models.dse import explore, best_config, sample_rows


def test_estimate_sane():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = uniform_sparse_csr(2000, 3000, 16, seed=1)
    wp = pack(m, cfg)
    est = estimate(m, cfg, wp)
    assert est.gops > 0 and est.time_s > 0
    assert 0 < est.beta <= 1 and 0 < est.alpha <= 1
    assert est.bound in ("hbm-stream", "compute", "x-reload")


def test_slot_rate_interpolation():
    assert slot_rate(1) > slot_rate(2) > slot_rate(4)
    assert slot_rate(3) == (slot_rate(2) + slot_rate(4)) / 2


def test_calibrated_slot_rates_load(tmp_path, monkeypatch):
    """A slot_rates.json written by scripts/calibrate_slot_rates.py takes
    precedence over the baked-in fallback tables."""
    import json
    from hisparse_tpu.models import perf_model
    path = tmp_path / "slot_rates.json"
    path.write_text(json.dumps({
        "device": "test", "select_chain": {"1": 100.0, "4": 80.0},
        "block_major": {"2": 90.0}, "tc_mult_chain": 0.9,
        "tc_mult_bm": 0.99}))
    monkeypatch.setattr(perf_model, "_RATES_PATH", str(path))
    monkeypatch.setattr(perf_model, "_loaded_rates", None)
    try:
        assert perf_model.slot_rate(1) == 100.0
        assert perf_model.slot_rate(4) == 80.0
        assert perf_model.slot_rate(2, block_major=True) == 90.0
        assert perf_model.tc_multiplier(False) == 0.9
        assert perf_model.tc_multiplier(True) == 0.99
    finally:
        perf_model._loaded_rates = None


def test_tc_multiplier_fallback():
    """Without a calibration file the frozen round-2/3 constants apply."""
    from hisparse_tpu.models import perf_model
    prev = perf_model._loaded_rates
    perf_model._loaded_rates = None
    try:
        # _RATES_PATH absent in a clean checkout -> fallbacks; if a real
        # calibration exists the values are whatever it measured (>0)
        assert 0 < perf_model.tc_multiplier(False) <= 1.5
        assert 0 < perf_model.tc_multiplier(True) <= 1.5
    finally:
        perf_model._loaded_rates = prev


def test_sample_rows():
    m = powerlaw_csr(5000, 1000, 5, seed=2)
    s = sample_rows(m, 500)
    assert s.num_rows == 500 and s.num_cols == m.num_cols
    assert s.nnz <= m.nnz


def test_dse_explore(tmp_path):
    m = uniform_sparse_csr(1500, 2000, 10, seed=3)
    grid = [(SpmvConfig(sublanes=128, bank_blocks=1, stripes=r), None)
            for r in (32, 128)]
    pts = explore([("u", m)], grid=grid, csv_path=str(tmp_path / "dse.csv"))
    assert len(pts) == 2
    assert pts[0].gops_geomean >= pts[1].gops_geomean
    assert (tmp_path / "dse.csv").exists()
    cfg, split = best_config(m, grid=grid)
    assert cfg.sublanes == 128
