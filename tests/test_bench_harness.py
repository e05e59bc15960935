"""Harness-level tests: the outage-resilient backend wait (bench.py) and
wavepack persistence backward-compatibility."""
import subprocess
import types

import numpy as np
import pytest


def _fake_run_factory(fail_times, calls):
    def fake_run(cmd, capture_output=None, text=None, timeout=None):
        calls["n"] += 1
        if calls["n"] <= fail_times:
            return types.SimpleNamespace(stdout="", stderr="UNAVAILABLE",
                                         returncode=1)
        return types.SimpleNamespace(stdout="PLATFORM=tpu\n", stderr="",
                                     returncode=0)
    return fake_run


def test_wait_for_backend_retries(monkeypatch):
    """Transient backend failures are retried with backoff; the platform
    string comes back once a probe succeeds (the round-3 outage fix)."""
    import bench
    calls = {"n": 0}
    monkeypatch.setattr(subprocess, "run", _fake_run_factory(2, calls))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_backend(max_wait_s=600) == "tpu"
    assert calls["n"] == 3


def test_wait_for_backend_exhausts_budget(monkeypatch):
    """A full-window outage raises (rc!=0 for the driver) instead of
    hanging forever."""
    import bench
    calls = {"n": 0}
    monkeypatch.setattr(subprocess, "run", _fake_run_factory(10**9, calls))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    with pytest.raises(RuntimeError, match="unavailable"):
        bench.wait_for_backend(max_wait_s=1)
    assert calls["n"] >= 1


def test_bench_datasets_npz_dir(tmp_path):
    """--npz-dir routes a suite entry to a real .npz when present (the
    one-command path for the day the FPGA'22 datasets become reachable),
    falling back to the synthetic stand-in otherwise."""
    import bench
    from hisparse_tpu import uniform_sparse_csr
    from hisparse_tpu.formats.csr import save_npz
    real = uniform_sparse_csr(256, 300, 5, seed=1)
    save_npz(tmp_path / "mouse_gene.npz", real)
    got = list(bench.dataset_suite(
        1.0, only=["mouse_gene", "transformer_95"],
        npz_dir=str(tmp_path)))
    assert [(n, r) for n, _, r in got] == [("mouse_gene", True),
                                           ("transformer_95", False)]
    m = got[0][1]
    assert (m.num_rows, m.num_cols, m.nnz) == (256, 300, real.nnz)
    np.testing.assert_array_equal(m.indices, real.indices)


def test_load_wavepack_pre_idx16_format(tmp_path):
    """Round-3 wavepack files carry a 7-field cfg vector (no idx16 flag);
    the loader must still read them (idx16 defaults off)."""
    from hisparse_tpu import SpmvConfig, powerlaw_csr, pack
    from hisparse_tpu.formats.wavepack import save_wavepack, load_wavepack
    m = powerlaw_csr(300, 900, 5, seed=50)
    wp = pack(m, SpmvConfig(sublanes=128, bank_blocks=1, stripes=64,
                            two_choice=False), split_max=16)
    p = tmp_path / "wp.npz"
    save_wavepack(p, wp)
    # rewrite the cfg vector to the 7-field round-3 layout
    with np.load(p, allow_pickle=False) as f:
        d = {k: f[k] for k in f.files}
    d["cfg"] = d["cfg"][:7]
    np.savez_compressed(p, **d)
    wp2 = load_wavepack(p)
    assert wp2.config == wp.config          # idx16 defaulted False
    assert np.array_equal(wp2.idxT, wp.idxT)
