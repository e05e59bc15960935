"""App-level tests (the BFS/PageRank/SSSP app tier the reference's lineage
documents in unit_tests/test_app.cpp)."""
import numpy as np

from hisparse_tpu import SpmvConfig, powerlaw_csr
from hisparse_tpu.models.apps import PageRank, pagerank_reference


def test_pagerank_matches_reference():
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = powerlaw_csr(400, 400, 6, seed=3)
    pr = PageRank(m, cfg, interpret=True)
    got = pr.run(iters=8)
    ref = pagerank_reference(m, iters=8)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-7)
    assert abs(got.sum() - ref.sum()) < 1e-3
