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


def test_sssp_matches_dijkstra():
    import scipy.sparse as sp
    from hisparse_tpu.models.apps import SSSP, sssp_reference
    from hisparse_tpu import CSRMatrix
    rng = np.random.default_rng(4)
    n = 150
    dense = rng.random((n, n))
    mask = rng.random((n, n)) < 0.05
    np.fill_diagonal(mask, False)
    w = np.where(mask, dense + 0.1, 0.0).astype(np.float32)
    m = CSRMatrix.from_scipy(sp.csr_matrix(w))
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    s = SSSP(m, cfg, interpret=True)
    got = s.run(source=3, iters=25)
    ref = sssp_reference(m, 3)
    both_inf = np.isinf(got) & np.isinf(ref)
    np.testing.assert_allclose(got[~both_inf], ref[~both_inf], rtol=1e-4,
                               atol=1e-5)
    assert (np.isinf(got) == np.isinf(ref)).all()


def test_sssp_early_exit():
    """With no iteration cap, SSSP stops at the relaxation fixpoint in
    O(diameter) iterations (device-side no-change check), not the n-1
    Bellman-Ford worst case."""
    import scipy.sparse as sp
    from hisparse_tpu.models.apps import SSSP, sssp_reference
    from hisparse_tpu import CSRMatrix
    rng = np.random.default_rng(8)
    n = 150
    dense = rng.random((n, n))
    mask = rng.random((n, n)) < 0.05
    np.fill_diagonal(mask, False)
    w = np.where(mask, dense + 0.1, 0.0).astype(np.float32)
    m = CSRMatrix.from_scipy(sp.csr_matrix(w))
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    s = SSSP(m, cfg, interpret=True)
    got = s.run(source=3)                  # default cap = n-1
    assert s.iters_run < 30                # dense ER graph: tiny diameter
    ref = sssp_reference(m, 3)
    both_inf = np.isinf(got) & np.isinf(ref)
    np.testing.assert_allclose(got[~both_inf], ref[~both_inf], rtol=1e-4,
                               atol=1e-5)
    assert (np.isinf(got) == np.isinf(ref)).all()


def test_bfs_levels():
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph
    from hisparse_tpu.models.apps import BFS
    from hisparse_tpu import CSRMatrix
    rng = np.random.default_rng(5)
    n = 120
    mask = (rng.random((n, n)) < 0.04)
    np.fill_diagonal(mask, False)
    m = CSRMatrix.from_scipy(sp.csr_matrix(mask.astype(np.float32)))
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    b = BFS(m, cfg, interpret=True)
    got = b.run(source=0, max_iters=30)
    ref = csgraph.shortest_path(m.to_scipy(), method="D", unweighted=True,
                                indices=0)
    ref_lvl = np.where(np.isinf(ref), -1, ref).astype(np.int64)
    np.testing.assert_array_equal(got, ref_lvl)


def test_pagerank_hub_graph_split_combine():
    """Hub rows split by the packer and recombined on device (selection-
    matrix SpMV) must still match the reference."""
    from hisparse_tpu import powerlaw_csr
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    m = powerlaw_csr(500, 500, 8, alpha=1.1, seed=6)
    assert m.row_nnz().max() > 100   # genuinely hubby
    pr = PageRank(m, cfg, interpret=True)
    got = pr.run(iters=10)
    ref = pagerank_reference(m, iters=10)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-8)


def test_pagerank_megahub_multilevel_combine():
    """A 2000-degree hub forces a 2-level combine tree."""
    import scipy.sparse as sp
    from hisparse_tpu import CSRMatrix
    base = sp.random(3000, 3000, density=0.002, random_state=3, format="lil")
    base[5, :2000] = 1.0
    m = CSRMatrix.from_scipy(sp.csr_matrix(base))
    cfg = SpmvConfig(sublanes=128, bank_blocks=1, stripes=128)
    pr = PageRank(m, cfg, interpret=True)
    assert len(pr.combine) == 2
    got = pr.run(iters=8)
    ref = pagerank_reference(m, iters=8)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-8)
