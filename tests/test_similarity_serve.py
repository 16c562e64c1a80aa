"""Similarity search + distributed query serving tests."""

import numpy as np
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages import (
    similarity,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd
    return rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def emb_mat():
    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return ids, m


def _numpy_oracle_topk(ids, m, q, k):
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    cos = mn @ qn
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), round(float(cos[i]), 6)) for i in order]


def test_knn_brute_matches_numpy(emb_ds, emb_mat):
    ids, m = emb_mat
    queries = m[:2]
    t = similarity.knn_brute(emb_ds, queries, k=10)
    got = {}
    for qid, rank, vid in zip(t["query_id"].to_pylist(), t["rank"].to_pylist(),
                              t["vec_id"].to_pylist()):
        got.setdefault(qid, []).append((rank, vid))
    for qi in (0, 1):
        want = [v for v, _ in _numpy_oracle_topk(ids, m, queries[qi], 10)]
        assert [v for _, v in sorted(got[qi])] == want


def test_knn_ivf_full_probe_equals_brute(emb_ds, emb_mat):
    ids, m = emb_mat
    queries = m[:2]
    brute = similarity.knn_brute(emb_ds, queries, k=5)
    ivf = similarity.knn_ivf(emb_ds, queries, k=5, nlist=4, nprobe=4)
    assert brute.to_pydict() == ivf.to_pydict()  # nprobe == nlist -> exact


def test_knn_ivf_partial_probe_recall(emb_ds, emb_mat):
    ids, m = emb_mat
    queries = m[:2]
    ivf = similarity.knn_ivf(emb_ds, queries, k=5, nlist=8, nprobe=2)
    # the probed cell containing the query itself is always scanned ->
    # rank-1 hit must be the query vector (cos 1.0)
    first = {q: v for q, r, v in zip(ivf["query_id"].to_pylist(),
                                     ivf["rank"].to_pylist(),
                                     ivf["vec_id"].to_pylist()) if r == 1}
    assert first[0] == int(ids[0]) and first[1] == int(ids[1])


def test_distributed_searcher_matches_local(ray_session, index_dir):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
        query,
        serve,
    )
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
        QUERY_SET,
    )
    local = query.IndexReader(index_dir)
    dist = serve.DistributedSearcher(index_dir, num_actors=2)
    try:
        for q in QUERY_SET:
            want = [(r.doc_id, round(r.score, 6))
                    for r in local.search_wand(q["query_text"], q["k"], q["mode"])]
            got = [(r.doc_id, round(r.score, 6))
                   for r in dist.search(q["query_text"], q["k"], q["mode"],
                                        method="wand")]
            assert got == want, f"distributed != local for q{q['query_id']}"
    finally:
        dist.shutdown()


def test_embed_stage_deterministic(ray_session):
    import pyarrow as pa

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.embed import (
        EMBED_DIM,
        EmbedDocs,
    )
    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["hello world engine", ""], pa.string())})
    e1 = EmbedDocs()(b)
    e2 = EmbedDocs()(b)
    assert e1.equals(e2)
    v = np.asarray(e1["embedding"][0].as_py())
    assert v.size == EMBED_DIM and abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_ivf_index_persist_and_prune(ray_session, emb_ds, emb_mat, tmp_path):
    """build_ivf writes cell-partitioned parquet + manifest; ivf_search
    reuses the index without rebuilding and touches only probed cell dirs."""
    import os
    ids, m = emb_mat
    idx = str(tmp_path / "ivf")
    man = similarity.build_ivf(emb_ds, idx, nlist=8)
    assert os.path.exists(os.path.join(idx, "ivf_manifest.json"))
    cell_dirs = [d for d in os.listdir(os.path.join(idx, "cells"))
                 if d.startswith("cell=")]
    assert 1 < len(cell_dirs) <= 8
    # row conservation across partitions
    import pyarrow.parquet as pq
    total = sum(pq.read_table(os.path.join(idx, "cells", d)).num_rows
                for d in cell_dirs)
    assert total == emb_ds.count()
    # search from the persisted index only (no Dataset arg)
    out = similarity.ivf_search(idx, m[:2], k=5, nprobe=8)
    brute = similarity.knn_brute(emb_ds, m[:2], k=5)
    assert out.to_pydict() == brute.to_pydict()  # full probe == exact
