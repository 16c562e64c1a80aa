"""Degenerate inputs (empty / single-row / all-identical) for the round-2
operators: dedup family, window rank, struct projection, IVF."""

import numpy as np
import pyarrow as pa
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages import (
    dedup,
    similarity,
)


def _docs(rows):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    return rd.from_arrow(t)


def test_exact_dedup_empty(ray_session):
    out = dedup.exact_dedup(_docs([])).to_pandas()
    assert len(out) == 0
    assert "content_hash" not in out.columns


def test_exact_dedup_single_row(ray_session):
    out = dedup.exact_dedup(_docs([(7, "only doc")])).to_pandas()
    assert out["doc_id"].tolist() == [7]


def test_exact_dedup_all_identical(ray_session):
    out = dedup.exact_dedup(
        _docs([(i, "same text here") for i in range(50)])).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_ngram_pairs_empty_and_single(ray_session):
    assert dedup.ngram_jaccard_pairs(_docs([]), threshold=0.5).num_rows == 0
    assert dedup.ngram_jaccard_pairs(
        _docs([(1, "one single document body")]), threshold=0.5).num_rows == 0


def test_simhash_pairs_empty(ray_session):
    t = dedup.simhash_dedup_pairs(_docs([]))
    assert t.num_rows == 0
    assert t.column_names == ["a", "b", "hamming"]


def test_minhash_groups_empty(ray_session):
    t = dedup.minhash_dedup_groups(_docs([]))
    assert t.num_rows == 0


def test_embedding_dedup_empty_and_single(ray_session):
    import ray.data as rd
    def vecs(n):
        return rd.from_items([
            {"vec_id": i, "embedding": [float(i + j) for j in range(8)]}
            for i in range(n)])
    assert dedup.embedding_dup_pairs(vecs(0), 0.9).num_rows == 0
    assert dedup.embedding_dup_pairs(vecs(1), 0.9).num_rows == 0
    assert dedup.embedding_dup_pairs_lsh(vecs(0), 0.9).num_rows == 0
    assert dedup.embedding_dup_pairs_lsh(vecs(1), 0.9).num_rows == 0


def test_ivf_single_vector(ray_session, tmp_path):
    import ray.data as rd
    ds = rd.from_items([{"vec_id": 5, "embedding": [1.0, 0.0, 0.0, 0.0]}])
    idx = str(tmp_path / "ivf1")
    similarity.build_ivf(ds, idx, nlist=4)
    out = similarity.ivf_search(idx, np.array([[1.0, 0.0, 0.0, 0.0]]), k=3,
                                nprobe=4)
    assert out["vec_id"].to_pylist() == [5]
    assert out["cos_m"].to_pylist() == [1000]
