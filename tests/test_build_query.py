"""End-to-end golden + metamorphic tests (SURVEY.md §5.2-5.3):
rank-parity engine vs brute-force oracle, WAND vs exhaustive,
partition-count invariance, resume-equals-fresh."""

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    oracle,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    QUERY_SET,
)


@pytest.fixture(scope="module")
def reader(index_dir):
    return query.IndexReader(index_dir)


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


def test_manifest_stats_match_oracle(reader, oracle_index):
    assert reader.n_docs == oracle_index.n_docs
    assert abs(reader.avg_dl - oracle_index.avg_dl) < 1e-9
    for term in ("spark", "data", "café"):
        assert reader._df.get(term, 0) == oracle_index.df.get(term, 0)


def test_rank_parity_all_queries(reader, oracle_index):
    for q in QUERY_SET:
        want = [(d, round(s, 6)) for d, s in
                oracle.oracle_topk(oracle_index, q["query_text"], q["k"], q["mode"])]
        got_ex = _fmt(reader.search_exhaustive(q["query_text"], q["k"], q["mode"]))
        got_wand = _fmt(reader.search_wand(q["query_text"], q["k"], q["mode"]))
        assert got_ex == want, f"exhaustive != oracle for q{q['query_id']}"
        assert got_wand == want, f"wand != oracle for q{q['query_id']}"


def test_filtered_rank_parity(reader, oracle_index):
    """Metadata-filtered search: WAND == exhaustive == oracle under an
    allowed-doc filter, for several filter shapes.  Stats stay GLOBAL, so
    filtered scores must equal unfiltered scores for surviving docs."""
    import numpy as np
    all_ids = np.asarray(oracle_index.doc_ids, dtype=np.int64)
    shapes = {
        "every3rd": all_ids[::3],
        "singleton": all_ids[7:8],
        "empty": all_ids[:0],
        "all": all_ids,
    }
    for name, allowed in shapes.items():
        mask = reader.make_doc_mask(allowed)
        aset = {int(x) for x in allowed}
        for q in QUERY_SET:
            want = [(d, round(s, 6)) for d, s in
                    oracle.oracle_topk(oracle_index, q["query_text"],
                                       q["k"], q["mode"], allowed=aset)]
            got_ex = _fmt(reader.search_exhaustive(
                q["query_text"], q["k"], q["mode"], mask=mask))
            got_wand = _fmt(reader.search_wand(
                q["query_text"], q["k"], q["mode"], mask=mask))
            assert got_ex == want, f"exhaustive!=oracle {name} q{q['query_id']}"
            assert got_wand == want, f"wand!=oracle {name} q{q['query_id']}"


def test_filtered_scores_equal_unfiltered(reader):
    """A doc that survives the filter keeps its exact unfiltered score
    (global statistics — the filter must not re-weight)."""
    import numpy as np
    full = {r.doc_id: r.score for r in
            reader.search_exhaustive("spark data join", 100)}
    keep = np.asarray(sorted(full), dtype=np.int64)[::2]
    mask = reader.make_doc_mask(keep)
    for r in reader.search_wand("spark data join", 100, mask=mask):
        assert r.doc_id in set(int(x) for x in keep)
        assert abs(r.score - full[r.doc_id]) < 1e-12


def test_wand_equals_exhaustive_various_k(reader):
    for k in (1, 3, 25, 100):
        for qtext in ("spark data join", "vector hash part"):
            assert _fmt(reader.search_wand(qtext, k)) == \
                _fmt(reader.search_exhaustive(qtext, k))


def test_partition_invariance(ray_session, pages_dir, tmp_path, index_dir):
    """Postings identical whether built from 1 or 4 shards (FIXTURES.md F5)."""
    d1 = str(tmp_path / "idx1")
    build.build_index(pages_dir, d1, build.BuildParams(num_shards=4, num_salts=2))
    r1 = query.IndexReader(d1)
    r2 = query.IndexReader(index_dir)  # 2 shards, 4 salts
    assert r1.n_docs == r2.n_docs and abs(r1.avg_dl - r2.avg_dl) < 1e-9
    assert r1._df == r2._df, "per-term document frequencies diverge"
    for q in QUERY_SET:
        assert _fmt(r1.search_wand(q["query_text"], q["k"], q["mode"])) == \
            _fmt(r2.search_wand(q["query_text"], q["k"], q["mode"]))


def test_resume_equals_fresh(ray_session, pages_dir, tmp_path):
    d = str(tmp_path / "idxr")
    build.build_index(pages_dir, d, build.BuildParams(num_shards=3, num_salts=2))
    fresh = _fmt(query.IndexReader(d).search_wand("spark data join", 10))
    # simulate a crash after shard 0: drop shard 1/2 outputs and one marker
    shutil.rmtree(os.path.join(d, "shards", "shard-0001", "seg"))
    shutil.rmtree(os.path.join(d, "shards", "shard-0002", "docs"))
    shutil.rmtree(os.path.join(d, "shards", "shard-0002", "seg"))
    build.build_index(pages_dir, d, build.BuildParams(num_shards=3, num_salts=2))
    resumed = _fmt(query.IndexReader(d).search_wand("spark data join", 10))
    assert resumed == fresh


def test_doc_ids_strictly_ascending_in_segments(index_dir):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.codec import (
        EncodedPostings,
        decode_postings,
    )
    import numpy as np
    for f in glob.glob(os.path.join(index_dir, "shards", "*", "seg", "*.parquet")):
        t = pq.read_table(f)
        d = t.to_pydict()
        for i in range(t.num_rows):
            enc = EncodedPostings(
                df=d["df"][i], doc_bytes=d["doc_bytes"][i], tf_bytes=d["tf_bytes"][i],
                block_first=np.asarray(d["block_first"][i], np.int64),
                block_doc_off=np.asarray(d["block_doc_off"][i], np.int32),
                block_tf_off=np.asarray(d["block_tf_off"][i], np.int32),
                block_max_tf=np.asarray(d["block_max_tf"][i], np.int64),
                block_min_dl=np.asarray(d["block_min_dl"][i], np.int32),
                block_last=np.asarray(d["block_last"][i], np.int64))
            ids, _ = decode_postings(enc)
            assert ids.size == d["df"][i]
            assert (np.diff(ids) > 0).all()


def test_salting_spreads_head_terms(index_dir):
    """With a tiny Zipfian vocab every common term is a head term: expect
    more than one distinct salt overall (north_rule skew handling)."""
    salts = set()
    for f in glob.glob(os.path.join(index_dir, "shards", "*", "seg", "*.parquet")):
        salts.update(pq.read_table(f, columns=["salt"])["salt"].to_pylist())
    assert len(salts) > 1
