"""The warm float32 dense-query fast path (query.IndexReader
_fast_or_topk32) must be BIT-IDENTICAL to the cold f64 exhaustive path
and to WAND: f32 accumulation + partition picks an error-bounded band,
f64 re-rank restores exact scores and ties.  Parity is asserted on the
standard fixture index, on a 4000-doc all-identical tie-plateau corpus
(forces the band cap fallback), and across k values that straddle tie
boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    QUERY_SET,
)


def _fmt(hits):
    return [(h.doc_id, h.score) for h in hits]  # FULL float equality


def test_warm_f32_path_bit_identical(ray_session, index_dir):
    cold = query.IndexReader(index_dir)                      # budget 0
    warm = query.IndexReader(index_dir,
                             cache_postings_budget=1 << 26)  # f32 twin on
    for rep in range(3):  # rep 0 fills caches; reps 1-2 hit the f32 path
        for q in QUERY_SET:
            for k in (1, 2, 3, q["k"], 50, 100):
                a = _fmt(warm.search_exhaustive(q["query_text"], k,
                                                q["mode"]))
                b = _fmt(cold.search_exhaustive(q["query_text"], k,
                                                q["mode"]))
                assert a == b, (rep, q["query_id"], k)
    # the fast path actually engaged for dense OR queries
    assert warm._tscores32, "f32 score cache never filled"


def test_warm_f32_path_on_tie_plateau(ray_session, tmp_path):
    """4000 byte-identical docs: every doc ties at every score — the f32
    band blows the sanity cap and the method must fall back to the exact
    path, still returning doc_id-ascending ties."""
    d = tmp_path / "tied"
    d.mkdir()
    text = "alpha beta gamma delta common words here"
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(4000), pa.int64()),
        "url": pa.array([f"u{i}" for i in range(4000)]),
        "text": pa.array([text] * 4000),
    }), str(d / "a.parquet"))
    idx = str(tmp_path / "idx")
    build.build_index(str(d / "a.parquet"), idx,
                      build.BuildParams(num_shards=1, num_salts=1))
    warm = query.IndexReader(idx, cache_postings_budget=1 << 26)
    cold = query.IndexReader(idx)
    for _ in range(2):
        for k in (1, 10, 100):
            a = _fmt(warm.search_exhaustive("alpha beta", k))
            b = _fmt(cold.search_exhaustive("alpha beta", k))
            assert a == b and len(a) == k
            assert [x[0] for x in a] == list(range(k))  # id-asc ties


def test_f32_cache_evicts_with_postings(ray_session, index_dir):
    """The f32 twin is charged to and evicted with the postings budget —
    no orphaned vectors after eviction."""
    r = query.IndexReader(index_dir, cache_postings_budget=2000)
    for q in QUERY_SET:
        r.search_exhaustive(q["query_text"], q["k"], q["mode"])
    assert set(r._tscores32) <= set(r._tscores) <= set(r._decoded)
