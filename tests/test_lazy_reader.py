"""Lazy segment loading: on-demand row-group reads must be rank+score
identical to the eager reader, touch only the accessed terms' row groups,
and open without reading posting payloads."""

from __future__ import annotations

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    QUERY_SET,
)


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


def test_lazy_equals_eager(ray_session, index_dir):
    eager = query.IndexReader(index_dir)
    lazy = query.IndexReader(index_dir, lazy=True)
    assert lazy.n_docs == eager.n_docs
    assert dict(lazy._df.items()) == eager._df, \
        "lazy df (termdict) != eager local sums"
    for q in QUERY_SET:
        for method in ("search_wand", "search_exhaustive"):
            got = _fmt(getattr(lazy, method)(q["query_text"], q["k"], q["mode"]))
            want = _fmt(getattr(eager, method)(q["query_text"], q["k"], q["mode"]))
            assert got == want, f"{method} lazy != eager for q{q['query_id']}"


def test_lazy_loads_only_touched_row_groups(ray_session, index_dir):
    lazy = query.IndexReader(index_dir, lazy=True)
    assert not lazy._loaded_rgs and not lazy._postings  # open reads no payloads
    lazy.search_wand("spark", 5)
    touched = set(lazy._loaded_rgs)
    assert touched and touched <= {loc for locs in lazy._loc.values()
                                   for loc in locs}
    # repeated query loads nothing new
    lazy.search_wand("spark", 5)
    assert set(lazy._loaded_rgs) == touched


def test_lazy_distributed_searcher_matches_eager(ray_session, index_dir):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.serve import (
        DistributedSearcher,
    )
    eager = query.IndexReader(index_dir)
    ds = DistributedSearcher(index_dir, num_actors=2, lazy=True)
    try:
        for q in QUERY_SET:  # full set: AND, OOV, stop-words-only, Unicode
            got = _fmt(ds.search(q["query_text"], q["k"], q["mode"]))
            want = _fmt(eager.search(q["query_text"], q["k"], q["mode"]))
            assert got == want, f"q{q['query_id']}"
    finally:
        ds.shutdown()


def test_lazy_partial_term_completes(ray_session, index_dir):
    """A term partially materialized by another term's row-group load must
    still get ALL its rows on its own first access."""
    lazy = query.IndexReader(index_dir, lazy=True)
    eager = query.IndexReader(index_dir)
    # load every term once, in an order that guarantees overlaps
    for t in sorted(lazy._loc):
        encs = lazy._encs(t)
        assert sum(e.df for e in encs) == sum(e.df for e in eager._encs(t)), t
