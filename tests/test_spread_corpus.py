"""Replica-suffixed bench corpus: WAND == exhaustive == correct df
spectrum on a replicate>=6 corpus (the regime where block-max pruning
actually engages — sources/pages.py ensure_pages_parquet)."""

from __future__ import annotations

import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources import (
    pages,
)


@pytest.fixture(scope="module")
def spread_reader(ray_session, tmp_path_factory):
    pdir = pages.ensure_pages_parquet("/root/testdata/sf0.001",
                                      num_files=8, replicate=8)
    d = str(tmp_path_factory.mktemp("spread") / "idx")
    build.build_index(pdir, d, build.BuildParams(num_shards=2, num_salts=4))
    return query.IndexReader(d)


def test_df_spectrum(spread_reader):
    r = spread_reader
    base = r._df.get("data", 0)
    sel = r._df.get("datar1", 0)
    assert sel > 0, "suffixed vocabulary missing from spread replica"
    # suffixed replicas (r in {1,5}) hold their vocab exclusively; the base
    # term keeps the other 6 of 8 replicas
    assert base > 4 * sel
    assert r._df.get("datar2", 0) == 0, "non-spread replica must keep base vocab"


def test_selective_wand_equals_exhaustive(spread_reader):
    r = spread_reader
    for q in pages.SELECTIVE_QUERY_SET:
        w = [(h.doc_id, round(h.score, 6))
             for h in r.search_wand(q["query_text"], q["k"], q["mode"])]
        e = [(h.doc_id, round(h.score, 6))
             for h in r.search_exhaustive(q["query_text"], q["k"], q["mode"])]
        assert w == e, f"wand != exhaustive for selective q{q['query_id']}"
    assert any(r.search_wand(q["query_text"], q["k"], q["mode"])
               for q in pages.SELECTIVE_QUERY_SET)


def test_selective_hits_come_from_spread_replica(spread_reader):
    hits = spread_reader.search_wand("sparkr1 datar1 joinr1", 10)
    assert hits
    for h in hits:
        assert 1_000_000_000 <= h.doc_id < 2_000_000_000
