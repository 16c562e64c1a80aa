"""Regression: AND-mode through shard-subset readers must not drop a
globally-present term that has no postings in the local shards — doing so
let shard actors return docs missing that term (spurious AND hits after
the distributed merge)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.serve import (
    DistributedSearcher,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    PAGES_SCHEMA,
)


def _pages(rows):
    cols = {n: [] for n in PAGES_SCHEMA.names}
    for did, body in rows:
        cols["doc_id"].append(did)
        cols["url"].append(f"https://x.example/{did}")
        cols["warc_ts"].append(0)
        cols["html"].append(f"<p>{body}</p>".encode())
        cols["text"].append(body)
        cols["lang"].append("en")
    return pa.table(cols, schema=PAGES_SCHEMA)


@pytest.fixture(scope="module")
def skewed_idx(ray_session, tmp_path_factory):
    """'apple' lives ONLY in shard 0; 'banana' in both shards."""
    d = tmp_path_factory.mktemp("skewed")
    pq.write_table(_pages([(1, "apple banana"), (2, "banana cherry")]),
                   d / "a.parquet")
    pq.write_table(_pages([(3, "banana banana plum"), (4, "banana date")]),
                   d / "b.parquet")
    idx = str(d / "idx")
    build.build_index(str(d), idx, build.BuildParams(num_shards=2, num_salts=2))
    return idx


def test_subset_and_mode_no_spurious_hits(skewed_idx):
    full = query.IndexReader(skewed_idx)
    want = [(h.doc_id, round(h.score, 6))
            for h in full.search_exhaustive("apple banana", 10, "and")]
    assert [d for d, _ in want] == [1]
    import os
    for name in sorted(os.listdir(os.path.join(skewed_idx, "shards"))):
        sub = query.IndexReader(skewed_idx, shard_subset=[name])
        got = sub.search_exhaustive("apple banana", 10, "and")
        got_w = sub.search_wand("apple banana", 10, "and")
        local_docs = set(sub._doc_ids.tolist())
        for h in list(got) + list(got_w):
            assert h.doc_id == 1, \
                f"spurious AND hit {h.doc_id} from shard {name} ({local_docs})"


def test_distributed_and_mode_matches_full(ray_session, skewed_idx):
    full = query.IndexReader(skewed_idx)
    ds = DistributedSearcher(skewed_idx, num_actors=2)
    try:
        for qtext, mode in (("apple banana", "and"), ("apple banana", "or"),
                            ("banana plum", "and"), ("apple zzz_oov", "and")):
            got = [(h.doc_id, round(h.score, 6))
                   for h in ds.search(qtext, 10, mode)]
            want = [(h.doc_id, round(h.score, 6))
                    for h in full.search(qtext, 10, mode)]
            assert got == want, (qtext, mode)
    finally:
        ds.shutdown()
