"""Re-sharding / compaction: building from an existing index's cleaned docs
tables (pre-extracted corpus path) yields a new index with a different
shard layout but identical query results — no re-extraction needed."""

from __future__ import annotations

import glob
import os

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    QUERY_SET,
)


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


def test_reshard_from_docs_tables(ray_session, index_dir, tmp_path):
    docs_files = sorted(glob.glob(
        os.path.join(index_dir, "shards", "*", "docs", "*.parquet")))
    assert docs_files
    out = str(tmp_path / "idx_reshard")
    m = build.build_index(docs_files, out,
                          build.BuildParams(num_shards=1, num_salts=2))
    r_new = query.IndexReader(out)
    r_old = query.IndexReader(index_dir)
    assert m["n_shards"] == 1
    assert r_new.n_docs == r_old.n_docs
    assert abs(r_new.avg_dl - r_old.avg_dl) < 1e-9
    for q in QUERY_SET:
        assert _fmt(r_new.search_wand(q["query_text"], q["k"], q["mode"])) == \
            _fmt(r_old.search_wand(q["query_text"], q["k"], q["mode"]))
