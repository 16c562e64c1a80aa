"""Degenerate build inputs: empty files, empty shards, stop-words-only and
empty documents must produce a loadable, queryable (empty-ish) index."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    PAGES_SCHEMA,
)


def _write_pages(path, rows):
    cols = {name: [] for name in PAGES_SCHEMA.names}
    for r in rows:
        for name in PAGES_SCHEMA.names:
            cols[name].append(r[name])
    pq.write_table(pa.table(cols, schema=PAGES_SCHEMA), path)


def _row(doc_id, html):
    return {"doc_id": doc_id, "url": f"https://x.example/{doc_id}",
            "warc_ts": 0, "html": html.encode(), "text": "", "lang": "en"}


def test_build_with_empty_file_and_shard(ray_session, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(d / "a.parquet", [_row(1, "<p>hello world data</p>")])
    _write_pages(d / "b.parquet", [])  # empty input file -> empty shard
    idx = str(tmp_path / "idx")
    m = build.build_index(str(d), idx, build.BuildParams(num_shards=2))
    assert m["n_docs"] == 1
    r = query.IndexReader(idx)
    hits = r.search_wand("hello", 10)
    assert [h.doc_id for h in hits] == [1]
    # empty shard must still be loadable as a subset
    import os
    names = sorted(os.listdir(os.path.join(idx, "shards")))
    for name in names:
        sub = query.IndexReader(idx, shard_subset=[name])
        assert sub.n_docs == 1  # global stats ride the manifest


def test_build_stopwords_and_empty_docs(ray_session, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(d / "a.parquet", [
        _row(1, "<p>the and of a</p>"),      # stop-words only -> doc_len 0
        _row(2, "<p></p>"),                   # empty text
        _row(3, "<p>unique token here</p>"),
    ])
    idx = str(tmp_path / "idx")
    m = build.build_index(str(d), idx, build.BuildParams(num_shards=1))
    assert m["n_docs"] == 3
    r = query.IndexReader(idx)
    assert [h.doc_id for h in r.search_wand("unique", 5)] == [3]
    assert r.search_wand("the of", 5) == []   # all query terms stop-filtered


def test_build_only_stopword_docs(ray_session, tmp_path):
    """A batch whose every doc tokenizes to nothing must not crash the
    postings builder (regression: IndexError on zero term rows)."""
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(d / "a.parquet", [_row(1, "<p>the and of</p>"),
                                   _row(2, "<p></p>")])
    idx = str(tmp_path / "idx")
    m = build.build_index(str(d), idx, build.BuildParams(num_shards=1))
    assert m["n_docs"] == 2 and m["n_postings"] == 0
    assert query.IndexReader(idx).search_wand("anything", 5) == []


def test_build_no_input_files(ray_session, tmp_path):
    """Zero input files -> a valid, loadable, empty index (regression:
    ArrowInvalid in finalize on concat of zero termdict tables)."""
    d = tmp_path / "pages"
    d.mkdir()
    idx = str(tmp_path / "idx")
    m = build.build_index(str(d), idx, build.BuildParams(num_shards=2))
    assert m["n_docs"] == 0 and m["n_shards"] == 0
    r = query.IndexReader(idx)
    assert r.search_wand("anything", 5) == []


def test_resume_refuses_changed_inputs(ray_session, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(d / "a.parquet", [_row(1, "<p>hello</p>")])
    idx = str(tmp_path / "idx")
    build.build_index(str(d), idx, build.BuildParams(num_shards=1))
    _write_pages(d / "b.parquet", [_row(2, "<p>world</p>")])  # corpus changed
    import pytest
    with pytest.raises(ValueError, match="different input files"):
        build.build_index(str(d), idx, build.BuildParams(num_shards=1))


def test_unwired_params_rejected(ray_session, tmp_path):
    import pytest
    with pytest.raises(NotImplementedError):
        build.build_index(str(tmp_path), str(tmp_path / "i"),
                          build.BuildParams(k1=2.0))


def test_reader_ignores_unfinalized_extend_shard(ray_session, tmp_path):
    """A crashed extend leaves a partial shard dir; readers must only see
    manifest-listed shards (regression: FileNotFoundError on missing seg)."""
    import os
    import shutil
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(d / "a.parquet", [_row(1, "<p>hello world</p>")])
    idx = str(tmp_path / "idx")
    build.build_index(str(d), idx, build.BuildParams(num_shards=1))
    # simulate a crash mid-extend: phase-1 output exists, no seg, no manifest
    part = os.path.join(idx, "shards", "shard-0001")
    shutil.copytree(os.path.join(idx, "shards", "shard-0000", "docs"),
                    os.path.join(part, "docs"))
    r = query.IndexReader(idx)
    assert r.n_docs == 1
    assert [h.doc_id for h in r.search_wand("hello", 5)] == [1]
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.query import (
        fetch_doc,
    )
    assert fetch_doc(idx, 1)["doc_id"] == 1


def test_build_all_empty(ray_session, tmp_path):
    d = tmp_path / "pages"
    d.mkdir()
    _write_pages(d / "a.parquet", [])
    idx = str(tmp_path / "idx")
    m = build.build_index(str(d), idx, build.BuildParams(num_shards=1))
    assert m["n_docs"] == 0
    r = query.IndexReader(idx)
    assert r.search_wand("anything", 5) == []
