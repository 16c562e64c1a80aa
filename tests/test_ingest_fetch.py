"""JSONL ingest (SURVEY §2.1 S1), point lookup fetch (J6/J8, S7 writer),
and CLI surface."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

PKG = "scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray"


@pytest.fixture(scope="module")
def jsonl_dir(ray_session, pages_dir, tmp_path_factory):
    """Pre-extracted corpus as line JSON (the reference's ingest format,
    CoreDataCleaner.scala:23-25) — same docs as the parquet fixture."""
    d = tmp_path_factory.mktemp("jsonl")
    tbl = pq.read_table(pages_dir, columns=["doc_id", "url", "text", "lang"])
    rows = tbl.to_pylist()
    half = len(rows) // 2
    for fi, chunk in enumerate((rows[:half], rows[half:])):
        with open(d / f"part-{fi:05d}.jsonl", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    return str(d)


def test_jsonl_build_matches_parquet_build(ray_session, jsonl_dir, index_dir,
                                           tmp_path):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
        build,
        query,
    )
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources import (
        pages,
    )
    d = str(tmp_path / "idx_jsonl")
    build.build_index(jsonl_dir, d, build.BuildParams(num_shards=2, num_salts=4))
    r_json = query.IndexReader(d)
    r_parq = query.IndexReader(index_dir)
    assert r_json.n_docs == r_parq.n_docs
    for q in pages.QUERY_SET:
        hj = [(h.doc_id, round(h.score, 6))
              for h in r_json.search_wand(q["query_text"], q["k"], q["mode"])]
        hp = [(h.doc_id, round(h.score, 6))
              for h in r_parq.search_wand(q["query_text"], q["k"], q["mode"])]
        assert hj == hp


def test_gzip_jsonl_build(ray_session, jsonl_dir, index_dir, tmp_path):
    """Compressed line-JSON ingest (reference S9 decompress step is folded
    into the reader — read_json handles .gz natively)."""
    import gzip
    import shutil as sh

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
        build,
        query,
    )
    d = tmp_path / "gz"
    d.mkdir()
    for f in sorted(os.listdir(jsonl_dir)):
        with open(os.path.join(jsonl_dir, f), "rb") as src, \
                gzip.open(d / (f + ".gz"), "wb") as dst:
            sh.copyfileobj(src, dst)
    idx = str(tmp_path / "idx_gz")
    build.build_index(str(d), idx, build.BuildParams(num_shards=2, num_salts=4))
    r_gz = query.IndexReader(idx)
    r_parq = query.IndexReader(index_dir)
    assert r_gz.n_docs == r_parq.n_docs
    got = [(h.doc_id, round(h.score, 6))
           for h in r_gz.search_wand("spark data join", 10)]
    want = [(h.doc_id, round(h.score, 6))
            for h in r_parq.search_wand("spark data join", 10)]
    assert got == want


def test_fetch_doc_roundtrip(ray_session, index_dir, pages_dir):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.query import (
        fetch_doc,
    )
    tbl = pq.read_table(pages_dir, columns=["doc_id", "text"])
    did = int(tbl["doc_id"][7].as_py())
    doc = fetch_doc(index_dir, did)
    assert doc is not None and doc["doc_id"] == did
    assert doc["text"] == tbl["text"][7].as_py()
    assert fetch_doc(index_dir, 999_999_999_999) is None


def test_cli_search_and_fetch(ray_session, index_dir, tmp_path, capsys):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.cli import (
        main,
    )
    rc = main(["search", "--index", index_dir, "--query", "spark data join",
               "--k", "3"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines and lines[0]["rank"] == 1
    # ray session owned by the pytest fixture must survive the CLI call
    assert ray_session.is_initialized()

    out = tmp_path / "doc.json"
    rc = main(["fetch", "--index", index_dir,
               "--doc-id", str(lines[0]["doc_id"]), "--out", str(out)])
    assert rc == 0
    doc = json.loads(out.read_text())
    assert doc["doc_id"] == lines[0]["doc_id"]
    assert main(["fetch", "--index", index_dir, "--doc-id",
                 "999999999999"]) == 2


def test_tfidf_query_runs(ray_session):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.queries import (
        q_tfidf,
    )
    import numpy as np
    t = q_tfidf("/root/testdata/sf0.001").take_batch(10_000, batch_format="pyarrow")
    assert set(t.column_names) == {"doc_id", "term", "tfidf_m"}
    assert np.asarray(t["tfidf_m"]).min() >= 0
