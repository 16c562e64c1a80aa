"""Composite corpus-cleaning pipeline (pipelines/corpus.py)."""

import json
import os

import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    corpus,
)

GOOD = ("the quick brown fox jumps over the lazy dog near the river bank "
        "today with plenty of unique content words everywhere")
NEAR = GOOD.rsplit(" ", 1)[0] + " changed"


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd
    rows = [
        {"doc_id": 0, "text": GOOD},
        {"doc_id": 1, "text": GOOD},            # exact dup -> dropped
        {"doc_id": 2, "text": NEAR},            # near dup (minhash path)
        {"doc_id": 3, "text": "too short"},     # < min_tokens
        {"doc_id": 4, "text": "!!! ??? ... ###"},  # punct ratio blowout
        {"doc_id": 5, "text": "a completely different document about "
                              "distributed query engines and shuffles"},
    ]
    return rd.from_items(rows)


def test_quality_filter_and_exact_dedup(docs_ds):
    out = corpus.clean_corpus(docs_ds).to_pandas()
    ids = sorted(out["doc_id"])
    # 1 = exact dup of 0; 3 and 4 fail quality; 2 survives (no near-dup)
    assert ids == [0, 2, 5]
    assert {"n_tokens", "stop_m", "punct_m"} <= set(out.columns)


def test_near_dup_stage_drops_group_losers(docs_ds):
    out = corpus.clean_corpus(docs_ds, near_dup=True,
                              minhash_threshold=0.5).to_pandas()
    ids = sorted(out["doc_id"])
    assert ids == [0, 5]  # 2 is a near-dup of 0 -> dropped, min id kept


def test_write_clean_corpus_manifest_and_buckets(docs_ds, tmp_path):
    out_dir = str(tmp_path / "clean")
    cleaned = corpus.clean_corpus(docs_ds)
    man = corpus.write_clean_corpus(cleaned, out_dir, n_buckets=4,
                                    drop_text=True)
    assert man["n_docs"] == 3 and man["drop_text"] is True
    with open(os.path.join(out_dir, "corpus_manifest.json")) as f:
        assert json.load(f) == man
    import pyarrow.dataset as pads
    dset = pads.dataset(os.path.join(out_dir, "buckets"),
                        format="parquet", partitioning="hive")
    t = dset.to_table()
    assert t.num_rows == 3 and "text" not in t.schema.names
    assert "bucket" in t.schema.names  # hive partition col re-attached


def test_clean_cli(ray_session, tmp_path, capsys):
    import json as _json

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray import (
        cli,
    )
    rc = cli.main(["clean", "--input", "/root/testdata/sf0.001/documents.parquet",
                   "--out", str(tmp_path / "c"), "--buckets", "4"])
    assert rc == 0
    m = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["n_docs"] > 0 and m["n_buckets"] == 4


def test_clean_with_decontamination(ray_session):
    """clean_corpus(benchmark=...) drops contaminated docs before dedup;
    everything else flows through unchanged."""
    import pyarrow as pa
    import ray.data as rd

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.corpus import (
        clean_corpus,
    )
    rows = [
        (0, "held out benchmark question about spark joins performance"),
        (1, "an innocent document about window functions and sorting runs"),
        (2, "prefix words held out benchmark question about spark joins "
            "performance suffix words"),  # contains a benchmark 5-gram
        (3, "another clean document mentioning columnar storage formats"),
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    bench = pa.table({"doc_id": pa.array([99], pa.int64()),
                      "text": pa.array([rows[0][1]], pa.string())})
    out = pa.concat_tables(list(
        clean_corpus(docs, min_tokens=3, benchmark=bench, decon_n=5)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert sorted(out["doc_id"].to_pylist()) == [1, 3]
    # without the benchmark the contaminated docs survive
    out2 = pa.concat_tables(list(
        clean_corpus(docs, min_tokens=3)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert sorted(out2["doc_id"].to_pylist()) == [0, 1, 2, 3]
