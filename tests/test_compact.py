"""Segment compaction: compact_index merges shards at the ENCODED level
(no re-extraction/re-tokenization) into a NEW index dir whose search
results are rank+score identical, with fewer shards and identical global
stats.  Covers the positional (v3 phrase) stream and resume semantics."""

from __future__ import annotations

import glob
import os

import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    QUERY_SET,
    SELECTIVE_QUERY_SET,
)


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


@pytest.fixture(scope="module")
def compacted(ray_session, pages_dir, tmp_path_factory):
    """base build (2 shards) + two extends (6 shards) -> compact to 2."""
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    assert len(files) >= 4
    h, q3 = len(files) // 2, 3 * len(files) // 4
    root = tmp_path_factory.mktemp("compact")

    d_grown = str(root / "idx_grown")
    build.build_index(files[:h], d_grown,
                      build.BuildParams(num_shards=2, num_salts=4))
    build.extend_index(files[h:q3], d_grown)
    m_grown = build.extend_index(files[q3:], d_grown)

    d_out = str(root / "idx_compact")
    m_out = build.compact_index(d_grown, d_out, target_shards=2)
    return d_grown, d_out, m_grown, m_out


def test_compact_shrinks_shards_keeps_stats(compacted):
    d_grown, d_out, m_grown, m_out = compacted
    assert m_grown["n_shards"] == 6
    assert m_out["n_shards"] == 2
    assert m_out["n_docs"] == m_grown["n_docs"]
    assert abs(m_out["avg_dl"] - m_grown["avg_dl"]) < 1e-12
    assert m_out["n_postings"] == m_grown["n_postings"]


def test_compact_scores_identical(compacted):
    d_grown, d_out, _, _ = compacted
    r_old = query.IndexReader(d_grown)
    r_new = query.IndexReader(d_out)
    assert r_old._df == r_new._df
    for q in list(QUERY_SET) + list(SELECTIVE_QUERY_SET):
        want = _fmt(r_old.search_wand(q["query_text"], q["k"], q["mode"]))
        assert _fmt(r_new.search_wand(q["query_text"], q["k"], q["mode"])) \
            == want, f"compact != source for q{q['query_id']}"
        assert _fmt(r_new.search_exhaustive(
            q["query_text"], q["k"], q["mode"])) == want


def test_compact_heavy_passthrough_scores_identical(compacted,
                                                    tmp_path_factory):
    """heavy_passthrough_bytes=0 forces EVERY multi-row (term, salt) group
    through un-merged (the head-term scaling escape hatch): the output
    keeps several doc-disjoint rows per term and the reader runs one
    cursor per row — results must stay rank+score identical and global
    stats exact."""
    d_grown, _, m_grown, _ = compacted
    d_pt = str(tmp_path_factory.mktemp("compact_pt") / "idx_pt")
    m_pt = build.compact_index(d_grown, d_pt, target_shards=1,
                               heavy_passthrough_bytes=0)
    assert m_pt["n_shards"] == 1
    assert m_pt["n_docs"] == m_grown["n_docs"]
    assert m_pt["n_postings"] == m_grown["n_postings"]
    # un-merged: the single output shard holds MORE term rows than a
    # fully merged compact-to-1 would (source shards' rows survive)
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.state import (
        checkpoint as ckpt,
    )
    d_merged = str(tmp_path_factory.mktemp("compact_m1") / "idx_m1")
    build.compact_index(d_grown, d_merged, target_shards=1)
    assert ckpt.read_shard_record(d_pt, 0)["n_term_shards"] > \
        ckpt.read_shard_record(d_merged, 0)["n_term_shards"]
    r_old = query.IndexReader(d_grown)
    r_new = query.IndexReader(d_pt)
    assert r_old._df == r_new._df
    for q in list(QUERY_SET) + list(SELECTIVE_QUERY_SET):
        want = _fmt(r_old.search_wand(q["query_text"], q["k"], q["mode"]))
        assert _fmt(r_new.search_wand(q["query_text"], q["k"], q["mode"])) \
            == want, f"passthrough compact != source for q{q['query_id']}"
        assert _fmt(r_new.search_exhaustive(
            q["query_text"], q["k"], q["mode"])) == want


def test_compact_resume_is_noop(compacted):
    d_grown, d_out, _, m_out = compacted
    import time
    t0 = time.time()
    m2 = build.compact_index(d_grown, d_out, target_shards=2)
    assert time.time() - t0 < 5, "resume over done markers should be ~free"
    assert m2["n_postings"] == m_out["n_postings"]
    assert m2["n_docs"] == m_out["n_docs"]


def test_compact_refuses_in_place(compacted):
    d_grown, *_ = compacted
    with pytest.raises(ValueError, match="NEW index dir"):
        build.compact_index(d_grown, d_grown, target_shards=1)


def test_compact_positional_phrase_parity(ray_session, pages_dir,
                                          tmp_path_factory):
    """v3 positional stream survives the encoded-level merge: phrase
    search over a compacted positional index matches the grown one."""
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    h = len(files) // 2
    root = tmp_path_factory.mktemp("compact_pos")
    d_grown = str(root / "pos_grown")
    build.build_index(files[:h], d_grown,
                      build.BuildParams(num_shards=2, num_salts=4,
                                        positions=True))
    build.extend_index(files[h:], d_grown)
    d_out = str(root / "pos_compact")
    build.compact_index(d_grown, d_out, target_shards=1)

    r_old = query.IndexReader(d_grown)
    r_new = query.IndexReader(d_out)
    assert r_new.has_positions
    for phrase in ("spark data", "query plan", "merge sort"):
        want = _fmt(r_old.search_phrase(phrase, 10))
        got = _fmt(r_new.search_phrase(phrase, 10))
        assert got == want, f"phrase {phrase!r}: {got} != {want}"
