"""Prefix-wildcard query expansion: dictionary bisect, OR-group scoring,
syntax through every scorer, exclusion composition."""

from __future__ import annotations

import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    query,
)


@pytest.fixture(scope="module")
def reader(ray_session, index_dir):
    return query.IndexReader(index_dir)


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


def test_expand_prefix_matches_vocab_scan(reader):
    got = reader.expand_prefix("s", max_expansions=None)
    want = sorted(t for t in reader._df if t.startswith("s"))
    assert got == want and len(got) >= 2


def test_expand_prefix_cap_keeps_top_df(reader):
    full = reader.expand_prefix("s", max_expansions=None)
    capped = reader.expand_prefix("s", max_expansions=2)
    assert len(capped) == 2
    by_df = sorted(full, key=lambda t: (-reader._df[t], t))[:2]
    assert capped == sorted(by_df)


def test_expand_prefix_no_match(reader):
    assert reader.expand_prefix("zzzz") == []


def test_wildcard_equals_manual_expansion(reader):
    exp = reader.expand_prefix("s")
    manual = _fmt(reader.search_exhaustive(" ".join(exp + ["merge"]), 10))
    star = _fmt(reader.search_exhaustive("s* merge", 10))
    assert star == manual


def test_wildcard_wand_equals_exhaustive(reader):
    a = _fmt(reader.search_wand("s* merge", 10))
    b = _fmt(reader.search_exhaustive("s* merge", 10))
    assert a == b


def test_wildcard_and_mode_raises(reader):
    assert len(reader.expand_prefix("s")) > 1
    with pytest.raises(ValueError, match="OR groups"):
        reader.search("s* merge", 10, mode="and")


def test_wildcard_in_exclusion(reader):
    exp = reader.expand_prefix("s")
    a = _fmt(reader.search("merge batch", 10, exclude="s*"))
    b = _fmt(reader.search("merge batch", 10, exclude=" ".join(exp)))
    assert a == b
    banned = set()
    for t in exp:
        _, _, idx = reader._term_postings(t)
        banned |= {int(reader._doc_ids[i]) for i in idx}
    assert all(d not in banned for d, _ in a)


def test_wildcard_no_match_is_dropped(reader):
    a = _fmt(reader.search("zzzq* merge", 10))
    b = _fmt(reader.search("merge", 10))
    assert a == b


def test_expand_prefix_multi_token_raises(reader):
    """A wildcard word that tokenizes to several tokens must not silently
    drop its leading tokens (ADVICE r3)."""
    with pytest.raises(ValueError, match="multiple tokens"):
        reader.expand_prefix("data-bas")


def test_multi_token_wildcard_keeps_leading_terms(reader):
    """'merge-s*' == query terms ['merge'] + expansions of 's' — identical
    results to writing 'merge s*' explicitly."""
    got = _fmt(reader.search_wand("merge-s*", 10))
    want = _fmt(reader.search_wand("merge s*", 10))
    assert got == want and got


def test_uncapped_expansion_beyond_cap(reader):
    """max_expansions=None expands past any cap (oracle parity path)."""
    full = reader.expand_prefix("s", max_expansions=None)
    via_query = reader.search_wand("s*", 5, max_expansions=None)
    capped = reader.search_wand("s*", 5, max_expansions=1)
    assert len(full) >= 2
    # capped-to-1 expansion must not silently equal the full expansion's
    # term set; results MAY coincide, so compare the rewritten queries
    assert reader._rewrite_wildcards("s*", "or", None) != \
        reader._rewrite_wildcards("s*", "or", 1)
    assert via_query  # runs and returns hits
