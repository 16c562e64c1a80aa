"""Partitioned termdict (SCALE.md switch point 1, flipped): the
distributed finalize path writes the same (term -> global df) mapping as
the driver merge, readers load only the parts they touch, and the whole
build/extend/query surface stays green with the partitioned layout."""

import json
import os

import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.sources.pages import (
    QUERY_SET,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.state.termdict import (
    TermDict,
)


@pytest.fixture(scope="module")
def dist_index(ray_session, pages_dir, tmp_path_factory):
    """Index whose termdict was aggregated DISTRIBUTED (threshold 0) over
    many shards."""
    d = str(tmp_path_factory.mktemp("tdix") / "idx")
    build.build_index(pages_dir, d,
                      build.BuildParams(num_shards=4, num_salts=4,
                                        termdict_dist_threshold=0))
    return d


def _fmt(results):
    return [(r.doc_id, round(r.score, 6)) for r in results]


def test_distributed_termdict_matches_driver_merge(
        ray_session, dist_index, index_dir):
    """Same corpus, distributed vs driver-side termdict -> identical
    (term, df) mapping (index_dir fixture builds with the default
    threshold, i.e. the driver path)."""
    with open(os.path.join(dist_index, "manifest.json")) as f:
        td_a = TermDict(os.path.join(dist_index, json.load(f)["termdict_dir"]))
    with open(os.path.join(index_dir, "manifest.json")) as f:
        td_b = TermDict(os.path.join(index_dir, json.load(f)["termdict_dir"]))
    assert dict(td_a.items()) == dict(td_b.items())


def test_parts_metadata_consistent(dist_index):
    with open(os.path.join(dist_index, "manifest.json")) as f:
        td_dir = os.path.join(dist_index, json.load(f)["termdict_dir"])
    parts = json.load(open(os.path.join(td_dir, "parts.json")))["parts"]
    assert parts, "non-empty corpus must have termdict parts"
    # sorted by lo; n matches file rows; every term in EXACTLY one part
    # (spans may overlap: the boundary part interleaves with interiors)
    import pyarrow.parquet as pq
    prev_lo = ""
    seen: dict[str, str] = {}
    for p in parts:
        assert p["lo"] <= p["hi"]
        assert p["lo"] >= prev_lo
        prev_lo = p["lo"]
        t = pq.read_table(os.path.join(td_dir, p["file"]))
        assert t.num_rows == p["n"]
        terms = t["term"].to_pylist()
        assert terms == sorted(terms)
        assert terms[0] == p["lo"] and terms[-1] == p["hi"]
        for term in terms:
            assert term not in seen, (term, seen[term], p["file"])
            seen[term] = p["file"]


def test_lazy_reader_over_partitioned_dict(ray_session, dist_index,
                                           oracle_index):
    """Lazy reader (df from the partitioned termdict) scores every query
    identically to the brute-force oracle."""
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
        oracle,
    )
    rd_ = query.IndexReader(dist_index, lazy=True)
    assert isinstance(rd_._df, TermDict)
    for q in QUERY_SET:
        want = [(d, round(s, 6)) for d, s in oracle.oracle_topk(
            oracle_index, q["query_text"], q["k"], q["mode"])]
        assert _fmt(rd_.search_wand(q["query_text"], q["k"],
                                    q["mode"])) == want


def test_df_lookup_loads_single_part(ray_session, dist_index):
    rd_ = query.IndexReader(dist_index, lazy=True)
    td = rd_._df
    n_parts = len(td._parts)
    td.get("data", 0)
    # a point lookup stabs the covering interior part plus (at most) the
    # boundary part — never the whole dictionary
    assert td.parts_loaded <= 2
    if n_parts > 2:
        assert td.parts_loaded < n_parts


def test_prefix_expansion_partition_aware(ray_session, dist_index,
                                          index_dir):
    """Wildcard expansion over the partitioned dict equals the eager
    reader's bisect over the full vocabulary, without loading every
    part (when the prefix range doesn't span them all)."""
    lazy = query.IndexReader(dist_index, lazy=True)
    eager = query.IndexReader(index_dir)
    for prefix in ("s", "da", "zz", "qu"):
        got = lazy.expand_prefix(prefix, max_expansions=None)
        want = eager.expand_prefix(prefix, max_expansions=None)
        assert got == want, prefix
        got_c = lazy.expand_prefix(prefix, max_expansions=3)
        want_c = eager.expand_prefix(prefix, max_expansions=3)
        assert got_c == want_c, prefix


def test_extend_keeps_partitioned_layout(ray_session, pages_dir,
                                         tmp_path_factory):
    """build(half) + extend(rest) under the distributed termdict path ==
    fresh build(all): identical df mapping and query results."""
    import glob
    files = sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))
    half = len(files) // 2
    p = build.BuildParams(num_shards=2, num_salts=4,
                          termdict_dist_threshold=0)
    d_ext = str(tmp_path_factory.mktemp("tdext") / "idx")
    build.build_index(files[:half], d_ext, p)
    build.extend_index(files[half:], d_ext)
    d_all = str(tmp_path_factory.mktemp("tdall") / "idx")
    build.build_index(files, d_all, p)
    td_e = TermDict(os.path.join(d_ext, json.load(
        open(os.path.join(d_ext, "manifest.json")))["termdict_dir"]))
    td_a = TermDict(os.path.join(d_all, json.load(
        open(os.path.join(d_all, "manifest.json")))["termdict_dir"]))
    assert dict(td_e.items()) == dict(td_a.items())
    r_e = query.IndexReader(d_ext, lazy=True)
    r_a = query.IndexReader(d_all, lazy=True)
    for q in QUERY_SET:
        assert _fmt(r_e.search_wand(q["query_text"], q["k"], q["mode"])) \
            == _fmt(r_a.search_wand(q["query_text"], q["k"], q["mode"]))
