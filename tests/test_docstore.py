"""Doc-store sidecar (state/docstore.py): sidecar-resolved point lookups
== filtered-scan fallback, column pruning, staleness fallback, and
lifecycle coverage (delete visibility through fetch_docs).

Reference analog: none — the reference re-reads the corpus through Spark
for every lookup (``webapp/backend`` fetch path); this is the Lucene
stored-fields-index design over the docs checkpoint."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    build,
    query,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.state import (
    checkpoint as ckpt,
    docstore,
)


@pytest.fixture(scope="module")
def doc_ids(index_dir):
    files = glob.glob(os.path.join(index_dir, "shards", "shard-*",
                                   "docs", "*.parquet"))
    ids = pq.ParquetDataset(files).read(columns=["doc_id"])
    return sorted(ids["doc_id"].to_pylist())


def _hide_sidecars(index_dir, hide=True):
    for sd in glob.glob(os.path.join(index_dir, "shards", "shard-*")):
        a = os.path.join(sd, docstore.DOCS_IDX_PTR)
        b = a + ".hidden"
        src, dst = (a, b) if hide else (b, a)
        if os.path.exists(src):
            os.rename(src, dst)


def _sidecar_table(sd):
    """All parts of a shard's CURRENT sidecar generation, concatenated
    and sorted by doc_id (gen names are random, boundaries may differ
    between rebuilds — the logical content is what must match)."""
    import pyarrow as pa
    parts = docstore._resolve_parts(sd)
    assert parts, sd
    tables = [pq.read_table(q) for q in parts]
    return pa.concat_tables(tables).sort_by("doc_id"), tables


def test_sidecar_written_per_shard_and_counted(index_dir):
    mf = ckpt.read_json(os.path.join(index_dir, "manifest.json"))
    assert mf["docs_idx"]["version"] == docstore.IDX_VERSION
    assert mf["docs_idx"]["n_rows"] == mf["n_docs"]
    for sd in glob.glob(os.path.join(index_dir, "shards", "shard-*")):
        whole, parts = _sidecar_table(sd)
        for t in parts:
            # each part sorted by doc_id — the property row-group
            # pruning relies on
            col = t["doc_id"].to_pylist()
            assert col == sorted(col)
            assert t.schema.metadata and b"files" in t.schema.metadata
        # parts are range-DISJOINT: the concatenation has no duplicates
        col = whole["doc_id"].to_pylist()
        assert len(col) == len(set(col))


def test_fetch_docs_sidecar_equals_scan(index_dir, doc_ids):
    wanted = doc_ids[::7] + [doc_ids[0], 999_999_999_999]
    fast = query.fetch_docs(index_dir, wanted)
    _hide_sidecars(index_dir)
    try:
        scan = query.fetch_docs(index_dir, wanted)
    finally:
        _hide_sidecars(index_dir, hide=False)
    assert fast == scan
    assert set(fast) == set(doc_ids[::7]) | {doc_ids[0]}
    assert 999_999_999_999 not in fast


def test_fetch_docs_column_pruning(index_dir, doc_ids):
    got = query.fetch_docs(index_dir, doc_ids[:3], columns=["text"])
    assert set(got) == set(doc_ids[:3])
    for row in got.values():
        assert set(row) == {"doc_id", "text"}  # doc_id forced in


def test_single_id_and_empty(index_dir, doc_ids):
    one = query.fetch_docs(index_dir, [doc_ids[5]])
    assert list(one) == [doc_ids[5]]
    assert one[doc_ids[5]]["doc_len"] > 0
    assert query.fetch_docs(index_dir, []) == {}


def test_stale_sidecar_falls_back(index_dir, doc_ids, tmp_path):
    """A sidecar referencing a vanished part must not break lookups —
    lookup_shard_docs returns None and fetch_docs falls back to the
    scan.  Simulated by pointing one shard's sidecar at a bogus file
    list (metadata rewrite, data unchanged)."""
    sd = glob.glob(os.path.join(index_dir, "shards", "shard-*"))[0]
    p = docstore._resolve_parts(sd)[0]
    orig = pq.read_table(p)
    bogus = orig.replace_schema_metadata(
        {b"files": b'["does-not-exist.parquet"]',
         b"version": str(docstore.IDX_VERSION).encode()})
    try:
        pq.write_table(bogus, p)
        got = query.fetch_docs(index_dir, doc_ids[:5])
        assert set(got) == set(doc_ids[:5])
    finally:
        pq.write_table(orig, p, row_group_size=docstore.IDX_ROW_GROUP)


def test_lookup_shard_docs_missing_sidecar_none(tmp_path):
    assert docstore.lookup_shard_docs(str(tmp_path), [1, 2]) is None


def test_row_beyond_rewritten_part_falls_back(pages_dir, tmp_path_factory):
    """A part rewritten SHORTER than the sidecar remembers (e.g. a purge
    that raced the rebuild) must degrade to the scan, not raise: the
    sidecar's row_i points past the part's rows."""
    d = str(tmp_path_factory.mktemp("ds_shrink_idx"))
    build.build_index(pages_dir, d, build.BuildParams(num_shards=1))
    sd = os.path.join(d, "shards", "shard-0000")
    parts = sorted(glob.glob(os.path.join(sd, "docs", "*.parquet")))
    t = pq.read_table(parts[0])
    assert t.num_rows > 1
    dropped = t["doc_id"][t.num_rows - 1].as_py()
    kept = t["doc_id"][0].as_py()
    pq.write_table(t.slice(0, t.num_rows - 1), parts[0])
    got = query.fetch_docs(d, [kept, dropped])  # must not raise
    assert kept in got and dropped not in got


def test_chunked_rebuild_equals_single(index_dir, doc_ids, monkeypatch,
                                       tmp_path_factory):
    """The fanned-out scan (SCAN_CHUNK-file tasks + merge) must produce a
    byte-equivalent sidecar to the single-task path: compact with
    SCAN_CHUNK=1 (forces one scan task PER FILE) and compare lookups +
    sidecar contents against a plain compact of the same index."""
    a = str(tmp_path_factory.mktemp("ds_chunk_a"))
    b = str(tmp_path_factory.mktemp("ds_chunk_b"))
    build.compact_index(index_dir, a, target_shards=1)
    monkeypatch.setattr(docstore, "SCAN_CHUNK", 1)
    build.compact_index(index_dir, b, target_shards=1)
    ta, _ = _sidecar_table(os.path.join(a, "shards", "shard-0000"))
    tb, _ = _sidecar_table(os.path.join(b, "shards", "shard-0000"))
    assert ta.equals(tb)
    wanted = doc_ids[::11]
    assert query.fetch_docs(b, wanted).keys() == \
        query.fetch_docs(a, wanted).keys() == set(wanted)


def test_delete_then_fetch_miss(pages_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ds_del_idx"))
    build.build_index(pages_dir, d, build.BuildParams(num_shards=2))
    files = glob.glob(os.path.join(d, "shards", "shard-*",
                                   "docs", "*.parquet"))
    ids = sorted(pq.ParquetDataset(files).read(
        columns=["doc_id"])["doc_id"].to_pylist())
    victim, survivor = ids[0], ids[1]
    assert victim in query.fetch_docs(d, [victim, survivor])
    build.delete_docs(d, [victim])
    got = query.fetch_docs(d, [victim, survivor])
    assert victim not in got and survivor in got
    # purge-compact to a fresh dir: sidecars rebuilt there, victim gone
    out = str(tmp_path_factory.mktemp("ds_del_out"))
    build.compact_index(d, out, target_shards=1)
    mf = ckpt.read_json(os.path.join(out, "manifest.json"))
    assert mf["docs_idx"]["n_rows"] == mf["n_docs"]
    got2 = query.fetch_docs(out, [victim, survivor])
    assert victim not in got2 and survivor in got2


def test_multi_part_sidecar_purge_and_scan_paths(pages_dir, monkeypatch,
                                                 tmp_path_factory):
    """Force the range-parted sidecar build (PART_TARGET_ROWS tiny) on
    BOTH build paths — the piggybacked purge rewrite and the scan-chunk
    rebuild — and check the parts are sorted, range-disjoint, and the
    lookups equal the scan fallback."""
    monkeypatch.setattr(docstore, "PART_TARGET_ROWS", 64)
    monkeypatch.setattr(docstore, "SCAN_CHUNK", 1)
    d = str(tmp_path_factory.mktemp("ds_mp_idx"))
    build.build_index(pages_dir, d, build.BuildParams(num_shards=2))
    files = glob.glob(os.path.join(d, "shards", "shard-*",
                                   "docs", "*.parquet"))
    ids = sorted(pq.ParquetDataset(files).read(
        columns=["doc_id"])["doc_id"].to_pylist())
    build.delete_docs(d, ids[::10])
    survivors = [x for x in ids if x not in set(ids[::10])]

    for label, out in (("purge", str(tmp_path_factory.mktemp("ds_mp_p"))),
                       ("plain", str(tmp_path_factory.mktemp("ds_mp_s")))):
        src = d
        if label == "plain":
            # purge first so the second compact runs tombstone-free
            # (plain path = scan-chunk rebuild)
            build.compact_index(d, out + ".pre", target_shards=2)
            src = out + ".pre"
        build.compact_index(src, out, target_shards=1)
        sd = os.path.join(out, "shards", "shard-0000")
        parts = docstore._resolve_parts(sd)
        assert len(parts) > 1, (label, parts)
        spans = []
        for q in parts:
            t = pq.read_table(q)
            col = t["doc_id"].to_pylist()
            assert col == sorted(col), label
            if col:
                spans.append((col[0], col[-1]))
        spans.sort()
        for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
            assert a_hi < b_lo, (label, spans)  # range-disjoint
        mf = ckpt.read_json(os.path.join(out, "manifest.json"))
        assert mf["docs_idx"]["n_rows"] == mf["n_docs"] == len(survivors)
        wanted = survivors[::5] + ids[:3]
        fast = query.fetch_docs(out, wanted)
        _hide_sidecars(out)
        try:
            assert fast == query.fetch_docs(out, wanted), label
        finally:
            _hide_sidecars(out, hide=False)
