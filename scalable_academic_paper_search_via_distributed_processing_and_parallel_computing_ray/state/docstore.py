"""Per-shard doc-store index: sorted ``doc_id -> (file, row group, row)``.

The docs checkpoint is a directory of content-addressed parquet parts
written in INGESTION order, and doc ids are url hashes — effectively
random — so parquet row-group statistics on the parts themselves cannot
prune a point lookup: every part's (min, max) spans the whole id space.
``fetch_docs`` therefore fell back to a filtered scan of EVERY part in
every shard, which is fine at fixture scale and absurd at 100 TB (a
snippet request would decompress a whole shard's text column).

This module maintains one small sidecar per shard,
``shards/shard-XXXX/docs_idx.parquet``:

    doc_id  int64   -- SORTED ascending
    file_i  int32   -- index into the ``files`` list (schema metadata)
    rg_i    int32   -- row group within that file
    row_i   int32   -- row within that row group

Because the sidecar is sorted by ``doc_id``, its OWN row-group
statistics are tight, disjoint ranges — a ``filters=[("doc_id", "in",
ids)]`` read prunes to the k covering row groups natively, so a lookup
never loads the index into memory: cost is O(k) tiny index row-groups +
O(k) doc row-groups, independent of shard size.  No driver-side cache,
no per-process state; the sidecar is republished atomically (tmp +
``fsio.replace``) by :func:`build_shard_docs_idx`.

Consistency: the sidecar is rebuilt inside ``build._finalize`` — i.e.
BEFORE the manifest publish that makes any new doc ids reachable — for
build, extend, and compaction alike (compaction ends in ``_finalize``
too).  A reader holding manifest generation N always sees a sidecar
covering generation N's docs; a crash between docs writes and finalize
leaves an old sidecar AND an old manifest, which agree.  If the sidecar
is missing or stale (a file it references is gone), ``fetch_docs``
falls back to the filtered scan, so the index is an accelerator, never
a correctness dependency.

The reference has no doc store at all — its UI re-reads the corpus
parquet through Spark per lookup (``bm25_searcher.py``); Lucene's
stored-fields index is the design analog here.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from . import fsio

DOCS_IDX = "docs_idx.parquet"
IDX_VERSION = 1
# small row groups keep the pruned lookup read tight: 4096 rows of the
# sidecar ~= 64 KB; the footer grows O(n_docs / 4096) entries per shard
IDX_ROW_GROUP = 4096


def _docs_files(docs_dir: str) -> list[str]:
    if not fsio.isdir(docs_dir):
        return []
    return sorted(f for f in fsio.listdir(docs_dir)
                  if f.endswith(".parquet"))


def build_shard_docs_idx(shard_dir: str) -> int:
    """(Re)build one shard's sidecar from its docs parts.  Reads ONLY the
    ``doc_id`` column (plus footers) of each part — O(8 bytes/doc) I/O —
    so a per-shard rebuild task stays cheap even when the text payload is
    hundreds of GB.  Returns the number of indexed rows."""
    docs_dir = os.path.join(shard_dir, "docs")
    files = _docs_files(docs_dir)
    ids_parts: list[np.ndarray] = []
    loc_parts: list[np.ndarray] = []  # (file_i, rg_i, row_i) packed
    for fi, name in enumerate(files):
        pf = fsio.pq_file(os.path.join(docs_dir, name))
        for rg in range(pf.metadata.num_row_groups):
            t = pf.read_row_group(rg, columns=["doc_id"])
            n = t.num_rows
            if not n:
                continue
            ids_parts.append(
                t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64))
            loc = np.empty((3, n), dtype=np.int32)
            loc[0] = fi
            loc[1] = rg
            loc[2] = np.arange(n, dtype=np.int32)
            loc_parts.append(loc)
    if ids_parts:
        ids = np.concatenate(ids_parts)
        loc = np.concatenate(loc_parts, axis=1)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        loc = loc[:, order]
    else:
        ids = np.empty(0, dtype=np.int64)
        loc = np.empty((3, 0), dtype=np.int32)
    table = pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "file_i": pa.array(loc[0], pa.int32()),
         "rg_i": pa.array(loc[1], pa.int32()),
         "row_i": pa.array(loc[2], pa.int32())})
    table = table.replace_schema_metadata(
        {"files": json.dumps(files), "version": str(IDX_VERSION)})
    tmp = os.path.join(shard_dir, DOCS_IDX + ".tmp")
    fsio.pq_write_table(table, tmp, row_group_size=IDX_ROW_GROUP)
    fsio.replace(tmp, os.path.join(shard_dir, DOCS_IDX))
    return int(ids.size)


def lookup_shard_docs(shard_dir: str, wanted: list[int],
                      columns: list[str] | None = None
                      ) -> dict[int, dict] | None:
    """Point-read ``wanted`` ids from one shard via the sidecar.

    Returns ``{doc_id: row_dict}`` for the ids present (missing ids are
    simply absent), or ``None`` when the sidecar is missing/unreadable/
    stale — the caller falls back to the filtered scan.  ``columns``
    prunes the doc read (e.g. the snippets path needs only ``text``)."""
    idx_path = os.path.join(shard_dir, DOCS_IDX)
    if not fsio.exists(idx_path):
        return None
    try:
        idx = fsio.pq_read_table(
            idx_path, filters=[("doc_id", "in", sorted(set(wanted)))])
    except (OSError, pa.ArrowInvalid):
        return None
    meta = idx.schema.metadata or {}
    try:
        files = json.loads(meta[b"files"])
    except (KeyError, ValueError):
        return None
    out: dict[int, dict] = {}
    if not idx.num_rows:
        return out
    doc_ids = idx["doc_id"].to_numpy(zero_copy_only=False)
    file_i = idx["file_i"].to_numpy(zero_copy_only=False)
    rg_i = idx["rg_i"].to_numpy(zero_copy_only=False)
    row_i = idx["row_i"].to_numpy(zero_copy_only=False)
    docs_dir = os.path.join(shard_dir, "docs")
    # group the hits per (file, row group): one row-group read each
    order = np.lexsort((rg_i, file_i))
    pf_cache: dict[int, object] = {}
    k = 0
    while k < order.size:
        j = k
        fi, rg = int(file_i[order[k]]), int(rg_i[order[k]])
        while j < order.size and file_i[order[j]] == fi \
                and rg_i[order[j]] == rg:
            j += 1
        sel = order[k:j]
        k = j
        if fi >= len(files):
            return None  # stale sidecar
        pf = pf_cache.get(fi)
        if pf is None:
            try:
                pf = fsio.pq_file(os.path.join(docs_dir, files[fi]))
            except (OSError, pa.ArrowInvalid, FileNotFoundError):
                return None  # stale sidecar (part vanished)
            pf_cache[fi] = pf
        if rg >= pf.metadata.num_row_groups:
            return None
        t = pf.read_row_group(rg, columns=columns)
        rows = t.take(pa.array(row_i[sel], pa.int32())).to_pylist()
        for did, row in zip(doc_ids[sel], rows):
            if int(row.get("doc_id", did)) != int(did):
                return None  # stale sidecar (part rewritten)
            out[int(did)] = row
    return out
