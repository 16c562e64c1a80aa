"""Index build pipeline: pages parquet -> cleaned docs -> partial postings
-> salted term shuffle -> compressed block-max segments + manifest.

Ray-Data-first re-expression of the reference's offline chain
(clean ``CoreDataCleaner.scala:23-37`` -> features ``bm25_precompute.py``)
with a real inverted index instead of the reference's forward index
(``bm25_precompute.py:86-90`` stores doc->term_freqs maps; we store
term->postings — the point of the north rule).

Physical plan per shard (SURVEY.md §7.3):

  phase 1:  read_parquet(pages, columns=[doc_id,url,html])
              -> map_batches(ExtractDocs, actor pool)       [CPU-bound]
              -> write_parquet(docs/)                        [checkpoint]
  global :  N, avg_dl from docs doc_len column (column-pruned read)
  phase 2:  read_parquet(docs, columns=[doc_id,text,doc_len])
              -> map_batches(PartialPostingsBuilder, actor pool)
              -> groupby(term, salt)                         [THE shuffle]
              -> map_groups(merge+encode)
              -> write_parquet(seg/)                         [checkpoint]

The docs/ parquet is the deliberate streaming-safe branch point: phase 2
re-reads only (doc_id, text, doc_len) with projection pushdown instead of
either materializing tokens in the object store or running extraction
twice.  Each shard's shuffle is independent, which both bounds shuffle size
and gives shard-granular resume (state/checkpoint.py).
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions import bm25
from ..functions.codec import BLOCK_SIZE, encode_postings
from ..functions.extract import EXTRACTOR_VERSION
from ..functions.tokenize import TOKENIZER_VERSION
from ..stages.spimi import ExtractDocs, PartialPostingsBuilder
from ..state import checkpoint as ckpt

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("df", pa.int64()),
    ("doc_bytes", pa.binary()),
    ("tf_bytes", pa.binary()),
    ("block_first", pa.list_(pa.int64())),
    ("block_last", pa.list_(pa.int64())),
    ("block_doc_off", pa.list_(pa.int32())),
    ("block_tf_off", pa.list_(pa.int32())),
    ("block_max_tfnorm", pa.list_(pa.float32())),
    ("max_tfnorm", pa.float32()),
])


@dataclass(frozen=True)
class BuildParams:
    num_shards: int = 1
    shard_parallelism: int = 4   # concurrent shard pipelines (driver threads)
    num_salts: int = 16
    head_df_frac: float = 0.05
    merge_parallelism: int = 0   # term-shuffle output partitions; 0 = #CPUs
    extract_batch_size: int = 256
    postings_batch_size: int = 4096
    k1: float = bm25.K1
    b: float = bm25.B
    block_size: int = BLOCK_SIZE


def _ncpu() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def make_merge_fn(avg_dl: float):
    """Per-(term, salt) merge: k-way concat of sorted partial lists ->
    delta+varint encoded block-max postings row."""

    def merge(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        salt = group["salt"][0].as_py()
        doc = pc.list_flatten(group["doc_ids"]).to_numpy(zero_copy_only=False)
        tf = pc.list_flatten(group["tfs"]).to_numpy(zero_copy_only=False)
        dl = pc.list_flatten(group["dls"]).to_numpy(zero_copy_only=False)
        order = np.argsort(doc, kind="stable")
        doc, tf, dl = doc[order], tf[order], dl[order]
        if doc.size > 1 and (np.diff(doc) <= 0).any():
            raise ValueError(
                f"duplicate doc_id in postings for term={term!r}; "
                "run dedup (stages/dedup.py) before indexing")
        tfn = bm25.tf_norm_vec(tf, dl, avg_dl)
        enc = encode_postings(doc.astype(np.int64), tf.astype(np.int64), tfn)
        return pa.table({
            "term": pa.array([term], pa.string()),
            "salt": pa.array([salt], pa.int32()),
            "df": pa.array([enc.df], pa.int64()),
            "doc_bytes": pa.array([enc.doc_bytes], pa.binary()),
            "tf_bytes": pa.array([enc.tf_bytes], pa.binary()),
            "block_first": pa.array([enc.block_first.tolist()], pa.list_(pa.int64())),
            "block_last": pa.array([enc.block_last.tolist()], pa.list_(pa.int64())),
            "block_doc_off": pa.array([enc.block_doc_off.tolist()], pa.list_(pa.int32())),
            "block_tf_off": pa.array([enc.block_tf_off.tolist()], pa.list_(pa.int32())),
            "block_max_tfnorm": pa.array([enc.block_max_tfnorm.tolist()], pa.list_(pa.float32())),
            "max_tfnorm": pa.array([np.float32(enc.block_max_tfnorm.max()) if enc.df else np.float32(0)],
                                   pa.float32()),
        })

    return merge


def _shard_inputs(input_paths: list[str], num_shards: int) -> list[list[str]]:
    """Deterministic shard assignment: sorted file list, round-robin."""
    files = sorted(input_paths)
    shards: list[list[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(files):
        shards[i % num_shards].append(f)
    return [s for s in shards if s]


def _run_shards(fn, shard_items: list[tuple[int, list[str]]],
                parallelism: int) -> None:
    """Run per-shard work concurrently from driver threads (each item is an
    independent Ray Data pipeline writing to its own checkpoint dir)."""
    from concurrent.futures import ThreadPoolExecutor
    workers = max(1, min(parallelism, len(shard_items)))
    if workers == 1:
        for sid, files in shard_items:
            fn(sid, files)
        return
    # Ray's read path lazily does `from fsspec.implementations.http import
    # HTTPFileSystem` on every read_parquet; in this environment that module
    # FAILS to import (no aiohttp), so the attempt repeats every call and
    # concurrent attempts from shard threads race in the import machinery
    # (deadlock-avoidance surfaces a partial-module ImportError that Ray's
    # `except ModuleNotFoundError` does not catch).  Register a benign
    # stand-in once so the import succeeds and caches; Ray only uses the
    # class in isinstance checks.
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types
        stub = types.ModuleType("fsspec.implementations.http")
        stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
        sys.modules["fsspec.implementations.http"] = stub
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(fn, sid, files) for sid, files in shard_items]
        for f in futs:
            f.result()  # surface the first exception


def _list_parquet(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet"))
    return [path]


def build_index(pages_path: str | list[str], index_dir: str,
                params: BuildParams = BuildParams()) -> dict:
    """Build (or resume) the full index under ``index_dir``; returns manifest."""
    t0 = time.time()
    paths = []
    for p in ([pages_path] if isinstance(pages_path, str) else pages_path):
        paths.extend(_list_parquet(p))
    shards = _shard_inputs(paths, params.num_shards)
    os.makedirs(index_dir, exist_ok=True)

    # ---- phase 1: extract + doc stats, per shard (resumable) --------------
    # Pending shards run CONCURRENTLY from driver threads: each shard is an
    # independent Dataset pipeline (own checkpoint dir), and Ray's scheduler
    # shares the cluster between them — this removes the serialized
    # per-pipeline fixed cost that dominated sequential shard builds while
    # keeping shard-granular resume.
    def _phase1(sid: int, files: list[str]) -> None:
        sd = ckpt.shard_dir(index_dir, sid)
        docs_dir = os.path.join(sd, "docs")
        if ckpt.is_done(docs_dir):
            return
        t1 = time.time()
        schema_names = pq.ParquetFile(files[0]).schema_arrow.names
        cols = [c for c in ("doc_id", "url", "html") if c in schema_names]
        if "html" not in schema_names:  # pre-extracted corpus (text input)
            cols.append("text")
        ds = rd.read_parquet(files, columns=cols)
        # ExtractDocs is stateless -> task pool (an instance, not the class):
        # elastic scheduling, no actor-pool cold start (which dominated small
        # builds: ~13s of the first shard's wall time was pool spin-up).
        ds = ds.map_batches(ExtractDocs(), batch_format="pyarrow",
                            batch_size=params.extract_batch_size)
        os.makedirs(docs_dir, exist_ok=True)
        ds.write_parquet(docs_dir)
        # per-shard doc stats from the written column (projection-pruned read)
        stat = pq.read_table(docs_dir, columns=["doc_len"])
        n_docs = stat.num_rows
        sum_dl = int(pc.sum(stat["doc_len"]).as_py() or 0)
        ckpt.update_shard_record(index_dir, sid, input_files=files,
                                 n_docs=n_docs, sum_dl=sum_dl,
                                 phase1_secs=round(time.time() - t1, 3))
        ckpt.mark_done(docs_dir)

    _run_shards(_phase1, list(enumerate(shards)), params.shard_parallelism)

    # ---- global stats ------------------------------------------------------
    recs = [ckpt.read_shard_record(index_dir, sid) for sid in range(len(shards))]
    n_total = sum(r["n_docs"] for r in recs)
    sum_dl = sum(r["sum_dl"] for r in recs)
    avg_dl = (sum_dl / n_total) if n_total else 1.0
    ckpt.write_json(os.path.join(index_dir, "stats.json"),
                    {"n_docs": n_total, "sum_dl": sum_dl, "avg_dl": avg_dl})

    # ---- phase 2: partial postings -> salted shuffle -> segments ----------
    # Runs only after EVERY shard's phase 1, because block-max bounds are
    # computed against the GLOBAL avg_dl (a shard-local average would break
    # the WAND upper-bound invariant).
    merge = make_merge_fn(avg_dl)

    def _phase2(sid: int, _files: list[str]) -> None:
        sd = ckpt.shard_dir(index_dir, sid)
        seg_dir = os.path.join(sd, "seg")
        if ckpt.is_done(seg_dir):
            return
        t2 = time.time()
        docs = rd.read_parquet(os.path.join(sd, "docs"),
                               columns=["doc_id", "text", "doc_len"])
        partials = docs.map_batches(
            PartialPostingsBuilder(num_salts=params.num_salts,
                                   head_df_frac=params.head_df_frac),
            batch_format="pyarrow", batch_size=params.postings_batch_size)
        # the sort-based groupby emits one output partition per input block;
        # partial-posting rows are few but heavy, so widen explicitly or the
        # merge stage runs ~5-way on a 32-core node
        partials = partials.repartition(params.merge_parallelism or _ncpu())
        segs = partials.groupby(["term", "salt"]).map_groups(
            merge, batch_format="pyarrow")
        os.makedirs(seg_dir, exist_ok=True)
        segs.write_parquet(seg_dir)
        meta = pq.read_table(seg_dir, columns=["df"])
        ckpt.update_shard_record(index_dir, sid,
                                 n_term_shards=meta.num_rows,
                                 n_postings=int(pc.sum(meta["df"]).as_py() or 0),
                                 phase2_secs=round(time.time() - t2, 3))
        ckpt.mark_done(seg_dir)

    _run_shards(_phase2, list(enumerate(shards)), params.shard_parallelism)

    # ---- global term dictionary -------------------------------------------
    # (term -> global df) so shard-subset readers / query actors can score
    # with the GLOBAL idf; small (one row per term) and cheap to rebuild.
    seg_tables = []
    for sid in range(len(shards)):
        seg_tables.append(pq.read_table(
            os.path.join(ckpt.shard_dir(index_dir, sid), "seg"),
            columns=["term", "df"]))
    termdict = pa.concat_tables(seg_tables).group_by("term") \
        .aggregate([("df", "sum")]).rename_columns(["term", "df"])
    pq.write_table(termdict.sort_by("term"),
                   os.path.join(index_dir, "termdict.parquet"))

    # ---- manifest ----------------------------------------------------------
    recs = [ckpt.read_shard_record(index_dir, sid) for sid in range(len(shards))]
    manifest = {
        "format_version": 1,
        "tokenizer_version": TOKENIZER_VERSION,
        "extractor_version": EXTRACTOR_VERSION,
        "params": asdict(params),
        "n_docs": n_total,
        "avg_dl": avg_dl,
        "n_shards": len(shards),
        "shards": recs,
        "build_secs": round(time.time() - t0, 3),
        "docs_per_sec": round(n_total / max(1e-9, time.time() - t0), 1),
    }
    ckpt.write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest
