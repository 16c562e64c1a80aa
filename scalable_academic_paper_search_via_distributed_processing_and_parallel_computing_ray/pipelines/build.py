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
twice.

Each phase runs as ONE Dataset pipeline over every *pending* shard, tagging
rows with their shard id (``sid``) and fanning the output back out with a
hive-partitioned write (``partition_cols=["sid"]`` -> renamed into the
per-shard checkpoint dirs).  Per-shard pipelines paid the pipeline fixed
cost (scheduling + shuffle latency floors, ~2-10 s each) once per shard;
measured on an 80k-page corpus the single-pipeline wave is ~5x faster while
keeping the same shard-granular resume layout: already-done shards are
excluded from the wave, and a restart after a mid-wave crash redoes only
that wave.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions import bm25
from ..functions.codec import (BLOCK_SIZE, FORMAT_VERSION, EncodedPostings,
                               _block_geometry, decode_positions,
                               decode_postings, decode_postings_multi,
                               encode_postings, encode_postings_multi,
                               expand_dl_lower_bounds)
from ..functions.extract import EXTRACTOR_VERSION
from ..functions.textstats import HASH_VERSION
from ..functions.tokenize import TOKENIZER_VERSION
from ..sources import fragments
from ..stages.groupagg import sorted_groupby_agg
from ..stages.spimi import ExtractDocs, PartialPostingsBuilder
from ..state import checkpoint as ckpt
from ..state import fsio
from ..state import termdict as termdict_mod

# docs parts are written with small row groups so a sidecar-resolved
# point read (state/docstore.py) decompresses ~1k rows of text, not a
# whole multi-thousand-row part; scans pay only footer overhead for it
DOCS_ROW_GROUP = 1024

# seg row-group granularity bounds TWO reads: a query's per-term
# filtered read decompresses one row group per matching term, and a
# compaction range task's boundary row groups are read by two adjacent
# tasks — both costs scale with rows/group (measured: 128-row groups
# made boundary duplication ~33% of the purge-merge's bytes at 63
# tasks x 67 files).  32 stays well above the one-row-per-group
# metadata floor that motivated coalescing in the first place.
SEG_ROW_GROUP = 32

DOCS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("text", pa.string()),
    ("doc_len", pa.int32()),
])

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
    ("block_max_tf", pa.list_(pa.int64())),
    ("block_min_dl", pa.list_(pa.int32())),
    ("pos_bytes", pa.binary()),             # b"" when built without positions
    ("block_pos_off", pa.list_(pa.int32())),
    # v4 impact Pareto frontier (codec.block_impact_frontier): flat (tf, dl)
    # pairs block-major + pairs-per-block, giving WAND the EXACT per-block
    # max doc score under any current avg_dl (extend-safe)
    ("imp_tf", pa.list_(pa.int64())),
    ("imp_dl", pa.list_(pa.int32())),
    ("imp_n", pa.list_(pa.int32())),
])


@dataclass(frozen=True)
class BuildParams:
    num_shards: int = 1
    num_salts: int = 16
    head_df_frac: float = 0.05
    merge_parallelism: int = 0   # term-shuffle output partitions; 0 = #CPUs
    extract_batch_size: int = 256
    postings_batch_size: int = 4096
    k1: float = bm25.K1
    b: float = bm25.B
    block_size: int = BLOCK_SIZE
    # record token positions (stop-filtered sequence) in the segments so
    # the reader can serve phrase queries.  Off by default: positions
    # roughly double the posting payload — at open-web scale you opt in
    # per index, you don't pay for it everywhere.
    positions: bool = False
    # summed per-shard vocab rows (parquet footers only) above which the
    # termdict finalize aggregates DISTRIBUTED instead of on the driver
    # (SCALE.md switch point 1 — same partitioned output layout either
    # way; 0 forces distributed, used by tests)
    termdict_dist_threshold: int = 4_000_000
    # doc id scheme (SCALE.md switch point 2).  "auto" = input doc_id
    # column when present, else 62-bit url hash (birthday bound ~10^5
    # collisions at 10^12 docs); "sharded" = collision-free-by-
    # construction (file_seq << 40) | row_in_file from the append-only
    # file ledger (sources/fragments.py) — the web-scale setting.
    doc_id_mode: str = "auto"
    # verify global doc_id uniqueness at finalize (one distributed
    # sorted count over the docs checkpoints): catches url-hash
    # collisions / duplicate inputs loudly instead of silently merging
    # two documents.  Off by default — "sharded" ids can't collide.
    verify_doc_ids: bool = False


def _ncpu() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


def merge_postings(group: pa.Table) -> pa.Table:
    """Per-(sid, term, salt) merge: k-way concat of sorted partial lists ->
    delta+varint encoded postings row with raw (max_tf, min_dl) block bounds.
    Needs NO global state (the avg_dl-dependent bound is derived at read
    time), so segment shards stay valid when the index is later extended."""
    sid = group["sid"][0].as_py()
    term = group["term"][0].as_py()
    salt = group["salt"][0].as_py()
    doc = pc.list_flatten(group["doc_ids"]).to_numpy(zero_copy_only=False)
    tf = pc.list_flatten(group["tfs"]).to_numpy(zero_copy_only=False)
    dl = pc.list_flatten(group["dls"]).to_numpy(zero_copy_only=False)
    flat_pos = (pc.list_flatten(group["poss"])
                .to_numpy(zero_copy_only=False).astype(np.int64)
                if "poss" in group.column_names
                else np.zeros(0, np.int64))
    order = np.argsort(doc, kind="stable")
    poss_sorted = None
    if flat_pos.size:
        # per-posting position slices travel with their posting through the
        # doc sort: gather each reordered posting's [start, start+tf) range
        tf64 = tf.astype(np.int64)
        pstart = np.concatenate(([0], np.cumsum(tf64)))[:-1]
        lens = tf64[order]
        within = (np.arange(int(lens.sum()))
                  - np.repeat(np.concatenate(([0], np.cumsum(lens)))[:-1], lens))
        poss_sorted = flat_pos[np.repeat(pstart[order], lens) + within]
    doc, tf, dl = doc[order], tf[order], dl[order]
    if doc.size > 1 and (np.diff(doc) <= 0).any():
        raise ValueError(
            f"duplicate doc_id in postings for term={term!r}; "
            "run dedup (stages/dedup.py) before indexing")
    enc = encode_postings(doc.astype(np.int64), tf.astype(np.int64),
                          dl.astype(np.int64), poss_sorted)
    return pa.table({
        "sid": pa.array([sid], pa.int32()),
        "term": pa.array([term], pa.string()),
        "salt": pa.array([salt], pa.int32()),
        "df": pa.array([enc.df], pa.int64()),
        "doc_bytes": pa.array([enc.doc_bytes], pa.binary()),
        "tf_bytes": pa.array([enc.tf_bytes], pa.binary()),
        "block_first": pa.array([enc.block_first.tolist()], pa.list_(pa.int64())),
        "block_last": pa.array([enc.block_last.tolist()], pa.list_(pa.int64())),
        "block_doc_off": pa.array([enc.block_doc_off.tolist()], pa.list_(pa.int32())),
        "block_tf_off": pa.array([enc.block_tf_off.tolist()], pa.list_(pa.int32())),
        "block_max_tf": pa.array([enc.block_max_tf.tolist()], pa.list_(pa.int64())),
        "block_min_dl": pa.array([enc.block_min_dl.tolist()], pa.list_(pa.int32())),
        "pos_bytes": pa.array([enc.pos_bytes], pa.binary()),
        "block_pos_off": pa.array(
            [enc.block_pos_off.tolist() if enc.block_pos_off is not None
             else []], pa.list_(pa.int32())),
        "imp_tf": pa.array([enc.imp_tf.tolist()], pa.list_(pa.int64())),
        "imp_dl": pa.array([enc.imp_dl.tolist()], pa.list_(pa.int32())),
        "imp_n": pa.array([enc.imp_n.tolist()], pa.list_(pa.int32())),
    })


class DocsCheckpointWriter:
    """Pass-through ``map_batches`` stage that tees the docs checkpoint:
    writes each batch into ``root/sid=K/`` hive layout as a side effect and
    returns the batch unchanged, so extraction output flows STRAIGHT into
    the postings builder — one pipeline, one fixed cost — while the docs
    parquet checkpoint (resume + re-shard + point-lookup source) still gets
    written without a separate wave or a docs re-read.

    Idempotent under Ray task retries: filenames are content-addressed
    (md5 of the batch's doc_id bytes), so a retried task overwrites its own
    earlier files with identical content instead of duplicating rows, and
    each file appears atomically via tmp + ``os.replace``."""

    def __init__(self, root: str):
        self.root = root

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib
        sids = (batch["sid"].to_numpy(zero_copy_only=False)
                if "sid" in batch.column_names
                else np.zeros(batch.num_rows, dtype=np.int32))
        out = batch.select(
            [c for c in batch.column_names if c in DOCS_SCHEMA.names])
        for sid in np.unique(sids):
            part = out.filter(pa.array(sids == sid))
            d = os.path.join(self.root, f"sid={int(sid)}")
            fsio.makedirs(d, exist_ok=True)
            h = hashlib.md5(
                part["doc_id"].to_numpy(zero_copy_only=False).tobytes())
            # fold the text payload into the tag (ADVICE r4): two batches
            # carrying the SAME doc_id sequence but different content (a
            # duplicate-id corpus in auto mode without verify_doc_ids)
            # must not collide on a filename and last-writer-win
            if "text" in part.column_names:
                for chunk in part["text"].chunks:
                    buf = chunk.buffers()[-1]
                    if buf is not None:
                        h.update(buf)
            tag = h.hexdigest()[:16]
            tmp = os.path.join(d, f".part-{tag}.parquet.tmp")
            fsio.pq_write_table(part, tmp, row_group_size=DOCS_ROW_GROUP)
            fsio.replace(tmp, os.path.join(d, f"part-{tag}.parquet"))
        return batch


def _shard_inputs(input_paths: list[str], num_shards: int) -> list[list[str]]:
    """Deterministic shard assignment: sorted file list, round-robin."""
    files = sorted(input_paths)
    shards: list[list[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(files):
        shards[i % num_shards].append(f)
    return [s for s in shards if s]


def _threaded(fn, items, workers: int = 8):
    """Driver-side helper: run per-shard metadata reads concurrently —
    pyarrow releases the GIL, and these serial loops were ~10% of a 32-CPU
    build's wall time at 5M docs."""
    from concurrent.futures import ThreadPoolExecutor
    if len(items) <= 1:
        return [fn(x) for x in items]
    with ThreadPoolExecutor(max_workers=min(workers, len(items))) as ex:
        return list(ex.map(fn, items))


def _publish_partitions(tmp_root: str, pending: list[int],
                        dest_for: dict[int, str],
                        empty_schema: pa.Schema) -> None:
    """Move each ``sid=K`` hive dir of a wave write into its shard's
    checkpoint dir; shards with no output rows get an empty-table file so
    downstream readers see a schema."""
    import shutil
    for sid in pending:
        dest = dest_for[sid]
        fsio.rmtree(dest, ignore_errors=True)
        fsio.makedirs(os.path.dirname(dest), exist_ok=True)
        src = os.path.join(tmp_root, f"sid={sid}")
        if fsio.isdir(src):
            fsio.replace(src, dest)
        else:
            fsio.makedirs(dest, exist_ok=True)
            fsio.pq_write_table(empty_schema.empty_table(),
                           os.path.join(dest, "empty.parquet"))
    fsio.rmtree(tmp_root, ignore_errors=True)


_JSON_EXTS = (".jsonl", ".json", ".jsonl.gz", ".json.gz")


def _list_parquet(path: str) -> list[str]:
    if fsio.isdir(path):
        return sorted(
            os.path.join(path, f) for f in fsio.listdir(path)
            if f.endswith(".parquet") or f.endswith(_JSON_EXTS))
    return [path]


def _input_schema_names(first_file: str) -> list[str]:
    """Column names of the input corpus (parquet footer, or the first JSONL
    record — the reference's ingest is schema-inferred line JSON,
    ``CoreDataCleaner.scala:23-25``)."""
    if first_file.endswith(_JSON_EXTS):
        import gzip
        import json as _json
        opener = gzip.open if first_file.endswith(".gz") else open
        with opener(first_file, "rt") as f:
            return list(_json.loads(f.readline()).keys())
    return list(pq.ParquetFile(first_file).schema_arrow.names)


def _read_corpus(files: list[str], cols: list[str],
                 num_blocks: int | None = None) -> rd.Dataset:
    """read_parquet with projection pushdown, or read_json for JSONL corpora
    (SURVEY.md §2.1 S1 — JSONL has no column pruning; projection happens in
    the first map).  ``num_blocks`` pins the read parallelism — the fused
    build wave uses it to size the sort-shuffle partition count at the
    READ (free) instead of repartitioning heavy partial postings (an extra
    all-to-all that cost ~40% at low parallelism, measured x256 @ 8 CPUs)."""
    if files[0].endswith(_JSON_EXTS):
        return rd.read_json(files, include_paths=True)
    if num_blocks is not None:
        return rd.read_parquet(files, columns=cols, include_paths=True,
                               override_num_blocks=num_blocks)
    return rd.read_parquet(files, columns=cols, include_paths=True)


def _fused_wave(index_dir: str, shard_map: dict[int, list[str]],
                params: BuildParams, pending: list[int],
                docs_dir_for: dict[int, str],
                seg_dir_for: dict[int, str]) -> None:
    """ONE pipeline for shards needing both phases: read pages -> extract
    -> docs checkpoint tee (:class:`DocsCheckpointWriter`) -> partial
    postings -> salted (sid, term, salt) shuffle -> encoded segments.
    Publishes docs dirs first, then segment dirs; done-markers stamp only
    after both, so a crash anywhere re-runs the whole wave (the wave is the
    unit of loss — SCALE.md)."""
    import shutil
    t0 = time.time()
    all_files = [f for sid in pending for f in shard_map[sid]]
    path_to_sid = {f: sid for sid in pending for f in shard_map[sid]}
    schema_names = _input_schema_names(all_files[0])
    cols = [c for c in ("doc_id", "url", "html") if c in schema_names]
    if "html" not in schema_names:  # pre-extracted corpus (text input)
        cols.append("text")
    docs_tmp = os.path.join(index_dir, "_wave_docs")
    seg_tmp = os.path.join(index_dir, "_wave_seg")
    fsio.rmtree(docs_tmp, ignore_errors=True)
    fsio.rmtree(seg_tmp, ignore_errors=True)

    # Block-count discipline: the sort-based groupby emits one partition
    # per input block, so the merge width is decided HERE, at the read —
    # where changing it is free — not by repartitioning the heavy partial
    # postings afterwards (measured x256: that extra all-to-all cost ~40%
    # wall at 8 CPUs while Ray's default ~200-task parallelism floor made
    # the sort overhead-bound at 32).  One read task per input file,
    # floored at 2x cores for small many-shard builds; files are the
    # natural shard-layout unit, so at web scale this is just "one block
    # per crawl file".
    target = params.merge_parallelism or _ncpu()
    num_blocks = max(2 * target, len(all_files))
    if params.doc_id_mode == "sharded":
        # position-based collision-free ids (SCALE.md switch point 2):
        # read via row-group fragments that synthesize doc_id from the
        # generation-persistent file ledger; any input doc_id column is
        # deliberately ignored
        if all_files[0].endswith(_JSON_EXTS):
            raise ValueError(
                "doc_id_mode='sharded' requires parquet input (row-group "
                "offsets drive the id assignment); JSONL corpora use the "
                "url-hash scheme")
        seq_of = {f: i for i, f in
                  enumerate(fragments.load_ledger(index_dir))}
        canon_files = [fragments.canon(f) for f in all_files]
        # the fragment reader emits canonical spellings in the ``path``
        # column; ExtractDocs' sid lookup must accept them too
        path_to_sid.update({cf: path_to_sid[f]
                            for f, cf in zip(all_files, canon_files)})
        missing = [f for f in canon_files if f not in seq_of]
        if missing:
            raise RuntimeError(
                f"{len(missing)} input files absent from the doc-id "
                "ledger — build_index/extend_index must extend it first")
        ds = fragments.read_fragments(
            canon_files, [c for c in cols if c != "doc_id"], seq_of,
            num_blocks=num_blocks)
    else:
        ds = _read_corpus(all_files, cols, num_blocks=num_blocks)
    ds = ds.map_batches(ExtractDocs(path_to_sid=path_to_sid),
                        batch_format="pyarrow",
                        batch_size=params.extract_batch_size)
    ds = ds.map_batches(DocsCheckpointWriter(docs_tmp),
                        batch_format="pyarrow",
                        batch_size=params.postings_batch_size)
    partials = ds.map_batches(
        PartialPostingsBuilder(num_salts=params.num_salts,
                               head_df_frac=params.head_df_frac,
                               positions=params.positions),
        batch_format="pyarrow", batch_size=params.postings_batch_size)
    segs = partials.groupby(["sid", "term", "salt"]).map_groups(
        merge_postings, batch_format="pyarrow")
    # coalesce one-row map_groups blocks before the write (row-group
    # metadata floor)
    segs = segs.map_batches(lambda b: b, batch_format="pyarrow",
                            batch_size=SEG_ROW_GROUP)
    _fs, _p = fsio.ray_fs_path(seg_tmp)
    segs.write_parquet(_p, partition_cols=["sid"], filesystem=_fs)
    if os.environ.get("GRAFT_BUILD_STATS"):
        print("=== fused wave stats ===\n", segs.stats())
    wave = round(time.time() - t0, 3)
    _publish_partitions(docs_tmp, pending, docs_dir_for, DOCS_SCHEMA)
    _publish_partitions(seg_tmp, pending, seg_dir_for, SEGMENT_SCHEMA)
    ts = time.time()

    def _stats(sid: int) -> tuple[int, int, int, int, int, int]:
        stat = fsio.pq_read_table(docs_dir_for[sid], columns=["doc_len"])
        meta = fsio.pq_read_table(seg_dir_for[sid], columns=["df"])
        seg_bytes = sum(
            fsio.getsize(os.path.join(seg_dir_for[sid], f))
            for f in fsio.listdir(seg_dir_for[sid]) if f.endswith(".parquet"))
        return (sid, stat.num_rows,
                int(pc.sum(stat["doc_len"]).as_py() or 0),
                meta.num_rows, int(pc.sum(meta["df"]).as_py() or 0),
                seg_bytes)

    for sid, n_docs, sum_dl, n_rows, n_post, seg_bytes in \
            _threaded(_stats, pending):
        ckpt.update_shard_record(
            index_dir, sid, input_files=shard_map[sid],
            n_docs=n_docs, sum_dl=sum_dl,
            n_term_shards=n_rows, n_postings=n_post, seg_bytes=seg_bytes,
            bytes_per_posting=round(seg_bytes / max(1, n_post), 3),
            format_version=FORMAT_VERSION, positions=params.positions,
            doc_id_mode=params.doc_id_mode, fused_wave_secs=wave)
        ckpt.mark_done(docs_dir_for[sid])
        ckpt.mark_done(seg_dir_for[sid])
    ckpt.update_shard_record(index_dir, pending[0],
                             wave_stats_secs=round(time.time() - ts, 3))


def _build_shards(index_dir: str, shard_map: dict[int, list[str]],
                  params: BuildParams) -> None:
    """Run phase 1 + phase 2 for the given {shard_id: input files}, skipping
    shards whose done-markers exist.  Both phases are avg_dl-independent
    (block bounds store raw max_tf/min_dl), so this is safe both for a fresh
    build and for appending new shards to an existing index."""
    if params.k1 != bm25.K1 or params.b != bm25.B:
        raise NotImplementedError(
            "per-index BM25 parameters are not wired through scoring; "
            "k1/b are fixed in functions/bm25.py (manifest records them)")
    if params.block_size != BLOCK_SIZE:
        raise NotImplementedError(
            "posting block size is fixed at codec.BLOCK_SIZE "
            f"({BLOCK_SIZE}); BuildParams.block_size only documents it")
    shard_ids = sorted(shard_map)
    # resume safety: a done shard must have been built from the SAME input
    # files — otherwise the marker would silently serve stale data for a
    # changed corpus (use a fresh index_dir, or extend_index for appends)
    for sid in shard_ids:
        docs_dir = os.path.join(ckpt.shard_dir(index_dir, sid), "docs")
        if ckpt.is_done(docs_dir):
            rec = ckpt.read_shard_record(index_dir, sid)
            if rec.get("input_files") != shard_map[sid]:
                raise ValueError(
                    f"shard {sid} was built from different input files; "
                    "refusing to resume over a changed corpus "
                    f"(recorded {len(rec.get('input_files', []))} files, "
                    f"requested {len(shard_map[sid])})")
        # a done SEGMENT shard must carry the current codec format —
        # resuming over old segments would skip the rebuild and then
        # _finalize would stamp the NEW version on v(N-1) payloads
        seg_dir = os.path.join(ckpt.shard_dir(index_dir, sid), "seg")
        if ckpt.is_done(seg_dir):
            rec = ckpt.read_shard_record(index_dir, sid)
            if rec.get("format_version") != FORMAT_VERSION:
                raise ValueError(
                    f"shard {sid} segments are format "
                    f"v{rec.get('format_version')!r}, this build writes "
                    f"v{FORMAT_VERSION}: incompatible — use a fresh "
                    "index_dir (or delete this one) to rebuild")
            if bool(rec.get("positions")) != params.positions:
                raise ValueError(
                    f"shard {sid} segments were built with "
                    f"positions={bool(rec.get('positions'))}, this build "
                    f"requests positions={params.positions}: use a fresh "
                    "index_dir to change the positional flag")
            if rec.get("doc_id_mode", "auto") != params.doc_id_mode:
                raise ValueError(
                    f"shard {sid} was built with doc_id_mode="
                    f"{rec.get('doc_id_mode', 'auto')!r}, this build "
                    f"requests {params.doc_id_mode!r}: mixing id schemes "
                    "re-ids documents — use a fresh index_dir")

    docs_dir_for = {sid: os.path.join(ckpt.shard_dir(index_dir, sid), "docs")
                    for sid in shard_ids}
    seg_dir_for = {sid: os.path.join(ckpt.shard_dir(index_dir, sid), "seg")
                   for sid in shard_ids}
    pending_docs = [sid for sid in shard_ids
                    if not ckpt.is_done(docs_dir_for[sid])]
    pending_segs = [sid for sid in shard_ids
                    if not ckpt.is_done(seg_dir_for[sid])]

    # ---- fused wave: shards needing BOTH docs and segments (the common
    # fresh-build / extend case) run extract -> docs checkpoint (side-effect
    # tee) -> partials -> shuffle -> segments as ONE pipeline: the two-wave
    # split paid the per-pipeline fixed cost (scheduling + shuffle ramp,
    # ~5.5 s measured in BASELINE.md) twice per build AND re-read the docs
    # parquet it had just written.  Phases overlap naturally now — the term
    # shuffle's map side consumes extraction output as it streams.
    fused = [sid for sid in pending_docs if sid in set(pending_segs)]
    if fused:
        _fused_wave(index_dir, shard_map, params, fused,
                    docs_dir_for, seg_dir_for)

    # ---- phase 1 only: docs pending but segments already done (rare —
    # manual surgery on a built index); keeps the old two-wave path alive
    # for it and for phase-2-only resumes below.
    pending1 = [sid for sid in pending_docs if sid not in set(fused)]
    if pending1:
        t1 = time.time()
        all_files = [f for sid in pending1 for f in shard_map[sid]]
        path_to_sid = {f: sid for sid in pending1 for f in shard_map[sid]}
        schema_names = _input_schema_names(all_files[0])
        cols = [c for c in ("doc_id", "url", "html") if c in schema_names]
        if "html" not in schema_names:  # pre-extracted corpus (text input)
            cols.append("text")
        ds = _read_corpus(all_files, cols)
        # ExtractDocs is stateless -> task pool (an instance, not the class):
        # elastic scheduling, no actor-pool cold start (which dominated small
        # builds: ~13s of the first shard's wall time was pool spin-up).
        ds = ds.map_batches(ExtractDocs(path_to_sid=path_to_sid),
                            batch_format="pyarrow",
                            batch_size=params.extract_batch_size)
        tmp_root = os.path.join(index_dir, "_wave_docs")
        import shutil
        fsio.rmtree(tmp_root, ignore_errors=True)
        _fs, _p = fsio.ray_fs_path(tmp_root)
        ds.write_parquet(_p, partition_cols=["sid"], filesystem=_fs)
        if os.environ.get("GRAFT_BUILD_STATS"):
            print("=== phase-1 wave stats ===\n", ds.stats())
        wave1 = round(time.time() - t1, 3)
        _publish_partitions(tmp_root, pending1, docs_dir_for, DOCS_SCHEMA)
        t1s = time.time()

        def _doc_stats(sid: int) -> tuple[int, int, int]:
            # per-shard doc stats from the written column (projection-pruned)
            stat = fsio.pq_read_table(docs_dir_for[sid], columns=["doc_len"])
            return sid, stat.num_rows, int(pc.sum(stat["doc_len"]).as_py() or 0)

        for sid, n_docs, sum_dl in _threaded(_doc_stats, pending1):
            ckpt.update_shard_record(
                index_dir, sid, input_files=shard_map[sid],
                n_docs=n_docs, sum_dl=sum_dl, phase1_wave_secs=wave1)
            ckpt.mark_done(docs_dir_for[sid])
        ckpt.update_shard_record(index_dir, pending1[0],
                                 phase1_stats_secs=round(time.time() - t1s, 3))

    # ---- phase 2 only: docs done, segments pending (resume after a crash
    # between the old phases, or a deleted/invalidated seg dir) ------------
    pending2 = [sid for sid in pending_segs if sid not in set(fused)]
    if pending2:
        t2 = time.time()
        dir_to_sid = {docs_dir_for[sid]: sid for sid in pending2}
        docs_files = [f for sid in pending2
                      for f in _list_parquet(docs_dir_for[sid])]
        # Merge width is pinned at the READ (one block per docs file,
        # floored at 2x cores) — the sort-based groupby emits one output
        # partition per input block, and sizing blocks here is free while
        # repartitioning the heavy partial postings afterwards paid an
        # extra all-to-all (~40% wall at 8 CPUs, x256 measured) and Ray's
        # ~200-task parallelism floor over-split the sort at 32.  This
        # also closes the ADVICE r3 caveat: override_num_blocks is an
        # exact pin, not a file-count proxy Ray's bundling could defeat.
        target = params.merge_parallelism or _ncpu()
        docs = rd.read_parquet(docs_files,
                               columns=["doc_id", "text", "doc_len"],
                               include_paths=True,
                               override_num_blocks=max(2 * target,
                                                       len(docs_files)))
        partials = docs.map_batches(
            PartialPostingsBuilder(num_salts=params.num_salts,
                                   head_df_frac=params.head_df_frac,
                                   dir_to_sid=dir_to_sid,
                                   positions=params.positions),
            batch_format="pyarrow", batch_size=params.postings_batch_size)
        # shard id is part of the shuffle key: ONE all-to-all covers every
        # pending shard (doc sets are disjoint across shards, so grouping by
        # (sid, term, salt) merges exactly what per-shard shuffles did)
        segs = partials.groupby(["sid", "term", "salt"]).map_groups(
            merge_postings, batch_format="pyarrow")
        # map_groups emits ONE-ROW blocks; written as-is each row becomes
        # its own parquet row group (~570 per file), which made segment
        # reads metadata-bound (~5x slower).  Coalesce before the write.
        segs = segs.map_batches(lambda b: b, batch_format="pyarrow",
                                batch_size=SEG_ROW_GROUP)
        tmp_root = os.path.join(index_dir, "_wave_seg")
        import shutil
        fsio.rmtree(tmp_root, ignore_errors=True)
        _fs, _p = fsio.ray_fs_path(tmp_root)
        segs.write_parquet(_p, partition_cols=["sid"], filesystem=_fs)
        if os.environ.get("GRAFT_BUILD_STATS"):
            print("=== phase-2 wave stats ===\n", segs.stats())
        wave2 = round(time.time() - t2, 3)
        _publish_partitions(tmp_root, pending2, seg_dir_for, SEGMENT_SCHEMA)
        t2s = time.time()

        def _seg_stats(sid: int) -> tuple[int, int, int, int]:
            meta = fsio.pq_read_table(seg_dir_for[sid], columns=["df"])
            seg_bytes = sum(
                fsio.getsize(os.path.join(seg_dir_for[sid], f))
                for f in fsio.listdir(seg_dir_for[sid]) if f.endswith(".parquet"))
            return (sid, meta.num_rows,
                    int(pc.sum(meta["df"]).as_py() or 0), seg_bytes)

        for sid, n_rows, n_post, seg_bytes in _threaded(_seg_stats, pending2):
            ckpt.update_shard_record(
                index_dir, sid, n_term_shards=n_rows,
                n_postings=n_post, seg_bytes=seg_bytes,
                bytes_per_posting=round(seg_bytes / max(1, n_post), 3),
                format_version=FORMAT_VERSION,
                positions=params.positions,
                phase2_wave_secs=wave2)
            ckpt.mark_done(seg_dir_for[sid])
        ckpt.update_shard_record(index_dir, pending2[0],
                                 phase2_stats_secs=round(time.time() - t2s, 3))


def _verify_unique_doc_ids(index_dir: str, n_shards: int) -> None:
    """Global doc_id uniqueness over every shard's docs checkpoint: one
    distributed sorted count on the id column, raising with examples on
    any duplicate.  Catches url-hash collisions (62-bit birthday bound)
    and accidentally re-ingested inputs LOUDLY instead of silently
    merging two documents' postings (``BuildParams.verify_doc_ids``)."""
    docs_files = [os.path.join(ckpt.shard_dir(index_dir, sid), "docs", f)
                  for sid in range(n_shards)
                  for f in sorted(fsio.listdir(
                      os.path.join(ckpt.shard_dir(index_dir, sid), "docs")))
                  if f.endswith(".parquet")]
    if not docs_files:
        return
    counts = sorted_groupby_agg(
        rd.read_parquet(docs_files, columns=["doc_id"]),
        ["doc_id"], [("doc_id", "count", "n")])
    bad = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)),
        batch_format="pyarrow").take(5)
    if bad:
        ex = ", ".join(str(r["doc_id"]) for r in bad)
        raise ValueError(
            f"duplicate doc_ids detected across the corpus (e.g. {ex}): "
            "url-hash collision or re-ingested input — dedup the corpus "
            "or switch to doc_id_mode='sharded'")


@ray.remote(num_cpus=1)
def _docs_idx_task(shard_dir: str) -> int:
    from ..state import docstore
    return docstore.build_shard_docs_idx(shard_dir)


@ray.remote(num_cpus=1, num_returns=2)
def _docs_idx_scan(docs_dir: str, files: list[str], base: int):
    """Scan chunk -> (small id sample, (ids, loc) payload).  The sample
    rides a separate return object so the driver can derive balanced
    range boundaries without ever pulling the payload."""
    from ..state import docstore
    ids, loc = docstore.scan_docs_chunk(docs_dir, files, base)
    return ids[::512].copy(), (ids, loc)


def _ingest_loc(names: list[str], counts: list[int],
                fidx: dict[str, int]) -> np.ndarray:
    """(file_i, rg_i, row_i) for rows a docs rewrite just wrote, in
    write order: arithmetic in the fixed docs row-group size — no file
    read needed."""
    total = int(sum(counts))
    loc = np.empty((3, total), dtype=np.int32)
    off = 0
    for nm, c in zip(names, counts):
        j = np.arange(c, dtype=np.int64)
        loc[0, off:off + c] = fidx[nm]
        loc[1, off:off + c] = j // DOCS_ROW_GROUP
        loc[2, off:off + c] = j % DOCS_ROW_GROUP
        off += c
    return loc


@ray.remote(num_cpus=1)
def _docs_idx_part(gen_dir: str, files_sorted: list[str],
                   lo, hi, k: int, metas: list, payloads: list) -> int:
    """One sidecar range part [lo, hi): filter every payload chunk to
    the range, sort, write ``part-k``.  ``metas[i]`` is None when
    ``payloads[i]`` is a scan chunk's (ids, loc) pair, or
    (names, counts) when it is a docs-rewrite's flat id array (locations
    derived arithmetically — no docs re-read)."""
    from ..state import docstore
    arrs = ray.get(list(payloads))
    fidx = {nm: j for j, nm in enumerate(files_sorted)}
    ids_l, loc_l = [], []
    for meta, arr in zip(metas, arrs):
        if meta is None:
            ids, loc = arr
        else:
            ids = arr
            loc = _ingest_loc(meta[0], meta[1], fidx)
        ids = np.asarray(ids, dtype=np.int64)
        mask = np.ones(ids.size, dtype=bool)
        if lo is not None:
            mask &= ids >= lo
        if hi is not None:
            mask &= ids < hi
        if mask.any():
            ids_l.append(ids[mask])
            loc_l.append(loc[:, mask])
    ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
    loc = (np.concatenate(loc_l, axis=1) if loc_l
           else np.empty((3, 0), np.int32))
    return docstore.write_idx_part(gen_dir, files_sorted, ids, loc, k)


@ray.remote(num_cpus=1)
def _docs_idx_publish(shard_dir: str, gen: str, *part_ns) -> int:
    from ..state import docstore
    return docstore.publish_idx(shard_dir, gen, len(part_ns),
                                sum(part_ns))


def _sample_bounds(samples: list[np.ndarray], n_parts: int) -> list[int]:
    """n_parts-1 range boundaries from id samples (quantiles) — no
    distribution assumption (auto ids are uniform 62-bit hashes, sharded
    ids are (file_seq << 40 | row), fixtures carry generator ids)."""
    s = np.concatenate([np.asarray(x, np.int64) for x in samples]) \
        if samples else np.empty(0, np.int64)
    if s.size == 0 or n_parts <= 1:
        return []
    qs = np.quantile(s, np.arange(1, n_parts) / n_parts,
                     method="nearest").astype(np.int64)
    return sorted(set(int(x) for x in qs))


def _parted_docs_idx(shard_dir: str, files_sorted: list[str],
                     n_rows: int, samples: list[np.ndarray],
                     metas: list, payloads: list) -> list:
    """Dispatch a multi-part sidecar build (one sort task per ~2M-row
    range + a publish task); returns [publish ref].  Falls back to a
    single part when the shard is small or the samples degenerate."""
    from ..state import docstore
    want = max(1, min(16, -(-n_rows // docstore.PART_TARGET_ROWS)))
    bounds = _sample_bounds(samples, want) if want > 1 else []
    gen = docstore.new_gen_name()
    gen_dir = os.path.join(shard_dir, gen)
    ranges = [(bounds[i - 1] if i else None,
               bounds[i] if i < len(bounds) else None)
              for i in range(len(bounds) + 1)]
    part_refs = [
        _docs_idx_part.remote(gen_dir, files_sorted, lo, hi, k,
                              metas, payloads)
        for k, (lo, hi) in enumerate(ranges)]
    return [_docs_idx_publish.remote(shard_dir, gen, *part_refs)]


def _dispatch_docs_idx(index_dir: str, shard_ids) -> list:
    """Dispatch the doc-store sidecar rebuild (state/docstore.py) for the
    given shards; returns result refs (summing to the indexed row
    count).  Wide shards (compaction concentrates thousands of parts
    into few shards) fan the footer+doc_id scan out in SCAN_CHUNK-file
    tasks feeding range-part sort tasks (~2M rows each) and an atomic
    pointer publish — a single shard-wide sort task was the one serial
    step left in a purge compaction (measured 7.5 s at 20M docs).
    Callers whose docs dirs are final EARLY (compaction publishes docs
    before the segment merge wave ends) dispatch here and hand the refs
    to ``_finalize``, hiding the sidecar I/O behind remaining pipeline
    work."""
    from ..state import docstore
    refs = []
    for sid in shard_ids:
        sd = ckpt.shard_dir(index_dir, sid)
        # extend/resume touch only SOME shards; a shard whose sidecar
        # still matches its (write-once, content-addressed) docs file
        # list keeps it — finalize cost scales with the new data, not
        # the whole index (review r5 finding)
        cur = docstore.sidecar_current_rows(sd)
        if cur is not None:
            refs.append(cur)
            continue
        files = docstore._docs_files(os.path.join(sd, "docs"))
        if len(files) <= docstore.SCAN_CHUNK:
            refs.append(_docs_idx_task.remote(sd))
            continue
        ddir = os.path.join(sd, "docs")
        scans = [
            _docs_idx_scan.remote(ddir, files[i:i + docstore.SCAN_CHUNK], i)
            for i in range(0, len(files), docstore.SCAN_CHUNK)]
        # the sample gather blocks only this driver thread, and only
        # until the (wide, parallel) scans finish — the payloads never
        # leave the object store
        samples = ray.get([s for s, _ in scans])
        try:
            rec = ckpt.read_shard_record(index_dir, sid)
            n_rows = int(rec.get("n_docs", 0))
        except Exception:
            n_rows = 0
        refs.extend(_parted_docs_idx(
            sd, files, n_rows, samples,
            [None] * len(scans), [p for _, p in scans]))
    return refs


def _finalize(index_dir: str, n_shards: int, params: BuildParams,
              t0: float, extra: dict | None = None,
              docs_idx_refs: list | None = None) -> dict:
    """Global stats + term dictionary + manifest over ALL shards (cheap:
    O(shards) lineage records + O(vocab) seg metadata)."""
    tf0 = time.time()
    from ..state import docstore
    if params.verify_doc_ids:
        _verify_unique_doc_ids(index_dir, n_shards)
    recs = [ckpt.read_shard_record(index_dir, sid) for sid in range(n_shards)]

    # doc-store sidecars: rebuilt on every finalize (build, extend,
    # compact, purge) BEFORE the manifest publish, so a manifest
    # generation and its sidecars agree.  Dispatched here (unless the
    # caller pre-dispatched) so the termdict work below overlaps the
    # sidecar I/O.
    if docs_idx_refs is None:
        docs_idx_refs = _dispatch_docs_idx(index_dir, range(n_shards))

    n_total = sum(r["n_docs"] for r in recs)
    sum_dl = sum(r["sum_dl"] for r in recs)
    avg_dl = (sum_dl / n_total) if n_total else 1.0
    # stats.json is an informational export (S6 artifact) — readers take
    # n_docs/avg_dl from the manifest, so its write order doesn't matter
    ckpt.write_json(os.path.join(index_dir, "stats.json"),
                    {"n_docs": n_total, "sum_dl": sum_dl, "avg_dl": avg_dl})

    # global term dictionary (term -> global df) so shard-subset readers /
    # query actors score with the GLOBAL idf.  Partitioned layout (a dir
    # of term-range parts + parts.json — state/termdict.py): the driver
    # merges only when the summed vocab rows (parquet FOOTERS, no data
    # read) fit ``termdict_dist_threshold``; above it the aggregation is
    # a distributed sorted_groupby_agg whose range-ordered blocks each
    # write one part, and the driver only ever sees O(parts) metadata —
    # SCALE.md switch point 1, flipped.
    seg_files = [os.path.join(ckpt.shard_dir(index_dir, sid), "seg", f)
                 for sid in range(n_shards)
                 for f in sorted(fsio.listdir(
                     os.path.join(ckpt.shard_dir(index_dir, sid), "seg")))
                 if f.endswith(".parquet")]
    vocab_rows = sum(fsio.pq_file(f).metadata.num_rows
                     for f in seg_files)
    # Versioned dirname + tmp/os.replace so the atomic MANIFEST publish is
    # the single commit point: a reader holding the old manifest keeps
    # reading the old termdict dir; a crash mid-finalize leaves only an
    # orphan dir, never a torn or mismatched (df vs n_docs) pair.
    td_name = f"termdict-{uuid.uuid4().hex[:12]}"
    td_tmp = os.path.join(index_dir, td_name + ".tmp")
    fsio.makedirs(td_tmp, exist_ok=True)
    if vocab_rows == 0:  # zero shards / empty corpus: empty-but-valid dict
        termdict_mod.publish_parts(td_tmp, [])
    elif vocab_rows <= params.termdict_dist_threshold:
        seg_tables = _threaded(
            lambda f: fsio.pq_read_table(f, columns=["term", "df"]), seg_files)
        termdict = pa.concat_tables(seg_tables).group_by("term") \
            .aggregate([("df", "sum")]).rename_columns(["term", "df"]) \
            .sort_by("term")
        termdict_mod.publish_parts(
            td_tmp, [termdict_mod.write_part(td_tmp, termdict)])
    else:
        ds = rd.read_parquet(seg_files, columns=["term", "df"])
        agg = sorted_groupby_agg(ds, ["term"], [("df", "sum", "df")])

        def write_one(t: pa.Table, _dir=td_tmp) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"file": pa.array([], pa.string()),
                                 "lo": pa.array([], pa.string()),
                                 "hi": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            m = termdict_mod.write_part(_dir, t)
            return pa.table({"file": [m["file"]], "lo": [m["lo"]],
                             "hi": [m["hi"]], "n": [m["n"]]})

        metas = agg.map_batches(write_one, batch_format="pyarrow",
                                batch_size=None).take_all()
        termdict_mod.publish_parts(
            td_tmp, [{"file": m["file"], "lo": m["lo"], "hi": m["hi"],
                      "n": int(m["n"])} for m in metas])
    fsio.replace(td_tmp, os.path.join(index_dir, td_name))

    # kept-current sidecars contribute plain ints (skipped rebuilds)
    n_idx_rows = (sum(r for r in docs_idx_refs if isinstance(r, int))
                  + sum(ray.get([r for r in docs_idx_refs
                                 if not isinstance(r, int)])))
    n_postings = sum(r.get("n_postings", 0) for r in recs)
    seg_bytes = sum(r.get("seg_bytes", 0) for r in recs)
    manifest = {
        "docs_idx": {"version": docstore.IDX_VERSION,
                     "n_rows": n_idx_rows},
        "format_version": FORMAT_VERSION,
        "termdict_dir": td_name,
        "tokenizer_version": TOKENIZER_VERSION,
        "extractor_version": EXTRACTOR_VERSION,
        "hash_version": HASH_VERSION,
        "params": asdict(params),
        "n_docs": n_total,
        "avg_dl": avg_dl,
        "n_shards": n_shards,
        "n_postings": n_postings,
        "index_bytes": seg_bytes,
        "bytes_per_posting": round(seg_bytes / max(1, n_postings), 3),
        "shards": recs,
        "finalize_secs": round(time.time() - tf0, 3),
        "build_secs": round(time.time() - t0, 3),
        "docs_per_sec": round(n_total / max(1e-9, time.time() - t0), 1),
    }
    if extra:
        manifest.update(extra)
    # remember the PREVIOUS generation's termdict before overwriting the
    # manifest, so a reader that loaded the old manifest moments before
    # this publish can still open its termdict (one-generation grace; a
    # reader two extends behind must re-open — snapshot-DB semantics)
    prev_td = None
    mf_path = os.path.join(index_dir, "manifest.json")
    if fsio.exists(mf_path):
        try:
            old = ckpt.read_json(mf_path)
            # single-file generations used termdict_file (and before
            # that the fixed name termdict.parquet)
            prev_td = old.get("termdict_dir") or old.get(
                "termdict_file", "termdict.parquet")
            # deletions survive an extend (extend reruns finalize; only
            # compaction purges tombstones — it writes a FRESH out_dir)
            if old.get("tombstone_files"):
                manifest["tombstone_files"] = old["tombstone_files"]
                manifest["n_tombstones"] = old.get("n_tombstones")
        except (OSError, ValueError):
            prev_td = None
    ckpt.write_json(mf_path, manifest)
    import shutil
    keep = {td_name, prev_td}
    for f in fsio.listdir(index_dir):
        if ((f == "termdict.parquet" or f.startswith("termdict-"))
                and f not in keep):
            p = os.path.join(index_dir, f)
            try:
                fsio.rmtree(p) if fsio.isdir(p) else fsio.unlink(p)
            except OSError:
                pass
    return manifest


def _check_manifest_compat(index_dir: str, manifest: dict) -> None:
    """Refuse to extend/compact an index whose persisted identity scheme
    differs from this code's.  ``format_version`` covers the segment byte
    layout; ``hash_version`` covers the hash64 scheme feeding
    ``stable_doc_id`` and salt assignment — extending across a hash change
    would silently assign the same url a NEW doc_id (duplicate documents,
    broken cross-generation identity).  Legacy manifests with no
    ``hash_version`` key predate the md5 scheme (v1 = blake2b) and are
    rejected the same way."""
    fv = manifest.get("format_version")
    if fv != FORMAT_VERSION:
        raise ValueError(
            f"index at {index_dir} has format_version={fv!r}, this build "
            f"writes v{FORMAT_VERSION}: incompatible — rebuild required")
    hv = manifest.get("hash_version", 1)
    if hv != HASH_VERSION:
        raise ValueError(
            f"index at {index_dir} was built with hash_version={hv!r}, "
            f"this code hashes with v{HASH_VERSION}: doc ids / salts would "
            "diverge across generations — rebuild required")


def build_index(pages_path: str | list[str], index_dir: str,
                params: BuildParams = BuildParams()) -> dict:
    """Build (or resume) the full index under ``index_dir``; returns manifest."""
    t0 = time.time()
    paths = []
    for p in ([pages_path] if isinstance(pages_path, str) else pages_path):
        paths.extend(_list_parquet(p))
    shards = _shard_inputs(paths, params.num_shards)
    fsio.makedirs(index_dir, exist_ok=True)
    if params.doc_id_mode == "sharded":
        # the ledger is written BEFORE any shard builds so file_seq -> ids
        # are identical on fresh, resumed, and extended runs
        fragments.extend_ledger(index_dir, paths)
    _build_shards(index_dir, dict(enumerate(shards)), params)
    return _finalize(index_dir, len(shards), params, t0)


def extend_index(pages_path: str | list[str], index_dir: str,
                 num_new_shards: int | None = None) -> dict:
    """Append new input files to an EXISTING index as new shards, without
    touching any already-written segment (incremental build — the capability
    the reference lacks entirely: its stages restart from zero,
    SURVEY.md §4.1 "Spark jobs restart from zero").

    Existing postings stay valid because block score bounds are stored as
    raw (max_tf, min_dl) and the avg_dl-dependent BM25 bound is derived at
    read time; only the cheap global artifacts (stats.json,
    termdict.parquet, manifest.json) are recomputed.  Scores after an extend
    are IDENTICAL to a fresh build over the union of inputs (global df and
    avg_dl are whole-index quantities; tested in tests/test_extend.py).

    Caller contract: new files must not contain doc_ids/urls already in the
    index (dedup first — stages/dedup.py).
    """
    t0 = time.time()
    manifest = ckpt.read_json(os.path.join(index_dir, "manifest.json"))
    _check_manifest_compat(index_dir, manifest)
    params = BuildParams(**manifest["params"])
    if num_new_shards is None:
        num_new_shards = params.num_shards
    paths = []
    for p in ([pages_path] if isinstance(pages_path, str) else pages_path):
        paths.extend(_list_parquet(p))
    base = int(manifest["n_shards"])
    new_shards = _shard_inputs(paths, num_new_shards)
    shard_map = {base + i: files for i, files in enumerate(new_shards)}
    if params.doc_id_mode == "sharded":
        ledger = set(fragments.load_ledger(index_dir))
        dup = [f for f in paths if f in ledger]
        if dup:
            raise ValueError(
                f"{len(dup)} input files already indexed (e.g. {dup[0]}) — "
                "extending with them would duplicate every row's doc_id")
        fragments.extend_ledger(index_dir, paths)
    _build_shards(index_dir, shard_map, params)
    return _finalize(index_dir, base + len(new_shards), params, t0)


# ------------------------------------------------------------- compaction --

def _enc_from_row(row: dict) -> EncodedPostings:
    """Rebuild an :class:`EncodedPostings` from one segment-table row dict
    (list cells already Python lists / bytes)."""
    return EncodedPostings(
        df=int(row["df"]),
        doc_bytes=row["doc_bytes"],
        tf_bytes=row["tf_bytes"],
        block_first=np.asarray(row["block_first"], dtype=np.int64),
        block_doc_off=np.asarray(row["block_doc_off"], dtype=np.int32),
        block_tf_off=np.asarray(row["block_tf_off"], dtype=np.int32),
        block_max_tf=np.asarray(row["block_max_tf"], dtype=np.int64),
        block_min_dl=np.asarray(row["block_min_dl"], dtype=np.int32),
        block_last=np.asarray(row["block_last"], dtype=np.int64),
        pos_bytes=row.get("pos_bytes") or b"",
        block_pos_off=np.asarray(row.get("block_pos_off") or [],
                                 dtype=np.int32),
        imp_tf=np.asarray(row.get("imp_tf") or [], dtype=np.int64),
        imp_dl=np.asarray(row.get("imp_dl") or [], dtype=np.int32),
        imp_n=np.asarray(row.get("imp_n") or [], dtype=np.int32),
    )


def merge_segment_rows(group: pa.Table,
                       tombstones: np.ndarray | None = None) -> pa.Table:
    """Per-(sid, term, salt) ENCODED-level merge for compaction: decode the
    member shards' posting rows, merge-sort by doc_id, re-encode.  No
    re-extraction and no re-tokenization — compaction touches only the
    segment bytes (LSM-style segment merge; the reference has no analog:
    its "index" is rebuilt from raw text every run).

    Per-posting doc_len is not stored in a segment, so the re-encode uses
    each posting's dl lower bound recovered from its SOURCE block's impact
    frontier (``codec.expand_dl_lower_bounds`` — valid and per-tf tight;
    it reproduces a single block's frontier exactly, keeping the
    single-row byte-identity invariant).  tf_norm is decreasing in dl, so
    the resulting block bounds stay valid WAND upper bounds — scores and
    results are unchanged (doc lengths live in the docs table).  Legacy
    rows without imp columns fall back to the block-min-dl surrogate.
    A single-row group re-encodes byte-identically and is passed through
    untouched.
    """
    if group.num_rows == 1 and tombstones is None:
        return group  # byte-identical passthrough (no purge requested)
    sid = group["sid"][0].as_py()
    term = group["term"][0].as_py()
    salt = group["salt"][0].as_py()
    docs_l, tfs_l, dls_l, poss_l = [], [], [], []
    has_pos = False
    for row in group.to_pylist():
        enc = _enc_from_row(row)
        if enc.df == 0:
            continue
        ids, tfs = decode_postings(enc)
        docs_l.append(ids)
        tfs_l.append(tfs)
        # per-posting dl lower bound from the source block's impact
        # frontier (falls back to the block minimum on legacy rows)
        nb = enc.block_first.size
        sizes = np.full(nb, BLOCK_SIZE, dtype=np.int64)
        sizes[-1] = enc.df - (nb - 1) * BLOCK_SIZE
        if enc.imp_n is not None and enc.imp_n.size:
            dls_l.append(expand_dl_lower_bounds(
                tfs, enc.imp_tf, enc.imp_dl, enc.imp_n, sizes))
        else:
            dls_l.append(np.repeat(enc.block_min_dl.astype(np.int64), sizes))
        if len(enc.pos_bytes):
            has_pos = True
            poss_l.append(decode_positions(enc, tfs))
        else:
            poss_l.append(np.zeros(0, np.int64))
    doc = np.concatenate(docs_l) if docs_l else np.zeros(0, np.int64)
    tf = np.concatenate(tfs_l) if tfs_l else np.zeros(0, np.int64)
    dl = np.concatenate(dls_l) if dls_l else np.zeros(0, np.int64)
    flat_pos = np.concatenate(poss_l) if has_pos else None
    if tombstones is not None and tombstones.size and doc.size:
        pos_i = np.searchsorted(tombstones, doc)
        pos_i[pos_i >= tombstones.size] = tombstones.size - 1
        keep = tombstones[pos_i] != doc
        if has_pos:
            flat_pos = flat_pos[np.repeat(keep, tf)]
        doc, tf, dl = doc[keep], tf[keep], dl[keep]
        if doc.size == 0:
            return group.slice(0, 0)  # term fully deleted: drop the row
    order = np.argsort(doc, kind="stable")
    poss_sorted = None
    if has_pos:
        tf64 = tf.astype(np.int64)
        pstart = np.concatenate(([0], np.cumsum(tf64)))[:-1]
        lens = tf64[order]
        within = (np.arange(int(lens.sum()))
                  - np.repeat(np.concatenate(([0], np.cumsum(lens)))[:-1],
                              lens))
        poss_sorted = flat_pos[np.repeat(pstart[order], lens) + within]
    doc, tf, dl = doc[order], tf[order], dl[order]
    if doc.size > 1 and (np.diff(doc) <= 0).any():
        raise ValueError(
            f"duplicate doc_id across compacted shards for term={term!r}; "
            "source shards must hold disjoint doc sets")
    enc = encode_postings(doc, tf, dl, poss_sorted)
    return pa.table({
        "sid": pa.array([sid], pa.int32()),
        "term": pa.array([term], pa.string()),
        "salt": pa.array([salt], pa.int32()),
        "df": pa.array([enc.df], pa.int64()),
        "doc_bytes": pa.array([enc.doc_bytes], pa.binary()),
        "tf_bytes": pa.array([enc.tf_bytes], pa.binary()),
        "block_first": pa.array([enc.block_first.tolist()],
                                pa.list_(pa.int64())),
        "block_last": pa.array([enc.block_last.tolist()],
                               pa.list_(pa.int64())),
        "block_doc_off": pa.array([enc.block_doc_off.tolist()],
                                  pa.list_(pa.int32())),
        "block_tf_off": pa.array([enc.block_tf_off.tolist()],
                                 pa.list_(pa.int32())),
        "block_max_tf": pa.array([enc.block_max_tf.tolist()],
                                 pa.list_(pa.int64())),
        "block_min_dl": pa.array([enc.block_min_dl.tolist()],
                                 pa.list_(pa.int32())),
        "pos_bytes": pa.array([enc.pos_bytes], pa.binary()),
        "block_pos_off": pa.array(
            [enc.block_pos_off.tolist() if enc.block_pos_off is not None
             else []], pa.list_(pa.int32())),
        "imp_tf": pa.array([enc.imp_tf.tolist()], pa.list_(pa.int64())),
        "imp_dl": pa.array([enc.imp_dl.tolist()], pa.list_(pa.int32())),
        "imp_n": pa.array([enc.imp_n.tolist()], pa.list_(pa.int32())),
    })


def _binary_col_flat(col: pa.ChunkedArray) -> np.ndarray:
    """The concatenated bytes of a (null-free) binary column, zero-copy,
    in row order — consecutive elements of a BinaryArray occupy
    consecutive value-buffer ranges."""
    arr = col.combine_chunks()
    if len(arr) == 0:
        return np.zeros(0, np.uint8)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + len(arr) + 1]
    return np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]:offs[-1]]


def merge_groups_batched(t: pa.Table, starts: np.ndarray, ends: np.ndarray,
                         merge_idx: np.ndarray,
                         tombstones: np.ndarray | None,
                         group_bytes: np.ndarray | None = None,
                         chunk_bytes: int | None = None) -> pa.Table:
    """Chunking wrapper around :func:`_merge_groups_chunk`: partitions
    ``merge_idx`` into runs of ~``chunk_bytes`` encoded payload and
    merges each run in one vectorized pass.  One flat pass over the
    task's whole stream would be minimal Python, but its uint64
    temporaries are 8x the byte stream — x4096 profile: 45 MB of
    payload became ~2 GB of temporary traffic and the "vectorized" pass
    ran 2x SLOWER than per-group (whose temporaries stay cache-resident).
    Small chunks keep the working set in per-core cache while amortizing
    the per-call numpy overhead over many groups.  ``group_bytes``:
    optional per-GROUP payload sizes (indexed like ``starts``; the
    caller already has them from the passthrough screen)."""
    if merge_idx.size == 0:
        return t.slice(0, 0)
    if chunk_bytes is None:
        # 128 KiB payload -> ~1.5 MB of decode temporaries: stays inside a
        # worker's PRIVATE cache.  Measured on the x4096 1%-purge at 32-way
        # concurrency: 2 MiB chunks thrash the SHARED cache and inflate the
        # merge-task work sum 4.1x over the 8-way run (496 s vs 121 s);
        # 128 KiB holds the inflation to 4% and the 8->32 CPU scaling
        # efficiency at 0.8.  Observable via GRAFT_MERGE_CHUNK_BYTES.
        chunk_bytes = int(os.environ.get("GRAFT_MERGE_CHUNK_BYTES",
                                         128 << 10))
    if group_bytes is None:
        row_b = (pc.binary_length(t["doc_bytes"]).to_numpy(
                     zero_copy_only=False).astype(np.int64)
                 + pc.binary_length(t["tf_bytes"]).to_numpy(
                     zero_copy_only=False).astype(np.int64))
        group_bytes = np.add.reduceat(row_b, starts)
    gb = np.asarray(group_bytes, dtype=np.int64)[merge_idx]
    # cut chunk boundaries where the running payload crosses chunk_bytes
    cuts = np.searchsorted(np.cumsum(gb), np.arange(
        chunk_bytes, int(gb.sum()), chunk_bytes), side="left") + 1
    pieces = np.split(merge_idx, np.unique(cuts[cuts < merge_idx.size]))
    outs = [_merge_groups_chunk(t, starts, ends, p, tombstones)
            for p in pieces if p.size]
    return pa.concat_tables(outs, promote_options="default") if outs \
        else t.slice(0, 0)


def _merge_groups_chunk(t: pa.Table, starts: np.ndarray, ends: np.ndarray,
                        merge_idx: np.ndarray,
                        tombstones: np.ndarray | None) -> pa.Table:
    """Vectorized equivalent of calling :func:`merge_segment_rows` on each
    group in ``merge_idx`` (groups = ``t`` row runs ``[starts[i],
    ends[i])``, same ``(sid, term, salt)`` within a run): ONE varint
    decode over every member row's concatenated posting stream, one
    tombstone ``searchsorted``, at most one posting sort, one batched
    re-encode, zero-copy Arrow assembly.  The per-group path paid ~2.5 ms
    of Python per (term, salt) group (``to_pylist``, 1-row tables,
    ``.tolist()`` list columns) — at x4096 that fixed cost, multiplied by
    ~68k groups and inflated by 32-way allocator contention, WAS the
    compaction-purge wall.  Requires positional streams to be absent
    (caller routes pos-bearing groups to the per-group path).

    Sort avoidance: member rows are gathered ordered by (group, first
    doc_id); when every group's rows cover disjoint doc ranges — shards
    hold disjoint docs, and auto-mode doc ids are contiguous per input
    block — the concatenation is already doc-sorted and the O(n log n)
    posting sort is skipped entirely.

    Output: one row per surviving group (fully-deleted groups drop), same
    columns and per-row bytes as the per-group path, in ``merge_idx``
    group order.  Raises ``ValueError`` on duplicate doc_ids across
    member rows, like :func:`merge_segment_rows`."""
    counts = (ends[merge_idx] - starts[merge_idx]).astype(np.int64)
    total_rows = int(counts.sum())
    if total_rows == 0:
        return t.slice(0, 0)
    cum = np.concatenate(([0], np.cumsum(counts)))
    rows = (np.repeat(starts[merge_idx].astype(np.int64), counts)
            + np.arange(total_rows) - np.repeat(cum[:-1], counts))
    grp_of_row = np.repeat(np.arange(merge_idx.size, dtype=np.int64), counts)
    tm = t.take(pa.array(rows, pa.int64()))
    dfs = tm["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    # drop df=0 member rows (contribute nothing; keep geometry exact)
    if (dfs == 0).any():
        nz = dfs > 0
        rows, grp_of_row, dfs = rows[nz], grp_of_row[nz], dfs[nz]
        tm = t.take(pa.array(rows, pa.int64()))
    # order member rows by (group, first doc id) so disjoint-range groups
    # come out pre-sorted
    bf = tm["block_first"].combine_chunks()
    off_f = bf.offsets.to_numpy(zero_copy_only=False)
    vals_f = bf.values.to_numpy(zero_copy_only=False)
    row_lo = vals_f[off_f[:-1]] if len(bf) else np.zeros(0, np.int64)
    order = np.lexsort((row_lo, grp_of_row))
    if not np.array_equal(order, np.arange(order.size)):
        rows, grp_of_row = rows[order], grp_of_row[order]
        dfs = dfs[order]
        tm = t.take(pa.array(rows, pa.int64()))
        bf = tm["block_first"].combine_chunks()
        off_f = bf.offsets.to_numpy(zero_copy_only=False)
        vals_f = bf.values.to_numpy(zero_copy_only=False)
        row_lo = vals_f[off_f[:-1]] if len(bf) else np.zeros(0, np.int64)
    bl = tm["block_last"].combine_chunks()
    off_l = bl.offsets.to_numpy(zero_copy_only=False)
    vals_l = bl.values.to_numpy(zero_copy_only=False)
    row_hi = vals_l[off_l[1:] - 1] if len(bl) else np.zeros(0, np.int64)
    same_grp = grp_of_row[1:] == grp_of_row[:-1]
    presorted = not (same_grp & (row_lo[1:] <= row_hi[:-1])).any()

    ids, tfs = decode_postings_multi(
        _binary_col_flat(tm["doc_bytes"]),
        _binary_col_flat(tm["tf_bytes"]), dfs)
    _, bsizes, _ = _block_geometry(dfs)
    if "imp_tf" in tm.column_names:
        # per-posting dl lower bound from each SOURCE block's impact
        # frontier — tighter than the block minimum, and re-encode of a
        # single-row group stays byte-identical (codec.expand_dl_lower_bounds)
        dl = expand_dl_lower_bounds(
            tfs,
            pc.list_flatten(tm["imp_tf"]).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            pc.list_flatten(tm["imp_dl"]).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            pc.list_flatten(tm["imp_n"]).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            bsizes)
    else:  # legacy rows: source-block minimum per posting
        mdl = tm["block_min_dl"].combine_chunks()
        dl = np.repeat(
            mdl.values.to_numpy(zero_copy_only=False).astype(np.int64),
            bsizes)
    grp = np.repeat(grp_of_row, dfs)

    if tombstones is not None and tombstones.size and ids.size:
        pos_i = np.searchsorted(tombstones, ids)
        pos_i[pos_i >= tombstones.size] = tombstones.size - 1
        keep = tombstones[pos_i] != ids
        if not keep.all():
            ids, tfs, dl, grp = ids[keep], tfs[keep], dl[keep], grp[keep]
    if not presorted and ids.size:
        o2 = np.lexsort((ids, grp))
        ids, tfs, dl, grp = ids[o2], tfs[o2], dl[o2], grp[o2]
    if ids.size > 1:
        bad = (np.diff(ids) <= 0) & (np.diff(grp) == 0)
        if bad.any():
            raise ValueError(
                "duplicate doc_id across compacted shards; source shards "
                "must hold disjoint doc sets")

    gsizes = np.bincount(grp, minlength=merge_idx.size).astype(np.int64)
    enc = encode_postings_multi(ids, tfs, dl, gsizes)
    if enc["doc_offsets"][-1] >= (1 << 31) or enc["tf_offsets"][-1] >= (1 << 31):
        raise ValueError("batched merge output exceeds 2 GiB binary column")
    M = merge_idx.size
    meta = t.take(pa.array(starts[merge_idx].astype(np.int64), pa.int64()))

    def _bin(buf: np.ndarray, offsets: np.ndarray) -> pa.Array:
        return pa.Array.from_buffers(
            pa.binary(), M,
            [None, pa.py_buffer(offsets.astype(np.int32)),
             pa.py_buffer(buf)])

    loff = np.concatenate(([0], np.cumsum(enc["nblocks"]))).astype(np.int32)

    def _lst(values: np.ndarray, typ) -> pa.Array:
        return pa.ListArray.from_arrays(
            pa.array(loff, pa.int32()), pa.array(values, typ))

    out = pa.table({
        "sid": meta["sid"],
        "term": meta["term"],
        "salt": meta["salt"],
        "df": pa.array(gsizes, pa.int64()),
        "doc_bytes": _bin(enc["doc_bytes"], enc["doc_offsets"]),
        "tf_bytes": _bin(enc["tf_bytes"], enc["tf_offsets"]),
        "block_first": _lst(enc["block_first"], pa.int64()),
        "block_last": _lst(enc["block_last"], pa.int64()),
        "block_doc_off": _lst(enc["block_doc_off"], pa.int32()),
        "block_tf_off": _lst(enc["block_tf_off"], pa.int32()),
        "block_max_tf": _lst(enc["block_max_tf"], pa.int64()),
        "block_min_dl": _lst(enc["block_min_dl"], pa.int32()),
        "pos_bytes": _bin(np.zeros(0, np.uint8),
                          np.zeros(M + 1, np.int64)),
        # no positions: per-block zero offsets, matching encode_postings
        "block_pos_off": _lst(np.zeros(int(loff[-1]), np.int32),
                              pa.int32()),
        # impact pairs: their own ragged offsets (pairs per segment), not
        # the block-count offsets the other list columns share
        "imp_tf": pa.ListArray.from_arrays(
            pa.array(enc["imp_offsets"].astype(np.int32), pa.int32()),
            pa.array(enc["imp_tf"], pa.int64())),
        "imp_dl": pa.ListArray.from_arrays(
            pa.array(enc["imp_offsets"].astype(np.int32), pa.int32()),
            pa.array(enc["imp_dl"], pa.int32())),
        "imp_n": _lst(enc["imp_n"], pa.int32()),
    })
    if (gsizes == 0).any():  # fully-deleted groups drop their row
        out = out.filter(pa.array(gsizes > 0))
    return out


@ray.remote(num_cpus=1)
def _merge_range(files: dict[str, tuple[int, list[tuple[int, int, int]]]],
                 tmp_root: str, ridx: int,
                 ts: np.ndarray | None,
                 heavy_passthrough_bytes: int = 4 << 20) -> tuple[float, int]:
    """One compaction merge task over the row-group pieces the planner
    assigned it (``files``: file -> (target sid, [(rg, row_lo, row_hi)]),
    ``row_hi == -1`` meaning the whole row group): read exactly those
    rows, merge same-(term, salt) rows locally, write one deterministic
    parquet part per target sid (``part-r{ridx}``, tmp + ``os.replace``
    — re-runs after a crash are idempotent).  No shuffle and no overlap:
    each source row is owned by exactly one task (whole-rg ownership;
    only heavy rgs are row-sliced), so nothing is decompressed twice.
    A (term, salt) group split across tasks yields multiple output rows
    — legal (doc-disjoint; reader keeps one cursor per row).  ``ts`` is
    the broadcast tombstone array (Ray de-references the ObjectRef arg)
    or None for the byte-identical passthrough fast path.

    Returns ``(task_secs, rows_read)`` so the driver can stamp a
    per-task duration summary into the compact metrics — straggler
    imbalance vs fixed overhead is observable from the manifest instead
    of needing a profiler on a 256-node run."""
    t_start = time.time()
    rows_read = 0
    by_gid: dict[int, list[pa.Table]] = {}
    for f, (gid, pieces) in files.items():
        pf = fsio.pq_file(f)
        whole = sorted(i for i, a, b in pieces if b == -1)
        got = []
        if whole:
            got.append(pf.read_row_groups(whole))
        got.extend(pf.read_row_group(i).slice(a, b - a)
                   for i, a, b in pieces if b != -1)
        for t in got:
            if t.num_rows:
                rows_read += t.num_rows
                by_gid.setdefault(gid, []).append(t)
    t_read = time.time()
    for gid, parts in by_gid.items():
        t = pa.concat_tables(parts, promote_options="default")
        if t.num_rows == 0:
            continue
        t = t.append_column(
            "sid", pa.array(np.full(t.num_rows, gid, np.int32),
                            pa.int32()))
        order = pc.sort_indices(
            t, sort_keys=[("term", "ascending"), ("salt", "ascending")])
        t = t.take(order)
        terms = t["term"].to_numpy(zero_copy_only=False)
        salts = t["salt"].to_numpy(zero_copy_only=False)
        n = t.num_rows
        change = np.zeros(n, dtype=bool)
        change[0] = True
        change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], n]
        outs: list[pa.Table] = []
        # Per-GROUP tombstone pre-screen (purge path): a posting row's doc
        # ids all lie in [block_first[0], block_last[-1]] (blocks are
        # doc-ordered), so a row whose range contains NO tombstone is
        # provably untouched by the purge and can take the non-purge path
        # below — byte-identical passthrough for single/heavy groups, a
        # tombstone-free merge otherwise.  The test is a superset check
        # (a tombstone inside the range but absent from the row merely
        # forces the full merge), so it can never drop a deletion.  With
        # uniform 1% deletes the long tail of rare terms is almost
        # entirely unhit — the purge re-encodes only what deletion
        # actually touched.
        if ts is not None and ts.size and n:
            bf = t["block_first"].combine_chunks()
            bl = t["block_last"].combine_chunks()
            off_f = bf.offsets.to_numpy(zero_copy_only=False)
            off_l = bl.offsets.to_numpy(zero_copy_only=False)
            vals_f = bf.values.to_numpy(zero_copy_only=False)
            vals_l = bl.values.to_numpy(zero_copy_only=False)
            nonempty = off_f[1:] > off_f[:-1]
            row_lo = np.zeros(n, np.int64)
            row_hi = np.full(n, -1, np.int64)
            row_lo[nonempty] = vals_f[off_f[:-1][nonempty]]
            row_hi[nonempty] = vals_l[off_l[1:][nonempty] - 1]
            row_hit = nonempty & (
                np.searchsorted(ts, row_hi, side="right")
                > np.searchsorted(ts, row_lo, side="left"))
            group_hit = np.logical_or.reduceat(row_hit, starts)
        else:
            group_hit = np.zeros(len(starts), dtype=bool)
        # HEAVY groups pass through: a head term's (term, salt) group is
        # the one indivisible unit of merge work — at x4096 the single
        # heaviest group's decode+re-encode (~8 s) WAS the wave wall at
        # 32 CPUs (merge_tasks max_s ≈ wave secs).  Its source rows are
        # already doc-disjoint (shards hold disjoint docs) and the reader
        # makes one cursor per row regardless (query.py _load_seg_batch
        # appends to a per-term LIST), so keeping k rows instead of
        # re-encoding to 1 costs k-1 extra cursors on a handful of head
        # terms and saves O(payload) CPU; rows stay byte-identical.
        single = (ends - starts) == 1
        row_bytes = (
            pc.binary_length(t["doc_bytes"]).to_numpy(
                zero_copy_only=False).astype(np.int64)
            + pc.binary_length(t["tf_bytes"]).to_numpy(
                zero_copy_only=False).astype(np.int64)
            + pc.binary_length(t["pos_bytes"]).to_numpy(
                zero_copy_only=False).astype(np.int64))
        run_bytes = np.add.reduceat(row_bytes, starts)
        heavy = run_bytes > heavy_passthrough_bytes
        keep_asis = ~group_hit & (single | heavy)
        if keep_asis.any():  # byte-identical passthrough
            outs.append(t.filter(pa.array(
                np.repeat(keep_asis, ends - starts))))
        merge_idx = np.flatnonzero(~keep_asis)
        if merge_idx.size:
            # pos-bearing groups keep the per-group path (the batched
            # merge does not re-encode positional streams); everything
            # else merges in ONE vectorized pass.  A >1 GiB task falls
            # back wholesale (int32 binary offsets in the batched output).
            pos_row = pc.binary_length(t["pos_bytes"]).to_numpy(
                zero_copy_only=False).astype(np.int64)
            grp_has_pos = np.add.reduceat(pos_row, starts) > 0
            big = int(run_bytes[merge_idx].sum()) >= (1 << 30)
            legacy_idx = merge_idx if big \
                else merge_idx[grp_has_pos[merge_idx]]
            batched_idx = merge_idx[:0] if big \
                else merge_idx[~grp_has_pos[merge_idx]]
            outs.extend(
                merge_segment_rows(t.slice(starts[i], ends[i] - starts[i]),
                                   ts if group_hit[i] else None)
                for i in legacy_idx)
            if batched_idx.size:
                outs.append(merge_groups_batched(
                    t, starts, ends, batched_idx,
                    ts if group_hit[batched_idx].any() else None,
                    group_bytes=run_bytes))
        outs = [o for o in outs if o.num_rows]
        if not outs:
            continue
        out = pa.concat_tables(outs, promote_options="default") \
            .drop_columns(["sid"]) \
            .select(SEGMENT_SCHEMA.names).cast(SEGMENT_SCHEMA)
        # outs concatenated category-first (passthrough, per-group,
        # batched) — restore the global (term, salt) order so the part's
        # row-group key stats stay disjoint (the whole-rg planner of a
        # FUTURE compaction and per-term row-group pruning rely on it)
        out = out.sort_by([("term", "ascending"), ("salt", "ascending")])
        d = os.path.join(tmp_root, f"sid={gid}")
        fsio.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".part-r{ridx:06d}.parquet.tmp")
        # without an explicit row-group size the merged part would be
        # ONE giant group — query-time term reads on a compacted index
        # would decompress the whole part, and a further compaction
        # would lose all boundary precision
        fsio.pq_write_table(out, tmp, row_group_size=SEG_ROW_GROUP)
        fsio.replace(tmp, os.path.join(d, f"part-r{ridx:06d}.parquet"))
    if os.environ.get("GRAFT_MERGE_DEBUG"):
        import json
        with open(f"/tmp/graft_merge_debug_{os.getpid()}_{ridx}.json",
                  "w") as fh:
            json.dump({"ridx": ridx, "secs": round(time.time() - t_start, 3),
                       "read_s": round(t_read - t_start, 3),
                       "rows": rows_read, "nfiles": len(files),
                       "split": sum(1 for _, (g, ps) in files.items()
                                    for p in ps if p[2] != -1)}, fh)
    return (round(time.time() - t_start, 3), rows_read)


def delete_docs(index_dir: str, doc_ids) -> dict:
    """Tombstone-delete documents from a live index (Lucene-style):
    deleted ids never surface from search / fetch / phrase / explain,
    but global statistics (n_docs, avg_dl, df) keep counting them until
    :func:`compact_index` purges — so scores of surviving docs are
    UNCHANGED by a delete, and no segment byte is rewritten (O(deleted)
    cost, not O(index)).

    The tombstone set is one sorted parquet file; each delete rewrites
    it union-merged under a fresh versioned name and republishes the
    manifest atomically (same one-generation reader grace as the
    termdict).  Ids not present in the index are inert.  The reference
    has no deletion at all — its pipeline rebuilds from raw text.
    """
    mf_path = os.path.join(index_dir, "manifest.json")
    manifest = ckpt.read_json(mf_path)
    _check_manifest_compat(index_dir, manifest)
    new = np.unique(np.fromiter((int(x) for x in doc_ids),
                                dtype=np.int64))
    from .query import load_tombstones
    merged = np.union1d(load_tombstones(index_dir, manifest), new)
    name = f"tombstones-{uuid.uuid4().hex[:12]}.parquet"
    tmp = os.path.join(index_dir, name + ".tmp")
    fsio.pq_write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp)
    fsio.replace(tmp, os.path.join(index_dir, name))
    prev = manifest.get("tombstone_files", [])
    manifest["tombstone_files"] = [name]
    manifest["n_tombstones"] = int(merged.size)
    ckpt.write_json(mf_path, manifest)
    keep = set(prev[-1:]) | {name}  # one-generation grace
    for f in fsio.listdir(index_dir):
        if f.startswith("tombstones-") and f.endswith(".parquet") \
                and f not in keep:
            try:
                fsio.unlink(os.path.join(index_dir, f))
            except OSError:
                pass
    return manifest


def compact_index(index_dir: str, out_dir: str,
                  target_shards: int = 1,
                  heavy_passthrough_bytes: int = 4 << 20) -> dict:
    """Merge an index's shards into ``target_shards`` new shards under a
    NEW directory, without re-reading any source text.

    Repeated :func:`extend_index` calls grow the shard count monotonically
    and query latency with it (every shard contributes a posting row per
    term).  Compaction is the LSM-style answer: docs parquet files are
    hard-copied (content unchanged), segments merge per (new shard, term,
    salt) at the ENCODED level in one groupby wave.  Search results are
    rank+score identical before and after (global df/avg_dl are preserved
    exactly; block bounds stay valid — see :func:`merge_segment_rows`).

    Writing to a fresh ``out_dir`` (not in place) keeps the source index
    live and readable throughout — the caller switches readers over and
    deletes the old dir when convenient; a crashed compaction leaves only
    an incomplete out_dir whose done-markers make a re-run resume.  Salt
    splits are preserved, so a head term's merge work stays bounded per
    task exactly as in the build shuffle.

    ``heavy_passthrough_bytes``: a (term, salt) group whose summed encoded
    payload exceeds this is NOT re-encoded — its (doc-disjoint) source
    rows pass through byte-identical and the reader keeps one cursor per
    row, because a single head group's decode+re-encode is the wave's one
    indivisible unit of work and becomes the scaling floor (measured: the
    max merge task ≈ the whole wave wall at x4096/32 CPUs).  0 forces
    passthrough for every multi-row group; set it huge to always merge.
    Tombstone purges still re-encode every group (the purge must rewrite
    the postings anyway).
    """
    t0 = time.time()
    if not fsio.is_uri(index_dir):
        index_dir = os.path.abspath(index_dir)
    if not fsio.is_uri(out_dir):
        out_dir = os.path.abspath(out_dir)
    if out_dir == index_dir:
        raise ValueError("compaction writes a NEW index dir; out_dir must "
                         "differ from index_dir (old index stays live)")
    manifest = ckpt.read_json(os.path.join(index_dir, "manifest.json"))
    _check_manifest_compat(index_dir, manifest)
    params = BuildParams(**manifest["params"])
    n_old = int(manifest["n_shards"])
    if not (1 <= target_shards <= n_old):
        raise ValueError(f"target_shards must be in [1, {n_old}]")
    from .query import load_tombstones
    tombstones = load_tombstones(index_dir, manifest)
    if not tombstones.size:
        tombstones = None  # fast path: encoded-level merge, file-copy docs
    fsio.makedirs(out_dir, exist_ok=True)
    if params.doc_id_mode == "sharded":
        # the doc-id file ledger is part of the index identity: without
        # it, extending the COMPACTED index would restart file_seq at 0
        # and re-issue existing doc ids (sources/fragments.py)
        src_ledger = os.path.join(index_dir, fragments.LEDGER)
        if fsio.exists(src_ledger):
            import shutil as _sh
            _sh.copy2(src_ledger, os.path.join(out_dir, fragments.LEDGER))
    groups = [list(g) for g in
              np.array_split(np.arange(n_old), target_shards)]
    fsio.makedirs(out_dir, exist_ok=True)

    # ---- docs: file-level copy per new shard (content unchanged) ----------
    # One Ray task per source file (copy, or tombstone-purge rewrite), all
    # groups submitted at once — the copy wall scales with CPUs / nodes
    # instead of being a serial driver loop (VERDICT r4 #2: the fixed
    # driver-side cost was a third of the compact wall at x256).  At 100 TB
    # the docs payload dominates compaction; a driver-side copy would be
    # the whole job.
    import shutil
    t1 = time.time()
    setup_secs = round(t1 - t0, 3)
    docs_dir_for = {g: os.path.join(ckpt.shard_dir(out_dir, g), "docs")
                    for g in range(target_shards)}
    old_recs = [ckpt.read_shard_record(index_dir, sid)
                for sid in range(n_old)]
    ts_copy_ref = ray.put(tombstones) if tombstones is not None else None

    @ray.remote(num_cpus=1, num_returns=2)
    def _copy_docs_files(pairs: list, ts):
        # ``ts`` arrives as the broadcast ObjectRef's value (Ray
        # de-references top-level args): zero-copy from the object store
        # in every task, put exactly once on the driver.  Each task
        # handles a CHUNK of files — per-task scheduling latency was the
        # whole docs wall once copy_file became a hard link (measured
        # 1.5 s for one-file tasks at x4096/8 CPUs vs ~0 work).
        n_rows = sum_dl = 0
        names: list[str] = []
        kept: list[np.ndarray] = []
        for src_f, dest_f in pairs:
            if ts is None:
                fsio.copy_file(src_f, dest_f)
                continue
            t = fsio.pq_read_table(src_f)
            ids = t["doc_id"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            pos_i = np.searchsorted(ts, ids)
            pos_i[pos_i >= ts.size] = ts.size - 1
            t = t.filter(pa.array(ts[pos_i] != ids))
            tmp = dest_f + ".tmp"
            fsio.pq_write_table(t, tmp, row_group_size=DOCS_ROW_GROUP)
            fsio.replace(tmp, dest_f)
            n_rows += t.num_rows
            sum_dl += int(pc.sum(t["doc_len"]).as_py() or 0)
            # piggyback the doc-store sidecar's scan: this task already
            # holds the SURVIVING doc ids of the file it just wrote, and
            # their (rg, row) locations are arithmetic in the write's
            # row-group size — returning them (second return object, so
            # the driver never pulls the payload) lets _finalize skip
            # re-reading every rewritten docs file
            names.append(os.path.basename(dest_f))
            kept.append(t["doc_id"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        counts = [int(a.size) for a in kept]
        payload = np.concatenate(kept) if kept else np.empty(0, np.int64)
        return ((n_rows, sum_dl, names, counts, payload[::512].copy()),
                payload)

    copy_refs: dict[int, list] = {}
    for g, members in enumerate(groups):
        if ckpt.is_done(docs_dir_for[g]):
            continue
        dest = docs_dir_for[g]
        fsio.rmtree(dest, ignore_errors=True)
        fsio.makedirs(dest, exist_ok=True)
        pairs = []
        for sid in members:
            src = os.path.join(ckpt.shard_dir(index_dir, sid), "docs")
            pairs.extend(
                (os.path.join(src, f),
                 os.path.join(dest, f"m{sid:04d}-{f}"))
                for f in sorted(fsio.listdir(src))
                if f.endswith(".parquet"))
        # ~2 chunks per CPU across ALL groups: parallel enough for real
        # byte copies, without a scheduling round-trip per file
        n_chunks = max(1, min(len(pairs),
                              (2 * _ncpu()) // max(1, target_shards)))
        size = -(-len(pairs) // n_chunks)
        copy_refs[g] = [
            _copy_docs_files.remote(pairs[i:i + size], ts_copy_ref)
            for i in range(0, len(pairs), size)]
    # (stats ref, ids-payload ref) pairs: the driver gathers only the
    # small stats; the id payloads flow worker-to-worker into the
    # sidecar build task below
    copy_payloads = {g: [r[1] for r in refs]
                     for g, refs in copy_refs.items()}
    copy_refs = {g: [r[0] for r in refs] for g, refs in copy_refs.items()}

    # ---- segments: shuffle-FREE range-partitioned merge wave --------------
    # Every (sid, term, salt) group's rows live in known source files, so
    # instead of an all-to-all (groupby or sort — a ~2 s latency floor at
    # this scale, and the full encoded payload through the object store at
    # any scale) the driver reads each source file's parquet FOOTER once
    # (O(files) metadata), derives W balanced (term, salt) range boundaries
    # from the row-group statistics, and dispatches one task per range that
    # reads exactly its overlapping row groups from each file.  Total data
    # read stays O(segment bytes); no row is shipped twice.  The docs-copy
    # tasks above run CONCURRENTLY with this wave — both are gathered below.
    seg_dir_for = {g: os.path.join(ckpt.shard_dir(out_dir, g), "seg")
                   for g in range(target_shards)}
    pending = [g for g in range(target_shards)
               if not ckpt.is_done(seg_dir_for[g])]
    wave = 0.0
    tmp_root = os.path.join(out_dir, "_wave_compact")
    merge_refs: list = []
    phase: dict[str, float] = {}
    if pending:
        t2 = time.time()
        file_gid: list[tuple[str, int]] = []
        for g in pending:
            for sid in groups[g]:
                sdir = os.path.join(ckpt.shard_dir(index_dir, sid), "seg")
                file_gid.extend((f, g) for f in _list_parquet(sdir))
        # footer pass (each file's footer read ONCE, threaded on the
        # driver — pyarrow releases the GIL and this was a serial
        # O(files) I/O loop inside the measured compact wall):
        # per row group (file, gid, rg_index, min_key, n_rows, bytes)
        def _footer_meta(fg: tuple[str, int]):
            f, g = fg
            size = fsio.getsize(f)
            md = fsio.pq_file(f).metadata
            sch = md.schema.to_arrow_schema()
            ti = sch.get_field_index("term")
            si = sch.get_field_index("salt")
            rows = []
            for i in range(md.num_row_groups):
                rg = md.row_group(i)
                if rg.num_rows == 0:
                    continue
                st_t = rg.column(ti).statistics
                st_s = rg.column(si).statistics
                key = ((st_t.min if st_t and st_t.has_min_max else ""),
                       (st_s.min if st_s and st_s.has_min_max else 0))
                rows.append((f, g, i, key, rg.num_rows,
                             rg.total_byte_size))
            return size, rows

        rg_meta: list[tuple[str, int, int, tuple, int, int]] = []
        total_bytes = 0
        for size, rows in _threaded(_footer_meta, file_gid, workers=16):
            total_bytes += size
            rg_meta.extend(rows)
        # the merge is CPU-bound (delta-decode + merge-sort + re-encode),
        # not byte-bound: fan out to 2x the CPUs (slack for residual
        # imbalance), growing past that only when the encoded payload is
        # large (32 MB of input per task).  A PURGE fans 4x: whole-rg
        # ownership made extra width free (no boundary re-reads), task
        # costs are estimates (head-term clusters run hotter per byte),
        # and smaller tasks let LPT packing absorb the mispredictions.
        width = params.merge_parallelism or \
            max((2 if tombstones is None else 4) * _ncpu(),
                -(-total_bytes // (32 << 20)))
        # Tasks own WHOLE row groups (key-sorted contiguous runs), not
        # key ranges.  The earlier [lo, hi) range design re-read every
        # rg straddling a boundary in BOTH neighbouring tasks — measured
        # +32% merge work at width 64 vs width 16 on the x4096 purge
        # bench, because straddling rgs are disproportionately the heavy
        # ones (big groups occupy more key space).  Whole-rg ownership
        # decompresses every byte exactly once.  The price: a (term,
        # salt) group whose rgs land in different tasks is emitted as
        # more than one output row — legal (the reader keeps one cursor
        # per segment row; rows from distinct sources are doc-disjoint),
        # rare (only groups at the ~width cut points), and consolidated
        # again by any later compaction.  Only an rg heavier than the
        # per-task share is SPLIT, by row index at df-weighted cost cut
        # points (it decompresses once per piece — a handful of heavy
        # rgs, bounded duplication, and without the split a single
        # head-term rg pins the wave wall).
        rg_meta.sort(key=lambda r: r[3])
        total_w = sum(r[5] for r in rg_meta)
        step = total_w / max(1, width)
        # a group headed for heavy passthrough costs ~file-copy, not
        # decode+merge+re-encode — weight it at ~10% so tasks equalize
        # actual MERGE work.  Under a PURGE a hit heavy group IS
        # re-encoded (and heavy ≈ always hit — huge df intersects any
        # uniform tombstone set), so there the full weight stands.
        _PT_COST = 0.1 if tombstones is None else 1.0
        # per-ROW fixed cost, in byte-equivalents.  The 30 KB/row purge
        # weight was measured on the per-group merge (~2.5 ms/row); the
        # vectorized multi-group merge cut that to ~1.6 ms/row AND made
        # byte-heavy head-term ranges the mispredicted-slow ones, so a
        # LOW row weight now balances best: x4096 1%-purge sweep at 32
        # CPUs — 30 K: max task 4.6 s over a 0.44 s p50 (wall 10.1 s);
        # 1-3 K: max 2.0-2.4 s, wall 8.0-8.7 s.  Observable via
        # GRAFT_MERGE_ROW_COST.
        _ROW_COST = int(os.environ.get("GRAFT_MERGE_ROW_COST", 2_000))
        heavy = [r for r in rg_meta
                 if r[5] > step or r[5] > heavy_passthrough_bytes]

        def _row_costs(r):
            # per-ROW cost estimate for a heavy rg: bytes ∝ df (one tiny
            # threaded driver-side column read per heavy rg)
            f, g, i, key, n, w = r
            t = fsio.pq_file(f).read_row_groups([i], columns=["df"])
            dfs = t["df"].to_numpy(zero_copy_only=False) \
                .astype(np.float64) + 1.0
            est = float(w) * dfs / dfs.sum()
            return ((f, i), np.where(est > heavy_passthrough_bytes,
                                     est * _PT_COST, est) + _ROW_COST)

        heavy_rows = dict(_threaded(_row_costs, heavy, workers=16))
        all_costs = {(f, i): (float(heavy_rows[(f, i)].sum())
                              if (f, i) in heavy_rows
                              else float(w) + _ROW_COST * n)
                     for f, g, i, key, n, w in rg_meta}
        grand_cost = sum(all_costs.values()) or 1.0
        # pack each target shard's key-ordered rg stream into contiguous
        # tasks; task spec: file -> (target sid, [(rg, row_lo, row_hi)]),
        # row_hi == -1 meaning the whole row group.  Consolidation needs
        # a task's run to span the rgs of EVERY member source shard at a
        # key (shards' files interleave in the key order; a group has one
        # row per member), so the per-gid width is capped at
        # rgs / members — at fixture scale that is ONE task (full
        # consolidation, parallelism is irrelevant there), at bench scale
        # rgs >> members and the cap is above 2× CPUs.
        tasks: list[dict[str, tuple[int, list[tuple[int, int, int]]]]] = []
        task_costs: list[float] = []
        for g in pending:
            metas_g = [r for r in rg_meta if r[1] == g]
            if not metas_g:
                continue
            cost_g = sum(all_costs[(r[0], r[2])] for r in metas_g)
            width_g = max(1, round(width * cost_g / grand_cost))
            width_g = min(width_g,
                          max(1, len(metas_g) // max(1, len(groups[g]))))
            step = cost_g / width_g
            cur: dict = {}
            cur_cost = 0.0

            def _flush():
                nonlocal cur, cur_cost
                if cur:
                    tasks.append(cur)
                    task_costs.append(cur_cost)
                    cur, cur_cost = {}, 0.0

            for f, _, i, key, n, w in metas_g:
                c = all_costs[(f, i)]
                rc = heavy_rows.get((f, i))
                if rc is not None and c > 1.5 * step and n > 1:
                    # an rg heavier than the per-task share: split it by
                    # row index at df-weighted cost cut points
                    _flush()
                    cum = np.cumsum(rc)
                    pieces = max(2, int(np.ceil(
                        cum[-1] / max(step, 1e-9))))
                    targets = cum[-1] * np.arange(1, pieces) / pieces
                    cuts = sorted({int(x) for x in
                                   (np.searchsorted(cum, targets) + 1)
                                   if 0 < int(x) < n} | {n})
                    prev = 0
                    for b in cuts:
                        tasks.append({f: (g, [(i, prev, b)])})
                        task_costs.append(float(rc[prev:b].sum()))
                        prev = b
                    continue
                ent = cur.setdefault(f, (g, []))
                ent[1].append((i, 0, -1))
                cur_cost += c
                if cur_cost >= step:
                    _flush()
            _flush()
        ts_merge_ref = ray.put(tombstones) if tombstones is not None \
            else None
        fsio.rmtree(tmp_root, ignore_errors=True)
        fsio.makedirs(tmp_root, exist_ok=True)
        phase["plan"] = round(time.time() - t2, 3)
        # LPT dispatch: submit the costliest tasks FIRST so a heavy task
        # never starts in the last scheduling round and pins the wave
        # wall (width is 2× CPUs — half the tasks run in a second round,
        # and which half matters)
        order = sorted(range(len(tasks)), key=lambda x: -task_costs[x])
        merge_refs = [
            _merge_range.remote(tasks[x], tmp_root, x, ts_merge_ref,
                                heavy_passthrough_bytes)
            for x in order]

    # gather the docs-copy tasks (they ran while the merge plan was built
    # and the merge wave runs)
    sidecar_meta: dict[int, tuple[list[str], list[int]]] = {}
    for g, refs in copy_refs.items():
        stats = ray.get(refs)
        members = groups[g]
        if tombstones is None:
            n_docs_g = sum(old_recs[sid]["n_docs"] for sid in members)
            sum_dl_g = sum(old_recs[sid]["sum_dl"] for sid in members)
        else:
            n_docs_g = sum(s[0] for s in stats)
            sum_dl_g = sum(s[1] for s in stats)
            sidecar_meta[g] = ([(s[2], s[3]) for s in stats],
                               [s[4] for s in stats], n_docs_g)
        ckpt.update_shard_record(
            out_dir, g,
            source_index=index_dir,
            source_shards=[int(s) for s in members],
            input_files=sorted(
                f for sid in members
                for f in old_recs[sid].get("input_files", [])),
            n_docs=n_docs_g,
            sum_dl=sum_dl_g)
        ckpt.mark_done(docs_dir_for[g])
    docs_secs = round(time.time() - t1, 3)
    # docs dirs are final here but the merge wave is still running:
    # start the sidecar rebuild NOW so its scan+sort+write overlaps the
    # segment merge instead of serializing into _finalize afterwards.
    # For the purge path the rewrite tasks already returned each file's
    # surviving doc ids, so the sidecar build skips re-reading the docs
    # entirely (ids flow worker-to-worker via the object store)
    docs_idx_refs = []
    for g in range(target_shards):
        meta = sidecar_meta.get(g)
        if meta is None:
            docs_idx_refs.extend(_dispatch_docs_idx(out_dir, [g]))
        else:
            metas, samples, n_rows_g = meta
            files_sorted = sorted(nm for names, _ in metas
                                  for nm in names)
            docs_idx_refs.extend(_parted_docs_idx(
                ckpt.shard_dir(out_dir, g), files_sorted, n_rows_g,
                samples, metas, copy_payloads[g]))

    if pending:
        task_stats = ray.get(merge_refs)
        secs = sorted(s for s, _ in task_stats)
        phase["merge"] = round(time.time() - t2 - phase["plan"], 3)
        # per-task duration summary: wall - max ≈ scheduling/dispatch
        # overhead, sum/width vs max ≈ range imbalance — readable from
        # the manifest on any cluster size (no profiler needed)
        phase["merge_tasks"] = {
            "n": len(secs),
            "p50_s": secs[len(secs) // 2] if secs else 0.0,
            "max_s": secs[-1] if secs else 0.0,
            "sum_s": round(sum(secs), 3),
            "rows_read": int(sum(r for _, r in task_stats)),
        }
        wave = round(time.time() - t2, 3)
        _publish_partitions(tmp_root, pending, seg_dir_for, SEGMENT_SCHEMA)
        phase["publish"] = round(time.time() - t2 - wave, 3)
        t3 = time.time()

        def _seg_stats(g: int) -> tuple[int, int, int, int]:
            meta = fsio.pq_read_table(seg_dir_for[g], columns=["df"])
            seg_bytes = sum(
                fsio.getsize(os.path.join(seg_dir_for[g], f))
                for f in fsio.listdir(seg_dir_for[g])
                if f.endswith(".parquet"))
            return (g, meta.num_rows,
                    int(pc.sum(meta["df"]).as_py() or 0), seg_bytes)

        for g, n_rows, n_post, seg_bytes in _threaded(_seg_stats, pending):
            ckpt.update_shard_record(
                out_dir, g, n_term_shards=n_rows,
                n_postings=n_post, seg_bytes=seg_bytes,
                bytes_per_posting=round(seg_bytes / max(1, n_post), 3),
                format_version=FORMAT_VERSION,
                positions=params.positions,
                compact_wave_secs=wave)
            ckpt.mark_done(seg_dir_for[g])
        phase["seg_stats"] = round(time.time() - t3, 3)

    return _finalize(out_dir, target_shards, params, t0,
                     extra={"compact_secs": {"setup": setup_secs,
                                             "docs": docs_secs,
                                             "wave": round(wave, 3),
                                             **phase}},
                     docs_idx_refs=docs_idx_refs)
