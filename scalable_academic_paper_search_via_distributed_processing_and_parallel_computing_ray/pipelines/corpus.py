"""Composite training-data cleaning pipeline — the end-to-end shape an
LLM-corpus user actually runs, chained from the repo's own primitives:

    read (pruned columns)
      -> vectorized quality features + threshold filter   (stages.text)
      -> exact dedup, survivor = min doc_id               (stages.dedup)
      -> optional MinHash near-dup removal                (stages.dedup)
      -> stats + partitioned parquet write with manifest

Everything streams: the quality filter is a ``map_batches`` over Arrow,
exact dedup is ONE sort + first-of-run, and the near-dup pass only adds
the capped in-bucket MinHash stage.  The write is hive-partitioned on a
hash bucket of doc_id so a re-run can skip finished partitions (task
brief: resumable output).

The quality+exact-dedup subset is SQL-expressible, so the ``corpus_clean``
driver query is ORACLED end-to-end; the near-dup stage is opt-in (off in
the oracled query — MinHash banding is not SQL-expressible) and covered by
``dedup_minhash`` rows-only plus pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..stages.dedup import exact_dedup, minhash_dedup_groups
from ..stages.text import batch_quality


def _round_m(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return (np.floor(np.abs(x) * 1000 + 0.5) * np.sign(x)).astype(np.int64)


def quality_filter(ds: Dataset, min_tokens: int = 5,
                   max_stop_m: int = 700, max_punct_m: int = 300,
                   text_col: str = "text") -> Dataset:
    """Keep docs passing the quality thresholds; output adds the quality
    columns (n_tokens, stop_m, punct_m) so downstream stages and sinks
    never recompute them.  Thresholds are in milli-units to match the
    oracled ``quality`` query's quantization."""

    def f(b: pa.Table) -> pa.Table:
        q = batch_quality(b[text_col], b.num_rows)
        stop_m = _round_m(q["stop_ratio"])
        punct_m = _round_m(q["punct_ratio"])
        keep = ((q["n_tokens"] >= min_tokens)
                & (stop_m <= max_stop_m) & (punct_m <= max_punct_m))
        out = b.filter(pa.array(keep))
        return (out
                .append_column("n_tokens",
                               pa.array(q["n_tokens"][keep], pa.int64()))
                .append_column("stop_m", pa.array(stop_m[keep], pa.int64()))
                .append_column("punct_m",
                               pa.array(punct_m[keep], pa.int64())))

    return ds.map_batches(f, batch_format="pyarrow")


def clean_corpus(ds: Dataset, min_tokens: int = 5, max_stop_m: int = 700,
                 max_punct_m: int = 300, near_dup: bool = False,
                 minhash_threshold: float = 0.8,
                 text_col: str = "text",
                 benchmark: "Dataset | pa.Table | None" = None,
                 decon_n: int = 13) -> Dataset:
    """quality filter -> (optional) test-set decontamination -> exact
    dedup -> (optional) MinHash near-dup removal.  Near-dup survivors
    keep the group's min doc_id, matching the exact-dedup survivor rule;
    ``benchmark`` drops every doc sharing a ``decon_n``-gram with the
    eval set (stages/decontaminate.py) before dedup pays for it."""
    filtered = quality_filter(ds, min_tokens, max_stop_m, max_punct_m,
                              text_col)
    if benchmark is not None:
        from ..stages.decontaminate import decontaminate
        filtered = decontaminate(filtered, benchmark, n=decon_n,
                                 text_col=text_col, mode="drop")
    survivors = exact_dedup(filtered, text_col=text_col)
    if not near_dup:
        return survivors
    # near-dup groups over the exact-dedup survivors; drop every member
    # except the group minimum.  The group table is O(near-dup docs) —
    # small by construction — and broadcast into a vectorized filter.
    import pyarrow.compute as _pc
    import ray as _ray
    groups = minhash_dedup_groups(survivors, threshold=minhash_threshold,
                                  text_col=text_col)
    doc = groups["doc_id"].to_numpy(zero_copy_only=False)
    grp = groups["group_id"].to_numpy(zero_copy_only=False)
    losers = pa.array(doc[doc != grp], pa.int64())
    losers_ref = _ray.put(losers)

    def drop_losers(b: pa.Table) -> pa.Table:
        ls = _ray.get(losers_ref)
        return b.filter(_pc.invert(_pc.is_in(b["doc_id"], value_set=ls)))

    return survivors.map_batches(drop_losers, batch_format="pyarrow")


def write_clean_corpus(ds: Dataset, out_dir: str, n_buckets: int = 16,
                       drop_text: bool = False) -> dict:
    """Partitioned, resumable sink: hive layout on ``bucket =
    hash(doc_id) % n_buckets`` (one directory per bucket -> a failed run
    reruns only missing buckets), manifest committed LAST with row count
    + schema + params so readers key off a complete write.  ``out_dir``
    may be a URI (fsio seam — same contract as the index dirs)."""
    from ..state import fsio

    def bucketize(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bk = ((ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)) \
            % np.uint64(n_buckets)
        out = b.drop_columns(["text"]) if drop_text and "text" in b.schema.names else b
        return out.append_column("bucket",
                                 pa.array(bk.astype(np.int32), pa.int32()))

    fsio.makedirs(out_dir, exist_ok=True)
    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    bk_fs, bk_p = fsio.ray_fs_path(fsio.join(out_dir, "buckets"))
    bucketed.write_parquet(bk_p, partition_cols=["bucket"],
                           min_rows_per_file=65536, filesystem=bk_fs)
    import pyarrow.dataset as pads
    dset = pads.dataset(bk_p, format="parquet", partitioning="hive",
                        filesystem=bk_fs)
    n = dset.count_rows()  # parquet metadata only, no data scan
    manifest = {"n_docs": int(n), "n_buckets": n_buckets,
                "drop_text": drop_text,
                "columns": [f for f in dset.schema.names if f != "bucket"]}
    fsio.write_json_atomic(fsio.join(out_dir, "corpus_manifest.json"),
                           manifest)
    return manifest
