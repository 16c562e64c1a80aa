"""Distributed AS-OF join (the classic time-series point-in-time lookup).

Ray Data has no as-of/range join; this operator expresses it with the same
sort + block-boundary-carry machinery as ``stages/window.py``:

1. tag the two inputs (probe rows carry an id, reference rows carry the
   value to look up) and UNION them;
2. ONE distributed sort on (key, time, tag) — probes sort before
   references at equal time, which gives strict ``reference.time <
   probe.time`` semantics;
3. per sorted block, a vectorized forward-fill assigns every probe row the
   last reference value seen; block boundaries chain through O(1)-per-block
   driver metadata.

The carry is O(1) per block, NOT a per-key prefix map (the round-2 shape
accumulated every key ever seen and shipped the full dict to every block):
the global sort makes each key's rows contiguous, so the ONLY key of a
block that can have references in earlier blocks is its FIRST key — every
other key's run starts inside the block.  Each block's metadata is just
``(first_key, last_key, last-ref-value-of-last_key)``, and the driver
chains a single boundary entry forward.  Carry size is independent of key
cardinality — billions of keys cost the same as ten.

All heavy data moves exactly once (the sort); the carry records are tiny.
Probes with no earlier reference are dropped (inner as-of).  The reference
system has no as-of operator at all — this is part of the beyond-reference
training-data toolkit (task brief: "custom operators ... as-of join").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .blocks import as_arrow_block, nonempty_block_refs

_PROBE, _REF = 0, 1  # probe first at equal time => strict "<" match


def _tag_probe(id_col: str, key_col: str, time_col: str):
    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "__key": b[key_col].cast(pa.int64()),
            "__t": b[time_col].cast(pa.int64()),
            "__tag": pa.array(np.full(n, _PROBE, np.int8)),
            "__id": b[id_col].cast(pa.int64()),
            # 0 placeholder, NOT null: a null in an int64 column upcasts
            # the numpy view to float64 and breaks exact value carry
            "__val": pa.array(np.zeros(n, np.int64)),
        })
    return f


def _tag_ref(key_col: str, time_col: str, value_col: str):
    def f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "__key": b[key_col].cast(pa.int64()),
            "__t": b[time_col].cast(pa.int64()),
            "__tag": pa.array(np.full(n, _REF, np.int8)),
            "__id": pa.array(np.zeros(n, np.int64)),
            "__val": b[value_col].cast(pa.int64()),
        })
    return f


@ray.remote
def _block_boundary_meta(blk) -> tuple:
    """(first_key, last_key, has_ref_for_last, last_ref_val) — the only
    state a LATER block can need from this one is the latest reference
    value of its LAST key (the single key whose sorted run may continue
    across the boundary)."""
    blk = as_arrow_block(blk)
    keys = blk["__key"].to_numpy(zero_copy_only=False)
    tags = blk["__tag"].to_numpy(zero_copy_only=False)
    first, last = int(keys[0]), int(keys[-1])
    ref_last = (tags == _REF) & (keys == last)
    if ref_last.any():
        vals = blk["__val"].to_numpy(zero_copy_only=False)
        return first, last, True, int(vals[np.flatnonzero(ref_last)[-1]])
    return first, last, False, 0


@ray.remote
def _block_fill(blk, carry: dict, id_out: str, val_out: str) -> pa.Table:
    blk = as_arrow_block(blk)
    keys = blk["__key"].to_numpy(zero_copy_only=False)
    tags = blk["__tag"].to_numpy(zero_copy_only=False)
    ids = blk["__id"].to_numpy(zero_copy_only=False)
    vals = blk["__val"].to_numpy(zero_copy_only=False)
    n = len(keys)
    idx = np.arange(n, dtype=np.int64)
    is_ref = tags == _REF
    # per-key-run forward fill via the segment-offset accumulate trick:
    # contribution = seg*n + idx for refs (monotone within a segment and
    # always above every earlier segment's), -1 for non-refs; after
    # maximum.accumulate, a value >= seg*n means "a ref exists earlier in
    # MY segment" and decodes back to its row index.
    seg = np.cumsum(np.r_[True, keys[1:] != keys[:-1]]) - 1
    contrib = np.where(is_ref, seg * n + idx, -1)
    ff = np.maximum.accumulate(contrib)
    in_seg = ff >= seg * n
    last_ref_idx = np.where(in_seg, ff - seg * n, 0)
    filled = vals[last_ref_idx]
    # rows with no in-segment ref fall back to the cross-block carry
    seg_keys = keys[np.r_[True, keys[1:] != keys[:-1]]]
    carry_per_seg = np.array(
        [carry.get(int(k), 0) for k in seg_keys], dtype=np.int64)
    # separate VALIDITY mask instead of an in-band sentinel: any int64
    # value (incl. INT64_MIN) is a legitimate carried reference value
    carry_ok_seg = np.array([int(k) in carry for k in seg_keys], dtype=bool)
    carry_vals = carry_per_seg[seg]
    carry_ok = carry_ok_seg[seg]
    out_vals = np.where(in_seg, filled, carry_vals)
    keep = (~is_ref) & (in_seg | carry_ok)
    return pa.table({id_out: pa.array(ids[keep].astype(np.int64), pa.int64()),
                     val_out: pa.array(out_vals[keep], pa.int64())})


def asof_join(probe: Dataset, ref: Dataset, key_col: str, time_col: str,
              probe_id_col: str, ref_value_col: str,
              id_out: str = "id", val_out: str = "asof_value") -> Dataset:
    """For each probe row, the ``ref_value_col`` of the LATEST reference
    row with the same key and STRICTLY earlier time.  Returns
    ``(id_out, val_out)``; probes with no earlier reference are dropped.
    Key and id must be integer-castable; time and value are carried as
    int64 (cast timestamps to epoch units upstream)."""
    tagged = probe.map_batches(_tag_probe(probe_id_col, key_col, time_col),
                               batch_format="pyarrow") \
        .union(ref.map_batches(_tag_ref(key_col, time_col, ref_value_col),
                               batch_format="pyarrow"))
    s = tagged.sort(["__key", "__t", "__tag"]).materialize()
    refs = nonempty_block_refs(s)
    if not refs:
        return ray.data.from_arrow(pa.schema(
            [(id_out, pa.int64()), (val_out, pa.int64())]).empty_table())
    metas = ray.get([_block_boundary_meta.remote(r) for r in refs])
    carries: list[dict] = []
    # single chained boundary entry: (key, value known?, value).  A block's
    # carry is non-empty only when its first key's run started earlier AND
    # some earlier block held a reference for it.
    bk: int | None = None
    has = False
    bv = 0
    for first, last, m_has, m_v in metas:
        carries.append({first: bv} if (has and bk == first) else {})
        if m_has:
            has, bv = True, m_v
        elif not (bk == last and has):
            has, bv = False, 0
        bk = last
    out_refs = [_block_fill.remote(r, c, id_out, val_out)
                for r, c in zip(refs, carries)]
    return ray.data.from_arrow_refs(out_refs)
