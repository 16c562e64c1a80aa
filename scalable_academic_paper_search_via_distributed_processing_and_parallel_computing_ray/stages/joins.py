"""Broadcast lookup join — the small-side alternative to a hash shuffle.

``ds.join`` moves BOTH sides through an all-to-all exchange.  When one
side is a narrow key->payload map that fits in a worker's heap, the
scale-correct shape is: put the small side in the object store ONCE (as
an Arrow table, concatenated by a Ray task so the driver never holds the
rows), then stream the big side through ``map_batches`` doing a
vectorized ``pc.index_in`` + ``take`` per batch.  The big side moves
zero times; the small side moves once per node (Ray object-store
locality), not once per batch.  (SURVEY.md §2.4 J4 — the reference
broadcasts its FWCI lookup the same way, ``calculate_fwci.py``.)

The small side's key column must be UNIQUE (``index_in`` returns the
first match); that is exactly the key->payload lookup contract.  Inner
semantics: big rows with no match are dropped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .blocks import as_arrow_block


@ray.remote
def _concat_small(key_col: str, cols: list, *blocks) -> pa.Table:
    t = pa.concat_tables([as_arrow_block(b) for b in blocks])
    return t.select([key_col, *cols]).combine_chunks()


def broadcast_lookup_join(big: Dataset, small: Dataset, big_key: str,
                          small_key: str, payload_cols: list[str],
                          max_rows: int = 5_000_000) -> Dataset | None:
    """Inner-join ``big`` with a unique-keyed ``small`` side by broadcast
    lookup.  Returns the joined Dataset (big columns + ``payload_cols``),
    or None when ``small`` exceeds ``max_rows`` — the caller falls back to
    a hash join.  ``small.count()`` on a pruned parquet read is
    metadata-only, so the size probe is free."""
    n = small.count()
    if n > max_rows:
        return None
    ref = _concat_small.remote(small_key, payload_cols,
                               *small.to_arrow_refs())

    def lookup(b: pa.Table) -> pa.Table:
        t = ray.get(ref)  # zero-copy from the local object store
        pos = pc.index_in(b[big_key], value_set=t[small_key])
        mask = pc.is_valid(pos)
        out = b.filter(mask)
        pos = pc.filter(pos, mask)
        for c in payload_cols:
            out = out.append_column(c, pc.take(t[c], pos))
        return out

    return big.map_batches(lookup, batch_format="pyarrow")


def broadcast_semi_filter(big: Dataset, small: Dataset, big_key: str,
                          small_key: str,
                          max_rows: int = 5_000_000) -> Dataset | None:
    """Semi-join by broadcast: keep big rows whose key appears in
    ``small``.  Same contract as :func:`broadcast_lookup_join` (None over
    the threshold -> caller falls back to a shuffle join); duplicates in
    ``small`` are fine for membership."""
    n = small.count()
    if n > max_rows:
        return None
    ref = _concat_small.remote(small_key, [], *small.to_arrow_refs())

    def keep(b: pa.Table) -> pa.Table:
        t = ray.get(ref)
        return b.filter(pc.is_in(b[big_key], value_set=t[small_key]))

    return big.map_batches(keep, batch_format="pyarrow")
