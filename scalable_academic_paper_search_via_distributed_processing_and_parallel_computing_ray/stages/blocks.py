"""Block-level dataset hygiene.

Ray's hash-shuffle operators (groupby aggregate, join) emit one block per
hash partition, including ZERO-ROW blocks with an EMPTY schema for
partitions that received no data.  ``map_batches`` passes such blocks
through without invoking the UDF, so they cannot be repaired in-stream, and
they break downstream consumers that concatenate block schemas — a join's
key-field lookup (``No match or multiple matches for key field reference``)
or a driver-side hash compare.  ``drop_empty_blocks`` removes them by
METADATA (no block is fetched); the price is a ``materialize()``, which is
acceptable exactly where this matters: after an all-to-all whose output is
about to be consumed again.

``nonempty_block_refs`` / ``as_arrow_block`` are the shared primitives for
the block-granular operators (``stages/window.py`` percent_rank,
``stages/dedup.py`` exact_dedup) that need ordered block access with
boundary metadata.
"""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset


def nonempty_block_refs(mat: Dataset) -> list:
    """Ordered refs of the blocks that have rows, selected by METADATA
    only — no block is fetched (shuffles emit schema-less empties)."""
    return [blk for bundle in mat.iter_internal_ref_bundles()
            for blk, m in bundle.blocks if (m.num_rows or 0) > 0]


def as_arrow_block(blk) -> pa.Table:
    """Blocks may be Arrow or pandas depending on the upstream source."""
    if isinstance(blk, pa.Table):
        return blk
    return pa.Table.from_pandas(blk, preserve_index=False)


def drop_empty_blocks(ds: Dataset) -> Dataset:
    """Materialize and re-emit only the blocks with rows (schema-stable).

    Contract: the NON-empty blocks must be Arrow — put a
    ``map_batches(..., batch_format="pyarrow")`` stage upstream (it converts
    every block it actually runs on, i.e. all non-empty ones).
    """
    mat = ds.materialize()
    refs = nonempty_block_refs(mat)
    if not refs:
        return mat.limit(0)
    return ray.data.from_arrow_refs(refs)
