"""Nested-struct field projection + null handling (SURVEY.md §2.2 M1-M3).

The reference's cleaning job selects nested fields out of a struct column
with aliases and then drops rows whose required fields are null
(``dataset_cleaning/diag.scala:17-35``:
``$"enrichments.documentType".getField("type").alias("docType")`` +
``.na.drop(Seq("title", "abstract"))``).  Re-expressed Ray-Data-first:
``pc.struct_field`` walks the nested path zero-copy inside one
``map_batches``, ``pc.coalesce`` fills null leaves, and ``pc.is_valid``
masks the drop — one streaming pass, no row loops.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def struct_field_path(col: pa.ChunkedArray | pa.Array, path: str):
    """Extract ``"a.b.c"``-style nested field from a struct column."""
    parts = path.split(".")
    out = col
    for p in parts:
        out = pc.struct_field(out, p)
    return out


def project_struct_fields(ds: Dataset, struct_col: str,
                          fields: dict[str, str],
                          keep: tuple[str, ...] = (),
                          drop_null_on: tuple[str, ...] = (),
                          fill: dict[str, object] | None = None) -> Dataset:
    """Project nested fields out of ``struct_col``.

    ``fields``: output name -> dotted path INSIDE the struct column
    (``"doc.type"`` reads ``struct_col.doc.type``).  ``keep``: top-level
    columns passed through unchanged.  ``drop_null_on``: output columns
    whose null rows are dropped (the ``na.drop`` analog — reference M1).
    ``fill``: output column -> scalar used to ``pc.coalesce`` nulls
    (reference M3's ``coalesce(abstract, '')`` half).
    """
    fill = fill or {}

    def f(b: pa.Table) -> pa.Table:
        cols = {k: b[k] for k in keep}
        for out, path in fields.items():
            col = struct_field_path(b[struct_col], path)
            if out in fill:
                col = pc.coalesce(col, pa.scalar(fill[out], col.type))
            cols[out] = col
        t = pa.table(cols)
        for c in drop_null_on:
            t = t.filter(pc.is_valid(t[c]))
        return t

    return ds.map_batches(f, batch_format="pyarrow")
