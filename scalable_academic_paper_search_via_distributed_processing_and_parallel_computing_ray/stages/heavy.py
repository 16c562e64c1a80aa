"""Heavy-hitter terms without a full-vocabulary shuffle.

``term_df``-style exact term statistics pay one all-to-all whose row count
is O(vocab x batches) — correct, but at open-web scale the vocabulary is
hundreds of millions of terms and almost all of them are light.  When only
the heavy tail matters (stop-list induction, hot-term salting thresholds,
corpus health dashboards), the scalable shape is candidates-then-verify:

1. **Candidate pass** (``map_batches``, no shuffle): each batch emits the
   terms whose LOCAL count exceeds ``local_n / k_sketch``.  Pigeonhole
   guarantee: if a term's global count exceeds ``total_n / k_sketch``
   then some batch has ``c_b / n_b > 1/k_sketch`` (otherwise summing
   ``c_b <= n_b/k`` over batches bounds the global count), so the union
   of per-batch candidates is a SUPERSET of every global heavy hitter.
   At most ``k_sketch`` terms can clear a local threshold, so candidate
   rows are O(k_sketch x batches) — independent of vocabulary size.
2. **Verify pass**: re-scan the corpus counting ONLY the candidate terms
   (the candidate set is small, so it broadcasts; an ``is_in`` filter
   inside each batch drops every light term before anything shuffles),
   then the sorted grouped aggregation (:mod:`.groupagg`) sums the
   per-batch partial counts and keeps ``count >= min_count``.  Counts
   are exact — a candidate's occurrences in batches where it was locally
   light are still counted, because the verify pass counts candidates in
   EVERY batch.

Two streaming reads of a pruned text column + a candidate-only shuffle,
against ``term_df``'s one all-to-all of the full vocabulary; at web
scale the reads win by orders of magnitude.

The guarantee requires ``min_count > total_tokens / k_sketch`` (STRICTLY —
the local threshold is strict, so pigeonhole only covers terms strictly
above the floor); the function raises otherwise (a silent partial answer
would look exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .text import flat_tokens


def _batch_candidates(batch: pa.Table, text_col: str,
                      k_sketch: int) -> pa.Table:
    """Terms with local count > local_tokens / k_sketch, plus the batch's
    token total (term='' row) so the driver can check the guarantee."""
    flat, _ = flat_tokens(batch[text_col], drop_stopwords=True)
    n = len(flat)
    out_t: list[str] = []
    if n:
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        keep = np.flatnonzero(cnt * k_sketch > n)
        out_t = [enc.dictionary[int(i)].as_py() for i in keep]
    return pa.table({
        "term": pa.array(out_t + [""], pa.string()),
        "n_tokens": pa.array([0] * len(out_t) + [n], pa.int64()),
    })


def heavy_terms(ds: Dataset, text_col: str = "text",
                min_count: int = 100, k_sketch: int = 4096) -> pa.Table:
    """Exact (term, count) for every term with count >= ``min_count``.

    Returns count-descending, term-ascending.  Raises if ``min_count``
    is below the ``total_tokens / k_sketch`` guarantee floor — raise
    ``k_sketch`` (more candidate rows) or ``min_count`` to fix.
    """
    # two passes = two lazy executions of the input lineage (a pruned
    # parquet re-read); deliberately NOT materialize() — pinning the whole
    # corpus in the object store is exactly what this operator avoids
    cand_df = ds.map_batches(
        lambda b: _batch_candidates(b, text_col, k_sketch),
        batch_format="pyarrow").to_pandas()  # O(k_sketch x batches) rows
    total_n = int(cand_df["n_tokens"].sum())
    # STRICT inequality is required: the local keep condition is
    # cnt * k > n, so pigeonhole only guarantees candidacy for terms with
    # global count STRICTLY above total_n / k_sketch.  At equality
    # (min_count == total_n / k_sketch) a term with count exactly
    # min_count could evade every local threshold — raise there too.
    if min_count * k_sketch <= total_n:
        raise ValueError(
            f"min_count={min_count} is at or below the guarantee floor "
            f"total_tokens/k_sketch = {total_n}/{k_sketch} = "
            f"{total_n / k_sketch:.1f}; heavy terms could be missed — "
            "raise k_sketch or min_count")
    cands = sorted({t for t in cand_df["term"].tolist() if t})
    if not cands:
        return pa.table({"term": pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})
    cand_arr = pa.array(cands, pa.string())

    def count_cands(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        flat, _ = flat_tokens(b[text_col], drop_stopwords=True)
        hit = flat.filter(pc.is_in(flat, value_set=cand_arr))
        if len(hit) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        enc = hit.dictionary_encode()
        cnt = np.bincount(enc.indices.to_numpy(zero_copy_only=False),
                          minlength=len(enc.dictionary))
        return pa.table({"term": enc.dictionary,
                         "c": pa.array(cnt, pa.int64())})

    from .groupagg import sorted_groupby_agg
    agg = sorted_groupby_agg(
        ds.map_batches(count_cands, batch_format="pyarrow"),
        ["term"], [("c", "sum", "count")]).to_pandas()
    agg = agg[agg["count"] >= min_count]
    agg = agg.sort_values(["count", "term"],
                          ascending=[False, True]).reset_index(drop=True)
    return pa.table({"term": pa.array(agg["term"], pa.string()),
                     "count": pa.array(agg["count"].to_numpy()
                                       .astype(np.int64), pa.int64())})
