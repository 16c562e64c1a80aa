"""Test-set decontamination: tag/drop training docs that share n-grams
with a benchmark (evaluation) set.

The standard LLM-training-data hygiene op: any document containing an
n-gram that also appears in an evaluation benchmark is flagged (or
removed) so the model is not trained on its own test set.  Shape:

  benchmark (small, e.g. 10^3-10^5 eval docs)
      -> distinct n-gram hash64 set, built once, ``ray.put`` broadcast
  corpus (arbitrarily large)
      -> map_batches(ContaminationTagger): per doc, the count of
         DISTINCT n-gram hashes hitting the benchmark set via one
         ``np.searchsorted`` against the broadcast sorted array

No shuffle at all: the benchmark side is the classic broadcast-small-
side pattern (same as ``stages/joins.py``), the corpus side is one
streaming pass.  At 100 TB the benchmark n-gram set for a 100k-doc
eval suite is ~10^7 uint64 = 80 MB — one object-store copy per node,
read zero-copy by every task.

N-gram semantics match the repo's shingle machinery
(``functions.textstats.shingle_hashes``: stop-filtered tokens joined by
US-31, md5-based hash64 — SQL-reproducible, so the driver oracle
value-checks the whole operator).  Docs shorter than ``n`` tokens hash
their full token list as one shingle (they can still be verbatim
benchmark rows — the case that matters most).

Reference parity: the reference has no decontamination at all; this is
part of the training-data toolkit mandated beyond SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..functions import textstats as ts
from ..functions.tokenize import tokenize_filtered


def benchmark_ngram_hashes(bench: Dataset | pa.Table, n: int = 13,
                           text_col: str = "text") -> np.ndarray:
    """Sorted distinct n-gram hash64 array over the benchmark set.  The
    benchmark is small by definition (an eval suite); it is the one side
    that MAY be driver-collected."""
    if isinstance(bench, Dataset):
        batches = bench.select_columns([text_col]) \
            .iter_batches(batch_format="pyarrow", batch_size=None)
    else:
        batches = [bench]
    hs: list[np.ndarray] = []
    for b in batches:
        for t in b[text_col].to_pylist():
            hs.append(ts.shingle_hashes(tokenize_filtered(t), n))
    if not hs:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(np.concatenate(hs))


class ContaminationTagger:
    """Actor-pool stage: the benchmark hash set loads once per actor from
    the object store (``__init__``); each batch answers with per-doc
    distinct-hit counts via one searchsorted per doc."""

    def __init__(self, bench_ref, n: int = 13, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.bench: np.ndarray = ray.get(bench_ref)
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        hits = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = np.unique(ts.shingle_hashes(tokenize_filtered(t), self.n))
            if sh.size == 0 or self.bench.size == 0:
                continue
            pos = np.searchsorted(self.bench, sh)
            pos[pos >= self.bench.size] = self.bench.size - 1
            hits[i] = int((self.bench[pos] == sh).sum())
        return pa.table({
            self.id_col: batch[self.id_col].cast(pa.int64()),
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64),
                                     pa.int64()),
        })


class ContaminationFilter(ContaminationTagger):
    """Drop-mode twin: passes CLEAN rows through with all their columns."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        tags = ContaminationTagger.__call__(self, batch)
        clean = np.asarray(tags["n_hits"]) == 0
        return batch.filter(pa.array(clean))


def decontaminate(docs: Dataset, bench: Dataset | pa.Table, n: int = 13,
                  id_col: str = "doc_id", text_col: str = "text",
                  mode: str = "tag", concurrency=(1, 8)) -> Dataset:
    """Tag (``mode="tag"``: (id, n_hits, contaminated) per doc) or drop
    (``mode="drop"``: clean docs only, all columns) corpus documents
    sharing any n-gram with ``bench``."""
    if mode not in ("tag", "drop"):
        raise ValueError(f"unknown mode {mode!r}")
    ref = ray.put(benchmark_ngram_hashes(bench, n, text_col))
    kwargs = dict(bench_ref=ref, n=n, id_col=id_col, text_col=text_col)
    if mode == "tag":
        return docs.select_columns([id_col, text_col]).map_batches(
            ContaminationTagger, fn_constructor_kwargs=kwargs,
            batch_format="pyarrow", concurrency=concurrency)
    return docs.map_batches(
        ContaminationFilter, fn_constructor_kwargs=kwargs,
        batch_format="pyarrow", concurrency=concurrency)
