"""BM25 scoring math — single source of truth for engine, WAND and oracle.

Parameters per ``BASELINE.json`` north_star: k1 = 1.2, b = 0.75 (NOTE: the
reference searcher used k1 = 1.5, ``bm25_searcher.py:22-24``; north_star
overrides).  IDF is the Lucene/Robertson form
``ln(1 + (N - df + 0.5) / (df + 0.5))`` — a documented deviation from the
reference's nonstandard Spark-IDF-in-BM25 mix (SURVEY.md §7.4.2; reference
formula at ``bm25_kernel.cu:62-64`` with Spark IDF from
``bm25_precompute.py:50-58``).

Scores decompose as ``score(q, d) = sum_t idf(t) * tf_norm(tf, dl)`` where
``tf_norm`` is doc-local.  Block-max metadata stores max ``tf_norm`` per
block; multiplying by per-term ``idf`` at query time yields the block upper
bound used by WAND.
"""

from __future__ import annotations

import math

import numpy as np

K1: float = 1.2
B: float = 0.75


def idf(n_docs: int, df: int) -> float:
    """Robertson/Lucene IDF; always > 0."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, doc_len: float, avg_dl: float) -> float:
    """Doc-local BM25 term saturation in [0, k1+1)."""
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * doc_len / avg_dl))


def tf_norm_vec(tfs: np.ndarray, doc_lens: np.ndarray, avg_dl: float) -> np.ndarray:
    """Vectorized ``tf_norm`` over parallel tf / doc_len arrays (float64)."""
    tfs = tfs.astype(np.float64, copy=False)
    dls = doc_lens.astype(np.float64, copy=False)
    return tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avg_dl))


def score_vec(idf_t: float, tfs: np.ndarray, doc_lens: np.ndarray, avg_dl: float) -> np.ndarray:
    return idf_t * tf_norm_vec(tfs, doc_lens, avg_dl)
