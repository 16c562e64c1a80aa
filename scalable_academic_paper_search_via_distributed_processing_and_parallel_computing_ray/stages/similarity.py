"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul and emits only its LOCAL
  top-k per query, and a final tiny ``groupby(query_id)`` merge resolves the
  global top-k.  This is the scale-correct shape: per-batch work is one
  GEMM, the shuffle carries k rows per (query, batch), never the corpus.
  (Reference analog: FAISS brute/IVF search ``semantic_index/search.py:34-40``.)

* :func:`knn_ivf` — IVF-bucketed approximate variant: deterministic k-means
  (numpy, fixed seed, driver-side fit on a sample — the reference fits KMeans
  on a 1% sample the same way, ``calculate_fwci.py:56-63``), assignment +
  per-bucket brute force over only ``nprobe`` probed lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _quant_m(x: np.ndarray) -> np.ndarray:
    """round(x*1000) half away from zero, as int64 (driver milli scale)."""
    x = np.asarray(x, dtype=np.float64)
    return (np.floor(np.abs(x) * 1000 + 0.5) * np.sign(x)).astype(np.int64)


def _tie_safe_keep(cos_m: np.ndarray, k: int) -> np.ndarray:
    """Boolean mask keeping every row whose QUANTIZED score ties-or-beats
    the k-th largest quantized score.  Final rank is assigned on
    (cos_m desc, vec_id asc) — numpy and DuckDB compose floats in different
    orders, so raw-float cuts can flip sub-milli near-ties; a fixed
    headroom (old k*3) was still unsafe if ties straddled its boundary.
    Any row this mask drops has cos_m strictly below at least k kept rows,
    so it can never enter the global top-k regardless of vec_id."""
    kk = min(k, cos_m.size)
    if kk == 0:
        return np.zeros(0, dtype=bool)
    v = -np.partition(-cos_m, kk - 1)[kk - 1]
    return cos_m >= v


def _topk_merge(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Per-query merge of per-batch candidates: tie-safe quantized cut."""
    return g[_tie_safe_keep(_quant_m(g["cos"].to_numpy()), k)]


def _rank_quantized(merged: pd.DataFrame, k: int) -> pa.Table:
    """(query_id, rank, vec_id, cos_m): rank per query on (cos_m desc,
    vec_id asc), identical to the oracle SQL's ordering."""
    cos = merged["cos"].to_numpy()
    merged = merged.assign(cos_m=(np.floor(np.abs(cos) * 1000 + 0.5)
                                  * np.sign(cos)).astype(np.int64))
    parts = []
    for qid, g in merged.groupby("query_id", sort=True):
        g = g.sort_values(["cos_m", "vec_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        parts.append(g[["query_id", "rank", "vec_id", "cos_m"]])
    if not parts:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cos_m": pa.array([], pa.int64())})
    out = pd.concat(parts, ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def knn_brute(ds: Dataset, queries: np.ndarray, k: int = 10,
              id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k for each query row in ``queries`` (q, dim).

    Returns (query_id, rank, vec_id, cos_m) — cos_m = round(cos*1000).
    """
    import ray

    q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(q)
    nq = q.shape[0]

    def local_topk(b: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(b[vec_col].to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        cos = qm @ m.T                                   # (nq, nb)
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(nq):
            # tie-safe local cut on the QUANTIZED score: keeps the k-th
            # value's whole tie class, so no sub-milli near-tie that the
            # global (cos_m desc, vec_id asc) rank would keep is dropped
            sel = np.flatnonzero(_tie_safe_keep(_quant_m(cos[qi]), k))
            rows_q.extend([qi] * sel.size)
            rows_v.extend(ids[sel].tolist())
            rows_c.extend(cos[qi, sel].tolist())
        return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                         "vec_id": pa.array(rows_v, pa.int64()),
                         "cos": pa.array(rows_c, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    merged = partials.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pandas").to_pandas()
    return _rank_quantized(merged, k)


def kmeans_fit(sample: np.ndarray, nlist: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd's k-means on normalized vectors (driver-side)."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample.astype(np.float64))
    nlist = min(nlist, x.shape[0])
    cent = x[rng.choice(x.shape[0], nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(nlist):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(ds: Dataset, queries: np.ndarray, k: int = 10, nlist: int = 16,
            nprobe: int = 4, sample_n: int = 2048,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42) -> pa.Table:
    """IVF approximate top-k: probe only the ``nprobe`` closest centroid
    buckets per query.  With nprobe == nlist this is exactly knn_brute.
    Returns (query_id, rank, vec_id, cos_m)."""
    import ray

    sample = ds.limit(sample_n).to_pandas()
    smat = np.stack(sample[vec_col].to_numpy())
    cent = kmeans_fit(smat, nlist, seed=seed)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # per-query probed cells
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]      # (nq, nprobe)
    ref = ray.put((q, cent, probe))
    nq = q.shape[0]

    def local_topk(b: pa.Table) -> pa.Table:
        qm, cm, pr = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(b[vec_col].to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        cell = np.argmax(m @ cm.T, axis=1)                      # IVF assignment
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(nq):
            mask = np.isin(cell, pr[qi])
            if not mask.any():
                continue
            sub_ids, sub = ids[mask], m[mask]
            cos = qm[qi] @ sub.T
            sel = np.flatnonzero(_tie_safe_keep(_quant_m(cos), k))
            rows_q.extend([qi] * sel.size)
            rows_v.extend(sub_ids[sel].tolist())
            rows_c.extend(cos[sel].tolist())
        return pa.table({"query_id": pa.array(rows_q, pa.int64()),
                         "vec_id": pa.array(rows_v, pa.int64()),
                         "cos": pa.array(rows_c, pa.float64())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    merged = partials.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pandas").to_pandas()
    return _rank_quantized(merged, k)
