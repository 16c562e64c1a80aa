"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), every batch does one numpy matmul and emits only its LOCAL
  top-k per query, and a final tiny ``groupby(query_id)`` merge resolves the
  global top-k.  This is the scale-correct shape: per-batch work is one
  GEMM, the shuffle carries k rows per (query, batch), never the corpus.
  (Reference analog: FAISS brute/IVF search ``semantic_index/search.py:34-40``.)

* :func:`build_ivf` / :func:`ivf_search` — PERSISTED IVF index: deterministic
  k-means centroids (numpy, fixed seed, driver-side fit on a sample — the
  reference fits on a sample the same way, ``calculate_fwci.py:56-63``),
  vectors written as cell-partitioned parquet, queries reading only their
  ``nprobe`` probed cells' files (the FAISS IVF build+save / load+search
  cycle of ``semantic_index/build_index.py:36-48`` + ``search.py:34-40``,
  re-expressed as a parquet layout).  :func:`knn_ivf` wraps build+search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from ..state import fsio


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


def _topk_merge(g: pa.Table, k: int) -> pa.Table:
    """Per-query merge of per-batch candidates: tie-safe quantized cut."""
    cos = g["cos"].to_numpy(zero_copy_only=False)
    return g.filter(pa.array(_tie_safe_keep(_quant_m(cos), k)))


_EMPTY_RESULT = pa.table({"query_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64()),
                          "vec_id": pa.array([], pa.int64()),
                          "cos_m": pa.array([], pa.int64())})

_EMPTY_CAND = pa.table({"query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cos": pa.array([], pa.float64())})


def _collect_arrow(ds: Dataset) -> pa.Table:
    """Driver-side collection of a (bounded, post-merge) candidate set."""
    tbls = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    tbls = [t for t in tbls if t.num_rows]
    return pa.concat_tables(tbls) if tbls else _EMPTY_CAND


def _rank_quantized(merged: pa.Table, k: int) -> pa.Table:
    """(query_id, rank, vec_id, cos_m): rank per query on (cos_m desc,
    vec_id asc), identical to the oracle SQL's ordering.  One vectorized
    lexsort + run-relative rank — no per-group pandas loop."""
    if merged.num_rows == 0:
        return _EMPTY_RESULT
    qid = merged["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    vid = merged["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cos_m = _quant_m(merged["cos"].to_numpy(zero_copy_only=False))
    order = np.lexsort((vid, -cos_m, qid))  # qid asc, cos_m desc, vid asc
    qid, vid, cos_m = qid[order], vid[order], cos_m[order]
    starts = np.flatnonzero(np.r_[True, qid[1:] != qid[:-1]])
    run_len = np.diff(np.r_[starts, qid.size])
    rank = np.arange(qid.size, dtype=np.int64) - np.repeat(starts,
                                                           run_len) + 1
    keep = rank <= k
    return pa.table({"query_id": pa.array(qid[keep], pa.int64()),
                     "rank": pa.array(rank[keep], pa.int64()),
                     "vec_id": pa.array(vid[keep], pa.int64()),
                     "cos_m": pa.array(cos_m[keep], pa.int64())})


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
    merged = _collect_arrow(partials.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pyarrow"))
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


def _kmeans_euclid(x: np.ndarray, ks: int, iters: int = 10,
                   seed: int = 0) -> np.ndarray:
    """Deterministic Lloyd's k-means, EUCLIDEAN objective, no row
    normalization (for PQ sub-vectors — normalizing 8-dim slices would
    destroy the magnitudes that make the codebook reconstructive)."""
    rng = np.random.RandomState(seed)
    ks = min(ks, x.shape[0])
    cent = x[rng.choice(x.shape[0], ks, replace=False)].copy()
    for _ in range(iters):
        d2 = ((x ** 2).sum(1)[:, None] - 2.0 * (x @ cent.T)
              + (cent ** 2).sum(1)[None, :])
        assign = np.argmin(d2, axis=1)
        for c in range(ks):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_fit(sample: np.ndarray, m: int, ks: int = 256,
           seed: int = 42) -> np.ndarray:
    """Product-quantizer codebooks (m, ks, dim/m) fit on NORMALIZED sample
    vectors — the reference trains FAISS IVF**PQ** with m=64, nbits=8
    (``semantic_index/build_index.py:37-39``); this is the same sketch with
    numpy k-means per subspace (nbits=8 -> ks=256 -> uint8 codes)."""
    x = _normalize(sample.astype(np.float64))
    d = x.shape[1]
    assert d % m == 0, f"dim {d} not divisible by pq_m {m}"
    dsub = d // m
    return np.stack([
        _kmeans_euclid(x[:, i * dsub:(i + 1) * dsub], ks, seed=seed + i)
        for i in range(m)
    ])  # (m, ks, dsub)


def pq_encode(vecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Normalized vectors (n, d) -> uint8 codes (n, m): per subspace, the
    euclidean-nearest codebook entry."""
    m, ks, dsub = codebooks.shape
    n = vecs.shape[0]
    codes = np.empty((n, m), dtype=np.uint8)
    for i in range(m):
        sub = vecs[:, i * dsub:(i + 1) * dsub]
        cb = codebooks[i]
        d2 = (cb ** 2).sum(1)[None, :] - 2.0 * (sub @ cb.T)  # +|x|^2 const
        codes[:, i] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def build_ivf(ds: Dataset, index_dir: str, nlist: int = 16,
              sample_n: int = 2048, id_col: str = "vec_id",
              vec_col: str = "embedding", seed: int = 42,
              pq_m: int | None = None, pq_ks: int = 256) -> dict:
    """Build a PERSISTED IVF index: vectors written as parquet partitioned
    by centroid cell (hive layout, ``cell=N/`` dirs), centroids + params in
    a manifest committed LAST (readers key off it).  This is the on-disk
    analog of the reference's FAISS IVF build+save
    (``semantic_index/build_index.py:36-48``): queries then touch only
    their probed cells' FILES — I/O-level pruning, not just a masked GEMM
    (the round-1 knn_ivf still scanned every row per batch).

    With ``pq_m`` set, the scanned cell files hold uint8 PQ codes instead
    of raw vectors (``pq_m`` bytes/vector — the reference's IVFPQ stores
    64 bytes/vector the same way), and the raw vectors move to a separate
    ``raw/`` per-cell store sorted by id that only the exact RE-RANK of a
    query's shortlist ever touches (id-filtered reads prune on row-group
    statistics).  At 100 TB the ADC scan reads ~pq_m/(4*dim) of the raw
    footprint; the re-rank reads O(shortlist) rows."""
    import ray

    sample = ds.limit(sample_n).to_pandas()
    cent = kmeans_fit(np.stack(sample[vec_col].to_numpy()), nlist, seed=seed)
    codebooks = (pq_fit(np.stack(sample[vec_col].to_numpy()), pq_m, pq_ks,
                        seed=seed) if pq_m else None)
    cref = ray.put((cent, codebooks))

    def assign(b: pa.Table) -> pa.Table:
        cm, _ = ray.get(cref)
        m = _normalize(np.stack(b[vec_col].to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        cell = np.argmax(m @ cm.T, axis=1).astype(np.int32)
        return pa.table({id_col: b[id_col], vec_col: b[vec_col],
                         "cell": pa.array(cell, pa.int32())})

    def assign_codes(b: pa.Table) -> pa.Table:
        cm, cb = ray.get(cref)
        m = _normalize(np.stack(b[vec_col].to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        cell = np.argmax(m @ cm.T, axis=1).astype(np.int32)
        codes = pq_encode(m, cb)
        code_col = pa.FixedSizeListArray.from_arrays(
            pa.array(codes.reshape(-1), pa.uint8()), codes.shape[1])
        return pa.table({id_col: b[id_col], "code": code_col,
                         "cell": pa.array(cell, pa.int32())})

    fsio.makedirs(index_dir, exist_ok=True)
    # cell data lives under cells/ so the manifest never pollutes the
    # parquet dataset directory scan; all paths ride the fsio seam so
    # index_dir may be a URI (same contract as the BM25 index_dir)
    cells_fs, cells_p = fsio.ray_fs_path(fsio.join(index_dir, "cells"))
    raw_fs, raw_p = fsio.ray_fs_path(fsio.join(index_dir, "raw"))
    src = ds.select_columns([id_col, vec_col])
    # min_rows_per_file coalesces task outputs so a many-block input does
    # not fragment into one tiny file per (task, cell) — per-file footers
    # would otherwise dwarf the column payload on small corpora and bloat
    # the file-listing metadata at large ones
    if pq_m:
        # two streaming passes over the (cheaply re-readable) source beat
        # materializing the corpus in the object store between two sinks
        src.map_batches(assign_codes, batch_format="pyarrow") \
            .write_parquet(cells_p, partition_cols=["cell"],
                           min_rows_per_file=65536, filesystem=cells_fs)
        src.map_batches(assign, batch_format="pyarrow") \
            .sort([id_col]) \
            .write_parquet(raw_p, partition_cols=["cell"],
                           min_rows_per_file=65536, filesystem=raw_fs)
    else:
        src.map_batches(assign, batch_format="pyarrow") \
            .write_parquet(cells_p, partition_cols=["cell"],
                           min_rows_per_file=65536, filesystem=cells_fs)
    manifest = {"nlist": int(cent.shape[0]), "dim": int(cent.shape[1]),
                "seed": seed, "id_col": id_col, "vec_col": vec_col,
                "centroids": cent.tolist()}
    if pq_m:
        manifest["pq"] = {"m": int(pq_m), "ks": int(codebooks.shape[1]),
                          "codebooks": codebooks.tolist()}
    fsio.write_json_atomic(fsio.join(index_dir, "ivf_manifest.json"),
                           manifest)
    return manifest


def _probed_cells_ds(index_dir: str, cells: list) -> "Dataset | None":
    """ONE ``read_parquet`` over the probed cells' files (I/O pruning is
    explicit: Ray 2.49's read_parquet filter can't prune on virtual hive
    columns, and a union chain of per-cell reads costs one read operator
    per cell — at nprobe == nlist that union dominated the query).  Hive
    inference re-attaches the ``cell`` column from each ``cell=N`` path
    segment (as a string — callers cast)."""
    import ray.data as rd
    fs, _ = fsio.ray_fs_path(index_dir)
    files: list[str] = []
    for c in cells:
        d = fsio.join(index_dir, "cells", f"cell={c}")
        if not fsio.isdir(d):
            continue
        files += [fsio.ray_fs_path(fsio.join(d, f))[1]
                  for f in fsio.listdir(d) if f.endswith(".parquet")]
    if not files:
        return None  # every probed cell empty: never written
    return rd.read_parquet(files, filesystem=fs)


def _pq_rerank(index_dir: str, man: dict, q: np.ndarray,
               shortlist: pd.DataFrame, k: int) -> pa.Table:
    """Exact re-rank of an ADC shortlist: one Ray task per involved cell
    reads the id-SORTED raw store with an ``id in shortlist`` filter
    (row-group statistics prune the scan), then a tiny driver GEMM scores
    the fetched rows exactly.  I/O is O(shortlist), not O(probed cells)."""
    import ray

    id_col, vec_col = man["id_col"], man["vec_col"]

    @ray.remote
    def fetch(cdir: str, ids: list):
        import pyarrow.dataset as pads

        from ..state import fsio as _fsio
        fs, p = _fsio.resolve(cdir)
        dset = pads.dataset(p, format="parquet", filesystem=fs)
        return dset.to_table(columns=[id_col, vec_col],
                             filter=pads.field(id_col).isin(ids))

    by_cell = shortlist.groupby("cell")["vec_id"]
    parts = ray.get([
        fetch.remote(fsio.join(index_dir, "raw", f"cell={int(c)}"),
                     sorted(int(v) for v in ids))
        for c, ids in by_cell])
    need = {int(v): set() for v in shortlist["vec_id"]}
    for qi, vid in zip(shortlist["query_id"], shortlist["vec_id"]):
        need[int(vid)].add(int(qi))
    rows_q, rows_v, rows_c = [], [], []
    for t in parts:
        if not t.num_rows:
            continue
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(t[vec_col].to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        cos = q @ m.T                                      # (nq, n_fetch)
        for j, vid in enumerate(ids):
            for qi in need.get(int(vid), ()):
                rows_q.append(qi)
                rows_v.append(int(vid))
                rows_c.append(float(cos[qi, j]))
    merged = pa.table({"query_id": pa.array(rows_q, pa.int64()),
                       "vec_id": pa.array(rows_v, pa.int64()),
                       "cos": pa.array(rows_c, pa.float64())})
    return _rank_quantized(merged, k)


def ivf_search(index_dir: str, queries: np.ndarray, k: int = 10,
               nprobe: int = 4, rerank: int | None = None) -> pa.Table:
    """Approximate top-k against a :func:`build_ivf` index.  Reads ONLY the
    union of the queries' ``nprobe`` closest cells (parquet partition
    pruning pushes the cell filter to file selection); each batch then
    GEMMs against just the queries probing its cell.  With nprobe == nlist
    results equal knn_brute.  Returns (query_id, rank, vec_id, cos_m).

    On a PQ index (``build_ivf(pq_m=...)``) the probed cells' uint8 codes
    are scanned with per-query ADC lookup tables, the per-query top
    ``rerank`` (default ``max(4k, 32)``) candidates form a shortlist, and
    the raw store is read ONLY for shortlist ids for an exact re-rank —
    the FAISS IVFPQ search shape (``semantic_index/search.py:34-40``)."""
    import ray
    import ray.data as rd

    man = fsio.read_json(fsio.join(index_dir, "ivf_manifest.json"))
    cent = np.asarray(man["centroids"], dtype=np.float64)
    id_col, vec_col = man["id_col"], man["vec_col"]
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]      # (nq, nprobe)
    cells = sorted({int(c) for c in probe.reshape(-1)})

    if man.get("pq"):
        cb = np.asarray(man["pq"]["codebooks"], dtype=np.float64)
        m_, ks_, dsub = cb.shape
        # per-query ADC tables: lut[qi, i, code] = q_sub_i . codebook[i, code]
        lut = np.einsum("qid,ikd->qik", q.reshape(q.shape[0], m_, dsub), cb)
        nshort = rerank if rerank is not None else max(4 * k, 32)
        ds = _probed_cells_ds(index_dir, cells)
        if ds is None:
            return _EMPTY_RESULT
        ref = ray.put((lut, probe))

        def local_adc(b: pa.Table) -> pa.Table:
            lt, pr = ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cell = b["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
            codes = np.stack(b["code"].to_numpy(zero_copy_only=False)) \
                .astype(np.int64)                           # (n, m)
            out_q, out_v, out_c, out_s = [], [], [], []
            cols = np.arange(codes.shape[1])
            for qi in range(lt.shape[0]):
                mask = np.isin(cell, pr[qi])
                if not mask.any():
                    continue
                sub = codes[mask]
                adc = lt[qi][cols[None, :], sub].sum(axis=1)  # (nsub,)
                keep = np.argsort(-adc)[:nshort]
                out_q.extend([qi] * keep.size)
                out_v.extend(ids[mask][keep].tolist())
                out_c.extend(cell[mask][keep].tolist())
                out_s.extend(adc[keep].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "vec_id": pa.array(out_v, pa.int64()),
                             "cell": pa.array(out_c, pa.int64()),
                             "adc": pa.array(out_s, pa.float64())})

        cand = ds.map_batches(local_adc, batch_format="pyarrow").to_pandas()
        if not len(cand):
            return _EMPTY_RESULT
        shortlist = (cand.sort_values("adc", ascending=False)
                     .groupby("query_id", sort=False).head(nshort))
        return _pq_rerank(index_dir, man, q, shortlist, k)
    ds = _probed_cells_ds(index_dir, cells)
    if ds is None:
        return _EMPTY_RESULT
    ref = ray.put((q, probe))

    def local_topk(b: pa.Table) -> pa.Table:
        qm, pr = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = b["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(np.stack(b[vec_col].to_numpy(zero_copy_only=False))
                       .astype(np.float64))
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(qm.shape[0]):
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
    merged = _collect_arrow(partials.groupby("query_id").map_groups(
        lambda g: _topk_merge(g, k), batch_format="pyarrow"))
    return _rank_quantized(merged, k)


def knn_ivf(ds: Dataset, queries: np.ndarray, k: int = 10, nlist: int = 16,
            nprobe: int = 4, sample_n: int = 2048,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42, index_dir: str | None = None,
            pq_m: int | None = None, rerank: int | None = None) -> pa.Table:
    """Convenience wrapper: build (or reuse — caller owns invalidation) the
    persisted IVF index, then probe it.  ``index_dir=None`` -> fresh temp
    dir."""
    import tempfile

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivf_")
    if not fsio.exists(fsio.join(index_dir, "ivf_manifest.json")):
        # no manifest = never committed; scrub any partial build first so a
        # rebuild can't append a second copy of every vector into cells/
        fsio.rmtree(fsio.join(index_dir, "cells"), ignore_errors=True)
        build_ivf(ds, index_dir, nlist, sample_n, id_col, vec_col, seed,
                  pq_m=pq_m)
    return ivf_search(index_dir, queries, k, nprobe, rerank=rerank)


# --------------------------------------------------- oracle-exact k-means ---


def quantize_m(x: np.ndarray, scale: int = 1_000_000) -> np.ndarray:
    """Half-away-from-zero rounding to int64 (DuckDB ROUND twin)."""
    x = np.asarray(x, dtype=np.float64)
    return (np.floor(np.abs(x) * scale + 0.5) * np.sign(x)).astype(np.int64)


def kmeans_hash_fit(ids: np.ndarray, x: np.ndarray, k: int = 8,
                    iters: int = 5, salt: str = "kmeans") -> np.ndarray:
    """Deterministic INTEGER Lloyd's k-means -> quantized centroids
    (k, dim) int64.

    Every operation is exact integer (or one f64 divide of exact ints),
    so plain SQL replays the whole iteration bit-for-bit (the generated
    ``kmeans_assign`` oracle unrolls it): vectors micro-quantized,
    initial centroids = the k rows with smallest (hash64(salt:vec_id),
    vec_id), assignment = argmin squared euclidean with ties to the
    lowest centroid index, update = ROUND(mean) per dim with empty
    clusters keeping their previous centroid.  The float/cosine
    :func:`kmeans_fit` stays for IVF; this variant exists so iterative
    clustering can be VALUE-ORACLED, not just rows-checked."""
    from ..functions.textstats import hash64

    xq = quantize_m(x)
    h = np.fromiter((hash64(f"{salt}:{int(i)}") for i in ids),
                    np.uint64, len(ids))
    seed = np.lexsort((ids, h))[:min(k, len(ids))]
    cent = xq[seed].copy()

    def assign_to(c: np.ndarray) -> np.ndarray:
        d2 = ((xq[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(d2, axis=1)  # first min = lowest cid (SQL tie)

    for _ in range(iters):
        a = assign_to(cent)
        for c in range(cent.shape[0]):
            members = xq[a == c]
            if len(members):
                mean = members.sum(axis=0).astype(np.float64) / len(members)
                cent[c] = quantize_m(mean, 1)
    return cent


def kmeans_hash_assign(batch_x: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Final assignment of (possibly distributed) rows against broadcast
    quantized centroids — same integer math as the fit."""
    xq = quantize_m(batch_x)
    d2 = ((xq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int64)


# ------------------------------------------------ oracle-exact PQ / ADC ---


def pq_hash_fit(ids: np.ndarray, x: np.ndarray, m: int = 4, ks: int = 8,
                iters: int = 2) -> np.ndarray:
    """Deterministic integer PQ codebooks ``(m, ks, dim//m)`` int64.

    Each subspace trains an INDEPENDENT :func:`kmeans_hash_fit` (md5-hash
    seeded, exact-int Lloyd's) on its slice of the micro-quantized
    vectors, salted ``pq{i}`` so subspaces draw different seed rows.
    Everything — seeding, iteration, encoding, ADC — is exact int64, so
    the generated ``knn_ivf_pq_hash`` oracle replays the full train +
    encode + ADC-scan bit-for-bit in SQL (the same discipline that
    value-oracled the probe path via ``kmeans_hash_fit``).  The
    float/FAISS-style :func:`pq_fit` stays for the realistic IVFPQ index;
    this twin exists so the ADC path can be VALUE-ORACLED, not just
    recall-checked (reference trains FAISS IVFPQ:
    ``semantic_index/build_index.py:36-48``)."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return np.stack([
        kmeans_hash_fit(ids, x[:, i * sub:(i + 1) * sub], k=ks,
                        iters=iters, salt=f"pq{i}")
        for i in range(m)])


def pq_hash_encode(batch_x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode rows -> ``(n, m)`` int64 codes: per-subspace argmin exact
    squared distance, ties to the lowest code (np.argmin first-min ==
    the SQL ``ORDER BY d2, cid`` tie-break)."""
    m, _, sub = books.shape
    xq = quantize_m(batch_x)
    codes = np.empty((xq.shape[0], m), dtype=np.int64)
    for i in range(m):
        d2 = ((xq[:, None, i * sub:(i + 1) * sub]
               - books[i][None, :, :]) ** 2).sum(axis=2)
        codes[:, i] = np.argmin(d2, axis=1)
    return codes


def pq_hash_lut(q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Per-query ADC lookup table ``(m, ks)`` int64: exact squared
    distance of the query's quantized subvectors to every codeword.
    ``adc(v) = lut[range(m), codes[v]].sum()``."""
    m, _, sub = books.shape
    qq = quantize_m(q)
    return np.stack([
        ((qq[i * sub:(i + 1) * sub][None, :] - books[i]) ** 2).sum(axis=1)
        for i in range(m)])
