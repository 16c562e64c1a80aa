"""Deduplication operators for the large-scale training-data toolkit.

All five operators follow the same Ray-Data shape: a vectorized
``map_batches`` fingerprint stage, a ``groupby`` on the fingerprint (the one
shuffle), and a cheap within-group resolution.  Survivor selection is
deterministic (min key) everywhere — the reference's only dedup,
``dropDuplicates(["paper_id"])`` (``create_lookup_table.py:34``), keeps an
arbitrary row; we pin the survivor so results are testable.

Scale notes baked into the design:
* candidate generation never does all-pairs over the corpus — pairs only
  form inside a bucket (hash / LSH band / simhash band / shared shingle);
* hot buckets are bounded (``max_df`` shingle cap, band width) — the dropped
  mass is the standard recall/cost dial, logged in the result;
* final connected components run on the driver ONLY over candidate pairs,
  which are orders of magnitude smaller than the corpus (documented
  assumption; an iterative min-label-propagation groupby replaces it when
  pairs themselves overflow the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count

from ..functions import textstats as ts
from ..functions.tokenize import tokenize_filtered

# ----------------------------------------------------------- exact dedup ---


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized-ish 64-bit content hash column (blake2b per string)."""
    h = np.fromiter((ts.hash64(t) & ((1 << 63) - 1)
                     for t in batch[text_col].to_pylist()),
                    dtype=np.int64, count=batch.num_rows)
    return batch.append_column("content_hash", pa.array(h, pa.int64()))


def exact_dedup(ds: Dataset, text_col: str = "text",
                key_col: str = "doc_id") -> Dataset:
    """Keep one row per distinct text: hash-partition on content hash, keep
    the min-key row per group (reference D1 analog, deterministic survivor)."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col),
                            batch_format="pyarrow")

    def first_by_key(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key_col).head(1)

    out = hashed.groupby("content_hash").map_groups(first_by_key,
                                                    batch_format="pandas")
    return out.drop_columns(["content_hash"])


# ------------------------------------------------------------ minhash-lsh ---


class MinHashBands:
    """docs -> (doc_id, band, band_hash) rows, ``num_bands`` per doc.

    Actor-pool stage: permutation params are built once per actor.
    """

    def __init__(self, num_perm: int = 128, num_bands: int = 16,
                 shingle_k: int = 3, text_col: str = "text"):
        assert num_perm % num_bands == 0
        self.a, self.b = ts.minhash_params(num_perm)
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        self.shingle_k = shingle_k
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = ts.shingle_hashes(tokenize_filtered(text), self.shingle_k)
        return ts.minhash_signature(sh, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])  # (n, num_perm)
        n = sigs.shape[0]
        bands = sigs.reshape(n, self.num_bands, self.rows_per_band)
        # hash each band slice to one 63-bit value (vectorized fold)
        acc = np.zeros((n, self.num_bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            acc = (acc * np.uint64(1099511628211)) ^ bands[:, :, r]
        band_hash = (acc & np.uint64((1 << 63) - 1)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(np.repeat(doc_ids, self.num_bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(self.num_bands, dtype=np.int32), n),
                             pa.int32()),
            "band_hash": pa.array(band_hash.reshape(-1), pa.int64()),
        })


def _pairs_from_groups(g: pd.DataFrame) -> pd.DataFrame:
    """All (a < b) pairs within one bucket."""
    ids = np.sort(g["doc_id"].to_numpy())
    ids = np.unique(ids)
    if ids.size < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    ai, bi = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"a": ids[ai], "b": ids[bi]})


def candidate_pairs_minhash(ds: Dataset, num_perm: int = 128,
                            num_bands: int = 16, shingle_k: int = 3,
                            concurrency=(2, 8)) -> Dataset:
    """LSH candidate pairs: same (band, band_hash) bucket => candidate."""
    bands = ds.map_batches(MinHashBands,
                           fn_constructor_kwargs={"num_perm": num_perm,
                                                  "num_bands": num_bands,
                                                  "shingle_k": shingle_k},
                           batch_format="pyarrow", concurrency=concurrency)
    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        _pairs_from_groups, batch_format="pandas")
    # distinct pairs (a doc pair can collide in several bands)
    return pairs.groupby(["a", "b"]).aggregate(Count(alias_name="n_bands"))


def _union_find_groups(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find over the (small) candidate pair set ->
    {doc_id: group_min}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def minhash_dedup_groups(ds: Dataset, threshold: float = 0.8,
                         num_perm: int = 128, num_bands: int = 16,
                         shingle_k: int = 3,
                         text_col: str = "text") -> pa.Table:
    """Near-dup groups via MinHash+LSH: candidates from band buckets, then
    signature-estimated Jaccard >= threshold, then connected components.
    Returns (doc_id, group_id) for docs in a group (group_id = min doc_id).
    """
    cand = candidate_pairs_minhash(ds, num_perm, num_bands, shingle_k)
    pairs = cand.to_pandas()  # candidate set — small by construction
    if len(pairs) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "group_id": pa.array([], pa.int64())})
    # verify with signature Jaccard estimate over only the candidate docs
    need = sorted(int(x) for x in (set(pairs["a"]) | set(pairs["b"])))
    mh = MinHashBands(num_perm, num_bands, shingle_k, text_col)

    def sig_batch(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b["doc_id"], value_set=pa.array(need, pa.int64()))
        b = b.filter(keep)
        sigs = [mh.signature(t) for t in b[text_col].to_pylist()]
        return pa.table({
            "doc_id": b["doc_id"],
            "sig": pa.array([s.astype(np.int64).tolist() for s in sigs],
                            pa.list_(pa.int64())),
        })

    sig_tbl = ds.map_batches(sig_batch, batch_format="pyarrow").to_pandas()
    sig_map = {int(r.doc_id): np.asarray(r.sig, dtype=np.int64)
               for r in sig_tbl.itertuples()}
    verified = []
    for a, b_ in zip(pairs["a"], pairs["b"]):
        est = float((sig_map[int(a)] == sig_map[int(b_)]).mean())
        if est >= threshold:
            verified.append((int(a), int(b_)))
    groups = _union_find_groups(verified)
    if not groups:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "group_id": pa.array([], pa.int64())})
    items = sorted(groups.items())
    return pa.table({"doc_id": pa.array([k for k, _ in items], pa.int64()),
                     "group_id": pa.array([v for _, v in items], pa.int64())})


# ---------------------------------------------------------------- simhash ---


class SimHashStage:
    """docs -> (doc_id, simhash, band0..band3) — 64-bit simhash split into
    four 16-bit bands; near-dups (hamming <= 3) share at least one band."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"]
        sims = np.fromiter(
            (ts.simhash64(tokenize_filtered(t)) & ((1 << 63) - 1)
             for t in batch[self.text_col].to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        cols = {"doc_id": doc_ids, "simhash": pa.array(sims, pa.int64())}
        for band in range(4):
            cols[f"band{band}"] = pa.array(
                ((sims.astype(np.uint64) >> np.uint64(16 * band))
                 & np.uint64(0xFFFF)).astype(np.int32), pa.int32())
        return pa.table(cols)


def simhash_dedup_pairs(ds: Dataset, max_hamming: int = 3,
                        text_col: str = "text") -> pa.Table:
    """Candidate pairs sharing any 16-bit band, verified hamming <= max_hamming.
    Returns (a, b, hamming)."""
    sigs = ds.map_batches(SimHashStage,
                          fn_constructor_kwargs={"text_col": text_col},
                          batch_format="pyarrow", concurrency=(1, 4))
    # consumed 5x below (4 band groupbys + the signature pull); without
    # materialize the per-doc simhash stage re-executes on every consumption
    sigs = sigs.materialize()
    pair_parts = []
    for band in range(4):
        p = sigs.select_columns(["doc_id", f"band{band}"]) \
                .groupby(f"band{band}") \
                .map_groups(_pairs_from_groups, batch_format="pandas")
        pair_parts.append(p)
    allp = pair_parts[0].union(*pair_parts[1:])
    cand = allp.groupby(["a", "b"]).aggregate(Count(alias_name="n")).to_pandas()
    sim_map = {int(r.doc_id): int(r.simhash)
               for r in sigs.select_columns(["doc_id", "simhash"]).to_pandas().itertuples()}
    rows = []
    for a, b in zip(cand["a"], cand["b"]):
        h = ts.hamming64(sim_map[int(a)], sim_map[int(b)])
        if h <= max_hamming:
            rows.append((int(a), int(b), h))
    rows.sort()
    return pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                     "b": pa.array([r[1] for r in rows], pa.int64()),
                     "hamming": pa.array([r[2] for r in rows], pa.int32())})


# ----------------------------------------------------- n-gram Jaccard ------


def shingle_rows(batch: pa.Table, k: int = 3,
                 text_col: str = "text") -> pa.Table:
    """docs -> distinct (doc_id, shingle) rows (set semantics per doc)."""
    out_doc, out_sh = [], []
    for did, txt in zip(batch["doc_id"].to_pylist(),
                        batch[text_col].to_pylist()):
        sh = set(ts.shingle_hashes(tokenize_filtered(txt), k).tolist())
        out_doc.extend([did] * len(sh))
        out_sh.extend(int(s) & ((1 << 63) - 1) for s in sh)
    return pa.table({"doc_id": pa.array(out_doc, pa.int64()),
                     "shingle": pa.array(out_sh, pa.int64())})


def ngram_jaccard_pairs(ds: Dataset, threshold: float = 0.8, k: int = 3,
                        max_df: int = 64, text_col: str = "text") -> pa.Table:
    """Exact n-gram-set Jaccard >= threshold via shared-shingle candidate
    generation (no all-pairs).  Shingles appearing in > max_df docs are
    dropped from candidate generation (hot-bucket cap; identical cap in the
    SQL oracle keeps the comparison exact).  Returns (a, b, jaccard_m) with
    jaccard_m = round(jaccard*1000) as int64.
    """
    sh = ds.map_batches(lambda b: shingle_rows(b, k, text_col),
                        batch_format="pyarrow")
    sh = sh.materialize()  # consumed twice (sizes + intersections)
    sizes = sh.groupby("doc_id").aggregate(Count(alias_name="sz")).to_pandas()
    size_map = dict(zip(sizes["doc_id"].astype(int), sizes["sz"].astype(int)))

    def bounded_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_df:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        return _pairs_from_groups(g)

    inter = sh.groupby("shingle").map_groups(bounded_pairs, batch_format="pandas") \
              .groupby(["a", "b"]).aggregate(Count(alias_name="inter")).to_pandas()
    rows = []
    for a, b, n_int in zip(inter["a"], inter["b"], inter["inter"]):
        a, b, n_int = int(a), int(b), int(n_int)
        union = size_map[a] + size_map[b] - n_int
        j = n_int / union if union else 1.0
        if j >= threshold:
            rows.append((a, b, int(np.floor(j * 1000 + 0.5))))
    rows.sort()
    return pa.table({"a": pa.array([r[0] for r in rows], pa.int64()),
                     "b": pa.array([r[1] for r in rows], pa.int64()),
                     "jaccard_m": pa.array([r[2] for r in rows], pa.int64())})


# ------------------------------------------------- embedding cosine dedup ---


def embedding_dup_pairs(ds: Dataset, threshold: float = 0.95,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> pa.Table:
    """Near-dup pairs by embedding cosine >= threshold.

    Baseline path: every batch multiplies against the full (broadcast)
    matrix — O(n^2) flops but distributed and vectorized; ray.put ships the
    matrix to the object store ONCE.  Scale path = LSH-bucketed variant in
    ``stages/similarity.py``.  Returns (a, b, cos_m).
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    mat = np.stack(full[vec_col].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat))

    def batch_pairs(b: pa.Table) -> pa.Table:
        ids_a, m = ray.get(ref)
        bids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = np.stack(b[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        cos = bm @ m.T
        ai, bi = np.nonzero(cos >= threshold)
        a_ids, b_ids = bids[ai], ids_a[bi]
        keep = a_ids < b_ids  # dedupe symmetric + self pairs
        cos_m = np.floor(np.abs(cos[ai, bi][keep]) * 1000 + 0.5) * \
            np.sign(cos[ai, bi][keep])
        return pa.table({"a": pa.array(a_ids[keep], pa.int64()),
                         "b": pa.array(b_ids[keep], pa.int64()),
                         "cos_m": pa.array(cos_m.astype(np.int64), pa.int64())})

    out = ds.map_batches(batch_pairs, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
