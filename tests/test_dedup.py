"""Dedup operator tests over a synthetic corpus with KNOWN duplicates
(the driver's documents table has none, so these fixtures create them)."""

import numpy as np
import pyarrow as pa
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages import (
    dedup,
)

BASE = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a completely different document about distributed query engines and shuffles",
    "numpy vectorized kernels make batch processing fast and memory friendly",
    "posting lists compress well with delta gaps and variable length integers",
]


@pytest.fixture(scope="module")
def dup_ds(ray_session):
    import ray.data as rd
    rows = []
    did = 0
    for i, text in enumerate(BASE):
        rows.append({"doc_id": did, "text": text}); did += 1
        # exact duplicate of every base doc
        rows.append({"doc_id": did, "text": text}); did += 1
        # near-duplicate: change the last word
        rows.append({"doc_id": did, "text": text.rsplit(" ", 1)[0] + " changed"})
        did += 1
    # unrelated singletons
    rows.append({"doc_id": did, "text": "orphan text one with unique words alpha beta"}); did += 1
    rows.append({"doc_id": did, "text": "another loner gamma delta epsilon entirely"}); did += 1
    return rd.from_items(rows)


def test_exact_dedup(dup_ds):
    out = dedup.exact_dedup(dup_ds).to_pandas()
    # 4 exact-dup pairs collapse -> 4 + 4 near + 2 singles = 10 survivors
    assert len(out) == 10
    # survivor is the min doc_id of each exact pair (0,3,6,9)
    for base_id in (0, 3, 6, 9):
        assert base_id in set(out["doc_id"])
        assert base_id + 1 not in set(out["doc_id"])


def test_exact_dedup_idempotent(dup_ds):
    once = dedup.exact_dedup(dup_ds)
    twice = dedup.exact_dedup(once).to_pandas()
    assert sorted(twice["doc_id"]) == sorted(dedup.exact_dedup(dup_ds).to_pandas()["doc_id"])


def test_minhash_groups(dup_ds):
    t = dedup.minhash_dedup_groups(dup_ds, threshold=0.5, num_perm=128,
                                   num_bands=32, shingle_k=3)
    groups: dict[int, list[int]] = {}
    for d, g in zip(t["doc_id"].to_pylist(), t["group_id"].to_pylist()):
        groups.setdefault(g, []).append(d)
    # each base triplet (exact dup + near dup) should land in one group
    for base_id in (0, 3, 6, 9):
        assert base_id in groups, f"base {base_id} found no group"
        members = set(groups[base_id])
        assert base_id + 1 in members  # exact dup always caught
    # singletons never grouped
    all_grouped = {d for mem in groups.values() for d in mem}
    assert 12 not in all_grouped and 13 not in all_grouped


def test_simhash_pairs(dup_ds):
    t = dedup.simhash_dedup_pairs(dup_ds, max_hamming=6)
    pairs = set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    for base_id in (0, 3, 6, 9):
        assert (base_id, base_id + 1) in pairs  # exact dups: hamming 0
    hams = dict(zip(zip(t["a"].to_pylist(), t["b"].to_pylist()),
                    t["hamming"].to_pylist()))
    assert hams[(0, 1)] == 0


def test_ngram_jaccard_pairs(dup_ds):
    t = dedup.ngram_jaccard_pairs(dup_ds, threshold=0.5, k=3, max_df=64)
    pairs = {(a, b): j for a, b, j in zip(t["a"].to_pylist(),
                                          t["b"].to_pylist(),
                                          t["jaccard_m"].to_pylist())}
    for base_id in (0, 3, 6, 9):
        assert pairs.get((base_id, base_id + 1)) == 1000  # identical sets
        assert (base_id, base_id + 2) in pairs  # near dup above 0.5
        assert pairs[(base_id, base_id + 2)] < 1000


def test_embedding_dup_pairs(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(0)
    base = rng.randn(6, 16).astype(np.float32)
    base[1] = base[0] + 0.01 * rng.randn(16).astype(np.float32)  # near-dup of 0
    ds = rd.from_items([
        {"vec_id": i, "embedding": base[i].tolist()} for i in range(6)])
    t = dedup.embedding_dup_pairs(ds, threshold=0.95)
    pairs = set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
    assert (0, 1) in pairs
    assert all(a == 0 and b == 1 for a, b in pairs)  # random others unrelated
