"""Test-set decontamination + repetition quality signals (the two
round-4 LLM-training-data additions)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.decontaminate import (
    ContaminationTagger,
    benchmark_ngram_hashes,
    decontaminate,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.text import (
    batch_repetition,
)

BENCH = pa.table({
    "doc_id": pa.array([100, 101], pa.int64()),
    "text": pa.array([
        "the quick brown fox jumps over the lazy dog tonight",
        "four score and seven years ago our fathers brought forth",
    ], pa.string()),
})

DOCS = [
    # 0: verbatim benchmark row -> contaminated
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    # 1: contains a benchmark 5-gram inside other text -> contaminated
    (1, "intro words then quick brown fox jumps over and outro"),
    # 2: shares only 4-gram-or-shorter overlap -> clean
    (2, "quick brown fox jumps somewhere else entirely today"),
    # 3: unrelated -> clean
    (3, "completely unrelated sentence about distributed dataframes"),
    # 4: empty -> clean
    (4, ""),
]


def _docs_ds():
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string()),
    })).repartition(3)


def test_tag_mode(ray_session):
    out = pa.concat_tables(list(
        decontaminate(_docs_ds(), BENCH, n=5)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["contaminated"].to_pylist()))
    assert got == {0: 1, 1: 1, 2: 0, 3: 0, 4: 0}
    hits = dict(zip(out["doc_id"].to_pylist(), out["n_hits"].to_pylist()))
    assert hits[0] > hits[1] >= 1


def test_drop_mode_keeps_all_columns(ray_session):
    out = pa.concat_tables(list(
        decontaminate(_docs_ds(), BENCH, n=5, mode="drop")
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    assert sorted(out["doc_id"].to_pylist()) == [2, 3, 4]
    assert set(out.column_names) == {"doc_id", "text"}


def test_short_doc_whole_shingle(ray_session):
    """A doc shorter than n tokens is matched as one whole-list shingle —
    a verbatim short benchmark row is still caught."""
    bench = pa.table({"doc_id": pa.array([9], pa.int64()),
                      "text": pa.array(["tiny benchmark row"], pa.string())})
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["tiny benchmark row",
                          "tiny benchmark sentence"], pa.string())}))
    out = pa.concat_tables(list(
        decontaminate(docs, bench, n=13)
        .iter_batches(batch_format="pyarrow", batch_size=None)))
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["contaminated"].to_pylist()))
    assert got == {0: 1, 1: 0}


def test_benchmark_hashes_empty():
    assert benchmark_ngram_hashes(
        pa.table({"text": pa.array([], pa.string())})).size == 0


def test_tagger_matches_bruteforce(ray_session):
    """Distinct-hit counts equal a brute-force set intersection."""
    import ray as _ray

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.textstats import (
        shingle_hashes,
    )
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.tokenize import (
        tokenize_filtered,
    )
    bench_h = set(benchmark_ngram_hashes(BENCH, 5).tolist())
    ref = _ray.put(benchmark_ngram_hashes(BENCH, 5))
    tagger = ContaminationTagger(ref, n=5)
    out = tagger(pa.table({
        "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string())}))
    for i, (_, text) in enumerate(DOCS):
        want = len({int(h) for h in
                    shingle_hashes(tokenize_filtered(text), 5)} & bench_h)
        assert out["n_hits"][i].as_py() == want


def test_repetition_signals_handcheck():
    t = pa.array([
        "the cat cat cat sat",            # stop-filtered: cat cat cat sat
        "x y x y x y x y x y",
        "",
        "one two three four five one two three four five",
    ])
    r = batch_repetition(t, 4)
    assert r["top_token_frac_m"].tolist() == [750, 500, 0, 200]
    assert r["top_2gram_frac_m"].tolist() == [1000, 1000, 0, 400]
    assert r["dup_5gram_frac_m"].tolist() == [0, 667, 0, 167]


def test_repetition_batch_invariant(ray_session):
    """Per-doc signals are independent of batching/partitioning."""
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta"]
    texts = [" ".join(rng.choice(words, rng.integers(0, 30)))
             for _ in range(50)]
    whole = batch_repetition(pa.array(texts), len(texts))
    for k in whole:
        parts = [batch_repetition(pa.array(texts[i:i + 7]),
                                  len(texts[i:i + 7]))[k]
                 for i in range(0, 50, 7)]
        assert np.concatenate(parts).tolist() == whole[k].tolist(), k


def test_kmeans_hash_deterministic_and_batch_invariant(ray_session):
    """Integer Lloyd's: same centroids on reruns; distributed assignment
    equals a single-batch assignment (broadcast math is stateless)."""
    import numpy as np

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.similarity import (
        kmeans_hash_assign,
        kmeans_hash_fit,
    )
    rng = np.random.default_rng(11)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    ids = np.arange(200, dtype=np.int64)
    c1 = kmeans_hash_fit(ids, x, k=6, iters=4)
    c2 = kmeans_hash_fit(ids, x, k=6, iters=4)
    assert (c1 == c2).all()
    whole = kmeans_hash_assign(x, c1)
    parts = np.concatenate([kmeans_hash_assign(x[i:i + 37], c1)
                            for i in range(0, 200, 37)])
    assert (whole == parts).all()
    assert len(set(whole.tolist())) > 1  # not degenerate
