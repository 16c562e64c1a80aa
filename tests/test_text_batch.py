"""Batch (Arrow/numpy) text-stat kernels vs their per-string scalar twins
in functions/textstats.py, over the fixture corpus + adversarial strings."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions import (
    textstats as ts,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.tokenize import (
    tokenize_filtered,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages import (
    text as tx,
)

EDGE = [
    "",                       # empty
    "   ",                    # whitespace only
    "the the the",            # stop words only
    "one",                    # single token (< window)
    "a b c d e f g",          # short
    "café déjà-vu naïve",     # non-ASCII
    "der die das und ist nicht ein gut",   # German markers
    "le la les et est une bonne chose",    # French markers
    "!!! ??? ... ,,,",        # punctuation only
    "word " * 500,            # long, one distinct shingle
]


@pytest.fixture(scope="module")
def corpus():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    return t["text"].to_pylist() + EDGE


def test_batch_quality_matches_scalar(corpus):
    arr = pa.array(corpus, pa.string())
    got = tx.batch_quality(arr, len(corpus))
    for i, txt in enumerate(corpus):
        want = ts.quality_features(txt)
        assert got["n_tokens"][i] == want["n_tokens"], (i, txt[:40])
        assert abs(got["stop_ratio"][i] - want["stop_ratio"]) < 1e-12
        assert abs(got["punct_ratio"][i] - want["punct_ratio"]) < 1e-12
        assert abs(got["mean_token_len"][i] - want["mean_token_len"]) < 1e-12


def test_batch_token_counts_matches_scalar(corpus):
    # ASCII corpus only: the batch path uses RE2 ASCII classes (the SQL
    # oracle's), the scalar path Python \w UNICODE — they agree on ASCII
    ascii_only = [t for t in corpus if t.isascii()]
    arr = pa.array(ascii_only, pa.string())
    got = tx.batch_token_counts(arr)
    for i, txt in enumerate(ascii_only):
        assert got["ws_tokens"][i] == ts.ws_token_count(txt)
        assert got["bpe_tokens"][i] == ts.bpe_token_count(txt)


def test_batch_lang_id_matches_scalar(corpus):
    corpus = corpus + ["中文文本测试中文文本测试"]
    arr = pa.array(corpus, pa.string())
    got = tx.batch_lang_id(arr, len(corpus))
    for i, txt in enumerate(corpus):
        assert got[i] == ts.lang_id(txt), (i, txt[:40], got[i])


def test_batch_fingerprint_matches_scalar(corpus):
    arr = pa.array(corpus, pa.string())
    got = tx.batch_fingerprint(arr, len(corpus))
    for i, txt in enumerate(corpus):
        toks = tokenize_filtered(txt)
        assert int(got["simhash"][i]) == ts.simhash64(toks), (i, txt[:40])
        assert got["n_fp"][i] == len(ts.rolling_fingerprint(toks)), (i, txt[:40])


def test_bpe_twins_agree_on_non_ascii():
    """Scalar and vectorized BPE counters share ASCII \\w semantics (the
    RE2 kernel and the SQL oracle are ASCII-classed; the scalar must
    match — advice round 2)."""
    import pyarrow as pa

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions import (
        textstats as ts,
    )
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.text import (
        batch_token_counts,
    )
    texts = ["café naïve", "日本語 text", "años 1999!", "plain ascii"]
    got = batch_token_counts(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        assert got["bpe_tokens"][i] == ts.bpe_token_count(t), t
