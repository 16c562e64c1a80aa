"""Tokenizer tests: Python truth vs Arrow fast path, Unicode, stop-words."""

import unicodedata

import pyarrow as pa
import pyarrow.parquet as pq

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.tokenize import (
    STOPWORDS,
    tokenize,
    tokenize_filtered,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.text import (
    doc_lengths,
    flat_tokens,
    term_counts,
)


def test_basic():
    assert tokenize_filtered("The quick brown-fox! 12") == ["quick", "brown", "fox", "12"]
    assert tokenize("The the") == ["the", "the"]


def test_stopwords_removed():
    assert tokenize_filtered("the a and of to") == []
    assert "the" in STOPWORDS


def test_unicode_cases():
    assert tokenize_filtered("Café CRÈME") == ["café", "crème"]
    nfd = unicodedata.normalize("NFD", "café")
    assert tokenize_filtered(nfd) == ["café"]  # NFC-normalized output
    assert tokenize_filtered("汉字 test") == ["汉字", "test"]
    assert tokenize_filtered("emoji 😀 x") == ["emoji", "x"]


def test_arrow_path_matches_python(pages_dir):
    texts = pq.read_table(pages_dir, columns=["text"])["text"]
    arr = texts.combine_chunks()
    flat, par = flat_tokens(arr)
    toks = flat.to_pylist()
    pars = par.to_pylist()
    # regroup arrow tokens by doc and compare to the python tokenizer
    by_doc: dict[int, list[str]] = {}
    for t, p in zip(toks, pars):
        by_doc.setdefault(p, []).append(t)
    for i, text in enumerate(arr.to_pylist()):
        assert by_doc.get(i, []) == tokenize_filtered(text), f"doc {i} diverges"


def test_arrow_path_unicode_edgecases():
    cases = ["un café s'il", unicodedata.normalize("NFD", "brûlée x"),
             "MIXED Case_Words 42", "", "   ", "汉字"]
    flat, par = flat_tokens(pa.array(cases))
    by_doc: dict[int, list[str]] = {}
    for t, p in zip(flat.to_pylist(), par.to_pylist()):
        by_doc.setdefault(p, []).append(t)
    for i, c in enumerate(cases):
        assert by_doc.get(i, []) == tokenize_filtered(c)


def test_doc_lengths_and_term_counts():
    arr = pa.array(["a b c c the", "", "c"])
    assert doc_lengths(arr, 3).tolist() == [3, 0, 1]  # 'the' is a stopword, 'a' too
    tc = term_counts(arr)
    d = {(p, t): n for p, t, n in zip(tc["pidx"].to_pylist(),
                                      tc["term"].to_pylist(),
                                      tc["tf"].to_pylist())}
    assert d[(0, "c")] == 2 and d[(0, "b")] == 1 and d[(2, "c")] == 1
    assert (0, "the") not in d and (0, "a") not in d
