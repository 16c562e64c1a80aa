"""Unit tests for text-analysis primitives (lang-id, quality, hashes)."""

import numpy as np

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions import (
    textstats as ts,
)


def test_lang_id():
    assert ts.lang_id("the cat and the dog is in this house") == "en"
    assert ts.lang_id("der Hund und die Katze ist nicht hier") == "de"
    assert ts.lang_id("le chat est dans la maison pour les amis") == "fr"
    assert ts.lang_id("el perro y la casa es una historia") == "es"
    assert ts.lang_id("汉字汉字汉字") == "zh"
    assert ts.lang_id("") == "und"
    assert ts.lang_id("qwzx bnmp") == "und"


def test_quality_features():
    q = ts.quality_features("The cat, the hat!")
    assert q["n_tokens"] == 4 and q["n_chars"] == 17
    assert abs(q["stop_ratio"] - 0.5) < 1e-9  # the, the of 4
    assert q["punct_ratio"] > 0
    empty = ts.quality_features("")
    assert empty["n_tokens"] == 0 and empty["stop_ratio"] == 0.0


def test_token_counts():
    assert ts.ws_token_count("a b  c") == 3
    assert ts.bpe_token_count("don't stop-me now!") == 8  # don ' t stop - me now !


def test_hash_determinism():
    assert ts.hash64("abc") == ts.hash64(b"abc")
    assert ts.hash64("abc") != ts.hash64("abd")
    h1 = ts.token_hashes(["x", "y"])
    h2 = ts.token_hashes(["x", "y"])
    assert (h1 == h2).all()


def test_simhash_similarity():
    a = ts.simhash64("the quick brown fox jumps over lazy dog".split())
    b = ts.simhash64("the quick brown fox jumps over lazy dogs".split())
    c = ts.simhash64("completely different words entirely here".split())
    assert ts.hamming64(a, b) < ts.hamming64(a, c)
    assert ts.simhash64([]) == 0


def test_minhash_jaccard_estimate():
    a, b = ts.minhash_params(128)
    s1 = ts.shingle_hashes("a b c d e f g h i j".split(), 2)
    s2 = ts.shingle_hashes("a b c d e f g h x y".split(), 2)
    m1 = ts.minhash_signature(s1, a, b)
    m2 = ts.minhash_signature(s2, a, b)
    est = float((m1 == m2).mean())
    true = ts.jaccard(set(s1.tolist()), set(s2.tolist()))
    assert abs(est - true) < 0.2
    # identical input -> identical signature
    assert (ts.minhash_signature(s1, a, b) == m1).all()


def test_rolling_fingerprint():
    fp1 = ts.rolling_fingerprint("a b c d e f g".split())
    fp2 = ts.rolling_fingerprint("a b c d e f g".split())
    assert fp1 == fp2 and len(fp1) > 0
    assert ts.rolling_fingerprint([]) == []
