"""Text-analysis primitives for the training-data toolkit: language ID,
quality scoring, token counting, fingerprinting, SimHash, MinHash.

All pure / numpy-vectorizable; Ray stages in ``stages/text.py`` and
``stages/dedup.py`` wrap these in ``map_batches``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .tokenize import STOPWORDS, tokenize

# ------------------------------------------------------------ language id ---

# tiny frozen marker sets per language (deterministic heuristic, not a model)
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for with as was on are this".split()),
    "de": frozenset("der die das und ist nicht ein eine mit von zu für auf den".split()),
    "fr": frozenset("le la les et est une des dans pour que qui sur pas avec".split()),
    "es": frozenset("el la los las y es una del en por que con para más como".split()),
}
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


def lang_id(text: str) -> str:
    """Deterministic n-gram/stop-word language guess.

    CJK characters dominate -> "zh"; otherwise argmax of marker-word hits
    (ties broken by fixed language order); no hits -> "und".
    """
    if len(_CJK_RE.findall(text)) * 4 >= max(1, len(text)):
        return "zh"
    toks = tokenize(text)
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in ("en", "de", "fr", "es"):  # fixed order = deterministic ties
        hits = sum(1 for t in toks if t in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


# ---------------------------------------------------------- quality score ---

_WS_RE = re.compile(r"\s+")
# ASCII word class ON PURPOSE: the DuckDB oracle's RE2 '\w' is ASCII-only,
# and the punctuation-ratio heuristic must count identically on both sides
# (a Unicode '\w' here would call 'é' a word char while SQL counts it as
# punctuation).  Documented divergence: non-ASCII letters count as "punct".
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)


def quality_features(text: str) -> dict:
    """Length / punctuation / stop-word ratio features (floats rounded by the
    caller when SQL parity is needed)."""
    toks = tokenize(text)
    n_tok = len(toks)
    n_stop = sum(1 for t in toks if t in STOPWORDS)
    n_chars = len(text)
    n_punct = len(_PUNCT_RE.findall(text))
    mean_len = (sum(len(t) for t in toks) / n_tok) if n_tok else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "stop_ratio": (n_stop / n_tok) if n_tok else 0.0,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "mean_token_len": mean_len,
    }


def ws_token_count(text: str) -> int:
    """Whitespace token count (``len(text.split())``)."""
    return len(text.split())


# BPE-ish pre-tokenizer: words, numbers, or single non-space symbols.
# ASCII \w deliberately: the vectorized twin (stages.text, RE2 kernels)
# and the DuckDB oracle ([a-zA-Z0-9_]) are both ASCII-classed, so the
# scalar must match or the "vectorized twins" parity breaks on non-ASCII
# text (e.g. "café" = 1 Unicode word but 2 ASCII runs + 1 symbol).
_BPE_RE = re.compile(r"\w+|[^\w\s]", re.ASCII)


def bpe_token_count(text: str) -> int:
    return len(_BPE_RE.findall(text))


# ----------------------------------------------------------- fingerprints ---

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# Version of the hash64 scheme below.  hash64 feeds PERSISTED index identity
# (stable_doc_id at stages/spimi.py, head-term salt assignment), so a scheme
# change silently re-ids every url: extend_index over a pre-change index
# would assign the same url a new doc_id (duplicate docs).  The build
# manifest records this value and extend_index refuses on mismatch
# (ADVICE r3).  History: 1 = blake2b (rounds 1-2), 2 = md5 (round 3+,
# SQL-reproducible for the driver oracle).
HASH_VERSION = 2


def hash64(s: str | bytes) -> int:
    """Stable 64-bit content hash: first 8 bytes of md5, big-endian.

    md5 (not blake2b) so the value is reproducible in plain SQL —
    DuckDB: ``('0x' || substr(md5(s), 1, 16))::UBIGINT`` — which lets
    the driver oracle value-check every sketch built on token/shingle
    hashes (simhash, minhash, fingerprints) instead of rows-only.
    Cryptographic strength is irrelevant here; only uniformity and
    stability are used."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable per-token 64-bit hashes (uint64)."""
    return np.array([hash64(t) for t in tokens], dtype=np.uint64)


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Hashes of word k-shingles (rolling window joined by '\\x1f')."""
    if len(tokens) < k:
        return (np.array([hash64("\x1f".join(tokens))], dtype=np.uint64)
                if tokens else np.zeros(0, dtype=np.uint64))
    return np.array(
        [hash64("\x1f".join(tokens[i:i + k])) for i in range(len(tokens) - k + 1)],
        dtype=np.uint64,
    )


def rolling_fingerprint(tokens: list[str], window: int = 4, keep: int = 8) -> list[int]:
    """Bottom-k sketch over ``window``-shingle hashes: the ``keep`` smallest
    DISTINCT hashes, ascending.  Deterministic; dedup happens before the
    cut so repeated shingles can't shrink the sketch below ``keep`` while
    distinct hashes remain (min-wise sketch, comparable across docs)."""
    h = shingle_hashes(tokens, k=window)
    if h.size == 0:
        return []
    return [int(x) for x in np.unique(h)[:keep]]


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token hashes (unweighted)."""
    if not tokens:
        return 0
    h = token_hashes(tokens)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    counts = bits.sum(axis=0)
    sig = (counts * 2 > len(tokens)).astype(np.uint64)
    return int((sig << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def hamming64_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a ^ b) for int64/uint64 arrays (numpy < 2 has no
    bitwise_count; unpackbits over the byte view is branch-free and fast
    for the in-bucket pair volumes this serves)."""
    x = (np.asarray(a).astype(np.uint64) ^ np.asarray(b).astype(np.uint64))
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    bits = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
    return bits.sum(axis=1).astype(np.int64)


# ---------------------------------------------------------------- minhash ---

# p = 2^31 - 1: a*x < 2^62 fits uint64 AND wraps the modulus ~2^31 times,
# which is what makes (a*x+b) mod p behave min-wise independent.  (A first
# attempt with p = 2^61-1 wrapped < 4 times, so argmin(h) collapsed onto
# argmin(x) for every permutation and Jaccard estimates were badly biased.)
_MERSENNE31 = np.uint64((1 << 31) - 1)


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) for universal hashing h_i(x) = (a_i*x + b_i) mod p."""
    rng = np.random.RandomState(seed)
    p = int(_MERSENNE31)
    a = rng.randint(1, p, size=num_perm).astype(np.uint64)
    b = rng.randint(0, p, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a set of shingle hashes."""
    if shingles.size == 0:
        return np.full(a.shape, _MASK64, dtype=np.uint64)
    # fold 64-bit shingle hashes into [0, p) (xor-fold keeps determinism)
    x = (((shingles >> np.uint64(32)) ^ (shingles & np.uint64(0xFFFFFFFF)))
         % _MERSENNE31).astype(np.uint64)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE31
    return np.min(vals, axis=1)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
