"""Vectorized (Arrow-kernel) batch tokenization helpers.

The per-string Python tokenizer in ``functions/tokenize.py`` is the semantic
truth; this module is its batch-vectorized twin built on pyarrow.compute
(``utf8_normalize(NFC) -> utf8_lower -> split_pattern_regex -> is_in`` — all
C++ kernels, no Python per row).  The two agree on ASCII + NFC text;
``tests/test_tokenize.py`` asserts agreement over the whole fixture corpus.
Reference semantics: Spark ML Tokenizer + StopWordsRemover
(``LexicalIndexer.scala:35-42``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import STOPWORDS

# complement split: tokens are runs of letters / marks / digits / underscore.
# \p{M} is included so NFD sequences stay attached to their base letter; the
# non-ASCII repair below then NFC-composes them to match the Python tokenizer.
TOKEN_SPLIT_RE = r"[^\p{L}\p{M}\p{N}_]+"
_STOP_ARR = pa.array(sorted(STOPWORDS), pa.string())


def _repair_non_ascii(flat: pa.Array) -> pa.Array:
    """Route the (rare) non-ASCII tokens through the Python normalizer so the
    Arrow fast path agrees with ``functions.tokenize`` byte-for-byte.

    NOTE: pyarrow 16's ``utf8_normalize`` ignores its ``form`` option and
    always decomposes (observed empirically: NFC input comes back NFD), so it
    cannot be used here.  Non-ASCII tokens are detected vectorized
    (binary_length != utf8_length) and only those strings touch Python —
    ASCII corpora never leave C++.
    """
    from ..functions.tokenize import normalize
    nb = pc.binary_length(flat)
    nc = pc.utf8_length(flat)
    mask = pc.not_equal(nb, nc)
    if not pc.any(mask).as_py():
        return flat
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    fixed = pa.array([normalize(v) for v in flat.take(pa.array(idx)).to_pylist()],
                     pa.string())
    return pc.replace_with_mask(flat, mask, fixed)


def flat_tokens(texts: pa.Array | pa.ChunkedArray,
                drop_stopwords: bool = True) -> tuple[pa.Array, pa.Array]:
    """(tokens, parent_doc_index) for a column of texts — fully vectorized."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    low = pc.utf8_lower(texts)
    toks = pc.split_pattern_regex(low, TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    flat = _repair_non_ascii(flat)
    mask = pc.not_equal(flat, "")
    if drop_stopwords:
        mask = pc.and_(mask, pc.invert(pc.is_in(flat, value_set=_STOP_ARR)))
    return flat.filter(mask), par.filter(mask)


def doc_lengths(texts: pa.Array | pa.ChunkedArray, n_docs: int) -> np.ndarray:
    """Stop-filtered token count per doc (int32)."""
    _, par = flat_tokens(texts)
    return np.bincount(par.to_numpy(zero_copy_only=False),
                       minlength=n_docs).astype(np.int32)


def term_counts(texts: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Per-(doc, term) frequency table ``(pidx:int64, term:string, tf:int64)``
    via Arrow hash-group-by (C++)."""
    flat, par = flat_tokens(texts)
    t = pa.table({"pidx": par, "term": flat})
    g = t.group_by(["pidx", "term"]).aggregate([("term", "count")])
    return g.rename_columns(["pidx", "term", "tf"])


# ----------------------------------------------------- batch text stats ----
# Vectorized twins of functions/textstats.py's per-string text-analysis
# helpers (same division/rounding composition, so quantized outputs are
# bit-identical): Arrow C++ kernels for tokenize / length / regex counts,
# numpy bincount for per-doc reductions.  Only string hashing touches
# Python, and only once per UNIQUE token via dictionary encoding.

_LANG_ORDER = ("en", "de", "fr", "es")
_CJK_PATTERN = "[一-鿿㐀-䶿]"
_PUNCT_PATTERN = r"[^\w\s]"   # RE2 \w is ASCII — same class as the SQL oracle


def _bincount(par: np.ndarray, n: int, weights=None,
              mask: np.ndarray | None = None) -> np.ndarray:
    if mask is not None:
        par = par[mask]
        weights = weights[mask] if weights is not None else None
    return np.bincount(par, weights=weights, minlength=n)


def batch_quality(texts: pa.Array | pa.ChunkedArray, n: int) -> dict:
    """Per-doc quality features (functions.textstats.quality_features twin):
    n_tokens, stop_ratio, punct_ratio, mean_token_len as numpy arrays."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, par = flat_tokens(texts, drop_stopwords=False)
    parn = par.to_numpy(zero_copy_only=False)
    n_tok = _bincount(parn, n)
    stop = pc.is_in(flat, value_set=_STOP_ARR).to_numpy(zero_copy_only=False)
    n_stop = _bincount(parn, n, mask=stop)
    sum_len = _bincount(parn, n,
                        weights=pc.utf8_length(flat).to_numpy())
    n_chars = pc.utf8_length(texts).to_numpy()
    n_punct = pc.count_substring_regex(texts, _PUNCT_PATTERN).to_numpy()
    return {
        "n_tokens": n_tok.astype(np.int64),
        "stop_ratio": np.where(n_tok > 0, n_stop / np.maximum(n_tok, 1), 0.0),
        "punct_ratio": np.where(n_chars > 0,
                                n_punct / np.maximum(n_chars, 1), 0.0),
        "mean_token_len": np.where(n_tok > 0,
                                   sum_len / np.maximum(n_tok, 1), 0.0),
    }


def batch_token_counts(texts: pa.Array | pa.ChunkedArray) -> dict:
    """Whitespace + BPE-ish token counts, pure RE2 counting kernels."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return {
        "ws_tokens": pc.count_substring_regex(texts, r"\S+")
        .to_numpy().astype(np.int64),
        "bpe_tokens": pc.count_substring_regex(texts, r"\w+|[^\w\s]")
        .to_numpy().astype(np.int64),
    }


def batch_lang_id(texts: pa.Array | pa.ChunkedArray, n: int) -> np.ndarray:
    """functions.textstats.lang_id twin: marker-hit argmax per doc with the
    same fixed tie order, CJK-density zh override, 'und' fallback."""
    from ..functions.textstats import _LANG_MARKERS
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, par = flat_tokens(texts, drop_stopwords=False)
    parn = par.to_numpy(zero_copy_only=False)
    hits = np.zeros((n, len(_LANG_ORDER)), dtype=np.int64)
    for li, lang in enumerate(_LANG_ORDER):
        m = pc.is_in(flat, value_set=pa.array(sorted(_LANG_MARKERS[lang]))) \
            .to_numpy(zero_copy_only=False)
        hits[:, li] = _bincount(parn, n, mask=m)
    best = hits.argmax(axis=1)          # first max == fixed-order tie break
    out = np.asarray(_LANG_ORDER, dtype=object)[best]
    out[hits.max(axis=1) == 0] = "und"
    out[_bincount(parn, n) == 0] = "und"
    cjk = pc.count_substring_regex(texts, _CJK_PATTERN).to_numpy()
    n_chars = pc.utf8_length(texts).to_numpy()
    out[cjk * 4 >= np.maximum(1, n_chars)] = "zh"
    return out


def batch_simhash64(texts: pa.Array | pa.ChunkedArray, n: int) -> np.ndarray:
    """Vectorized per-doc simhash, bit-identical to
    ``functions.textstats.simhash64(tokenize_filtered(text))``: token
    hashing once per unique token (dictionary encode), per-bit majority
    via one scatter-add.  Returns uint64[n]."""
    from ..functions.textstats import hash64
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, par = flat_tokens(texts, drop_stopwords=True)
    parn = par.to_numpy(zero_copy_only=False)
    enc = flat.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    vh = np.fromiter((hash64(t) for t in vocab), dtype=np.uint64,
                     count=len(vocab))
    th = vh[enc.indices.to_numpy(zero_copy_only=False)] \
        if len(vocab) else np.zeros(0, np.uint64)
    n_tok = _bincount(parn, n)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    cnt = np.zeros((n, 64), dtype=np.int64)
    np.add.at(cnt, parn, bits)
    sig = (cnt * 2 > n_tok[:, None]).astype(np.uint64)
    sim = (sig << shifts[None, :]).sum(axis=1)
    sim[n_tok == 0] = 0
    return sim


def batch_fingerprint(texts: pa.Array | pa.ChunkedArray, n: int,
                      window: int = 4, keep: int = 8) -> dict:
    """Per-doc simhash (bit-identical to functions.textstats.simhash64) and
    bottom-k sketch SIZE.  Token hashing runs once per unique token
    (dictionary encode); the distinct-shingle count uses a vectorized
    64-bit polynomial combine of token hashes instead of hashing the joined
    shingle STRING — counts agree with the scalar path except for
    astronomically unlikely (2^-64-scale) collisions; the scalar functions
    remain the semantic truth for sketch VALUES."""
    from ..functions.textstats import hash64
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, par = flat_tokens(texts, drop_stopwords=True)
    parn = par.to_numpy(zero_copy_only=False)
    enc = flat.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    vh = np.fromiter((hash64(t) for t in vocab), dtype=np.uint64,
                     count=len(vocab))
    th = vh[enc.indices.to_numpy(zero_copy_only=False)] \
        if len(vocab) else np.zeros(0, np.uint64)
    n_tok = _bincount(parn, n)

    # simhash: per-doc per-bit majority over token-hash bits
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    cnt = np.zeros((n, 64), dtype=np.int64)
    np.add.at(cnt, parn, bits)
    sig = (cnt * 2 > n_tok[:, None]).astype(np.uint64)
    sim = (sig << shifts[None, :]).sum(axis=1)
    sim[n_tok == 0] = 0

    # distinct window-shingles per doc (vectorized rolling combine)
    P = np.uint64(1099511628211)
    n_fp = np.zeros(n, dtype=np.int64)
    if th.size >= window:
        code = th[: th.size - window + 1].copy()
        for w in range(1, window):
            code = code * P ^ th[w: th.size - window + 1 + w]
        valid = parn[: th.size - window + 1] == parn[window - 1:]
        vpar, vcode = parn[: th.size - window + 1][valid], code[valid]
        if vcode.size:
            order = np.lexsort((vcode, vpar))
            sp, sc = vpar[order], vcode[order]
            new = np.r_[True, (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1])]
            n_fp = _bincount(sp, n, mask=new)
    # scalar semantics: 0 < n_tok < window => ONE shingle (the whole doc)
    n_fp[(n_tok > 0) & (n_tok < window)] = 1
    return {"simhash": sim, "n_fp": np.minimum(n_fp, keep).astype(np.int64)}


def batch_repetition(texts: pa.Array | pa.ChunkedArray, n: int) -> dict:
    """Gopher-style repetition quality signals per doc, milli-quantized
    (Rae et al. 2021 §A1.1 repetition filters, re-expressed over this
    repo's stop-filtered tokens so the SQL oracle shares one tokenizer):

    * ``top_token_frac_m``  — most frequent token's share of tokens;
    * ``top_2gram_frac_m``  — tokens covered by the most frequent 2-gram
      (count x 2 / n_tokens; may exceed 1000 on degenerate repeats);
    * ``dup_5gram_frac_m``  — fraction of 5-gram positions whose shingle
      already occurred in the doc (1 - distinct/total positions).

    Fully vectorized: one dictionary-encode, integer keys per (doc,
    gram), ``np.unique`` + ``np.maximum.at`` reductions.  Quantization is
    ``floor(1000 * num / den + 0.5)`` with the multiply FIRST — the exact
    op order of the oracle's ``ROUND(1000.0 * num / den)``, so values are
    bit-identical.  Docs with no tokens (or too few for a gram) emit 0.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    flat, par = flat_tokens(texts)
    parn = par.to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = _bincount(parn, n).astype(np.int64)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64) \
        if len(flat) else np.zeros(0, np.int64)
    v = len(enc.dictionary) if len(flat) else 1

    def q_m(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        out = np.zeros(n, dtype=np.int64)
        ok = den > 0
        out[ok] = np.floor(1000.0 * num[ok] / den[ok] + 0.5).astype(np.int64)
        return out

    # most frequent token per doc
    mx1 = np.zeros(n, dtype=np.int64)
    if codes.size:
        uk, cnt = np.unique(parn * v + codes, return_counts=True)
        np.maximum.at(mx1, uk // v, cnt)

    # most frequent 2-gram per doc (adjacent same-doc positions)
    mx2 = np.zeros(n, dtype=np.int64)
    if codes.size >= 2:
        adj = parn[1:] == parn[:-1]
        d2 = parn[:-1][adj]
        key2 = (d2 * v + codes[:-1][adj]) * v + codes[1:][adj]
        if key2.size:
            order = np.lexsort((key2, d2))
            sd, sk = d2[order], key2[order]
            new = np.r_[True, (sd[1:] != sd[:-1]) | (sk[1:] != sk[:-1])]
            run_id = np.cumsum(new) - 1
            cnt2 = np.bincount(run_id)
            np.maximum.at(mx2, sd[new], cnt2)

    # duplicate 5-gram positions per doc (rolling uint64 combine over the
    # batch-local dictionary codes — equality grouping only)
    tot5 = np.zeros(n, dtype=np.int64)
    dst5 = np.zeros(n, dtype=np.int64)
    w = 5
    if codes.size >= w:
        th = codes.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        code5 = th[: th.size - w + 1].copy()
        P = np.uint64(1099511628211)
        for k in range(1, w):
            code5 = code5 * P ^ th[k: th.size - w + 1 + k]
        valid = parn[: th.size - w + 1] == parn[w - 1:]
        vpar = parn[: th.size - w + 1][valid]
        vcode = code5[valid]
        if vcode.size:
            tot5 = _bincount(vpar, n).astype(np.int64)
            order = np.lexsort((vcode, vpar))
            sp, sc = vpar[order], vcode[order]
            new = np.r_[True, (sp[1:] != sp[:-1]) | (sc[1:] != sc[:-1])]
            dst5 = _bincount(sp, n, mask=new).astype(np.int64)

    return {
        "top_token_frac_m": q_m(mx1, n_tok),
        "top_2gram_frac_m": q_m(2 * mx2, n_tok),
        "dup_5gram_frac_m": q_m(tot5 - dst5, tot5),
    }
