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
