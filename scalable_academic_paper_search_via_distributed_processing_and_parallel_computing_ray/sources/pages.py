"""Deterministic Common-Crawl-style ``pages`` table (FIXTURES.md F1).

Schema per ``BASELINE.json`` input_hint:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

The page body text is seeded from the driver's synthetic
``documents.parquet`` (``/root/testdata/sf*/documents.parquet`` —
``doc_id,text,lang,source,n_chars``); no external data, no wall clock.  The
``html`` column wraps the text in a deterministic template with title,
paragraphs, entity escapes, script/style noise and inline markup; the
``text`` column is the *independently composed* expected extraction (title +
paragraph blocks joined by "\\n" with whitespace collapsed) — the extractor
(`functions/extract.py`) must reproduce it byte-identically, which is the
per-row invariant tested in ``tests/test_extract.py``.

``doc_id`` is carried through for test joins; the engine itself derives
stable doc ids from ``url`` hashes (order-independent — SURVEY.md §4.3.2).
"""

from __future__ import annotations

import hashlib
import html as html_mod
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_BASE_EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z, fixed

# bump when generated corpus content changes (v2: replica-suffixed vocab)
_CORPUS_VERSION = 2
_TS_STEP_US = 17_000_000  # 17 s per page


def url_for(doc_id: int) -> str:
    h = hashlib.sha1(str(doc_id).encode()).hexdigest()[:8]
    return f"https://site{doc_id % 97}.example/{h}"


def _collapse(s: str) -> str:
    return " ".join(s.split())


def make_page(doc_id: int, body_text: str) -> tuple[bytes, str]:
    """Compose (html, expected_text) for one page, deterministically.

    The expected text is built from the parts directly (NOT by running the
    extractor), so the extractor is genuinely tested against this spec.
    """
    words = body_text.split()
    title_words = words[:5] if words else ["untitled"]
    title = " ".join(title_words)
    # split body into paragraphs of ~40 words
    paras = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)] or [""]

    h = hashlib.sha1(f"page:{doc_id}".encode()).digest()
    blocks: list[str] = []
    out_parts: list[str] = [
        "<html><head>",
        f"<title>{html_mod.escape(title)}</title>",
        "<style>body { color: #000; }</style>",
        "</head>\n<body>",
    ]
    blocks.append(_collapse(title))
    if h[0] % 3 == 0:
        out_parts.append("<script>var x = 1 < 2 && 3 > 2;</script>")
    if h[1] % 4 == 0:
        out_parts.append("<!-- crawler comment &amp; noise -->")
    for pi, para in enumerate(paras):
        esc = html_mod.escape(para)
        hp = h[(2 + pi) % 20]
        if hp % 5 == 0 and para:
            # wrap first word in inline markup (must not split the block)
            first, _, rest = esc.partition(" ")
            esc = f"<b>{first}</b> {rest}" if rest else f"<b>{first}</b>"
        if hp % 7 == 0:
            # entity-reference flourish appended as extra visible token
            esc = esc + " caf&#233;" if esc else "caf&#233;"
            para = (para + " café").strip()
        out_parts.append(f"<p>\n  {esc}\n</p>")
        if _collapse(para):
            blocks.append(_collapse(para))
    if h[2] % 2 == 0:
        out_parts.append("<div><span>footer &amp; links</span></div>")
        blocks.append("footer & links")
    out_parts.append("</body></html>")
    html_doc = "\n".join(out_parts)
    return html_doc.encode("utf-8"), "\n".join(b for b in blocks if b)


def pages_table_from_documents(documents_path: str) -> pa.Table:
    """Build the full pages Arrow table from a documents.parquet file."""
    tbl = pq.read_table(documents_path, columns=["doc_id", "text", "lang"])
    doc_ids = tbl["doc_id"].to_numpy()
    texts = tbl["text"].to_pylist()
    langs = tbl["lang"].to_pylist()
    htmls: list[bytes] = []
    exp_texts: list[str] = []
    for did, txt in zip(doc_ids, texts):
        h, t = make_page(int(did), txt)
        htmls.append(h)
        exp_texts.append(t)
    ts = (_BASE_EPOCH_US + doc_ids.astype(np.int64) * _TS_STEP_US)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "url": pa.array([url_for(int(d)) for d in doc_ids], pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(exp_texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def ensure_pages_parquet(sf_dir: str, out_root: str = "/tmp/graft_pages",
                         num_files: int = 8, replicate: int = 1) -> str:
    """Materialize the pages table for ``sf_dir`` once under /tmp (split into
    ``num_files`` row-aligned parquet files so reads parallelize); reuse on
    subsequent calls.  Returns the directory path.

    ``replicate > 1`` scales the corpus deterministically for benchmarking:
    copy r gets ``doc_id + r * 10^9`` and fresh urls/html (distinct pages),
    so bench runs have enough work for the parallelism under test without
    any external data.  Every 4th replica (``r % 4 == 1``) additionally gets
    a replica-suffixed vocabulary (word -> ``{word}r{r}``): the base corpus
    has only ~32 distinct terms, so without this every query term is dense
    (df ≈ 0.8N) and block-max pruning can never engage; suffixed replicas
    give the scaled corpus a df spectrum from head terms (~60% of docs) down
    to selective terms (~0.2% of docs), which is what a Zipfian web corpus
    actually looks like.  See :data:`SELECTIVE_QUERY_SET`.
    """
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    # _CORPUS_VERSION is part of the cache key: bump it whenever the
    # generated corpus CONTENT changes (e.g. the replica-suffixed vocabulary
    # added after v1), or a stale /tmp dir from older code is silently
    # reused and selective-query benchmarks measure empty results.
    out_dir = os.path.join(
        out_root, f"{tag}-{num_files}-x{replicate}-v{_CORPUS_VERSION}")
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang"])
    doc_ids = base["doc_id"].to_numpy()
    texts = base["text"].to_pylist()
    langs = base["lang"].to_pylist()
    fi = 0
    rows_per_file = max(1, -(-base.num_rows * replicate // num_files))
    buf_ids: list[int] = []
    buf_html: list[bytes] = []
    buf_text: list[str] = []
    buf_lang: list[str] = []

    def flush():
        nonlocal fi, buf_ids, buf_html, buf_text, buf_lang
        if not buf_ids:
            return
        ids = np.asarray(buf_ids, dtype=np.int64)
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "url": pa.array([url_for(int(d)) for d in ids], pa.string()),
            "warc_ts": pa.array(_BASE_EPOCH_US + ids * _TS_STEP_US,
                                pa.timestamp("us")),
            "html": pa.array(buf_html, pa.binary()),
            "text": pa.array(buf_text, pa.string()),
            "lang": pa.array(buf_lang, pa.string()),
        }, schema=PAGES_SCHEMA)
        pq.write_table(tbl, os.path.join(out_dir, f"part-{fi:05d}.parquet"))
        fi += 1
        buf_ids, buf_html, buf_text, buf_lang = [], [], [], []

    for r in range(replicate):
        off = r * 1_000_000_000
        spread = replicate > 1 and r % 4 == 1
        sfx = f"r{r}"
        for did, txt, lg in zip(doc_ids, texts, langs):
            rid = int(did) + off
            if spread:
                txt = " ".join(w + sfx for w in txt.split())
            h, t = make_page(rid, txt)
            buf_ids.append(rid)
            buf_html.append(h)
            buf_text.append(t)
            buf_lang.append(lg)
            if len(buf_ids) >= rows_per_file:
                flush()
    flush()
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


# Fixed query set (FIXTURES.md F2) — mirrors the reference's query shapes
# (multi-term phrase `bm25_searcher.py:22`, single rare term, head terms,
# OOV, stop-words-only, Unicode).
# Selective queries against the replica-suffixed vocabulary of scaled bench
# corpora (valid when replicate >= 6): each term's df is ~1/replicate of the
# corpus, so block-max WAND actually prunes — these measure the
# posting-list-traversal regime, while QUERY_SET measures the dense regime.
SELECTIVE_QUERY_SET: list[dict] = [
    {"query_id": 100, "query_text": "sparkr1 datar1 joinr1", "mode": "or", "k": 10},
    {"query_id": 101, "query_text": "vectorr5 hashr5", "mode": "and", "k": 10},
    {"query_id": 102, "query_text": "queryr1 planr5 scanr9", "mode": "or", "k": 10},
]

QUERY_SET: list[dict] = [
    {"query_id": 0, "query_text": "spark data join", "mode": "or", "k": 10},
    {"query_id": 1, "query_text": "window merge sort batch", "mode": "or", "k": 10},
    {"query_id": 2, "query_text": "vector hash", "mode": "and", "k": 10},
    {"query_id": 3, "query_text": "café", "mode": "or", "k": 10},
    {"query_id": 4, "query_text": "zzz_out_of_vocab", "mode": "or", "k": 10},
    {"query_id": 5, "query_text": "the a and of", "mode": "or", "k": 10},
    {"query_id": 6, "query_text": "query plan scan filter table", "mode": "or", "k": 10},
    {"query_id": 7, "query_text": "customer order line", "mode": "and", "k": 10},
]
