"""Range-partitioned global term dictionary (term -> global df).

SCALE.md switch point 1, flipped: the build's ``_finalize`` used to
concat every shard's (term, df) seg columns on the DRIVER and write one
``termdict.parquet`` — fine to ~10^7 terms, driver-OOM at web vocabulary
(10^8-10^9 terms x shards of partials).  The termdict is now a
DIRECTORY of term-range-partitioned parquet parts plus a ``parts.json``
sidecar recording each part's [first_term, last_term] span:

* small vocabularies (below ``BuildParams.termdict_dist_threshold``
  summed seg rows — known from parquet FOOTERS, no data read) are still
  merged on the driver (cheap, no extra pipeline spin-up) but written in
  the same partitioned layout, so readers have ONE code path;
* large vocabularies aggregate distributed — ``read_parquet(seg files,
  columns=[term, df])`` -> ``sorted_groupby_agg`` (one sort; output
  blocks are GLOBALLY range-ordered and disjoint) -> one write task per
  block, each returning only (file, lo, hi, n) metadata.  The driver
  handles O(parts) metadata rows, never the vocabulary.

Readers (:class:`TermDict`) memory-map nothing up front: a df lookup
bisects ``parts.json`` spans and loads only the covering part; a prefix
expansion loads only parts intersecting ``[prefix, prefix + U+10FFFF]``.
Loaded parts are cached per reader (query terms are Zipfian — the hot
parts stay resident, cold ones are never touched).

Reference parity: the reference broadcasts its whole idf map in one
Spark closure (``bm25_searcher.py:61-74``); this layout is what replaces
that at a vocabulary that no longer fits one process.
"""

from __future__ import annotations

import bisect
import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PARTS_META = "parts.json"

_MAX_CHAR = chr(0x10FFFF)


# ------------------------------------------------------------------ write ---


def write_part(out_dir: str, tbl: pa.Table) -> dict:
    """Write ONE term-sorted (term, df) table as a part file ->
    {"file", "lo", "hi", "n"} metadata row.  ``tbl`` must be sorted by
    term (callers: the driver merge sorts explicitly; the distributed
    path's blocks come out of the sort shuffle ordered)."""
    from . import fsio
    name = f"part-{uuid.uuid4().hex[:12]}.parquet"
    fsio.pq_write_table(tbl, os.path.join(out_dir, name))
    return {"file": name,
            "lo": tbl["term"][0].as_py(),
            "hi": tbl["term"][-1].as_py(),
            "n": tbl.num_rows}


def publish_parts(out_dir: str, parts: list[dict]) -> None:
    """Write the ``parts.json`` sidecar, sorted by lo.  Spans may
    OVERLAP (sorted_groupby_agg emits range-disjoint interior blocks
    plus one small driver-merged boundary block whose keys interleave
    between them) but every term lives in exactly ONE part — the reader
    stabs all covering intervals."""
    from . import fsio
    parts = sorted(parts, key=lambda p: p["lo"])
    fsio.write_json_atomic(os.path.join(out_dir, PARTS_META),
                           {"parts": parts})


# ------------------------------------------------------------------- read ---


class TermDict:
    """Lazy reader over a partitioned termdict directory.

    Dict-like surface (``get`` / ``in`` / ``items``) so ``IndexReader``
    call sites stay unchanged; ``prefix_items`` is the partition-aware
    path for wildcard expansion (loads only intersecting parts instead
    of materializing the vocabulary)."""

    def __init__(self, td_dir: str):
        from . import fsio
        self._dir = td_dir
        self._parts: list[dict] = fsio.read_json(
            os.path.join(td_dir, PARTS_META))["parts"]
        self._los = [p["lo"] for p in self._parts]
        # interval-stabbing helper: running max of hi over parts[0..i]
        # (spans can overlap — see publish_parts) so the left walk in
        # _covering stops as soon as no earlier part can reach the term
        self._max_hi: list[str] = []
        run = ""
        for p in self._parts:
            run = max(run, p["hi"])
            self._max_hi.append(run)
        # per-part cache: (sorted term list, df int64 array)
        self._cache: dict[int, tuple[list[str], np.ndarray]] = {}
        self.parts_loaded = 0  # observability (tests assert partial loads)

    def __len__(self) -> int:
        return sum(p["n"] for p in self._parts)

    def _load(self, i: int) -> tuple[list[str], np.ndarray]:
        part = self._cache.get(i)
        if part is None:
            from . import fsio
            t = fsio.pq_read_table(os.path.join(self._dir,
                                                self._parts[i]["file"]))
            part = (t["term"].to_pylist(),
                    t["df"].to_numpy(zero_copy_only=False).astype(np.int64))
            self._cache[i] = part
            self.parts_loaded += 1
        return part

    def _covering(self, lo_key: str, hi_key: str):
        """Indices of every part whose span intersects [lo_key, hi_key]
        (ascending).  Bisect to the last part starting <= hi_key, then
        walk left while the running-max hi says an earlier part could
        still reach lo_key — O(log parts + hits)."""
        i = bisect.bisect_right(self._los, hi_key) - 1
        out = []
        while i >= 0 and self._max_hi[i] >= lo_key:
            if self._parts[i]["hi"] >= lo_key:
                out.append(i)
            i -= 1
        out.reverse()
        return out

    def get(self, term: str, default: int = 0) -> int:
        for i in self._covering(term, term):
            terms, dfs = self._load(i)
            j = bisect.bisect_left(terms, term)
            if j < len(terms) and terms[j] == term:
                return int(dfs[j])
        return default

    def __contains__(self, term: str) -> bool:
        for i in self._covering(term, term):
            terms, _ = self._load(i)
            j = bisect.bisect_left(terms, term)
            if j < len(terms) and terms[j] == term:
                return True
        return False

    def prefix_items(self, prefix: str) -> list[tuple[str, int]]:
        """Ascending (term, df) for every term starting with ``prefix`` —
        loads only the parts whose span intersects the prefix range."""
        hi_key = prefix + _MAX_CHAR
        out: list[tuple[str, int]] = []
        for i in self._covering(prefix, hi_key):
            terms, dfs = self._load(i)
            j = bisect.bisect_left(terms, prefix)
            while j < len(terms) and terms[j].startswith(prefix):
                out.append((terms[j], int(dfs[j])))
                j += 1
        out.sort()  # parts can interleave (boundary part) — one final sort
        return out

    def items(self):
        """Full materialization (loads every part) — only for callers
        that genuinely need the whole vocabulary (tests, stats)."""
        for i in range(len(self._parts)):
            terms, dfs = self._load(i)
            yield from zip(terms, (int(x) for x in dfs))

    def __iter__(self):
        for term, _ in self.items():
            yield term
