"""Distributed query serving: a pool of per-shard query actors + driver-side
top-k merge.

Ray-native replacement for the reference's serving layer
(``api/combined.py:100-126`` loads the whole index into ONE FastAPI process;
``/paper/{id}`` even spawns a spark-submit per request,
``combined.py:227-278``).  Here each :class:`QueryShardActor` holds a
disjoint subset of index shards in memory (segments + its doc-length
slice) and answers with a LOCAL top-k; because build shards partition the
document space, the global top-k is exactly the k best of the union of the
local top-ks — a tiny driver-side merge, no shuffle, no full-index copy on
any single node.

Scores are globally correct from a shard subset because global stats ride
the manifest (N, avg_dl) and per-term global df rides ``termdict.parquet``
(written at build finalize).
"""

from __future__ import annotations

import os

import ray

from .query import IndexReader, TopkResult


@ray.remote
class QueryShardActor:
    """Holds a subset of index shards; state loads once per actor
    (reference ST3 pattern, SURVEY.md §2.3)."""

    def __init__(self, index_dir: str, shard_names: list[str],
                 cache_postings_budget: int = 20_000_000,
                 lazy: bool = False):
        # long-lived actor: cache decoded postings for hot terms (~20B per
        # posting -> default budget ~400MB/actor; the reference's serving
        # process similarly holds its index resident).  lazy=True starts
        # serving immediately and faults posting row groups in on demand.
        self.reader = IndexReader(index_dir, shard_subset=shard_names,
                                  cache_postings_budget=cache_postings_budget,
                                  lazy=lazy)

    def search(self, query_text: str, k: int, mode: str,
               method: str = "auto") -> list[tuple[int, float]]:
        if method == "wand":
            hits = self.reader.search_wand(query_text, k, mode)
        elif method == "exhaustive":
            hits = self.reader.search_exhaustive(query_text, k, mode)
        else:
            hits = self.reader.search(query_text, k, mode)
        return [(h.doc_id, h.score) for h in hits]

    def stats(self) -> dict:
        r = self.reader
        n_terms = len(r._loc) if r._lazy else len(r._postings)
        return {"n_docs_local": int(r._doc_ids.size),
                "n_terms_local": n_terms}

    def fetch(self, doc_id: int) -> dict | None:
        """Point lookup served without a per-request job (unlike the
        reference's spark-submit-per-request ``/paper/{id}`` endpoint)."""
        from .query import fetch_doc
        return fetch_doc(self.reader.index_dir, doc_id)


class DistributedSearcher:
    """Partition the index's shards over ``num_actors`` query actors."""

    def __init__(self, index_dir: str, num_actors: int = 2,
                 lazy: bool = False):
        import json
        with open(os.path.join(index_dir, "manifest.json")) as f:
            n_shards = int(json.load(f)["n_shards"])
        # manifest-driven discovery: partial shard dirs from an in-flight
        # extend must stay invisible (same rule as IndexReader)
        shard_names = [f"shard-{i:04d}" for i in range(n_shards)]
        num_actors = max(1, min(num_actors, len(shard_names)))
        assign: list[list[str]] = [[] for _ in range(num_actors)]
        for i, s in enumerate(shard_names):
            assign[i % num_actors].append(s)
        self.actors = [QueryShardActor.remote(index_dir, names, lazy=lazy)
                       for names in assign if names]

    def search(self, query_text: str, k: int = 10, mode: str = "or",
               method: str = "auto") -> list[TopkResult]:
        futs = [a.search.remote(query_text, k, mode, method)
                for a in self.actors]
        merged: list[tuple[int, float]] = []
        for part in ray.get(futs):
            merged.extend(part)
        merged.sort(key=lambda ds: (-ds[1], ds[0]))
        return [TopkResult(d, s) for d, s in merged[:k]]

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
