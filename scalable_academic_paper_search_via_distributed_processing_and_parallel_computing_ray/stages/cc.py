"""Connected components over a verified-duplicate pair set.

Dedup group resolution (MinHash / SimHash / n-gram / embedding pairs ->
``group_id = component min``) previously ran union-find on the driver —
fine while verified pairs are orders of magnitude smaller than the
corpus, but a pathologically duplicate-heavy crawl can make the pair set
itself exceed driver memory.  This module provides the distributed twin,
the engine-side equivalent of the recursive min-label CTE the SQL
oracles use for ``dedup_minhash`` / ``dedup_simhash``, in three phases
(see :func:`connected_components_ds`):

    1. contraction rounds — per-block union-find stars + block-count
       halving repartitions (no sorts; the pair set's quadratic bucket
       mass collapses to one row per distinct node);
    2. single-task finish once the star set fits one worker's heap;
    3. fallback: iterative min-label propagation with pointer jumping
       for node sets too big for any one task —

       l0(n)  = min(n, min neighbor)           -- one sorted-agg shuffle
       repeat until no label changes:
         l'(n)  = min(l(n), min over edges (n,m) of l(m))  -- fill-down
         l''(n) = l'(l'(n))                                -- pointer jump

Labels only ever decrease and every label is a node id from the same
component (initial labels are within-component minima; propagation moves
them across edges; jumping follows a same-component node's label), so the
fixpoint is exactly ``label = component min``.  Pointer jumping halves
label-tree heights each round, giving O(log diameter) iterations; the
near-clique graphs banding produces converge in 1-2.

The label lookups use :func:`filldown_join` — a distributed sort on
(key, kind) + a vectorized per-block fill + O(blocks) driver boundary
carry, the same discipline as ``stages/groupagg.py`` — NOT
``ray.data.Dataset.join``: Ray 2.49's hash-shuffle join raises
``ArrowInvalid: No match or multiple matches for key field reference``
whenever a hash partition comes up empty on one side (schema-less empty
table inside the aggregator), which tiny or skewed label tables hit
constantly.  Nothing component- or corpus-sized ever lands on the
driver; convergence detection uses the exact label sum as a potential
function (strictly decreases on any change; computed as
arbitrary-precision per-block partial sums so 2^62-range doc ids cannot
overflow).

Small pair sets (<= ``local_cap`` rows — fits comfortably in one block)
take the degenerate single-partition path: the same min-label fixpoint
computed with union-find in one task-sized step.  Tests assert both
paths produce identical labels.

Reference parity: the reference's only grouping of duplicate candidates
is implicit in ``dropDuplicates`` (``create_lookup_table.py:34``); this
operator generalizes it to transitive near-dup groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

from .blocks import as_arrow_block, nonempty_block_refs
from .groupagg import sorted_groupby_agg


def union_find_labels(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Single-machine min-label fixpoint via union-find ->
    {node: component_min}.  The degenerate (one-partition) case of the
    distributed loop below; used when the pair set fits in one block."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _labels_table(groups: dict[int, int]) -> pa.Table:
    items = sorted(groups.items())
    return pa.table({"node": pa.array([k for k, _ in items], pa.int64()),
                     "label": pa.array([v for _, v in items], pa.int64())})


_EMPTY_LABELS = pa.table({"node": pa.array([], pa.int64()),
                          "label": pa.array([], pa.int64())})

_EMPTY_OUT = pa.table({"dst": pa.array([], pa.int64()),
                       "lab": pa.array([], pa.int64())})


# ------------------------------------------------------- fill-down join ---


@ray.remote(num_returns=2)
def _fill_block(blk):
    """Resolve request rows against label rows inside one sorted block.

    Input rows are sorted by (key, kind) with kind=0 label rows leading
    each key run (labels are unique per key), kind=1 request rows after.
    -> (resolved (dst, lab) table,
        (prefix_count, last_key, last_lab_or_None)) where prefix_count
    is the number of leading request rows whose run started in an
    earlier block (their label arrives via the driver carry)."""
    blk = as_arrow_block(blk)
    key = blk["key"].to_numpy(zero_copy_only=False)
    kind = blk["kind"].to_numpy(zero_copy_only=False)
    val = blk["val"].to_numpy(zero_copy_only=False)
    dst = blk["dst"].to_numpy(zero_copy_only=False)
    n = len(key)
    idx = np.arange(n)
    # index of the most recent label row at-or-above each row (-1 = none)
    lab_idx = np.maximum.accumulate(np.where(kind == 0, idx, -1))
    is_req = kind == 1
    have = lab_idx >= 0
    same_run = np.zeros(n, dtype=bool)
    same_run[have] = key[lab_idx[have]] == key[have]
    resolved = is_req & same_run
    unresolved = is_req & ~same_run  # always a block prefix (runs lead
    # with their label row, so only the first, continued run lacks one)
    out = pa.table({"dst": pa.array(dst[resolved], pa.int64()),
                    "lab": pa.array(val[lab_idx[resolved]], pa.int64())})
    # label for the run continuing into the next block (the last row's
    # run), if its label row lives in this block
    last_lab = int(val[lab_idx[-1]]) \
        if have[-1] and key[lab_idx[-1]] == key[-1] else None
    return out, (int(unresolved.sum()), int(key[-1]), last_lab)


@ray.remote
def _fix_prefix(blk, prefix_count: int, lab: int):
    """Attach the carried label to a block's unresolved prefix rows."""
    blk = as_arrow_block(blk).slice(0, prefix_count)
    return pa.table({"dst": blk["dst"].cast(pa.int64()),
                     "lab": pa.array(np.full(prefix_count, lab, np.int64),
                                     pa.int64())})


def filldown_join(labels: Dataset, requests: Dataset) -> Dataset:
    """Distributed lookup join: for every request row (key, dst) emit
    (dst, lab) where lab is the label of ``key`` in ``labels`` (key,
    lab; keys unique, every request key present).

    ONE distributed sort on (key, kind) co-locates each key's label row
    ahead of its request rows; a vectorized per-block pass resolves
    everything except runs that span block boundaries, which are fixed by
    an O(blocks) driver carry scan + one tiny task per spanning prefix —
    the ``stages/groupagg.py`` discipline.  Used instead of
    ``Dataset.join`` (see module docstring for the Ray 2.49 empty-
    partition failure)."""

    def tag_labels(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["key"].cast(pa.int64()),
            "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
            "val": t["lab"].cast(pa.int64()),
            "dst": pa.array(np.zeros(n, np.int64), pa.int64()),
        })

    def tag_requests(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["key"].cast(pa.int64()),
            "kind": pa.array(np.ones(n, np.int8), pa.int8()),
            "val": pa.array(np.zeros(n, np.int64), pa.int64()),
            "dst": t["dst"].cast(pa.int64()),
        })

    tagged = labels.map_batches(tag_labels, batch_format="pyarrow").union(
        requests.map_batches(tag_requests, batch_format="pyarrow"))
    s = tagged.sort(["key", "kind"]).materialize()
    refs = nonempty_block_refs(s)
    if not refs:
        return rd.from_arrow(_EMPTY_OUT)
    outs = [_fill_block.remote(r) for r in refs]
    metas = ray.get([m for _, m in outs])
    out_refs = [o for o, _ in outs]
    carry_lab: int | None = None
    fixes = []
    for ref, (prefix_count, _last_key, last_lab) in zip(refs, metas):
        if prefix_count:
            assert carry_lab is not None, \
                "filldown_join: request key missing from labels"
            fixes.append(_fix_prefix.remote(ref, prefix_count, carry_lab))
        if last_lab is not None:
            # the block's last run carries its label forward; when
            # last_lab is None the block is one mid-run slice and the
            # existing carry (that run's label) stays valid
            carry_lab = last_lab
    return rd.from_arrow_refs(out_refs + fixes)


# ------------------------------------------------- distributed min-label ---


def _exact_sum(ds: Dataset, col: str) -> int:
    """Arbitrary-precision sum of an int64 column: python-int partial per
    block (labels can sit near 2^62 — int64/float64 sums would overflow),
    merged on the driver as O(blocks) strings."""
    parts = ds.map_batches(
        lambda t: pa.table({"s": pa.array([str(sum(t[col].to_pylist()))])}),
        batch_format="pyarrow").take_all()
    return sum(int(r["s"]) for r in parts)


def _self_min(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    return pa.table({"n": t["n"],
                     "l": pc.min_element_wise(t["n"], t["l"])})


def _local_star(t: pa.Table) -> pa.Table:
    """Per-block contraction: union-find over this block's edges -> star
    edges (node, block-local component min).  Connectivity within the
    block is exactly preserved (that is what union-find computes) and
    across blocks a shared node links its local minima, so the union of
    all blocks' stars has the SAME components as the input — but the
    block's quadratic pair mass collapses to one row per distinct node,
    and a component's diameter drops to O(#blocks it spans).  Self rows
    (node == local min) are KEPT — one row per local min is negligible
    and it preserves singleton components from degenerate (x, x) input
    pairs, matching :func:`union_find_labels` exactly."""
    av = t["a"].to_pylist()
    bv = t["b"].to_pylist()
    lab = union_find_labels(list(zip(av, bv)))
    nodes = np.fromiter(lab.keys(), np.int64, len(lab))
    mins = np.fromiter(lab.values(), np.int64, len(lab))
    return pa.table({"a": pa.array(nodes, pa.int64()),
                     "b": pa.array(mins, pa.int64())})


@ray.remote
def _uf_finish(*blks) -> pa.Table:
    """Single-task finish: exact labels over a star set that fits in one
    worker's heap (runs on a WORKER, not the driver)."""
    tbl = pa.concat_tables([as_arrow_block(b) for b in blks])
    lab = union_find_labels(
        list(zip(tbl["a"].to_pylist(), tbl["b"].to_pylist())))
    t = _labels_table(lab)
    return t.rename_columns(["n", "l"])


def connected_components_ds(pairs: Dataset, a: str = "a", b: str = "b",
                            max_iters: int = 64,
                            task_cap: int = 1 << 21) -> Dataset:
    """Distributed min-label propagation -> Dataset[(n, l)] for every
    node appearing in ``pairs``; l = component min node id.

    Three phases, cheapest machinery that still guarantees exactness:

    1. **Contraction rounds** — per-block union-find stars
       (:func:`_local_star`), then repartition to 1/4 the blocks and
       contract again.  Each round is one narrow repartition + one map
       over data that shrinks from the pair set (quadratic in bucket
       sizes) toward one row per distinct node; no sorts.
    2. **Single-task finish** — once the star set fits ``task_cap``
       rows, one worker task computes exact labels (the pair set has
       collapsed to <= #distinct duplicate-involved nodes by then, which
       for thresholded near-dup pairs is tiny relative to the corpus).
    3. **Min-label loop** (fallback) — if even the contracted node set
       exceeds ``task_cap`` (a corpus where *billions* of docs are near
       dups of something), propagate labels with :func:`filldown_join`
       + pointer jumping: O(log blocks) rounds of node-count-sized
       shuffles, nothing bigger than a block on any one machine.
       ``task_cap=0`` forces this path (tests exercise it explicitly).
    """

    def both_dirs(t: pa.Table) -> pa.Table:
        av = t["a"].cast(pa.int64())
        bv = t["b"].cast(pa.int64())
        return pa.table({"n": pa.chunked_array([av, bv]).combine_chunks(),
                         "nbr": pa.chunked_array([bv, av]).combine_chunks()})

    # phase 1: contraction rounds
    stars = pairs.select_columns([a, b]).rename_columns(["a", "b"]) \
        .map_batches(_local_star, batch_format="pyarrow",
                     batch_size=None).materialize()
    nblocks = stars.num_blocks()
    # task_cap=0 (force the loop) skips further contraction so the loop
    # actually sees a multi-block graph
    while task_cap and nblocks > 1 and stars.count() > task_cap:
        nblocks = max(1, nblocks // 4)
        stars = stars.repartition(nblocks) \
            .map_batches(_local_star, batch_format="pyarrow",
                         batch_size=None).materialize()

    # phase 2: single-task finish
    if stars.count() <= task_cap:
        refs = nonempty_block_refs(stars)
        if not refs:
            return rd.from_arrow(_EMPTY_LABELS.rename_columns(["n", "l"]))
        return rd.from_arrow_refs([_uf_finish.remote(*refs)])

    # phase 3: min-label loop over the contracted stars
    edges = stars.map_batches(both_dirs, batch_format="pyarrow") \
        .materialize()
    edge_req = edges.map_batches(
        lambda t: pa.table({"key": t["nbr"], "dst": t["n"]}),
        batch_format="pyarrow").materialize()

    # l0 = min(self, min neighbor) — already one propagation round
    L = sorted_groupby_agg(edges.select_columns(["n", "nbr"]), ["n"],
                           [("nbr", "min", "l")]) \
        .map_batches(_self_min, batch_format="pyarrow").materialize()

    as_labels = lambda ds: ds.map_batches(  # noqa: E731
        lambda t: pa.table({"key": t["n"], "lab": t["l"]}),
        batch_format="pyarrow")
    prev = None
    for _ in range(max_iters):
        tot = _exact_sum(L, "l")
        if tot == prev:
            return L
        prev = tot
        # propagate: each edge (n, m) offers l(m) to n
        msgs = filldown_join(as_labels(L), edge_req).map_batches(
            lambda t: pa.table({"n": t["dst"], "l": t["lab"]}),
            batch_format="pyarrow")
        L2 = sorted_groupby_agg(msgs.union(L.select_columns(["n", "l"])),
                                ["n"], [("l", "min", "l")]).materialize()
        # pointer jump: l <- l(l).  Every label is a node id present in
        # L2 (within-component minima), so the lookup is total.
        jump_req = L2.map_batches(
            lambda t: pa.table({"key": t["l"], "dst": t["n"]}),
            batch_format="pyarrow")
        L = filldown_join(as_labels(L2), jump_req).map_batches(
            lambda t: pa.table({"n": t["dst"], "l": t["lab"]}),
            batch_format="pyarrow").materialize()
    raise RuntimeError(
        f"connected_components_ds: no fixpoint after {max_iters} "
        "iterations (diameter beyond pointer-jumped bound — raise "
        "max_iters)")


def connected_components(pairs: pa.Table | Dataset, a: str = "a",
                         b: str = "b", *, local_cap: int = 1 << 20,
                         max_iters: int = 64,
                         task_cap: int = 1 << 21) -> pa.Table:
    """(node, label) sorted by node, label = component min.

    Pair sets up to ``local_cap`` rows solve in one single-partition step
    (union-find — the same fixpoint, cheaper than spinning shuffle
    iterations for kilobyte inputs); larger sets run the distributed
    path (``local_cap=0`` forces it; ``task_cap`` is forwarded — see
    :func:`connected_components_ds`).  The returned table is
    driver-resident — callers that keep corpus-scale group tables
    distributed should use :func:`connected_components_ds`.
    """
    is_ds = isinstance(pairs, Dataset)
    n_pairs = pairs.count() if is_ds else pairs.num_rows
    if n_pairs == 0:
        return _EMPTY_LABELS
    if n_pairs <= local_cap:
        tbl = pa.concat_tables(
            [b_ for b_ in pairs.iter_batches(batch_format="pyarrow",
                                             batch_size=None)]) \
            if is_ds else pairs
        return _labels_table(union_find_labels(
            list(zip(tbl[a].to_pylist(), tbl[b].to_pylist()))))
    ds = pairs if is_ds else rd.from_arrow(pairs)
    out = connected_components_ds(ds, a, b, max_iters=max_iters,
                                  task_cap=task_cap)
    res = pa.concat_tables(
        [t for t in out.iter_batches(batch_format="pyarrow",
                                     batch_size=None)])
    return res.rename_columns(["node", "label"]) \
        .sort_by([("node", "ascending")])
