"""Analytics enrichment: batch-precompute + point-serve FWCI and citation
percentile per id (reference ``api/enrich.py:208-240``: ``/enrich`` answers
from a preloaded analytics DataFrame; ``api/combined.py:100-126`` loads it
once at startup).

Ray-native split:

* :func:`build_analytics` — the batch side: grouped-mean FWCI ratios
  (A4+M11) and the distributed percent_rank (O3, ``stages/window.py``)
  joined on id and written as HASH-BUCKETED parquet
  (``bucket=<id % n>/``) with a manifest.  Bucketing is the point-lookup
  index: a single id maps to one bucket directory.
* :class:`EnrichServer` — the serving side: an actor that memoizes bucket
  tables on first touch (lazy, O(touched buckets) memory) and answers
  ``enrich([ids])`` without any per-request job — unlike the reference's
  spark-submit-per-request ``/paper/{id}`` (``combined.py:227-278``).
  Rank -> percentile conversion ``(1 - rank) * 100`` mirrors M12
  (``enrich.py:228``).

No HTTP framework ships in this sandbox; the server is exposed as a Ray
actor with the same request/response shape the reference's FastAPI handler
has — a web front is one ``@app.post`` wrapper away.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..state import fsio

N_BUCKETS = 64


def build_analytics(sf_dir: str, out_dir: str,
                    n_buckets: int = N_BUCKETS) -> dict:
    """Precompute (event_id, fwci_m, pct_m, bucket) and write bucketed
    parquet + manifest.  Returns the manifest.

    The analytics VALUES come from the same driver-contract pipelines the
    oracle gate verifies (``q_fwci_events``, ``q_percentile_rank``) — one
    source of truth, so batch and serving can never drift."""
    from .queries import q_fwci_events, q_percentile_rank

    fwci_ds = q_fwci_events(sf_dir)                     # (event_id, fwci_m)
    pct_ds = q_percentile_rank(sf_dir).map_batches(     # (pr_id, pct_m)
        lambda b: pa.table({"pr_id": b["event_id"], "pct_m": b["pct_m"]}),
        batch_format="pyarrow")

    n_rows = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]).count()
    npart = max(8, min(int(ray.cluster_resources().get("CPU", 8)),
                       n_rows // 100_000 + 1))
    joined = fwci_ds.join(pct_ds, join_type="inner", num_partitions=npart,
                          on=("event_id",), right_on=("pr_id",))

    def bucketize(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "bucket", pa.array((ids % n_buckets).astype(np.int32), pa.int32()))

    # versioned bucket dir + manifest-as-commit-point (same discipline as
    # the index termdict): a rebuild never appends into live bucket dirs,
    # and readers of the PREVIOUS generation keep working until the next
    # rebuild GCs it (one-generation grace)
    fsio.makedirs(out_dir, exist_ok=True)
    bdir_name = f"buckets-{uuid.uuid4().hex[:12]}"
    b_fs, b_p = fsio.ray_fs_path(fsio.join(out_dir, bdir_name))
    joined.map_batches(bucketize, batch_format="pyarrow") \
        .write_parquet(b_p, partition_cols=["bucket"], filesystem=b_fs)
    manifest = {"n_buckets": n_buckets, "source": sf_dir,
                "buckets_dir": bdir_name}
    mf_path = fsio.join(out_dir, "analytics_manifest.json")
    prev = None
    if fsio.exists(mf_path):
        try:
            prev = fsio.read_json(mf_path).get("buckets_dir", "buckets")
        except (OSError, ValueError):
            prev = None
    fsio.write_json_atomic(mf_path, manifest)
    keep = {bdir_name, prev}
    for d in fsio.listdir(out_dir):
        if ((d == "buckets" or d.startswith("buckets-")) and d not in keep):
            fsio.rmtree(fsio.join(out_dir, d), ignore_errors=True)
    return manifest


@ray.remote
class EnrichServer:
    """Point-serving actor over a :func:`build_analytics` directory."""

    def __init__(self, analytics_dir: str):
        self.manifest = fsio.read_json(
            fsio.join(analytics_dir, "analytics_manifest.json"))
        self.n_buckets = int(self.manifest["n_buckets"])
        self.dir = analytics_dir
        self._buckets: dict[int, dict[int, tuple[int, int]]] = {}

    def _bucket(self, b: int) -> dict[int, tuple[int, int]]:
        hit = self._buckets.get(b)
        if hit is None:
            root = fsio.join(self.dir,
                             self.manifest.get("buckets_dir", "buckets"))
            if not fsio.isdir(root):
                # generation GC'd (server fell two rebuilds behind): fail
                # LOUDLY — returning {} would silently serve null analytics
                # for ids that exist
                raise RuntimeError(
                    f"analytics generation {root} no longer exists "
                    f"(superseded by newer builds); restart EnrichServer")
            bdir = fsio.join(root, f"bucket={b}")
            hit = {}
            if fsio.isdir(bdir):
                t = fsio.pq_read_table(
                    bdir, columns=["event_id", "fwci_m", "pct_m"])
                hit = {int(i): (int(f), int(p))
                       for i, f, p in zip(t["event_id"].to_pylist(),
                                          t["fwci_m"].to_pylist(),
                                          t["pct_m"].to_pylist())}
            self._buckets[b] = hit
        return hit

    def enrich(self, ids: list[int]) -> list[dict]:
        """One record per requested id, reference response shape: missing
        ids come back with null analytics (``enrich.py:236-238``)."""
        out = []
        for i in ids:
            row = self._bucket(int(i) % self.n_buckets).get(int(i))
            if row is None:
                out.append({"event_id": int(i), "fwci": None,
                            "citation_percentile": None})
            else:
                fwci_m, pct_m = row
                out.append({
                    "event_id": int(i),
                    "fwci": fwci_m / 1000.0,
                    # rank->percentile rescale, reference M12
                    "citation_percentile": (1000 - pct_m) / 10.0,
                })
        return out
