"""Enrich point-serving (pipelines/enrich.py) vs the batch analytics
pipelines it precomputes (reference /enrich semantics)."""

import os

import pytest
import ray

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
    enrich,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines.queries import (
    q_fwci_events,
    q_percentile_rank,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def analytics_dir(ray_session, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("analytics"))
    enrich.build_analytics(SF, d, n_buckets=8)
    return d


def test_build_layout(analytics_dir):
    import json
    mf = os.path.join(analytics_dir, "analytics_manifest.json")
    assert os.path.exists(mf)
    with open(mf) as f:
        bdir = json.load(f)["buckets_dir"]
    buckets = [d for d in os.listdir(os.path.join(analytics_dir, bdir))
               if d.startswith("bucket=")]
    assert len(buckets) > 1


def test_rebuild_replaces_buckets(ray_session, tmp_path):
    """A rebuild must not append into live bucket dirs (stale-read class)."""
    import json
    d = str(tmp_path / "an")
    enrich.build_analytics(SF, d, n_buckets=8)
    with open(os.path.join(d, "analytics_manifest.json")) as f:
        first = json.load(f)["buckets_dir"]
    enrich.build_analytics(SF, d, n_buckets=8)
    with open(os.path.join(d, "analytics_manifest.json")) as f:
        second = json.load(f)["buckets_dir"]
    assert first != second
    # previous generation kept for in-flight readers (one-generation grace)
    assert os.path.isdir(os.path.join(d, first))
    # a third build GCs the first generation
    enrich.build_analytics(SF, d, n_buckets=8)
    assert not os.path.isdir(os.path.join(d, first))
    # serving still answers correctly after rebuilds
    srv = enrich.EnrichServer.remote(d)
    got = ray.get(srv.enrich.remote([0]))
    assert got[0]["fwci"] is not None
    ray.kill(srv)


def test_enrich_matches_batch_pipelines(analytics_dir):
    fw = q_fwci_events(SF).to_pandas()
    pct = q_percentile_rank(SF).to_pandas()
    fw_map = dict(zip(fw["event_id"], fw["fwci_m"]))
    pct_map = dict(zip(pct["event_id"], pct["pct_m"]))

    srv = enrich.EnrichServer.remote(analytics_dir)
    ids = sorted(fw_map)[:25]
    got = ray.get(srv.enrich.remote(ids))
    for rec in got:
        i = rec["event_id"]
        assert rec["fwci"] == fw_map[i] / 1000.0
        assert rec["citation_percentile"] == (1000 - pct_map[i]) / 10.0
    ray.kill(srv)


def test_enrich_missing_id_null(analytics_dir):
    srv = enrich.EnrichServer.remote(analytics_dir)
    got = ray.get(srv.enrich.remote([10**12 + 7]))
    assert got == [{"event_id": 10**12 + 7, "fwci": None,
                    "citation_percentile": None}]
    ray.kill(srv)
