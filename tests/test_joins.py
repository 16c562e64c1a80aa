"""Broadcast lookup join (stages/joins.py)."""

import pandas as pd

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.joins import (
    broadcast_lookup_join,
)


def test_broadcast_lookup_inner_semantics(ray_session):
    import ray.data as rd
    big = pd.DataFrame({"k": [1, 2, 3, 2, 9], "x": [10, 20, 30, 40, 50]})
    small = pd.DataFrame({"kk": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
    out = broadcast_lookup_join(rd.from_pandas(big).repartition(3),
                                rd.from_pandas(small), "k", "kk",
                                ["name"]).to_pandas()
    out = out.sort_values("x").reset_index(drop=True)
    # inner: k=9 dropped; duplicates on the big side each matched
    assert out["x"].tolist() == [10, 20, 30, 40]
    assert out["name"].tolist() == ["a", "b", "c", "b"]


def test_broadcast_lookup_threshold_fallback(ray_session):
    import ray.data as rd
    big = rd.from_pandas(pd.DataFrame({"k": [1]}))
    small = rd.from_pandas(pd.DataFrame({"kk": [1, 2, 3]}))
    assert broadcast_lookup_join(big, small, "k", "kk", [],
                                 max_rows=2) is None
