"""Distributed as-of join (stages/asof.py) vs a pandas reference, incl.
cross-block carry and strict-inequality semantics."""

import numpy as np
import pandas as pd
import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.asof import (
    asof_join,
)


def _reference(probe: pd.DataFrame, ref: pd.DataFrame) -> dict[int, int]:
    out = {}
    for row in probe.itertuples():
        c = ref[(ref["key"] == row.key) & (ref["t"] < row.t)]
        if len(c):
            out[row.pid] = int(c.sort_values("t")["v"].iloc[-1])
    return out


def test_asof_matches_pandas(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(5)
    n_p, n_r = 4000, 1500
    probe = pd.DataFrame({
        "pid": np.arange(n_p, dtype=np.int64),
        "key": rng.randint(0, 40, n_p).astype(np.int64),
        "t": rng.randint(0, 100_000, n_p).astype(np.int64),
    })
    ref = pd.DataFrame({
        "key": rng.randint(0, 40, n_r).astype(np.int64),
        "t": rng.randint(0, 100_000, n_r).astype(np.int64),
        "v": rng.randint(0, 10**9, n_r).astype(np.int64),
    })
    # force equal-time collisions to pin the strict-< rule
    probe.loc[0, ["key", "t"]] = [1, 500]
    ref = pd.concat([ref, pd.DataFrame({"key": [1], "t": [500],
                                        "v": [7]})], ignore_index=True)
    got_ds = asof_join(rd.from_pandas(probe).repartition(8),
                       rd.from_pandas(ref).repartition(8),
                       key_col="key", time_col="t",
                       probe_id_col="pid", ref_value_col="v")
    got = dict(zip(*[got_ds.to_pandas()[c] for c in ("id", "asof_value")]))
    want = _reference(probe, ref)
    assert got == want and len(want) > n_p // 2


@pytest.mark.parametrize("seed", range(5))
def test_asof_many_keys_stress(ray_session, seed):
    """Key cardinality ~ row count (each key 1-3 rows), 16 blocks — the
    regime where the round-2 per-key prefix carry exploded; the O(1)
    boundary carry must stay exact, incl. runs that span blocks."""
    import ray.data as rd
    rng = np.random.RandomState(100 + seed)
    n_p, n_r, n_k = 3000, 3000, 2500
    probe = pd.DataFrame({
        "pid": np.arange(n_p, dtype=np.int64),
        "key": rng.randint(0, n_k, n_p).astype(np.int64),
        "t": rng.randint(0, 1000, n_p).astype(np.int64),
    })
    ref = pd.DataFrame({
        "key": rng.randint(0, n_k, n_r).astype(np.int64),
        "t": rng.randint(0, 1000, n_r).astype(np.int64),
        "v": rng.randint(0, 10**9, n_r).astype(np.int64),
    })
    got_ds = asof_join(rd.from_pandas(probe).repartition(16),
                       rd.from_pandas(ref).repartition(16),
                       key_col="key", time_col="t",
                       probe_id_col="pid", ref_value_col="v")
    got = dict(zip(*[got_ds.to_pandas()[c] for c in ("id", "asof_value")]))
    want = _reference(probe, ref)
    assert got == want


def test_asof_no_reference_rows(ray_session):
    import ray.data as rd
    probe = pd.DataFrame({"pid": [1], "key": [1], "t": [10]})
    ref = pd.DataFrame({"key": pd.Series(dtype=np.int64),
                        "t": pd.Series(dtype=np.int64),
                        "v": pd.Series(dtype=np.int64)})
    out = asof_join(rd.from_pandas(probe), rd.from_pandas(ref),
                    "key", "t", "pid", "v").to_pandas()
    assert len(out) == 0
