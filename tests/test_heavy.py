"""Heavy-hitter terms: candidates-then-verify equals the full groupby."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pytest
import ray.data as rd

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.tokenize import (
    tokenize_filtered,
)
from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.heavy import (
    heavy_terms,
)


def _mk_ds(texts, blocks=4):
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})) \
        .repartition(blocks)


def _exact(texts, min_count):
    c = Counter(t for x in texts for t in tokenize_filtered(x))
    rows = sorted(((t, n) for t, n in c.items() if n >= min_count),
                  key=lambda tn: (-tn[1], tn[0]))
    return rows


def test_heavy_equals_exact_counts(ray_session):
    texts = (["alpha beta gamma"] * 30 + ["alpha delta"] * 25
             + ["epsilon zeta"] * 3 + ["beta"] * 10)
    got = heavy_terms(_mk_ds(texts), min_count=10, k_sketch=64)
    want = _exact(texts, 10)
    assert list(zip(got["term"].to_pylist(),
                    got["count"].to_pylist())) == want


def test_heavy_light_term_spread_across_batches(ray_session):
    """A term light in every batch but globally heavy MUST still be found
    (the pigeonhole guarantee working at the batch boundary)."""
    # 'rare' appears once per doc, docs spread over many blocks
    texts = ["rare filler%d stuff%d" % (i, i) for i in range(40)]
    got = heavy_terms(_mk_ds(texts, blocks=8), min_count=40, k_sketch=512)
    assert ("rare", 40) in list(zip(got["term"].to_pylist(),
                                    got["count"].to_pylist()))


def test_heavy_guarantee_floor_raises(ray_session):
    texts = ["word " * 50] * 20  # 1000 tokens
    with pytest.raises(ValueError, match="guarantee floor"):
        heavy_terms(_mk_ds(texts), min_count=5, k_sketch=8)  # floor=125


def test_heavy_empty_input(ray_session):
    got = heavy_terms(_mk_ds(["", "the a of"]), min_count=1, k_sketch=1000)
    assert got.num_rows == 0


def test_heavy_guarantee_floor_equality_raises(ray_session):
    """min_count * k_sketch == total_tokens is NOT covered by the strict
    pigeonhole argument — must raise (ADVICE r3 boundary)."""
    texts = ["word " * 50] * 20  # 1000 tokens
    # min_count=125, k_sketch=8 -> 125*8 == 1000 exactly
    with pytest.raises(ValueError, match="guarantee floor"):
        heavy_terms(_mk_ds(texts), min_count=125, k_sketch=8)
