"""Deterministic hash-based sampling.

``Dataset.random_sample(fraction, seed)`` (reference O4,
``working.py``-style ``df.sample``) draws from an RNG stream whose
membership depends on row/partition order — two runs over differently
partitioned copies of the same table sample DIFFERENT rows, which breaks
resumable pipelines (a retried shard re-samples) and cross-engine
verification.  The scalable idiom is hash-Bernoulli sampling: a row is in
the sample iff ``hash(key) mod M < M * fraction``.  Membership is a pure
per-row function — stable under repartitioning, restarts, cluster size,
and reproducible in SQL (md5-based :func:`..functions.textstats.hash64`),
so the driver oracle can value-check the exact sampled row set.

Cost note: md5-per-key is a Python-loop-over-rows stage (~1 us/row).
A vectorized numpy mix (splitmix64) would be ~50x faster but not
SQL-reproducible; sampling is a one-pass filter over a pruned column, so
the hash is not a bottleneck until ~10^9 rows/task — at which point swap
the hash fn (parameter below), losing only oracle parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from ..functions.textstats import hash64


def hash_keep_mask(keys: np.ndarray, fraction: float, mod: int = 1_000_000,
                   salt: str = "") -> np.ndarray:
    """Membership mask: ``hash64(salt + str(key)) % mod < mod*fraction``."""
    thr = int(mod * fraction)
    return np.fromiter(
        (hash64(f"{salt}{k}") % mod < thr for k in keys),
        dtype=bool, count=keys.size)


def hash_sample(ds: Dataset, key_col: str, fraction: float,
                mod: int = 1_000_000, salt: str = "") -> Dataset:
    """Deterministic ~``fraction`` sample of ``ds`` keyed on ``key_col``.

    ``salt`` decorrelates successive samples over the same table (two
    different salts give independent samples); same salt -> same rows,
    forever, on any cluster.
    """

    def f(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(hash_keep_mask(keys, fraction, mod, salt)))

    return ds.map_batches(f, batch_format="pyarrow")
