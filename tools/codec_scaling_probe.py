"""Isolated parallel-codec throughput probe (no Ray): decode+re-encode a
representative postings row in N worker PROCESSES and print aggregate
throughput at N = 1, 8, 32.

Purpose: separate the hardware's parallel-scaling ceiling from the
compaction pipeline's.  A tombstone purge is CPU/memory-bound codec work
(delta+varint decode -> filter -> re-encode); if this probe shows the
BOX only gives k× aggregate throughput from 8 -> 32 processes, no
orchestration can push the purge-compaction 8-vs-32 efficiency above
k/4.  Measured on the round-5 bench VM (32 physical cores, 2.1 GHz):
1 -> 8 procs 0.97 efficiency, 8 -> 32 procs 0.68 — the purge
compaction's measured 0.66 is ~97% of that ceiling.

Usage: python tools/codec_scaling_probe.py [seconds-per-level]
"""
import os
import sys
import time
from multiprocessing import Process, Queue

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def work(q, secs):
    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.functions.codec import (  # noqa: E501
        decode_postings,
        encode_postings,
    )
    rng = np.random.default_rng(os.getpid())
    doc = np.sort(rng.choice(2 ** 40, 5000, replace=False)).astype(np.int64)
    tf = rng.integers(1, 5, 5000).astype(np.int64)
    dl = rng.integers(50, 500, 5000).astype(np.int64)
    enc = encode_postings(doc, tf, dl, None)
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        ids, tfs = decode_postings(enc)
        enc = encode_postings(ids, tfs, dl, None)
        n += 1
    q.put(n)


def main():
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    out = {}
    for procs in (1, 8, 32):
        q = Queue()
        ps = [Process(target=work, args=(q, secs)) for _ in range(procs)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        out[procs] = sum(q.get() for _ in ps)
        print(f"procs={procs:2d} aggregate={out[procs]} "
              f"per-proc={out[procs] / procs:.0f}")
    print(f"8->32 scaling efficiency of the BOX for codec work: "
          f"{out[32] / out[8] / 4:.3f}")


if __name__ == "__main__":
    main()
