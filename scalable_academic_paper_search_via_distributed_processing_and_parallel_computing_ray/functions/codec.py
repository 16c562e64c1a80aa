"""Posting-list compression: delta-gap + LEB128 varint, block-max, skips.

Pure numpy (vectorized encode AND decode — no per-int Python loops), no Ray.
Layout (SURVEY.md §1.4 "posting lists"): postings for one (term, salt) shard
are split into fixed-size blocks of ``BLOCK_SIZE`` postings.  Each block's
doc_ids are delta-encoded (first id absolute, then gaps) and varint-packed
independently, so WAND can skip whole blocks without decoding them.  Per
block we keep: first doc_id (for seeking), byte offsets into the two binary
streams (skip pointers), and the max ``tf_norm`` (block-max upper bound,
multiplied by idf at query time).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128  # postings per block


# ---------------------------------------------------------------- varint ---

def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():
        nbits[nz] += 1
        tmp >>= np.uint64(7)
        nz = tmp > 0
    nbytes = np.maximum(nbits, 1)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    # byte position within its value: iteratively place group k of every value
    # still having >k groups (loop runs max 10 times — vectorized inside)
    k = 0
    remaining = v.copy()
    active = np.ones(v.shape, dtype=bool)
    while active.any():
        idx = starts[active] + k
        payload = (remaining[active] & np.uint64(0x7F)).astype(np.uint8)
        more = (remaining[active] >> np.uint64(7)) > 0
        out[idx] = payload | (more.astype(np.uint8) << 7)
        remaining[active] >>= np.uint64(7)
        nxt = np.zeros_like(active)
        nxt[active] = more
        active = nxt
        k += 1
    return out.tobytes()


def varint_decode(buf: bytes | memoryview) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # start index of each value = positions just after each terminator
    starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    payload = (b & np.uint64(0x7F)).astype(np.uint64)
    # shift of each byte = 7 * (pos - start_of_its_value)
    value_id = np.cumsum(is_last) - is_last  # 0-based id of the value each byte belongs to
    pos_in_value = np.arange(b.size, dtype=np.int64) - starts[value_id]
    shifted = payload << (np.uint64(7) * pos_in_value.astype(np.uint64))
    return np.add.reduceat(shifted, starts)


# ---------------------------------------------------------- block layout ---

@dataclass
class EncodedPostings:
    """One (term, salt) shard: columnar fields stored in the segment table."""
    df: int                      # number of postings in this shard
    doc_bytes: bytes             # concatenated per-block varint(delta(doc_ids))
    tf_bytes: bytes              # concatenated per-block varint(tf - 1)
    block_first: np.ndarray      # int64 — first doc_id of each block
    block_doc_off: np.ndarray    # int32 — byte offset of each block in doc_bytes
    block_tf_off: np.ndarray     # int32 — byte offset of each block in tf_bytes
    block_max_tfnorm: np.ndarray  # float32 — max tf_norm within each block
    block_last: np.ndarray       # int64 — last doc_id of each block (skip bound)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray,
                    tfnorms: np.ndarray) -> EncodedPostings:
    """doc_ids strictly ascending int64; tfs >= 1; tfnorms = bm25.tf_norm per
    posting (block-max basis)."""
    n = doc_ids.size
    assert tfs.size == n and tfnorms.size == n
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    nblocks = max(1, -(-n // BLOCK_SIZE)) if n else 0
    doc_chunks: list[bytes] = []
    tf_chunks: list[bytes] = []
    block_first = np.zeros(nblocks, dtype=np.int64)
    block_last = np.zeros(nblocks, dtype=np.int64)
    block_doc_off = np.zeros(nblocks, dtype=np.int32)
    block_tf_off = np.zeros(nblocks, dtype=np.int32)
    block_max = np.zeros(nblocks, dtype=np.float32)
    doff = toff = 0
    for bi in range(nblocks):
        lo, hi = bi * BLOCK_SIZE, min(n, (bi + 1) * BLOCK_SIZE)
        ids = doc_ids[lo:hi]
        deltas = np.empty(hi - lo, dtype=np.uint64)
        deltas[0] = np.uint64(ids[0])
        if hi - lo > 1:
            deltas[1:] = np.diff(ids).astype(np.uint64)
        dchunk = varint_encode(deltas)
        tchunk = varint_encode((tfs[lo:hi].astype(np.uint64) - np.uint64(1)))
        block_first[bi] = ids[0]
        block_last[bi] = ids[-1]
        block_doc_off[bi] = doff
        block_tf_off[bi] = toff
        block_max[bi] = np.float32(tfnorms[lo:hi].max())
        doc_chunks.append(dchunk)
        tf_chunks.append(tchunk)
        doff += len(dchunk)
        toff += len(tchunk)
    return EncodedPostings(
        df=n,
        doc_bytes=b"".join(doc_chunks),
        tf_bytes=b"".join(tf_chunks),
        block_first=block_first,
        block_doc_off=block_doc_off,
        block_tf_off=block_tf_off,
        block_max_tfnorm=block_max,
        block_last=block_last,
    )


def decode_block(enc: EncodedPostings, bi: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids int64, tfs int64)."""
    nb = enc.block_first.size
    dlo = int(enc.block_doc_off[bi])
    dhi = int(enc.block_doc_off[bi + 1]) if bi + 1 < nb else len(enc.doc_bytes)
    tlo = int(enc.block_tf_off[bi])
    thi = int(enc.block_tf_off[bi + 1]) if bi + 1 < nb else len(enc.tf_bytes)
    deltas = varint_decode(enc.doc_bytes[dlo:dhi])
    ids = np.cumsum(deltas.astype(np.int64))
    tfs = varint_decode(enc.tf_bytes[tlo:thi]).astype(np.int64) + 1
    return ids, tfs


def decode_postings(enc: EncodedPostings) -> tuple[np.ndarray, np.ndarray]:
    """Decode all blocks -> (doc_ids, tfs)."""
    if enc.df == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    parts = [decode_block(enc, bi) for bi in range(enc.block_first.size)]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]))
