"""Checkpoint / manifest / lineage for resumable index builds.

Pattern generalized from the reference's only resume mechanism — the
append-only upload log + skip-if-exists ingest
(``dataset/s2orc/load_hdfs.sh:31-46``, ``dataset/s2orc/api.py:29-31``) — as
mandated by SURVEY.md §4.3.3: per-shard output directories with
``_SUCCESS`` done-markers, a ``shard.json`` lineage record (input files,
row counts, metrics, stage versions) and a final ``manifest.json``.  A
restarted build skips every shard whose marker exists; ``tests/test_resume``
asserts resumed == fresh.

All paths go through :mod:`state.fsio`, so ``index_dir`` may be a URI
(``file://``, ``mock://`` in tests, or any pyarrow/fsspec filesystem) —
plain POSIX paths take the zero-overhead local fast path.
"""

from __future__ import annotations

from . import fsio

SUCCESS = "_SUCCESS"


def is_done(dir_path: str) -> bool:
    return fsio.exists(fsio.join(dir_path, SUCCESS))


def mark_done(dir_path: str) -> None:
    fsio.write_bytes(fsio.join(dir_path, SUCCESS), b"ok\n")


def write_json(path: str, obj: dict) -> None:
    fsio.write_json_atomic(path, obj)  # atomic publish (see fsio notes)


def read_json(path: str) -> dict:
    return fsio.read_json(path)


def shard_dir(index_dir: str, shard_id: int) -> str:
    return fsio.join(index_dir, "shards", f"shard-{shard_id:04d}")


def update_shard_record(index_dir: str, shard_id: int, **fields) -> dict:
    sd = shard_dir(index_dir, shard_id)
    fsio.makedirs(sd)
    path = fsio.join(sd, "shard.json")
    rec = read_json(path) if fsio.exists(path) else {"shard_id": shard_id}
    rec.update(fields)
    write_json(path, rec)
    return rec


def read_shard_record(index_dir: str, shard_id: int) -> dict:
    return read_json(fsio.join(shard_dir(index_dir, shard_id), "shard.json"))
