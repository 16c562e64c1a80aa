"""Checkpoint / manifest / lineage for resumable index builds.

Pattern generalized from the reference's only resume mechanism — the
append-only upload log + skip-if-exists ingest
(``dataset/s2orc/load_hdfs.sh:31-46``, ``dataset/s2orc/api.py:29-31``) — as
mandated by SURVEY.md §4.3.3: per-shard output directories with
``_SUCCESS`` done-markers, a ``shard.json`` lineage record (input files,
row counts, metrics, stage versions) and a final ``manifest.json``.  A
restarted build skips every shard whose marker exists; ``tests/test_resume``
asserts resumed == fresh.
"""

from __future__ import annotations

import json
import os

SUCCESS = "_SUCCESS"


def is_done(dir_path: str) -> bool:
    return os.path.exists(os.path.join(dir_path, SUCCESS))


def mark_done(dir_path: str) -> None:
    with open(os.path.join(dir_path, SUCCESS), "w") as f:
        f.write("ok\n")


def write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)
    os.replace(tmp, path)  # atomic publish


def read_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def shard_dir(index_dir: str, shard_id: int) -> str:
    return os.path.join(index_dir, "shards", f"shard-{shard_id:04d}")


def update_shard_record(index_dir: str, shard_id: int, **fields) -> dict:
    sd = shard_dir(index_dir, shard_id)
    os.makedirs(sd, exist_ok=True)
    path = os.path.join(sd, "shard.json")
    rec = read_json(path) if os.path.exists(path) else {"shard_id": shard_id}
    rec.update(fields)
    write_json(path, rec)
    return rec


def read_shard_record(index_dir: str, shard_id: int) -> dict:
    return read_json(os.path.join(shard_dir(index_dir, shard_id), "shard.json"))
