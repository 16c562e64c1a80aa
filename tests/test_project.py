"""Nested-struct projection stage (SURVEY §2.2 M1-M3; ref diag.scala:17-35)."""

import pyarrow as pa

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages.project import (
    project_struct_fields,
    struct_field_path,
)


def _nested_ds():
    import ray.data as rd
    inner = pa.StructArray.from_arrays(
        [pa.array(["article", None, "thesis"]),
         pa.array([0.9, 0.5, None])],
        ["type", "confidence"])
    meta = pa.StructArray.from_arrays([inner], ["doc"])
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "meta": meta})
    return rd.from_arrow(t)


def test_struct_field_path(ray_session):
    t = _nested_ds().take_batch(3, batch_format="pyarrow")
    out = struct_field_path(t["meta"], "doc.type")
    assert out.to_pylist() == ["article", None, "thesis"]


def test_project_drop_null_and_fill(ray_session):
    ds = _nested_ds()
    out = project_struct_fields(
        ds, "meta",
        fields={"doc_type": "doc.type", "conf": "doc.confidence"},
        keep=("doc_id",),
        drop_null_on=("doc_type",),
        fill={"conf": 0.0}).to_pandas()
    # row 2 (null type) dropped; null confidence coalesced to 0.0
    assert out["doc_id"].tolist() == [1, 3]
    assert out["doc_type"].tolist() == ["article", "thesis"]
    assert out["conf"].tolist() == [0.9, 0.0]
