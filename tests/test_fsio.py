"""Remote-storage seam (state/fsio.py, VERDICT r4 #3): the whole index
lifecycle — build -> search -> extend -> delete -> compact -> point fetch —
runs with ``index_dir`` as a URI on a fake remote filesystem.

``mock://name/...`` maps to a local shadow root through a
``pyarrow.fs.SubTreeFileSystem`` — deterministic, so every Ray worker
process resolves the same shadow (a multi-process-safe fake remote).  A
call site that bypasses the seam with a raw ``os.*`` on the URI string
would create a literal ``mock:`` directory or crash; the test asserts
neither happened.
"""

import os
import shutil

import pytest

from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.state import (
    fsio,
)

MOCK = "mock://fsio-test"


@pytest.fixture(autouse=True)
def _clean_mock_root():
    shutil.rmtree(os.path.join(fsio.MOCK_ROOT, "fsio-test"),
                  ignore_errors=True)
    yield
    shutil.rmtree(os.path.join(fsio.MOCK_ROOT, "fsio-test"),
                  ignore_errors=True)


def test_primitives_on_mock_fs():
    d = f"{MOCK}/prim"
    fsio.makedirs(f"{d}/sub")
    assert fsio.exists(f"{d}/sub") and fsio.isdir(f"{d}/sub")
    fsio.write_json_atomic(f"{d}/a.json", {"x": 1})
    assert fsio.read_json(f"{d}/a.json") == {"x": 1}
    assert not fsio.exists(f"{d}/a.json.tmp")  # replace consumed the tmp
    fsio.write_bytes(f"{d}/sub/b.bin", b"hi")
    assert fsio.getsize(f"{d}/sub/b.bin") == 2
    assert fsio.listdir(d) == ["a.json", "sub"]
    fsio.replace(f"{d}/sub/b.bin", f"{d}/sub/c.bin")
    assert fsio.listdir(f"{d}/sub") == ["c.bin"]
    # cross-fs copy: local -> mock
    local = "/tmp/fsio_local_src.txt"
    with open(local, "w") as f:
        f.write("payload")
    fsio.copy_file(local, f"{d}/copied.txt")
    with fsio.open_read(f"{d}/copied.txt") as f:
        assert f.read() == "payload"
    fsio.rmtree(f"{d}/sub")
    assert not fsio.exists(f"{d}/sub")
    os.unlink(local)


def test_index_lifecycle_on_mock_fs(ray_session, tmp_path):
    import importlib

    pkg = ("scalable_academic_paper_search_via_distributed_processing_"
           "and_parallel_computing_ray")
    pages = importlib.import_module(pkg + ".sources.pages")
    build = importlib.import_module(pkg + ".pipelines.build")
    query = importlib.import_module(pkg + ".pipelines.query")

    pdir = pages.ensure_pages_parquet("/root/testdata/sf0.001", num_files=6)
    files = sorted(os.path.join(pdir, f) for f in os.listdir(pdir)
                   if f.endswith(".parquet"))
    uri = f"{MOCK}/idx"
    local = str(tmp_path / "idx_local")

    # build half remotely and locally, extend both with the rest
    params = build.BuildParams(num_shards=2)
    build.build_index(files[:3], uri, params)
    build.build_index(files[:3], local, params)
    build.extend_index(files[3:], uri)
    build.extend_index(files[3:], local)

    r_uri = query.IndexReader(uri)
    r_loc = query.IndexReader(local)
    for q in pages.QUERY_SET:
        a = [(h.doc_id, round(h.score, 6)) for h in
             r_uri.search_wand(q["query_text"], q["k"],
                               mode=q.get("mode", "or"))]
        b = [(h.doc_id, round(h.score, 6)) for h in
             r_loc.search_wand(q["query_text"], q["k"],
                               mode=q.get("mode", "or"))]
        assert a == b, q

    # delete + compact on the remote index; point fetch through the seam
    victims = [h.doc_id for h in
               r_uri.search_wand("spark data join", 10)][:3]
    build.delete_docs(uri, victims)
    assert query.fetch_doc(uri, victims[0]) is None
    curi = f"{MOCK}/idx_compact"
    build.compact_index(uri, curi, target_shards=1)
    rc = query.IndexReader(curi)
    for q in pages.QUERY_SET:
        hits = rc.search_wand(q["query_text"], q["k"],
                              mode=q.get("mode", "or"))
        assert not any(h.doc_id in set(victims) for h in hits)
    surviving = [h.doc_id for h in rc.search_wand("spark data join", 5)]
    assert surviving and query.fetch_doc(curi, surviving[0]) is not None

    # no call site bypassed the seam: a raw os.* on the URI string would
    # have created a literal "mock:" directory somewhere local
    assert not os.path.exists("mock:")
    assert not os.path.exists(os.path.join(os.getcwd(), "mock:"))
    # the shadow root actually holds the index (it IS the fake remote)
    shadow = os.path.join(fsio.MOCK_ROOT, "fsio-test", "idx",
                          "manifest.json")
    assert os.path.exists(shadow)


def test_ivf_index_on_mock_fs(ray_session):
    """The persisted ANN index (cells/, raw/, ivf_manifest.json) rides the
    same seam: build + probe + PQ re-rank with index_dir as a URI equals
    the local-dir result bit-for-bit."""
    import numpy as np
    import ray.data as rd

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.stages import (
        similarity,
    )

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    rng = np.random.default_rng(7)
    qs = rng.normal(size=(3, 64)).astype(np.float64)

    import tempfile
    local = tempfile.mkdtemp(prefix="ivf_local_")
    for pq_m, tag in ((None, "plain"), (8, "pq")):
        uri = f"{MOCK}/ivf-{tag}"
        want = similarity.knn_ivf(ds, qs, k=5, nlist=8, nprobe=8,
                                  index_dir=f"{local}/{tag}", pq_m=pq_m)
        got = similarity.knn_ivf(ds, qs, k=5, nlist=8, nprobe=8,
                                 index_dir=uri, pq_m=pq_m)
        assert got.equals(want), tag
        # probe again from the already-persisted remote index (pure read)
        again = similarity.ivf_search(uri, qs, k=5, nprobe=8)
        assert again.equals(want), tag
    assert not os.path.exists("mock:")


def test_analytics_and_corpus_sinks_on_mock_fs(ray_session):
    """The enrich analytics dir and the clean-corpus sink ride the seam:
    build to a mock:// URI, point-serve / read back, compare to local."""
    import ray
    import ray.data as rd

    from scalable_academic_paper_search_via_distributed_processing_and_parallel_computing_ray.pipelines import (
        corpus,
        enrich,
    )

    sf = "/root/testdata/sf0.001"
    uri = f"{MOCK}/analytics"
    man = enrich.build_analytics(sf, uri, n_buckets=4)
    assert fsio.read_json(f"{uri}/analytics_manifest.json") == man
    srv = enrich.EnrichServer.remote(uri)
    recs = ray.get(srv.enrich.remote([1, 2, 10**12]))
    assert recs[0]["fwci"] is not None and recs[2]["fwci"] is None
    # rebuild GCs the superseded generation through the seam
    man2 = enrich.build_analytics(sf, uri, n_buckets=4)
    assert man2["buckets_dir"] != man["buckets_dir"]

    docs = rd.read_parquet(f"{sf}/documents.parquet").limit(64)
    curi = f"{MOCK}/clean"
    cman = corpus.write_clean_corpus(corpus.clean_corpus(docs), curi,
                                     n_buckets=4, drop_text=True)
    assert cman["n_docs"] > 0
    assert fsio.read_json(f"{curi}/corpus_manifest.json") == cman
    assert not os.path.exists("mock:")


def test_distributed_searcher_on_mock_fs(ray_session, tmp_path):
    """The serving tier also rides the seam (its manifest read was the
    one raw open() left): DistributedSearcher over a mock:// index must
    return the same hits as a local IndexReader."""
    import importlib

    pkg = ("scalable_academic_paper_search_via_distributed_processing_"
           "and_parallel_computing_ray")
    pages = importlib.import_module(pkg + ".sources.pages")
    build = importlib.import_module(pkg + ".pipelines.build")
    query = importlib.import_module(pkg + ".pipelines.query")
    serve = importlib.import_module(pkg + ".pipelines.serve")

    pdir = pages.ensure_pages_parquet("/root/testdata/sf0.001", num_files=4)
    uri = f"{MOCK}/srv"
    build.build_index(pdir, uri, build.BuildParams(num_shards=2))
    want = [(h.doc_id, round(h.score, 6)) for h in
            query.IndexReader(uri).search_wand("spark data join", 10)]
    ds = serve.DistributedSearcher(uri, num_actors=2)
    got = [(h.doc_id, round(h.score, 6)) for h in
           ds.search("spark data join", 10)]
    assert got == want
    ds.shutdown()
