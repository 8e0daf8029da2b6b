"""Mesh-sharded search tests on the virtual 8-device CPU mesh: the sharded
path must return exactly what the single-device flat index returns."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from automative_rag_tpu.documents import Document
from automative_rag_tpu.index import FlatIndex
from automative_rag_tpu.parallel import ShardedFlatIndex, make_mesh


def _corpus(rng, n, dim):
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    docs = [
        Document(
            page_content=f"doc {i}",
            metadata={
                "manufacturer": f"manu-{i % 4}",
                "year": 2015 + (i % 10),
                "source_id": f"s{i % 5}",
            },
        )
        for i in range(n)
    ]
    return vectors, docs


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _build_pair(rng, n=1000, dim=64, mesh=None):
    vectors, docs = _corpus(rng, n, dim)
    flat = FlatIndex(dim=dim, device_dtype="float32")
    flat.add(vectors, [Document(d.page_content, dict(d.metadata), d.id) for d in docs])
    sharded = ShardedFlatIndex(dim=dim, mesh=mesh, device_dtype="float32")
    sharded.add(vectors, docs)
    return flat, sharded


def test_sharded_matches_single_device(rng, mesh):
    flat, sharded = _build_pair(rng, mesh=mesh)
    queries = rng.normal(size=(4, 64)).astype(np.float32)
    a = flat.search(queries, 10)
    b = sharded.search(queries, 10)
    for qa, qb in zip(a, b):
        assert [r.row for r in qa] == [r.row for r in qb]
        np.testing.assert_allclose(
            [r.score for r in qa], [r.score for r in qb], rtol=1e-5
        )


def test_sharded_filtered_search(rng, mesh):
    flat, sharded = _build_pair(rng, mesh=mesh)
    q = rng.normal(size=64).astype(np.float32)
    flt = {"manufacturer": ["manu-1", "manu-3"], "year": 2018}
    a = flat.search(q, 8, flt)[0]
    b = sharded.search(q, 8, flt)[0]
    assert [r.row for r in a] == [r.row for r in b]
    for r in b:
        assert r.document.metadata["manufacturer"] in ("manu-1", "manu-3")
        assert r.document.metadata["year"] == 2018


def test_sharded_capacity_is_shard_aligned(rng, mesh):
    _, sharded = _build_pair(rng, n=100, mesh=mesh)
    state = sharded._device_state()
    assert state["capacity"] % (128 * 8) == 0


def test_sharded_delete(rng, mesh):
    flat, sharded = _build_pair(rng, mesh=mesh)
    victims = [sharded._ids[i] for i in range(0, 50)]
    flat.delete_by_ids(victims)
    sharded.delete_by_ids(victims)
    q = rng.normal(size=64).astype(np.float32)
    a = [r.row for r in flat.search(q, 10)[0]]
    b = [r.row for r in sharded.search(q, 10)[0]]
    assert a == b
    assert all(r >= 50 for r in b)


def test_sharded_fewer_matches_than_k(rng, mesh):
    flat, sharded = _build_pair(rng, n=300, mesh=mesh)
    q = rng.normal(size=64).astype(np.float32)
    flt = {"manufacturer": "manu-2", "year": 2017}
    a = sharded.search(q, 20, flt)[0]
    b = flat.search(q, 20, flt)[0]
    assert [r.row for r in a] == [r.row for r in b]


def test_sharded_ivf_recall_and_filters(rng, mesh):
    from automative_rag_tpu.parallel import ShardedIVFIndex

    n, dim = 4000, 64
    centers = rng.normal(size=(32, dim)).astype(np.float32) * 3
    assign = rng.integers(0, 32, size=n)
    vectors = (centers[assign] + rng.normal(size=(n, dim))).astype(np.float32)
    docs = [
        Document(page_content=f"doc {i}",
                 metadata={"manufacturer": f"manu-{i % 4}", "year": 2018 + i % 4})
        for i in range(n)
    ]
    index = ShardedIVFIndex(dim=dim, mesh=mesh, device_dtype="float32",
                            n_lists=16, n_probe=4)
    index.add(vectors, docs)

    # unbuilt → exact sharded path
    q = rng.normal(size=dim).astype(np.float32)
    exact_rows = [r.row for r in index.search(q, 10)[0]]

    info = index.rebuild()
    assert info["n_shards"] == 8 and info["rows_indexed"] == n
    assert index.stats()["built"]

    # recall vs exact over several queries
    normalized = vectors / np.linalg.norm(vectors, axis=1, keepdims=True)
    recall = 0.0
    queries = rng.normal(size=(10, dim)).astype(np.float32)
    for qq in queries:
        qn = qq / np.linalg.norm(qq)
        want = set(np.argsort(-(normalized @ qn))[:10].tolist())
        got = {r.row for r in index.search(qq, 10)[0]}
        recall += len(got & want) / 10
    assert recall / 10 >= 0.8, recall / 10

    # filtered search respects the filter (with probe expansion)
    hits = index.search(q, 8, {"manufacturer": "manu-1", "year": 2019}, n_probe=1)[0]
    assert hits
    for r in hits:
        assert r.document.metadata["manufacturer"] == "manu-1"
        assert r.document.metadata["year"] == 2019


def test_sharded_ivf_tail_and_growth_invalidation(rng, mesh):
    from automative_rag_tpu.parallel import ShardedIVFIndex

    n, dim = 2000, 64
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    docs = [Document(page_content=f"d{i}", metadata={}) for i in range(n)]
    index = ShardedIVFIndex(dim=dim, mesh=mesh, device_dtype="float32",
                            n_lists=8, n_probe=8)
    index.add(vectors, docs)
    index.rebuild()

    # fresh row in the tail must be findable without a rebuild
    q = rng.normal(size=dim).astype(np.float32)
    index.add(q[None, :], [Document(page_content="fresh", metadata={})])
    assert index.tail_rows == 1
    hits = index.search(q, 3)[0]
    assert hits[0].document.page_content == "fresh"

    # growing past the built capacity invalidates the build (falls back to
    # exact) instead of returning wrong shard-range results
    filler = rng.normal(size=(3000, dim)).astype(np.float32)
    index.add(filler, [Document(page_content=f"x{i}", metadata={}) for i in range(3000)])
    assert not index.stats()["built"]
    hits = index.search(q, 3)[0]
    assert hits[0].document.page_content == "fresh"


def test_sharded_int8_recall(rng, mesh):
    """int8 sharded flat: top-10 must overlap the f32 sharded results >=80%
    and the top hit must agree (same bound as the single-device int8 test)."""
    flat, sharded = _build_pair(rng, mesh=mesh)
    vectors = sharded._vectors.copy()
    docs = [Document(d.page_content, dict(d.metadata)) for d in sharded._docs]
    quant = ShardedFlatIndex(dim=64, mesh=mesh, device_dtype="int8")
    quant.add(vectors, docs, normalize=False)

    queries = rng.normal(size=(4, 64)).astype(np.float32)
    exact = sharded.search(queries, 10)
    approx = quant.search(queries, 10)
    for qa, qb in zip(exact, approx):
        a, b = {r.row for r in qa}, {r.row for r in qb}
        assert len(a & b) >= 8, (a, b)
        assert qa[0].row == qb[0].row
        np.testing.assert_allclose(qa[0].score, qb[0].score, atol=0.03)


def test_sharded_int8_filtered(rng, mesh):
    flat, _ = _build_pair(rng, mesh=mesh)
    quant = ShardedFlatIndex(dim=64, mesh=mesh, device_dtype="int8")
    quant.add(flat._vectors.copy(),
              [Document(d.page_content, dict(d.metadata)) for d in flat._docs],
              normalize=False)
    q = rng.normal(size=64).astype(np.float32)
    flt = {"manufacturer": ["manu-1", "manu-3"], "year": 2018}
    want = {r.row for r in flat.search(q, 8, flt)[0]}
    hits = quant.search(q, 8, flt)[0]
    assert {r.row for r in hits} == want  # tiny filtered pool → exact agreement
    for r in hits:
        assert r.document.metadata["manufacturer"] in ("manu-1", "manu-3")
        assert r.document.metadata["year"] == 2018


def test_sharded_ivf_int8(rng, mesh):
    from automative_rag_tpu.parallel import ShardedIVFIndex

    n, dim = 4000, 64
    centers = rng.normal(size=(32, dim)).astype(np.float32) * 3
    assign = rng.integers(0, 32, size=n)
    vectors = (centers[assign] + rng.normal(size=(n, dim))).astype(np.float32)
    docs = [Document(page_content=f"doc {i}",
                     metadata={"manufacturer": f"manu-{i % 4}"})
            for i in range(n)]
    f32 = ShardedIVFIndex(dim=dim, mesh=mesh, device_dtype="float32",
                          n_lists=16, n_probe=16)
    f32.add(vectors, [Document(d.page_content, dict(d.metadata)) for d in docs])
    f32.rebuild(seed=0)
    quant = ShardedIVFIndex(dim=dim, mesh=mesh, device_dtype="int8",
                            n_lists=16, n_probe=16)
    quant.add(vectors, docs)
    quant.rebuild(seed=0)
    # centroids must not be quantized
    assert quant._device_state()["centroids"].dtype == jnp.bfloat16

    queries = rng.normal(size=(6, dim)).astype(np.float32)
    overlap = 0.0
    for q in queries:
        a = {r.row for r in f32.search(q, 10)[0]}
        b = {r.row for r in quant.search(q, 10)[0]}
        overlap += len(a & b) / 10
    assert overlap / 6 >= 0.8, overlap / 6

    # filtered + tail row still works on the int8 path
    qv = rng.normal(size=dim).astype(np.float32)
    quant.add(qv[None, :], [Document(page_content="fresh", metadata={})])
    hits = quant.search(qv, 3)[0]
    assert hits[0].document.page_content == "fresh"
    flt_hits = quant.search(qv, 5, {"manufacturer": "manu-2"}, n_probe=2)[0]
    assert flt_hits
    for r in flt_hits:
        assert r.document.metadata["manufacturer"] == "manu-2"


def test_sharded_ivf_built_slab_survives_appends(rng, mesh):
    """Pure appends within the capacity bucket must keep the sharded device
    slab resident (restaging shards the whole corpus across the mesh) and
    the host-searched tail must respect metadata filters."""
    from automative_rag_tpu.parallel import ShardedIVFIndex

    n, dim = 1500, 64
    vectors = rng.normal(size=(n, dim)).astype(np.float32)
    docs = [Document(page_content=f"d{i}",
                     metadata={"manufacturer": f"manu-{i % 4}"})
            for i in range(n)]
    index = ShardedIVFIndex(dim=dim, mesh=mesh, device_dtype="float32",
                            n_lists=8, n_probe=8)
    index.add(vectors, docs)
    index.rebuild()
    q = rng.normal(size=(1, dim)).astype(np.float32)
    index.search(q, 5)
    built = index._device
    assert built is not None

    tail_v = rng.normal(size=(3, dim)).astype(np.float32)
    index.add(tail_v, [
        Document(page_content=f"t{i}", metadata={"manufacturer": "manu-9"})
        for i in range(3)
    ])
    assert index._device is built  # pure in-bucket append: slab survives
    assert index.tail_rows == 3

    # tail rows findable, exactly, including under a filter only they match
    hits = index.search(tail_v[1:2], 3)[0]
    assert hits[0].document.page_content == "t1"
    hits = index.search(tail_v[1:2], 3, {"manufacturer": "manu-9"})[0]
    assert len(hits) == 3
    assert all(h.document.metadata["manufacturer"] == "manu-9" for h in hits)

    # deleting a tail row removes it from results
    victim = hits[0].document.id
    index.delete_by_ids([victim])
    hits = index.search(tail_v[1:2], 5, {"manufacturer": "manu-9"})[0]
    assert all(h.document.id != victim for h in hits) and len(hits) == 2


def test_filter_mask_np_matches_jnp(rng):
    """The host filter evaluator (tail path) must agree with the jitted one
    for every condition kind."""
    from automative_rag_tpu.index.filters import (
        MetadataColumns, compile_filter, eval_filter_mask,
        eval_filter_mask_np,
    )

    cols = MetadataColumns()
    metas = [
        {"manufacturer": f"m{i % 5}", "model": f"x{i % 7}",
         "year": 2010 + (i % 12), "source": ["pdf", "video"][i % 2]}
        for i in range(64)
    ]
    cols.append_rows(metas, 64)
    for flt in (
        {"manufacturer": "m1"},
        {"manufacturer": ["m1", "m3"], "source": "pdf"},
        {"year": 2015},
        {"year": {"gte": 2012, "lte": 2018}},
        {"year": [2011, 2013], "model": "x2"},
        {},
    ):
        spec = compile_filter(flt, cols)
        want = np.asarray(eval_filter_mask(
            jnp.asarray(cols.codes[:, :64]), jnp.asarray(cols.numerics[:, :64]), spec))
        got = eval_filter_mask_np(cols.codes[:, :64], cols.numerics[:, :64], spec)
        np.testing.assert_array_equal(got, want, err_msg=str(flt))
