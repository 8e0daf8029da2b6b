"""Mesh-sharded sparse (lexical) arm on the virtual 8-device CPU mesh:
the per-shard scan + all-gather merge must return exactly what the
single-device SparseIndex returns, across staged slab, live tail, and
compaction."""

import numpy as np
import pytest
import jax

from automative_rag_tpu.index.sparse import SparseIndex, _TAIL_FOLD
from automative_rag_tpu.parallel import ShardedSparseIndex, make_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _corpus(rng, n, t=12, vocab=400):
    ids = rng.integers(0, vocab, size=(n, t)).astype(np.int32)
    weights = np.abs(rng.normal(0.8, 0.4, size=(n, t))).astype(np.float32)
    return ids, weights


def _build_pair(rng, mesh, n=700, t=12):
    ids, weights = _corpus(rng, n, t)
    single = SparseIndex(top_terms=t, device_dtype="float32")
    single.append(ids, weights)
    sharded = ShardedSparseIndex(top_terms=t, device_dtype="float32",
                                 mesh=mesh)
    sharded.append(ids, weights)
    return single, sharded, ids, weights


def _query(rng, ids, rows=(3, 5), q=10):
    q_ids = np.concatenate([ids[r, : q // len(rows)] for r in rows])
    q_w = np.abs(rng.normal(1.0, 0.3, size=len(q_ids))).astype(np.float32)
    return q_ids.astype(np.int32), q_w


def test_sharded_matches_single(mesh):
    rng = np.random.default_rng(0)
    single, sharded, ids, _ = _build_pair(rng, mesh)
    q_ids, q_w = _query(rng, ids)
    want = single.search(q_ids, q_w, k=12)
    got = sharded.search(q_ids, q_w, k=12)
    assert [r for r, _ in got] == [r for r, _ in want]
    np.testing.assert_allclose(
        [v for _, v in got], [v for _, v in want], rtol=1e-5)


def test_self_query_top1(mesh):
    rng = np.random.default_rng(1)
    _, sharded, ids, weights = _build_pair(rng, mesh)
    hits = sharded.search(ids[42], weights[42], k=5)
    assert hits and hits[0][0] == 42


def test_live_tail_merges(mesh):
    rng = np.random.default_rng(2)
    single, sharded, ids, _ = _build_pair(rng, mesh, n=300)
    q_ids, q_w = _query(rng, ids)
    # force device staging, then append a small tail (< fold threshold):
    # fresh rows must be host-scored and merged with the device top-k
    sharded.search(q_ids, q_w, k=5)
    assert sharded._device is not None
    tail_n = 50
    assert tail_n < _TAIL_FOLD
    tail_ids, tail_w = _corpus(rng, tail_n)
    # make one tail row the best possible match for the query
    tail_ids[7, : len(q_ids)] = q_ids
    tail_w[7, : len(q_ids)] = 5.0
    single.append(tail_ids, tail_w)
    sharded.append(tail_ids, tail_w)
    assert sharded._device is not None  # slab survived the append
    want = single.search(q_ids, q_w, k=8)
    got = sharded.search(q_ids, q_w, k=8)
    assert got[0][0] == 300 + 7
    assert [r for r, _ in got] == [r for r, _ in want]


def test_select_rows_compaction(mesh):
    rng = np.random.default_rng(3)
    single, sharded, ids, _ = _build_pair(rng, mesh, n=200)
    q_ids, q_w = _query(rng, ids, rows=(8, 9))
    keep = [i for i in range(200) if i % 3 != 0]
    single.select_rows(keep)
    sharded.select_rows(keep)
    want = single.search(q_ids, q_w, k=10)
    got = sharded.search(q_ids, q_w, k=10)
    assert [r for r, _ in got] == [r for r, _ in want]


def test_save_load_roundtrip_into_sharded(tmp_path, mesh):
    rng = np.random.default_rng(4)
    _, sharded, ids, weights = _build_pair(rng, mesh, n=150)
    sharded.save(str(tmp_path))
    restored = SparseIndex.load(str(tmp_path))
    # app.load_index transplants host arrays into a fresh sharded index
    fresh = ShardedSparseIndex(top_terms=restored.top_terms,
                               device_dtype="float32", mesh=mesh)
    fresh._ids = restored._ids
    fresh._weights = restored._weights
    fresh._recount_df_locked()
    hits = fresh.search(ids[3], weights[3], k=4)
    assert hits and hits[0][0] == 3
    assert fresh.stats()["kind"] == "sharded"
    assert fresh.stats()["n_shards"] == 8


def test_sharded_batch_matches_single(mesh):
    rng = np.random.default_rng(5)
    single, sharded, ids, _ = _build_pair(rng, mesh, n=400)
    qs = [_query(rng, ids, rows=(r, r + 1)) for r in (3, 40, 200)]
    got = sharded.search_batch(
        np.stack([q for q, _ in qs]), np.stack([w for _, w in qs]), k=9)
    for (q_ids, q_w), batch_hits in zip(qs, got):
        want = single.search(q_ids, q_w, k=9)
        assert [r for r, _ in batch_hits] == [r for r, _ in want]
        np.testing.assert_allclose(
            [v for _, v in batch_hits], [v for _, v in want], rtol=1e-5)


@pytest.mark.parametrize("variant", ["pallas", "broadcast", "fori"])
def test_all_scan_variants_match_numpy_oracle(mesh, variant):
    """r03 ADVICE #1: every scan formulation — including the TPU production
    one (pallas, interpret-mode here) — must be forceable from a CPU test
    and agree with the numpy oracle and each other, single AND sharded."""
    from automative_rag_tpu.index.sparse import _score_rows_np
    from automative_rag_tpu.parallel.sharded_sparse import (
        make_sharded_sparse_topk, make_sharded_sparse_topk_batch)

    rng = np.random.default_rng(7)
    single, sharded, ids, weights = _build_pair(rng, mesh, n=900)
    q_ids, q_w = _query(rng, ids)
    k = 15

    oracle = _score_rows_np(ids, weights, q_ids, q_w)
    want_rows = np.argsort(-oracle)[:k].tolist()
    want_vals = oracle[want_rows]

    single.scan_variant = variant
    got = single.search(q_ids, q_w, k=k)
    assert [r for r, _ in got] == [r for r in want_rows if oracle[r] > 0]
    np.testing.assert_allclose(
        [v for _, v in got],
        [v for v in want_vals if v > 0], rtol=1e-4)

    sharded.scan_variant = variant
    got_sh = sharded.search(q_ids, q_w, k=k)
    assert [r for r, _ in got_sh] == [r for r, _ in got]

    # batched paths, forced through the same variant
    qb_ids = np.stack([q_ids, q_ids[::-1].copy()])
    qb_w = np.stack([q_w, q_w[::-1].copy()])
    got_b = single.search_batch(qb_ids, qb_w, k=k)
    got_sh_b = sharded.search_batch(qb_ids, qb_w, k=k)
    for a, b in zip(got_b, got_sh_b):
        assert [r for r, _ in a] == [r for r, _ in b]
    assert [r for r, _ in got_b[0]] == [r for r, _ in got]

    # the explicit make_* factories accept the variant too (threading per
    # ADVICE: default comes from the backend, tests pin it)
    state = sharded._device_state()
    fn = make_sharded_sparse_topk(mesh, "shard", k, variant=variant)
    vals, rows = fn(state[0], state[1], np.int32(state[2]),
                    q_ids.astype(np.int32), q_w)
    assert np.asarray(rows).tolist()[: len(got)] == [r for r, _ in got]
    fnb = make_sharded_sparse_topk_batch(mesh, "shard", k, variant=variant)
    bvals, brows = fnb(state[0], state[1], np.int32(state[2]),
                       qb_ids.astype(np.int32), qb_w)
    assert np.asarray(brows)[0].tolist()[: len(got)] == [r for r, _ in got]
