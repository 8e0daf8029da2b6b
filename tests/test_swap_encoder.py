"""Train→serve hot-swap: POST /model/swap-encoder loads a trained encoder
and re-embeds the corpus in place — queries keep answering, the sparse arm
upgrades to the learned head, and every row-aligned sidecar stays aligned."""

import time

import pytest

from automative_rag_tpu.app import RAGApplication
from automative_rag_tpu.config.settings import Settings

DOCS = [
    ("比亚迪汉EV 2024款CLTC续航里程为715公里。", {"manufacturer": "比亚迪"}),
    ("特斯拉Model 3 2024款续航606公里。", {"manufacturer": "特斯拉"}),
    ("宝马X5 xDrive40i 的百公里油耗是8.9升。", {"manufacturer": "宝马"}),
]


@pytest.fixture()
def app(tmp_path):
    settings = Settings(data_dir=str(tmp_path / "d"),
                        index_dir=str(tmp_path / "d" / "idx"))
    app = RAGApplication(settings=settings, tiny=True, tiny_dim=64)
    for text, md in DOCS:
        job = app.ingest_text(text, metadata=md)
        while app.tracker.get_job(job)["status"] not in ("completed", "failed"):
            time.sleep(0.02)
    yield app
    app.shutdown()


def test_swap_encoder_reindexes_and_answers(app):
    old_dim = app.embedder.dim
    info = app.swap_encoder("data/trained_encoder")
    assert info["swapped"] and info["reindexed_docs"] == 3
    assert info["dim"] != old_dim  # trained export is 128-d
    assert app.index.dim == info["dim"]
    assert info["sparse_mode"] == "transformer"  # learned head picked up
    # row-aligned sidecars survived the reindex
    assert app.sparse_index.rows == app.index.total_rows == 3
    if app.token_store is not None:
        assert app.token_store.rows == 3
    # queries answer with the NEW encoder end to end
    job = app.query_sync("汉EV的续航里程是多少？", mode="facts", timeout=60)
    assert job["status"] == "completed"
    assert "715" in job["result"]["answer"]
    # and further ingest keeps pairing rows under the new geometry
    j = app.ingest_text("奥迪Q7 55TFSI 的最大功率250千瓦。",
                        metadata={"manufacturer": "奥迪"})
    while app.tracker.get_job(j)["status"] not in ("completed", "failed"):
        time.sleep(0.02)
    assert app.sparse_index.rows == app.index.total_rows == 4


def test_swap_encoder_bad_path(app):
    with pytest.raises(ValueError, match="no loadable encoder"):
        app.swap_encoder("/nonexistent/dir")
