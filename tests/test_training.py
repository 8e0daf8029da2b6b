"""Contrastive trainer tests: loss decreases, sharded step runs on the
virtual mesh, checkpoint round-trips via orbax."""

import numpy as np
import jax

from automative_rag_tpu.models.encoder import EncoderConfig
from automative_rag_tpu.parallel.mesh import make_mesh_2d
from automative_rag_tpu.training.trainer import ContrastiveTrainer

PAIRS = [
    ("宝马X5 加速", "宝马X5 2023款百公里加速5.5秒"),
    ("特斯拉续航", "特斯拉Model 3 续航606公里"),
    ("凯美瑞油耗", "丰田凯美瑞混动油耗4.1L"),
    ("奥迪Q7 价格", "奥迪Q7 2022款售价70万元"),
    ("汉EV 充电", "比亚迪汉EV 快充30分钟"),
    ("G9 智驾", "小鹏G9 支持城市NGP"),
    ("5系 轴距", "宝马5系轴距3105mm"),
    ("途观 空间", "大众途观L 空间宽敞"),
] * 2


def test_fit_improves_loss():
    trainer = ContrastiveTrainer(EncoderConfig.tiny(), learning_rate=3e-4, max_length=24)
    history = trainer.fit(PAIRS, batch_size=8, epochs=6, log_every=0)
    assert len(history) == 12
    first = np.mean([h["loss"] for h in history[:2]])
    last = np.mean([h["loss"] for h in history[-2:]])
    assert np.isfinite(last) and last < first


def test_fit_on_dp_tp_mesh():
    mesh = make_mesh_2d(2, 4, axis_names=("dp", "tp"), devices=jax.devices()[:8])
    config = EncoderConfig(vocab_size=512, hidden_size=32, num_layers=1, num_heads=4,
                           intermediate_size=64, max_position=64)
    trainer = ContrastiveTrainer(config, mesh=mesh, learning_rate=1e-4, max_length=16)
    history = trainer.fit(PAIRS[:8], batch_size=8, epochs=1, log_every=0)
    assert history and np.isfinite(history[-1]["loss"])


def test_checkpoint_roundtrip(tmp_path):
    trainer = ContrastiveTrainer(
        EncoderConfig.tiny(), learning_rate=1e-4, max_length=16,
        checkpoint_dir=str(tmp_path),
    )
    trainer.fit(PAIRS[:8], batch_size=8, epochs=1, log_every=0)
    path = trainer.save_checkpoint()

    fresh = ContrastiveTrainer(EncoderConfig.tiny(), learning_rate=1e-4, max_length=16)
    assert fresh.restore_checkpoint(path) == trainer.step
    a = jax.tree.leaves(trainer.params)[0]
    b = jax.tree.leaves(fresh.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # restored trainer keeps training
    fresh.fit(PAIRS[:8], batch_size=8, epochs=1, log_every=0)
    assert fresh.step == trainer.step + 1


def test_trained_params_hot_swap_into_embedder():
    """Train → export → serve: a DenseEmbedder built from trained params
    must embed deterministically and differ from the random-init encoder."""
    from automative_rag_tpu.models.bge_m3 import DenseEmbedder

    config = EncoderConfig.tiny()
    trainer = ContrastiveTrainer(config, learning_rate=3e-4, max_length=16)
    trainer.fit(PAIRS[:8], batch_size=8, epochs=2, log_every=0)

    trained = DenseEmbedder.from_params(config, trainer.export_params(), max_length=16)
    assert trained.pretrained and trained.mode == "transformer"
    fresh = DenseEmbedder(config=config, max_length=16, mode="transformer")

    a = trained.embed_query("宝马X5 加速")
    b = trained.embed_query("宝马X5 加速")
    np.testing.assert_allclose(a, b, rtol=1e-6)
    c = fresh.embed_query("宝马X5 加速")
    assert np.abs(a - c).max() > 1e-4  # training actually changed the encoder


def test_sparse_head_trains_and_roundtrips(tmp_path):
    """Joint SPLADE-style training: the sparse InfoNCE must improve over
    random init, and the exported head must load back through
    SparseEncoder's transformer mode."""
    import json

    import jax
    import numpy as np
    from safetensors.numpy import save_file

    from automative_rag_tpu.models.encoder import EncoderConfig
    from automative_rag_tpu.training.trainer import ContrastiveTrainer

    cfg = EncoderConfig(vocab_size=512, hidden_size=32, num_layers=1,
                        num_heads=4, intermediate_size=64, max_position=64)
    trainer = ContrastiveTrainer(cfg, learning_rate=3e-4, max_length=16,
                                 sparse_head=True)
    pairs = [(f"query about item {i}", f"document describing item {i}")
             for i in range(64)]
    history = trainer.fit(pairs, batch_size=16, epochs=6, log_every=0)
    assert "sparse_loss" in history[-1]
    assert history[-1]["sparse_accuracy"] >= history[0]["sparse_accuracy"]

    w, b = trainer.export_sparse_head()
    assert w.shape == (cfg.hidden_size,)
    save_file({"sparse_linear.weight": np.ascontiguousarray(w),
               "sparse_linear.bias": np.full(1, b, np.float32)},
              str(tmp_path / "sparse_linear.safetensors"))

    from automative_rag_tpu.models.sparse import SparseEncoder, _load_sparse_head
    loaded = _load_sparse_head(str(tmp_path))
    assert loaded is not None
    np.testing.assert_allclose(loaded[0], w, rtol=1e-6)

    class _FakeDense:  # just enough surface for SparseEncoder
        pretrained = True
        weights_path = str(tmp_path)
        max_length = 16
        batch_size = 8

        def __init__(self, trainer):
            self.tokenizer = trainer.tokenizer
            self.model = None
            self.params = None

    enc = SparseEncoder(_FakeDense(trainer), top_terms=8, query_terms=8)
    assert enc.mode == "transformer"
    assert enc.use_idf is False
