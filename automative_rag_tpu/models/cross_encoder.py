"""Cross-encoder relevance scorer (bge-reranker-base-compatible).

The reference's second rerank stage is a torch ``CrossEncoder``
(``rerankers.py:317`` — bge-reranker-base, an XLM-RoBERTa pair classifier).
Here the same architecture runs on the shared Flax encoder: the query and
document are packed into one sequence, and a 1-logit classification head on
the [CLS] state produces the relevance score. Exposes the ``SecondScorer``
callable signature the hybrid reranker expects.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EncoderConfig, TransformerEncoder, init_encoder_params, load_hf_weights
from .tokenizer import load_tokenizer


class CrossEncoderScorer:
    def __init__(
        self,
        config: Optional[EncoderConfig] = None,
        weights_path: str = "",
        tokenizer_path: str = "",
        max_length: int = 512,
        batch_size: int = 32,
        seed: int = 2,
    ):
        self.config = config or EncoderConfig.bge_m3()
        self.max_length = max_length
        self.batch_size = batch_size
        self.model = TransformerEncoder(self.config)
        params = load_hf_weights(self.config, weights_path) if weights_path else None
        self.pretrained = params is not None
        self.params = params if params is not None else init_encoder_params(self.config, seed)
        self.head = self._load_head(weights_path)
        self.tokenizer = load_tokenizer(tokenizer_path or weights_path,
                                        vocab_size=self.config.vocab_size)

        def _forward(params, head, input_ids, attention_mask):
            hidden = self.model.apply({"params": params}, input_ids, attention_mask)
            cls = hidden[:, 0, :]
            if "dense_kernel" in head:
                # RobertaClassificationHead (the real bge-reranker head,
                # XLMRobertaForSequenceClassification): dense → tanh → out_proj
                cls = jnp.tanh(cls @ head["dense_kernel"] + head["dense_bias"])
            return (cls @ head["kernel"] + head["bias"])[:, 0]

        self._forward = jax.jit(_forward)

    def _load_head(self, weights_path: str):
        """Classification head. HF names: ``classifier.dense`` + tanh +
        ``classifier.out_proj`` (RobertaClassificationHead — what
        bge-reranker-base ships) or a bare ``classifier.weight``/``bias``
        linear. Returned as a dict of f32 arrays."""
        head = None
        if weights_path and Path(weights_path).exists():
            try:
                from safetensors.numpy import load_file

                state = {}
                for f in sorted(Path(weights_path).glob("*.safetensors")):
                    state.update(load_file(str(f)))
                for key in ("classifier.weight", "classifier.out_proj.weight"):
                    if key in state and state[key].shape[0] == 1:
                        head = {
                            "kernel": state[key].T,
                            "bias": state.get(key.replace("weight", "bias"),
                                              np.zeros(1)),
                        }
                        if key.startswith("classifier.out_proj") and \
                                "classifier.dense.weight" in state:
                            head["dense_kernel"] = state["classifier.dense.weight"].T
                            head["dense_bias"] = state.get(
                                "classifier.dense.bias",
                                np.zeros(self.config.hidden_size),
                            )
                        break
            except Exception:
                head = None
        if head is None:
            rng = np.random.default_rng(3)
            head = {
                "kernel": rng.normal(scale=0.02, size=(self.config.hidden_size, 1)),
                "bias": np.zeros(1),
            }
        return {k: jnp.asarray(v, jnp.float32) for k, v in head.items()}

    def _score_texts(self, packed: Sequence[str]) -> np.ndarray:
        scores = []
        for i in range(0, len(packed), self.batch_size):
            ids, mask = self.tokenizer.encode_batch(packed[i : i + self.batch_size],
                                                    self.max_length)
            out = self._forward(self.params, self.head,
                                jnp.asarray(ids), jnp.asarray(mask))
            scores.append(np.asarray(out, np.float64))
        return np.concatenate(scores)

    def __call__(self, query: str, texts: Sequence[str]) -> np.ndarray:
        """SecondScorer interface: (query, docs) → scores [n_docs]."""
        return self._score_texts([f"{query} [SEP] {t}" for t in texts])

    def score_pairs(self, pairs: Sequence[tuple]) -> np.ndarray:
        """Batched pair scoring: [(query, text), ...] → scores [n_pairs] in
        one internally-batched forward stream (the multi-query rerank path
        feeds every query's candidates through a single call)."""
        return self._score_texts([f"{q} [SEP] {t}" for q, t in pairs])
