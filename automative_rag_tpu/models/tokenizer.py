"""Tokenizers for the JAX encoders.

Two backends behind one interface:

- ``HFTokenizer`` — wraps a local HuggingFace tokenizer directory (the
  production path for real bge-m3 / ColBERT checkpoints; the reference loads
  tokenizers the same local-files-only way, ``settings.py:233-249``).
- ``HashTokenizer`` — a deterministic, dependency-free fallback: CJK chars
  are split as single tokens (bge-m3's sentencepiece does roughly this for
  Chinese), Latin text by word pieces, ids assigned by stable hashing. It
  keeps the whole pipeline runnable (tests, benches, weightless deploys)
  with identical shapes/masks to the real tokenizer.

Both return fixed-length ``(input_ids, attention_mask)`` numpy batches —
static shapes for the jitted encoders.
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path
from typing import List, Sequence, Tuple

import numpy as np

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
UNK_ID = 3
_RESERVED = 4

_TOKEN_RE = re.compile(
    r"[一-鿿]|[a-zA-Z]+|[0-9]+(?:\.[0-9]+)?|[^\sa-zA-Z0-9一-鿿]"
)


def _stable_hash(token: str, vocab_size: int) -> int:
    digest = hashlib.blake2s(token.encode("utf-8"), digest_size=8).digest()
    return _RESERVED + int.from_bytes(digest, "little") % (vocab_size - _RESERVED)


class HashTokenizer:
    """Deterministic hash tokenizer with CJK-aware splitting."""

    def __init__(self, vocab_size: int = 32768):
        self.vocab_size = vocab_size
        self.pad_token_id = PAD_ID
        self.cls_token_id = CLS_ID
        self.sep_token_id = SEP_ID

    def tokenize(self, text: str) -> List[str]:
        return _TOKEN_RE.findall(text.lower())

    def encode_batch(
        self, texts: Sequence[str], max_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(texts)
        ids = np.full((n, max_length), PAD_ID, np.int32)
        mask = np.zeros((n, max_length), np.int32)
        for i, text in enumerate(texts):
            toks = [_stable_hash(t, self.vocab_size) for t in self.tokenize(text)]
            toks = toks[: max_length - 2]
            row = [CLS_ID] + toks + [SEP_ID]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask


class HFTokenizer:
    """Local-files-only HuggingFace tokenizer wrapper."""

    def __init__(self, path: str):
        from transformers import AutoTokenizer  # lazy; heavy import

        self._tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
        self.vocab_size = self._tok.vocab_size
        self.pad_token_id = self._tok.pad_token_id or 0
        self.cls_token_id = self._tok.cls_token_id
        self.sep_token_id = self._tok.sep_token_id

    def encode_batch(
        self, texts: Sequence[str], max_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        enc = self._tok(
            list(texts),
            add_special_tokens=True,
            max_length=max_length,
            padding="max_length",
            truncation=True,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)


def load_tokenizer(path: str = "", vocab_size: int = 32768):
    """HF tokenizer if a local directory exists, else the hash fallback."""
    if path and Path(path).exists():
        try:
            return HFTokenizer(path)
        except Exception:
            pass
    return HashTokenizer(vocab_size=vocab_size)
