from .tokenizer import HashTokenizer, load_tokenizer
from .encoder import EncoderConfig, TransformerEncoder, init_encoder_params
from .bge_m3 import DenseEmbedder
from .colbert import ColBERTEncoder
from .cross_encoder import CrossEncoderScorer
from .whisper import WhisperConfig, WhisperModel

__all__ = [
    "HashTokenizer",
    "load_tokenizer",
    "EncoderConfig",
    "TransformerEncoder",
    "init_encoder_params",
    "DenseEmbedder",
    "ColBERTEncoder",
    "CrossEncoderScorer",
    "WhisperConfig",
    "WhisperModel",
]
