from .metadata import MetadataExtractor
from .chunker import split_text
from .transcript import TranscriptProcessor
from .factory import ProcessorFactory
from .text_processor import TextProcessor
from .pdf_processor import PDFProcessor
from .video_processor import VideoProcessor

__all__ = [
    "MetadataExtractor",
    "split_text",
    "TranscriptProcessor",
    "ProcessorFactory",
    "TextProcessor",
    "PDFProcessor",
    "VideoProcessor",
]
