"""Multimodal input (mtmd): CLIP ViT vision encoder + media-chunk pipeline.

Reference: tools/mtmd (clip.cpp encoder graphs over ggml, mtmd.h C API with
<__media__> markers and media chunking).
"""

from .audio import WhisperAudioEncoder, chunk_mel, log_mel_spectrogram
from .clip import ClipVision, preprocess_image
from .pipeline import MEDIA_MARKER, build_multimodal_embeddings, generate_mtmd

__all__ = [
    "WhisperAudioEncoder",
    "log_mel_spectrogram",
    "chunk_mel",
    "ClipVision",
    "preprocess_image",
    "MEDIA_MARKER",
    "build_multimodal_embeddings",
    "generate_mtmd",
]
