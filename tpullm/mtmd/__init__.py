"""Multimodal input (mtmd): CLIP ViT vision encoder + media-chunk pipeline.

Reference: tools/mtmd (clip.cpp encoder graphs over ggml, mtmd.h C API with
<__media__> markers and media chunking).
"""

from .audio import (
    ConformerAudioEncoder,
    WhisperAudioEncoder,
    chunk_mel,
    log_mel_spectrogram,
)


def load_audio(path):
    """Audio-tower dispatch (≡ clip.cpp builder switch for audio
    projectors): LFM2A rides the conformer graph, every other audio
    projector the whisper encoder."""
    from ..gguf.reader import GGUFReader

    proj = GGUFReader(path).metadata.get("clip.projector_type", "qwen2a")
    if proj == "lfm2a":
        return ConformerAudioEncoder(path)
    return WhisperAudioEncoder(path)
from .clip import ClipVision, preprocess_image
from .qwen_vl import Qwen2VLVision
from .siglip import Gemma3Vision


def load_vision(path):
    """Projector-type dispatch (≡ clip.cpp clip_graph builder switch,
    clip.cpp:779-830): picks the tower class from clip.projector_type."""
    from ..gguf.reader import GGUFReader

    proj = GGUFReader(path).metadata.get("clip.projector_type", "mlp")
    if proj in ("qwen2vl_merger", "qwen2.5vl_merger", "qwen2.5o"):
        return Qwen2VLVision(path)
    if proj == "qwen3vl_merger":
        from .qwen_vl import Qwen3VLVision

        return Qwen3VLVision(path)
    if proj == "gemma3":
        return Gemma3Vision(path)
    if proj == "idefics3":
        from .siglip import Idefics3Vision

        return Idefics3Vision(path)
    if proj == "janus_pro":
        from .siglip import JanusVision

        return JanusVision(path)
    if proj == "lfm2":
        from .siglip import Lfm2Vision

        return Lfm2Vision(path)
    if proj == "glm4v":
        from .glm4v import Glm4vVision

        return Glm4vVision(path)
    if proj == "llama4":
        from .llama4 import Llama4Vision

        return Llama4Vision(path)
    if proj == "cogvlm":
        from .cogvlm import CogVLMVision

        return CogVLMVision(path)
    if proj in ("pixtral", "lightonocr"):
        from .pixtral import PixtralVision

        return PixtralVision(path)
    if proj == "kimivl":
        from .kimivl import KimiVLVision

        return KimiVLVision(path)
    if proj == "youtuvl":
        from .qwen_vl import YoutuVLVision

        return YoutuVLVision(path)
    if proj == "gemma3nv":
        from .mobilenet import Gemma3nVision

        return Gemma3nVision(path)
    if proj == "resampler":  # minicpm-v
        from .minicpmv import MiniCPMVVision

        return MiniCPMVVision(path)
    if proj == "internvl":
        from .internvl import InternVLVision

        return InternVLVision(path)
    return ClipVision(path)

from .pipeline import MEDIA_MARKER, build_multimodal_embeddings, generate_mtmd

__all__ = [
    "WhisperAudioEncoder",
    "ConformerAudioEncoder",
    "load_audio",
    "log_mel_spectrogram",
    "chunk_mel",
    "ClipVision",
    "Qwen2VLVision",
    "Gemma3Vision",
    "load_vision",
    "preprocess_image",
    "MEDIA_MARKER",
    "build_multimodal_embeddings",
    "generate_mtmd",
]
