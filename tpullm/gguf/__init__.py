from .constants import GGMLType, GGUFValueType, Keys, TYPE_TRAITS, QK_K
from .reader import GGUFReader, GGUFTensorInfo, load_gguf
from .writer import GGUFWriter

__all__ = [
    "GGMLType",
    "GGUFValueType",
    "Keys",
    "TYPE_TRAITS",
    "QK_K",
    "GGUFReader",
    "GGUFTensorInfo",
    "load_gguf",
    "GGUFWriter",
]
