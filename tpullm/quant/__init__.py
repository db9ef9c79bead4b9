from . import codecs
from .codecs import dequantize, quantize

__all__ = ["codecs", "dequantize", "quantize"]
