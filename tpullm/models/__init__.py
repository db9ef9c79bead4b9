from . import hparams, registry, testing, weights
from .registry import get_arch, load_hparams, register_arch, supported_archs

__all__ = [
    "hparams", "registry", "testing", "weights",
    "get_arch", "load_hparams", "register_arch", "supported_archs",
]
