from . import norms, qmatmul, rope

__all__ = ["norms", "qmatmul", "rope"]
