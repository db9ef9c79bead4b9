from .engine import Engine, PerfCounters
from .kvcache import KVCache
from .model import Model
from .sampling import Sampler, SamplerParams

__all__ = ["Engine", "Model", "PerfCounters", "KVCache", "Sampler",
           "SamplerParams"]
