from .engine import Engine, PerfCounters
from .kvcache import KVCache
from .sampling import Sampler, SamplerParams

__all__ = ["Engine", "PerfCounters", "KVCache", "Sampler", "SamplerParams"]
