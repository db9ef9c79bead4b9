"""tpullm — a TPU-native, GGUF-compatible quantized LLM inference framework.

Built from scratch on JAX/XLA/Pallas with the capability surface of llama.cpp
(surveyed from the MI50-optimized fork stanus74/llama-mi50.cpp; see SURVEY.md):
GGUF block-quantized model loading, fused dequant matmul and flash-attention
Pallas kernels, paged KV cache, tokenizers, sampler chains, grammar-constrained
sampling, speculative decoding, a continuous-batching OpenAI-compatible server,
and first-class multi-chip sharding over ICI meshes.
"""

__version__ = "0.1.0"
