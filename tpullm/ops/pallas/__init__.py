"""Pallas TPU kernels (the gfx906 HIP kernel layer's role, reimagined for MXU/VPU)."""
