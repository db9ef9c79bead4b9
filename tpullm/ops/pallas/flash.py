"""Pallas flash attention kernel (gate stub; kernel lands with the qmm kernel)."""

from __future__ import annotations


def available() -> bool:
    return False


def supports(q, k, v) -> bool:
    return False


def flash_attention(q, k, v, mask, scale, softcap=0.0):
    raise NotImplementedError
