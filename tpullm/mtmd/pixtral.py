"""Pixtral / Mistral-Small-3.1 vision tower.

Reference: tools/mtmd/models/pixtral.cpp (clip_graph_pixtral::build) — an
RMS-norm ViT with 2-D rope over (row, col) patch positions, gated-silu FFN,
no class token and no learned positions; then the LLaVA-style 2-layer GELU
projector. Mistral Small 3.1 adds a 2×2 patch merger (mm.patch_merger)
before the projector, and the [IMG_BREAK] token embedding is appended after
every patch row (pixtral.cpp:61-82).

Rope convention follows HF PixtralRotaryEmbedding exactly: per-position
frequency vector interleaves row/col frequencies
  freqs[p] = [h·f0, w·f1, h·f2, w·f3, …],  f_j = θ^(-2j/d)
applied with half-split rotate_half pairing (the reference reaches the same
values through two interleaved half-dim ggml_rope_ext calls plus a
conversion-time permute).

TPU notes: one jit per (rows, cols) grid, cached; everything is [N, C]
matmuls on the MXU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import rms_norm


def fit_image_size(h: int, w: int, factor: int, min_pixels: int,
                   max_pixels: int) -> tuple[int, int]:
    """Aspect-preserving target with both sides multiples of `factor` and
    area within [min_pixels, max_pixels] (≡ calc_size_preserved_ratio)."""
    scale = 1.0
    if h * w > max_pixels:
        scale = math.sqrt(max_pixels / (h * w))
    elif h * w < min_pixels:
        scale = math.sqrt(min_pixels / (h * w))
    ceil_f = lambda x: max(factor, int(math.ceil(x / factor)) * factor)
    return ceil_f(h * scale), ceil_f(w * scale)


class PixtralVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.patch_size = int(g("patch_size", 16))
        self.n_embd = int(g("embedding_length", 1024))
        self.n_layer = int(g("block_count", 24))
        self.n_head = int(g("attention.head_count", 16))
        self.head_dim = self.n_embd // self.n_head
        self.eps = float(g("attention.layer_norm_epsilon", 1e-5))
        self.rope_theta = float(g("rope.freq_base", 10000.0))
        # mistral small 3.1 spatial merge; original pixtral has none
        self.n_merge = int(md.get("clip.vision.spatial_merge_size", 1))
        self.min_pixels = int(g("image_min_pixels", 8 * 16 * 16))
        self.max_pixels = int(g("image_max_pixels", 1024 * 16 * 16))
        self.image_mean = np.asarray(
            g("image_mean", [0.48145466, 0.4578275, 0.40821073]), np.float32)
        self.image_std = np.asarray(
            g("image_std", [0.26862954, 0.26130258, 0.27577711]), np.float32)

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        self.params = {
            "patch_w": arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P),
            "patch_b": maybe("v.patch_embd.bias"),
            "pre_ln_w": maybe("v.pre_ln.weight"),
            "mm1_w": arr("mm.1.weight"), "mm1_b": maybe("mm.1.bias"),
            "mm2_w": arr("mm.2.weight"), "mm2_b": maybe("mm.2.bias"),
            "img_break": maybe("v.token_embd.img_break"),
            "input_norm": maybe("mm.input_norm.weight"),
            "patch_merger": maybe("mm.patch_merger.weight"),
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"v.blk.{i}."
            self.params["layers"].append({
                "ln1": arr(p + "ln1.weight"),
                "wq": arr(p + "attn_q.weight"),
                "wk": arr(p + "attn_k.weight"),
                "wv": arr(p + "attn_v.weight"),
                "wo": arr(p + "attn_out.weight"),
                "ln2": arr(p + "ln2.weight"),
                "gate_w": arr(p + "ffn_gate.weight"),
                "up_w": arr(p + "ffn_up.weight"),
                "down_w": arr(p + "ffn_down.weight"),
            })
        self._jit_cache: dict = {}

    # -- rope ---------------------------------------------------------------

    def _cos_sin(self, rows: int, cols: int):
        d = self.head_dim
        j = np.arange(0, d, 2, dtype=np.float64)
        f = self.rope_theta ** (-j / d)  # f_j = θ^(-2j/d), j pair index
        hh, ww = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
        hh = hh.reshape(-1, 1).astype(np.float64)
        ww = ww.reshape(-1, 1).astype(np.float64)
        # interleave: even pair slots carry h-frequencies, odd carry w
        freqs = np.empty((rows * cols, d // 2), np.float64)
        freqs[:, 0::2] = hh * f[0::2]
        freqs[:, 1::2] = ww * f[1::2]
        emb = np.concatenate([freqs, freqs], axis=-1)  # duplicate for halves
        return (jnp.asarray(np.cos(emb), jnp.float32),
                jnp.asarray(np.sin(emb), jnp.float32))

    # -- forward ------------------------------------------------------------

    def _forward(self, p, patches, cos, sin, rows: int, cols: int):
        N = rows * cols
        H, D = self.n_head, self.head_dim
        x = patches @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        if p["pre_ln_w"] is not None:
            x = rms_norm(x, p["pre_ln_w"], self.eps)

        def rope(v):  # [N, H, D] half-split rotate_half
            half = D // 2
            v1, v2 = v[..., :half], v[..., half:]
            c = cos[:, None, :half]
            s = sin[:, None, :half]
            return jnp.concatenate([v1 * c - v2 * s, v1 * s + v2 * c], -1)

        for layer in p["layers"]:
            h = rms_norm(x, layer["ln1"], self.eps)
            q = rope((h @ layer["wq"].T).reshape(N, H, D))
            k = rope((h @ layer["wk"].T).reshape(N, H, D))
            v = (h @ layer["wv"].T).reshape(N, H, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
            ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(N, H * D)
            x = x + ctx @ layer["wo"].T
            h = rms_norm(x, layer["ln2"], self.eps)
            gate = h @ layer["gate_w"].T
            up = h @ layer["up_w"].T
            x = x + (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype)
                     * up) @ layer["down_w"].T

        # mistral small 3.1 patch merger: RMS input norm, then n_merge×n_merge
        # blocks concatenated feature-wise and projected (pixtral.cpp:30-48)
        m = self.n_merge
        if p["patch_merger"] is not None and m > 1:
            x = rms_norm(x, p["input_norm"], self.eps)
            grid = x.reshape(rows // m, m, cols // m, m, self.n_embd)
            # feature order ≡ torch F.unfold: (channel, dy, dx), channel slowest
            blocks = grid.transpose(0, 2, 4, 1, 3).reshape(
                (rows // m) * (cols // m), self.n_embd * m * m)
            x = blocks @ p["patch_merger"].T
            rows, cols = rows // m, cols // m

        # LLaVA projector: GELU between the two mm layers
        x = x @ p["mm1_w"].T
        if p["mm1_b"] is not None:
            x = x + p["mm1_b"]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        x = x @ p["mm2_w"].T
        if p["mm2_b"] is not None:
            x = x + p["mm2_b"]

        # append [IMG_BREAK] after every patch row except the last
        if p["img_break"] is not None:
            e = x.shape[-1]
            grid = x.reshape(rows, cols, e)
            brk = jnp.broadcast_to(p["img_break"].reshape(1, 1, e),
                                   (rows, 1, e)).astype(x.dtype)
            x = jnp.concatenate([grid, brk], axis=1).reshape(-1, e)[:-1]
        return x

    def encode_grid(self, patches: np.ndarray, rows: int, cols: int) -> np.ndarray:
        """patches [rows*cols, 3·P·P] (row-major grid) → [n_tokens, n_embd_llm]."""
        key = (rows, cols)
        fn = self._jit_cache.get(key)
        if fn is None:
            cos, sin = self._cos_sin(rows, cols)
            fwd = functools.partial(self._forward, rows=rows, cols=cols)
            fn = jax.jit(lambda p, x: fwd(p, x, cos, sin))
            self._jit_cache[key] = fn
        return np.asarray(fn(self.params, jnp.asarray(patches)))

    def encode_image(self, image) -> np.ndarray:
        """PIL image / [H, W, 3] uint8 → projected embeddings."""
        img = np.asarray(image, dtype=np.float32) / 255.0
        P = self.patch_size
        h, w = img.shape[:2]
        th, tw = fit_image_size(h, w, P * self.n_merge,
                                self.min_pixels, self.max_pixels)
        # bilinear resize
        yy = np.linspace(0, h - 1, th)
        xx = np.linspace(0, w - 1, tw)
        y0 = np.clip(yy.astype(int), 0, h - 2)
        x0 = np.clip(xx.astype(int), 0, w - 2)
        fy = (yy - y0)[:, None, None]
        fx = (xx - x0)[None, :, None]
        img = ((img[y0][:, x0] * (1 - fy) * (1 - fx))
               + (img[y0 + 1][:, x0] * fy * (1 - fx))
               + (img[y0][:, x0 + 1] * (1 - fy) * fx)
               + (img[y0 + 1][:, x0 + 1] * fy * fx))
        img = (img - self.image_mean) / self.image_std
        rows, cols = th // P, tw // P
        patches = img.reshape(rows, P, cols, P, 3).transpose(0, 2, 4, 1, 3)
        patches = patches.reshape(rows * cols, 3 * P * P)
        return self.encode_grid(patches.astype(np.float32), rows, cols)

