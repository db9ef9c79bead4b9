"""InternVL vision tower: CLS-token ViT + pixel shuffle + MLP projector.

Reference: tools/mtmd/models/internvl.cpp (clip_graph_internvl::build) —
a standard learned-position ViT with a class token and per-layer scale
vectors (ls1/ls2, InternVL's lambda_1/lambda_2); LayerNorm for the 300M
ViT, RMS for the 6B one. After dropping the CLS token the patch grid is
pixel-shuffled by n_merge per side (scale_factor² features per merged
token) and projected through LN + 2-layer GELU MLP
(mm.model.mlp.{0,1,3}).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm, rms_norm


class InternVLVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 448))
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1024))
        self.n_layer = int(g("block_count", 24))
        self.n_head = int(g("attention.head_count", 16))
        self.head_dim = self.n_embd // self.n_head
        self.eps = float(g("attention.layer_norm_epsilon", 1e-6))
        self.n_merge = int(md.get("clip.vision.projector.scale_factor", 2))
        # the 6B InternVL ViT uses RMS norms (internvl.cpp:15-17)
        self.rms = (self.n_embd == 3200 and self.n_layer == 45)
        self.image_mean = np.asarray(
            g("image_mean", [0.485, 0.456, 0.406]), np.float32)
        self.image_std = np.asarray(
            g("image_std", [0.229, 0.224, 0.225]), np.float32)

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        self.params = {
            "patch_w": arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P),
            "patch_b": maybe("v.patch_embd.bias"),
            "cls": arr("v.class_embd"),
            "pos_embd": arr("v.position_embd.weight"),
            "mm0_w": arr("mm.model.mlp.0.weight"), "mm0_b": arr("mm.model.mlp.0.bias"),
            "mm1_w": arr("mm.model.mlp.1.weight"), "mm1_b": arr("mm.model.mlp.1.bias"),
            "mm3_w": arr("mm.model.mlp.3.weight"), "mm3_b": arr("mm.model.mlp.3.bias"),
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"v.blk.{i}."
            self.params["layers"].append({
                "ln1_w": arr(p + "ln1.weight"), "ln1_b": maybe(p + "ln1.bias"),
                "wq": arr(p + "attn_q.weight"), "bq": maybe(p + "attn_q.bias"),
                "wk": arr(p + "attn_k.weight"), "bk": maybe(p + "attn_k.bias"),
                "wv": arr(p + "attn_v.weight"), "bv": maybe(p + "attn_v.bias"),
                "q_norm": maybe(p + "attn_q_norm.weight"),
                "k_norm": maybe(p + "attn_k_norm.weight"),
                "wo": arr(p + "attn_out.weight"), "bo": maybe(p + "attn_out.bias"),
                "ls1": maybe(p + "ls1.weight"),
                "ln2_w": arr(p + "ln2.weight"), "ln2_b": maybe(p + "ln2.bias"),
                "up_w": arr(p + "ffn_up.weight"), "up_b": maybe(p + "ffn_up.bias"),
                "down_w": arr(p + "ffn_down.weight"),
                "down_b": maybe(p + "ffn_down.bias"),
                "ls2": maybe(p + "ls2.weight"),
            })
        self._jit_cache: dict = {}

    def _norm(self, x, w, b):
        if self.rms:
            return rms_norm(x, w, self.eps)
        return layer_norm(x, w, b, self.eps)

    def _forward(self, p, patches, rows: int, cols: int):
        N = rows * cols
        H, D = self.n_head, self.head_dim
        x = patches @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        x = jnp.concatenate([p["cls"].reshape(1, -1), x], axis=0)
        x = x + p["pos_embd"][: N + 1]

        for layer in p["layers"]:
            h = self._norm(x, layer["ln1_w"], layer["ln1_b"])
            q = h @ layer["wq"].T
            k = h @ layer["wk"].T
            v = h @ layer["wv"].T
            if layer["bq"] is not None:
                q, k, v = q + layer["bq"], k + layer["bk"], v + layer["bv"]
            if layer["q_norm"] is not None:  # 6B ViT per-row qk norms
                q = rms_norm(q, layer["q_norm"], self.eps)
                k = rms_norm(k, layer["k_norm"], self.eps)
            q = q.reshape(-1, H, D)
            k = k.reshape(-1, H, D)
            v = v.reshape(-1, H, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
            ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(-1, H * D)
            attn = ctx @ layer["wo"].T
            if layer["bo"] is not None:
                attn = attn + layer["bo"]
            if layer["ls1"] is not None:
                attn = attn * layer["ls1"]
            x = x + attn
            h = self._norm(x, layer["ln2_w"], layer["ln2_b"])
            up = h @ layer["up_w"].T
            if layer["up_b"] is not None:
                up = up + layer["up_b"]
            act = jax.nn.gelu(up.astype(jnp.float32),
                              approximate=False).astype(x.dtype)
            down = act @ layer["down_w"].T
            if layer["down_b"] is not None:
                down = down + layer["down_b"]
            if layer["ls2"] is not None:
                down = down * layer["ls2"]
            x = x + down

        x = x[1:]  # drop CLS

        # pixel shuffle (internvl.cpp:31-50): fold n_merge×n_merge patch
        # blocks into the feature dim. ggml order: first gather `m` patches
        # along x into the feature dim, then `m` rows along y.
        m = self.n_merge
        e = self.n_embd
        grid = x.reshape(rows, cols // m, m * e)
        grid = grid.transpose(1, 0, 2).reshape(cols // m, rows // m, m * m * e)
        x = grid.transpose(1, 0, 2).reshape((rows // m) * (cols // m), m * m * e)

        x = layer_norm(x, p["mm0_w"], p["mm0_b"], 1e-5)
        x = x @ p["mm1_w"].T + p["mm1_b"]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
        return x @ p["mm3_w"].T + p["mm3_b"]

    def encode_grid(self, patches: np.ndarray, rows: int, cols: int) -> np.ndarray:
        key = (rows, cols)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(self._forward, rows=rows, cols=cols))
            self._jit_cache[key] = fn
        return np.asarray(fn(self.params, jnp.asarray(patches)))

    def encode_image(self, image) -> np.ndarray:
        from .clip import preprocess_image

        pixels = preprocess_image(image, self.image_size, self.image_mean,
                                  self.image_std)
        P = self.patch_size
        side = self.image_size // P
        img = np.asarray(pixels).reshape(3, self.image_size, self.image_size)
        patches = img.reshape(3, side, P, side, P).transpose(1, 3, 0, 2, 4)
        patches = patches.reshape(side * side, 3 * P * P)
        return self.encode_grid(patches.astype(np.float32), side, side)
