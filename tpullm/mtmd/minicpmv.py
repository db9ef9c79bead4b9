"""MiniCPM-V vision tower: SigLIP-style ViT + perceiver resampler.

Reference: tools/mtmd/models/minicpmv.cpp (clip_graph_minicpmv::build) —
standard LayerNorm ViT with learned positions (no class token), then the
resampler projector: a single cross-attention block whose learned queries
(resampler.query, minicpmv_query_num of them) attend over the kv-projected
patch embeddings, with a 2-D sinusoidal position embedding added to the
keys (resampler.py get_2d_sincos_pos_embed: per key position (h, w),
  pos_embed = [sin(wω) | cos(wω) | sin(hω) | cos(hω)],
ω_i = base^(-i/(d/4)), clip.cpp:3462-3479 — note ggml feeds pos_w into
theta_x first, matching the upstream resampler's (w, h) order), a post
LayerNorm and a final projection.

The output is a FIXED number of query tokens per image regardless of
resolution — the property that makes MiniCPM-V serve long-image contexts
cheaply. Multi-crop slicing of large images (the reference's llava-uhd
path) can feed this tower crop-by-crop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm


class MiniCPMVVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 448))
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1152))
        self.n_layer = int(g("block_count", 27))
        self.n_head = int(g("attention.head_count", 16))
        self.head_dim = self.n_embd // self.n_head
        self.eps = float(g("attention.layer_norm_epsilon", 1e-6))
        version = int(md.get("clip.minicpmv_version", 3) or 3)
        self.n_query = int(md.get("clip.minicpmv_query_num",
                                  {3: 64, 4: 64, 5: 64}.get(version, 96)))
        self.image_mean = np.asarray(g("image_mean", [0.5, 0.5, 0.5]), np.float32)
        self.image_std = np.asarray(g("image_std", [0.5, 0.5, 0.5]), np.float32)

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        self.params = {
            "patch_w": arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P),
            "patch_b": maybe("v.patch_embd.bias"),
            "pos_embd": arr("v.position_embd.weight"),
            "query": arr("resampler.query"),          # [n_query, d_proj]
            "kv_proj": arr("resampler.kv.weight"),    # [d_proj, n_embd]
            "ln_q_w": arr("resampler.ln_q.weight"),
            "ln_q_b": maybe("resampler.ln_q.bias"),
            "ln_kv_w": arr("resampler.ln_kv.weight"),
            "ln_kv_b": maybe("resampler.ln_kv.bias"),
            "attn_q_w": arr("resampler.attn.q.weight"),
            "attn_q_b": arr("resampler.attn.q.bias"),
            "attn_k_w": arr("resampler.attn.k.weight"),
            "attn_k_b": arr("resampler.attn.k.bias"),
            "attn_v_w": arr("resampler.attn.v.weight"),
            "attn_v_b": arr("resampler.attn.v.bias"),
            "attn_o_w": arr("resampler.attn.out.weight"),
            "attn_o_b": arr("resampler.attn.out.bias"),
            "ln_post_w": arr("resampler.ln_post.weight"),
            "ln_post_b": maybe("resampler.ln_post.bias"),
            "proj": arr("resampler.proj.weight"),     # [d_proj, d_out]
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"v.blk.{i}."
            self.params["layers"].append({
                "ln1_w": arr(p + "ln1.weight"), "ln1_b": maybe(p + "ln1.bias"),
                "wq": arr(p + "attn_q.weight"), "bq": maybe(p + "attn_q.bias"),
                "wk": arr(p + "attn_k.weight"), "bk": maybe(p + "attn_k.bias"),
                "wv": arr(p + "attn_v.weight"), "bv": maybe(p + "attn_v.bias"),
                "wo": arr(p + "attn_out.weight"), "bo": maybe(p + "attn_out.bias"),
                "ln2_w": arr(p + "ln2.weight"), "ln2_b": maybe(p + "ln2.bias"),
                "up_w": arr(p + "ffn_up.weight"), "up_b": maybe(p + "ffn_up.bias"),
                "down_w": arr(p + "ffn_down.weight"),
                "down_b": maybe(p + "ffn_down.bias"),
            })
        self._jit_cache: dict = {}

    def _pos_embed_2d(self, rows: int, cols: int) -> np.ndarray:
        """[rows·cols, d_proj] sinusoid (clip.cpp omega + sin|cos concat)."""
        d = int(self.params["kv_proj"].shape[0])
        quarter = d // 4
        omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
        hh, ww = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
        theta_x = ww.reshape(-1, 1) * omega[None, :]  # pos_w first
        theta_y = hh.reshape(-1, 1) * omega[None, :]
        return np.concatenate([np.sin(theta_x), np.cos(theta_x),
                               np.sin(theta_y), np.cos(theta_y)],
                              axis=-1).astype(np.float32)

    def _forward(self, p, patches, pos_ids, pos2d, rows: int, cols: int):
        N = rows * cols
        H, D = self.n_head, self.head_dim
        eps = self.eps
        x = patches @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        x = x + p["pos_embd"][pos_ids]

        for layer in p["layers"]:
            h = layer_norm(x, layer["ln1_w"], layer["ln1_b"], eps)
            q = (h @ layer["wq"].T + layer["bq"]).reshape(N, H, D)
            k = (h @ layer["wk"].T + layer["bk"]).reshape(N, H, D)
            v = (h @ layer["wv"].T + layer["bv"]).reshape(N, H, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
            ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(N, H * D)
            x = x + (ctx @ layer["wo"].T + layer["bo"])
            h = layer_norm(x, layer["ln2_w"], layer["ln2_b"], eps)
            up = h @ layer["up_w"].T
            if layer["up_b"] is not None:
                up = up + layer["up_b"]
            act = jax.nn.gelu(up.astype(jnp.float32), approximate=True).astype(x.dtype)
            down = act @ layer["down_w"].T
            if layer["down_b"] is not None:
                down = down + layer["down_b"]
            x = x + down

        # resampler
        dp = p["query"].shape[-1]
        # reference hardcodes the resampler head dim (minicpmv.cpp:77)
        dh = 128 if dp % 128 == 0 else dp
        nh = dp // dh
        q = layer_norm(p["query"], p["ln_q_w"], p["ln_q_b"], eps)
        v = layer_norm(x @ p["kv_proj"].T, p["ln_kv_w"], p["ln_kv_b"], eps)
        k = v + pos2d.astype(v.dtype)
        Q = (q @ p["attn_q_w"].T + p["attn_q_b"]).reshape(self.n_query, nh, dh)
        K = (k @ p["attn_k_w"].T + p["attn_k_b"]).reshape(N, nh, dh)
        V = (v @ p["attn_v_w"].T + p["attn_v_b"]).reshape(N, nh, dh)
        scores = jnp.einsum("qhd,khd->hqk", Q, K) * (dh ** -0.5)
        probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
        ctx = jnp.einsum("hqk,khd->qhd", probs, V).reshape(self.n_query, dp)
        out = ctx @ p["attn_o_w"].T + p["attn_o_b"]
        out = layer_norm(out, p["ln_post_w"], p["ln_post_b"], eps)
        return out @ p["proj"]

    def encode_grid(self, patches: np.ndarray, rows: int, cols: int) -> np.ndarray:
        key = (rows, cols)
        fn = self._jit_cache.get(key)
        if fn is None:
            pos2d = jnp.asarray(self._pos_embed_2d(rows, cols))
            # learned ViT positions: row-major index into the trained grid
            side = int(round(np.sqrt(self.params["pos_embd"].shape[0])))
            rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
            ids = jnp.asarray((rr * side + cc).reshape(-1), jnp.int32)
            fwd = functools.partial(self._forward, rows=rows, cols=cols)
            fn = jax.jit(lambda p, x: fwd(p, x, ids, pos2d))
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
