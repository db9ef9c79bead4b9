"""Llama-4 vision tower: LayerNorm ViT with a trailing CLS token, learned
absolute positions, interleaved 2-D rope, pixel shuffle and a two-GELU
adapter MLP + linear projector.

Reference: tools/mtmd/models/llama4.cpp (clip_graph_llama4::build): unfold
conv patch embed, CLS appended after the patches, build_rope_2d with
non-interleaved frequencies (first half of the head dim rotates by the x
coordinate, second half by y, both +1; CLS unrotated — HF
Llama4VisionRotaryEmbedding), pixel shuffle by n_merge, mm.model.mlp.1/2
with GELU after BOTH layers (Llama4VisionMLP2), then mm.model.fc
(Llama4MultiModalProjector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm


class Llama4Vision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 336))
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1408))
        self.n_layer = int(g("block_count", 34))
        self.n_head = int(g("attention.head_count", 16))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-5))
        self.n_merge = int(md.get("clip.vision.projector.scale_factor", 2))
        self.image_mean = np.asarray(g("image_mean", [0.5, 0.5, 0.5]), np.float32)
        self.image_std = np.asarray(g("image_std", [0.5, 0.5, 0.5]), np.float32)
        self.side = self.image_size // self.patch_size

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        self.params = {
            "patch_w": arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P),
            "patch_b": maybe("v.patch_embd.bias"),
            "cls": arr("v.class_embd").reshape(self.n_embd),
            "pos_embd": arr("v.position_embd.weight"),
            "pre_ln_w": arr("v.pre_ln.weight"), "pre_ln_b": maybe("v.pre_ln.bias"),
            "post_ln_w": arr("v.post_ln.weight"),
            "post_ln_b": maybe("v.post_ln.bias"),
            "mlp1_w": arr("mm.model.mlp.1.weight"),
            "mlp2_w": arr("mm.model.mlp.2.weight"),
            "proj_w": arr("mm.model.fc.weight"),
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
        self._encode = jax.jit(self._forward)

    def _forward(self, p, pixels):
        """pixels [3, S, S] normalized → [(side/n_merge)², n_embd_llm]."""
        P = self.patch_size
        side = self.side
        N = side * side
        C = self.n_embd
        hd = C // self.n_head
        x = pixels.reshape(3, side, P, side, P)
        x = x.transpose(1, 3, 0, 2, 4).reshape(N, 3 * P * P)
        x = x @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        x = jnp.concatenate([x, p["cls"][None]], axis=0)  # CLS last
        x = x + p["pos_embd"][: N + 1]
        x = layer_norm(x, p["pre_ln_w"], p["pre_ln_b"], self.eps)

        # interleaved 2-D rope (Llama4VisionRotaryEmbedding): hd/4 base
        # frequencies; complex pairs 0..hd/2 rotate by (x+1), the rest by
        # (y+1); the CLS row stays unrotated
        q4 = hd // 4
        f = 1.0 / (10000.0 ** (np.arange(0, hd // 2, 2)[:q4] / (hd / 2)))
        xs = np.concatenate([np.arange(N) % side + 1.0, [0.0]])
        ys = np.concatenate([np.arange(N) // side + 1.0, [0.0]])
        ang = np.concatenate([xs[:, None] * f[None, :],
                              ys[:, None] * f[None, :]], axis=1)  # [N+1, hd/2]
        cos = jnp.asarray(np.cos(ang), jnp.float32)[:, None, :]
        sin = jnp.asarray(np.sin(ang), jnp.float32)[:, None, :]

        def rope(v):  # [T, H, hd], interleaved pairs
            vr = v.reshape(v.shape[0], self.n_head, hd // 2, 2)
            re, im = vr[..., 0], vr[..., 1]
            out = jnp.stack([re * cos - im * sin, re * sin + im * cos], -1)
            return out.reshape(v.shape[0], self.n_head, hd)

        T = N + 1
        for lyr in p["layers"]:
            h = layer_norm(x, lyr["ln1_w"], lyr["ln1_b"], self.eps)

            def proj(w, b):
                y = h @ lyr[w].T
                if lyr[b] is not None:
                    y = y + lyr[b]
                return y.reshape(T, self.n_head, hd)

            q = rope(proj("wq", "bq"))
            k = rope(proj("wk", "bk"))
            v = proj("wv", "bv")
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(T, C)
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn

            h = layer_norm(x, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            up = h @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            down = jax.nn.gelu(up, approximate=False) @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down

        x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)
        x = x[:N]  # drop CLS

        # pixel shuffle (HF pixel_shuffle, ratio 1/n_merge)
        fct = self.n_merge
        x = x.reshape(side, side // fct, C * fct)
        x = x.transpose(1, 0, 2).reshape(side // fct, side // fct,
                                         C * fct * fct)
        x = x.transpose(1, 0, 2).reshape((side // fct) ** 2, C * fct * fct)

        # adapter: GELU after BOTH fcs (Llama4VisionMLP2), then projector
        x = jax.nn.gelu(x @ p["mlp1_w"].T, approximate=False)
        x = jax.nn.gelu(x @ p["mlp2_w"].T, approximate=False)
        return x @ p["proj_w"].T

    def encode_image(self, image) -> np.ndarray:
        from .clip import preprocess_image

        px = preprocess_image(image, self.image_size, self.image_mean,
                              self.image_std)
        return np.asarray(self._encode(self.params, jnp.asarray(px)))
