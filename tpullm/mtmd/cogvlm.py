"""CogVLM vision tower: post-norm EVA-CLIP ViT with a trailing CLS token
and a swiglu projector bracketed by learned BOI/EOI embeddings.

Reference: tools/mtmd/models/cogvlm.cpp (clip_graph_cogvlm::build): fused
qkv, attention → LayerNorm → residual and FFN → LayerNorm → residual
(post-norm placement), absolute positions added once, CLS dropped before
the projector; projector = mm.model.fc → LayerNorm(1e-5) → GELU →
silu(gate)·up → down, output wrapped as [boi, tokens…, eoi].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm
from .clip import preprocess_image


class CogVLMVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 490))
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1792))
        self.n_layer = int(g("block_count", 63))
        self.n_head = int(g("attention.head_count", 16))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-6))
        self.use_gelu = bool(md.get("clip.use_gelu", False))
        self.image_mean = np.asarray(g("image_mean", [0.48145466, 0.4578275,
                                                      0.40821073]), np.float32)
        self.image_std = np.asarray(g("image_std", [0.26862954, 0.26130258,
                                                    0.27577711]), np.float32)
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
            "proj_w": arr("mm.model.fc.weight"),
            "post_fc_w": arr("mm.post_fc_norm.weight"),
            "post_fc_b": maybe("mm.post_fc_norm.bias"),
            "up_w": arr("mm.up.weight"),
            "gate_w": arr("mm.gate.weight"),
            "down_w": arr("mm.down.weight"),
            "boi": arr("v.boi").reshape(1, -1),
            "eoi": arr("v.eoi").reshape(1, -1),
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"v.blk.{i}."
            self.params["layers"].append({
                "qkv_w": arr(p + "attn_qkv.weight"),
                "qkv_b": maybe(p + "attn_qkv.bias"),
                "wo": arr(p + "attn_out.weight"), "bo": maybe(p + "attn_out.bias"),
                "ln1_w": arr(p + "ln1.weight"), "ln1_b": maybe(p + "ln1.bias"),
                "ln2_w": arr(p + "ln2.weight"), "ln2_b": maybe(p + "ln2.bias"),
                "up_w": arr(p + "ffn_up.weight"), "up_b": maybe(p + "ffn_up.bias"),
                "gate_w": maybe(p + "ffn_gate.weight"),
                "gate_b": maybe(p + "ffn_gate.bias"),
                "down_w": arr(p + "ffn_down.weight"),
                "down_b": maybe(p + "ffn_down.bias"),
            })
        self._encode = jax.jit(self._forward)

    def _ffn_act(self, up):
        if self.use_gelu:
            return jax.nn.gelu(up, approximate=False)
        return jax.nn.gelu(up, approximate=True)

    def _forward(self, p, pixels):
        """pixels [3, S, S] normalized → [n_patches + 2, n_embd_llm]."""
        P = self.patch_size
        side = self.side
        N = side * side
        C = self.n_embd
        hd = C // self.n_head
        T = N + 1
        x = pixels.reshape(3, side, P, side, P)
        x = x.transpose(1, 3, 0, 2, 4).reshape(N, 3 * P * P)
        x = x @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        x = jnp.concatenate([x, p["cls"][None]], axis=0)  # CLS last
        x = x + p["pos_embd"][:T]

        for lyr in p["layers"]:
            qkv = x @ lyr["qkv_w"].T
            if lyr["qkv_b"] is not None:
                qkv = qkv + lyr["qkv_b"]
            q, k, v = (qkv[:, :C].reshape(T, self.n_head, hd),
                       qkv[:, C:2 * C].reshape(T, self.n_head, hd),
                       qkv[:, 2 * C:].reshape(T, self.n_head, hd))
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(T, C)
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            # post-norm placement: norm the branch output, then residual
            attn = layer_norm(attn, lyr["ln1_w"], lyr["ln1_b"], self.eps)
            x = x + attn

            up = x @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            if lyr["gate_w"] is not None:
                gate = x @ lyr["gate_w"].T
                if lyr["gate_b"] is not None:
                    gate = gate + lyr["gate_b"]
                act = jax.nn.silu(gate) * up
            else:
                act = self._ffn_act(up)
            ffn = act @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                ffn = ffn + lyr["down_b"]
            ffn = layer_norm(ffn, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            x = x + ffn

        x = x[:N]  # drop CLS
        y = x @ p["proj_w"].T
        y = layer_norm(y, p["post_fc_w"], p["post_fc_b"], 1e-5)
        y = jax.nn.gelu(y, approximate=True)  # ggml_gelu
        y = jax.nn.silu(y @ p["gate_w"].T) * (y @ p["up_w"].T)
        y = y @ p["down_w"].T
        return jnp.concatenate([p["boi"], y, p["eoi"]], axis=0)

    def encode_image(self, image) -> np.ndarray:
        px = preprocess_image(image, self.image_size, self.image_mean,
                              self.image_std)
        return np.asarray(self._encode(self.params, jnp.asarray(px)))
