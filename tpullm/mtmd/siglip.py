"""SigLIP vision encoder + Gemma3 multimodal projector.

Reference: tools/mtmd/models/siglip.cpp (clip_graph_siglip::build,
PROJECTOR_TYPE_GEMMA3 branch): standard pre-norm ViT with learned positions
and no class token, gelu-tanh FFN; then the gemma3 projector — average-pool
the patch grid by n_merge per side, RMS-normalize (mm.soft_emb_norm, weight
stored with the gemma +1 fold), and project into the LLM embedding space
(mm.input_projection).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm, rms_norm
from .clip import preprocess_image


class Gemma3Vision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 896))
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1152))
        self.n_layer = int(g("block_count", 27))
        self.n_head = int(g("attention.head_count", 16))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-6))
        # patch side reduced 4× by the pool (clip.cpp:1142-1150)
        self.n_merge = int(md.get("clip.vision.projector.scale_factor", 4))
        self.image_mean = np.asarray(g("image_mean", [0.5, 0.5, 0.5]), np.float32)
        self.image_std = np.asarray(g("image_std", [0.5, 0.5, 0.5]), np.float32)
        self.side = self.image_size // self.patch_size

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        proj = maybe("mm.input_projection.weight")
        if proj is not None and proj.shape[0] != self.n_embd:
            proj = proj.T  # accept either orientation
        self.params = {
            "patch_w": arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P),
            "patch_b": maybe("v.patch_embd.bias"),
            "pos_embd": arr("v.position_embd.weight"),
            "post_ln_w": maybe("v.post_ln.weight"),
            "post_ln_b": maybe("v.post_ln.bias"),
            "soft_emb_norm": maybe("mm.soft_emb_norm.weight"),
            "input_proj": proj,  # [n_embd_vision, n_embd_llm]
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
        x = x + p["pos_embd"][:N]

        for lyr in p["layers"]:
            h = layer_norm(x, lyr["ln1_w"], lyr["ln1_b"], self.eps)

            def proj(w, b):
                y = h @ lyr[w].T
                if lyr[b] is not None:
                    y = y + lyr[b]
                return y.reshape(N, self.n_head, hd)

            q, k, v = proj("wq", "bq"), proj("wk", "bk"), proj("wv", "bv")
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(N, C)
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn

            h = layer_norm(x, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            up = h @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            act = jax.nn.gelu(up, approximate=True)  # gelu_pytorch_tanh
            down = act @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down

        if p["post_ln_w"] is not None:
            x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)

        # gemma3 projector: avg-pool n_merge×n_merge over the patch grid,
        # RMS norm, single projection (siglip.cpp:18-39)
        k = self.n_merge
        s2 = side // k
        g = x.reshape(s2, k, s2, k, C).mean(axis=(1, 3)).reshape(s2 * s2, C)
        g = rms_norm(g, p["soft_emb_norm"], self.eps)
        return g @ p["input_proj"]

    def encode_image(self, image) -> np.ndarray:
        px = preprocess_image(image, self.image_size, self.image_mean,
                              self.image_std)
        return np.asarray(self._encode(self.params, jnp.asarray(px)))


class Idefics3Vision(Gemma3Vision):
    """SmolVLM/Idefics3: the same SigLIP ViT, but the projector is a
    pixel-shuffle (scale_factor, modeling_idefics3.py pixel_shuffle) into a
    single linear (clip.cpp PROJECTOR_TYPE_IDEFICS3 mm.model.fc)."""

    def __init__(self, path, dtype=jnp.float32):
        super().__init__(path, dtype=dtype)
        t = self.reader.tensors
        self.params["fc"] = jnp.asarray(
            t["mm.model.fc.weight"].to_numpy(), dtype)

    def _forward(self, p, pixels):
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
        # Idefics3 buckets fractional coords scaled by (1-1e-6), so even a
        # full-size grid indexes positions [0, 0, 1, …, side-2] per axis
        # (Idefics3VisionEmbeddings.forward bucketize(right=True))
        frac = (np.arange(side) / side) * (1 - 1e-6)
        bounds = np.arange(1, side) / side
        ids = np.searchsorted(bounds, frac, side="right")
        pos_ids = (ids[:, None] * side + ids[None, :]).reshape(-1)
        x = x + p["pos_embd"][pos_ids]
        for lyr in p["layers"]:
            h = layer_norm(x, lyr["ln1_w"], lyr["ln1_b"], self.eps)

            def proj(w, b):
                y = h @ lyr[w].T
                if lyr[b] is not None:
                    y = y + lyr[b]
                return y.reshape(N, self.n_head, hd)

            q, k, v = proj("wq", "bq"), proj("wk", "bk"), proj("wv", "bv")
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(N, C)
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn
            h = layer_norm(x, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            up = h @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            act = jax.nn.gelu(up, approximate=True)
            down = act @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down
        if p["post_ln_w"] is not None:
            x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)

        # pixel_shuffle (modeling_idefics3.py:578): [h, w, C] →
        # [h/sf · w/sf, C·sf²] with column-major gather per shuffle block
        sf = self.n_merge
        x = x.reshape(side, side // sf, C * sf)
        x = x.transpose(1, 0, 2).reshape(side // sf, side // sf, C * sf * sf)
        x = x.transpose(1, 0, 2).reshape((side // sf) ** 2, C * sf * sf)
        return x @ p["fc"].T
