"""CLIP ViT vision encoder + LLaVA MLP projector.

Reference: tools/mtmd/clip.cpp (mmproj GGUF: v.* encoder tensors +
mm.* projector; clip.vision.* metadata). Pre-norm ViT: conv patch embedding
+ class token + learned positions → N transformer blocks → (llava) project
patch tokens through the 2-layer GELU MLP into the LLM embedding space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm


class ClipVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 224))
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 768))
        self.n_ff = int(g("feed_forward_length", 3072))
        self.n_layer = int(g("block_count", 12))
        self.n_head = int(g("attention.head_count", 12))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-5))
        # ≡ clip.cpp use_gelu: CLIP ViTs use quick_gelu (x·σ(1.702x));
        # towers converted from gelu models set clip.use_gelu=true. Our
        # synthetic fixtures predate the flag and assume tanh-gelu.
        self.use_gelu = bool(md.get("clip.use_gelu", True))
        self.image_mean = np.asarray(g("image_mean", [0.48145466, 0.4578275, 0.40821073]),
                                     dtype=np.float32)
        self.image_std = np.asarray(g("image_std", [0.26862954, 0.26130258, 0.27577711]),
                                    dtype=np.float32)
        self.n_patches_side = self.image_size // self.patch_size
        self.n_patches = self.n_patches_side ** 2

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        self.params = {
            # conv kernel logical (n_embd, 3, P, P)
            "patch_w": arr("v.patch_embd.weight").reshape(
                self.n_embd, 3, self.patch_size, self.patch_size
            ),
            "patch_b": maybe("v.patch_embd.bias"),
            "class_embd": maybe("v.class_embd"),
            "pos_embd": arr("v.position_embd.weight"),
            "pre_ln_w": maybe("v.pre_ln.weight"),
            "pre_ln_b": maybe("v.pre_ln.bias"),
            "post_ln_w": maybe("v.post_ln.weight"),
            "post_ln_b": maybe("v.post_ln.bias"),
            "layers": [],
            # llava projector: mm.0 (+bias) → GELU → mm.2 (+bias)
            "mm0_w": arr("mm.0.weight"),
            "mm0_b": maybe("mm.0.bias"),
            "mm2_w": maybe("mm.2.weight"),
            "mm2_b": maybe("mm.2.bias"),
            # mlp_norm (Yi-VL, clip.cpp PROJECTOR_TYPE_MLP_NORM): LayerNorms
            # after each linear — mm.0 → LN(mm.1) → GELU → mm.3 → LN(mm.4)
            "mm1_w": maybe("mm.1.weight"), "mm1_b": maybe("mm.1.bias"),
            "mm3_w": maybe("mm.3.weight"), "mm3_b": maybe("mm.3.bias"),
            "mm4_w": maybe("mm.4.weight"), "mm4_b": maybe("mm.4.bias"),
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
                "down_w": arr(p + "ffn_down.weight"), "down_b": maybe(p + "ffn_down.bias"),
            })
        self._encode = jax.jit(self._forward)

    # -- graph ----------------------------------------------------------------

    def _forward(self, pixels: jax.Array) -> jax.Array:
        """pixels [B, 3, H, W] normalized → projected patch embeddings
        [B, n_patches, n_embd_llm]."""
        p = self.params
        B = pixels.shape[0]
        P = self.patch_size
        # conv patch embedding as unfold + matmul (MXU-friendly im2col)
        x = pixels.reshape(B, 3, self.n_patches_side, P, self.n_patches_side, P)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, self.n_patches, 3 * P * P)
        w = p["patch_w"].reshape(self.n_embd, 3 * P * P)
        x = jnp.einsum("bpe,de->bpd", x, w)
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        if p["class_embd"] is not None:
            cls = jnp.broadcast_to(p["class_embd"], (B, 1, self.n_embd))
            x = jnp.concatenate([cls, x], axis=1)
        x = x + p["pos_embd"][None, : x.shape[1]]
        if p["pre_ln_w"] is not None:
            x = layer_norm(x, p["pre_ln_w"], p["pre_ln_b"], self.eps)

        hd = self.n_embd // self.n_head
        for lyr in p["layers"]:
            h = layer_norm(x, lyr["ln1_w"], lyr["ln1_b"], self.eps)
            T = h.shape[1]

            def proj(wname, bname):
                y = jnp.einsum("bte,de->btd", h, lyr[wname])
                if lyr[bname] is not None:
                    y = y + lyr[bname]
                return y.reshape(B, T, self.n_head, hd)

            q = proj("wq", "bq")
            k = proj("wk", "bk")
            v = proj("wv", "bv")
            scores = jnp.einsum("bthd,bshd->bhts", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)  # bidirectional
            attn = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, self.n_embd)
            attn = jnp.einsum("bte,de->btd", attn, lyr["wo"])
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn

            h = layer_norm(x, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            up = jnp.einsum("bte,fe->btf", h, lyr["up_w"])
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            if self.use_gelu:
                act = jax.nn.gelu(up, approximate=True)
            else:  # quick_gelu
                act = up * jax.nn.sigmoid(1.702 * up)
            down = jnp.einsum("btf,ef->bte", act, lyr["down_w"])
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down

        if p["post_ln_w"] is not None:
            x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)
        # llava: project PATCH tokens (drop the class token)
        if p["class_embd"] is not None:
            x = x[:, 1:]
        y = jnp.einsum("bte,de->btd", x, p["mm0_w"])
        if p["mm0_b"] is not None:
            y = y + p["mm0_b"]
        if p["mm1_w"] is not None:  # mlp_norm (Yi-VL)
            y = layer_norm(y, p["mm1_w"], p["mm1_b"], self.eps)
            y = jax.nn.gelu(y, approximate=True)
            y = jnp.einsum("btd,ed->bte", y, p["mm3_w"])
            if p["mm3_b"] is not None:
                y = y + p["mm3_b"]
            return layer_norm(y, p["mm4_w"], p["mm4_b"], self.eps)
        if p["mm2_w"] is not None:
            y = jax.nn.gelu(y, approximate=True)
            y = jnp.einsum("btd,ed->bte", y, p["mm2_w"])
            if p["mm2_b"] is not None:
                y = y + p["mm2_b"]
        return y

    def encode(self, pixels: np.ndarray) -> np.ndarray:
        """pixels [B, 3, H, W] (already normalized) → [B, n_patches, E_llm]."""
        return np.asarray(self._encode(jnp.asarray(pixels, jnp.float32)))

    def encode_image(self, image) -> np.ndarray:
        """image: HWC uint8 array or PIL image → [n_patches, E_llm]."""
        px = preprocess_image(image, self.image_size, self.image_mean,
                              self.image_std)
        return self.encode(px[None])[0]


def preprocess_image(image, size: int, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """HWC uint8 / PIL → normalized CHW f32 at size×size (bicubic ≈ clip.cpp
    preprocessing)."""
    if not isinstance(image, np.ndarray):
        image = np.asarray(image.convert("RGB"))
    if image.shape[:2] != (size, size):
        try:
            from PIL import Image

            image = np.asarray(
                Image.fromarray(image.astype(np.uint8)).resize(
                    (size, size), Image.BICUBIC
                )
            )
        except ImportError:  # nearest-neighbor fallback
            ys = (np.arange(size) * image.shape[0] // size).clip(0, image.shape[0] - 1)
            xs = (np.arange(size) * image.shape[1] // size).clip(0, image.shape[1] - 1)
            image = image[ys][:, xs]
    x = image.astype(np.float32) / 255.0
    x = (x - mean) / std
    return np.ascontiguousarray(x.transpose(2, 0, 1))
