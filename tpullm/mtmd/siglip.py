"""SigLIP vision encoder family: Gemma3 / Idefics3(SmolVLM) / Janus-Pro.

Reference: tools/mtmd/models/siglip.cpp (clip_graph_siglip::build): standard
pre-norm ViT with learned positions and no class token; the FFN activation
comes from hparams.ffn_op (clip.use_gelu → exact GELU, clip.use_silu → SiLU,
else the tanh/quick approximation, clip.cpp:1048-1064). Projector heads:
  - gemma3: average-pool the patch grid by n_merge per side, RMS-normalize
    (mm.soft_emb_norm) and project (mm.input_projection)
  - idefics3: pixel-shuffle by scale_factor into a single fc (mm.model.fc)
  - janus_pro: two-layer MLP aligner (mm.0 → ffn_op → mm.1,
    siglip.cpp:70-76)
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
        # block-FFN activation ≡ hparams.ffn_op (clip.cpp:1048-1064)
        self.use_gelu = bool(md.get("clip.use_gelu", False))
        self.use_silu = bool(md.get("clip.use_silu", False))
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
        self._load_extra(t, dtype)
        self._encode = jax.jit(self._forward)

    def _load_extra(self, tensors, dtype):
        """Projector-specific tensors beyond the shared trunk."""

    def _ffn_act(self, up):
        if self.use_gelu:
            return jax.nn.gelu(up, approximate=False)
        if self.use_silu:
            return jax.nn.silu(up)
        return jax.nn.gelu(up, approximate=True)  # gelu_pytorch_tanh

    def _pos_ids(self):
        """Position-embedding row per patch (default: raster order)."""
        return np.arange(self.side * self.side)

    def _forward(self, p, pixels):
        """pixels [3, S, S] normalized → [n_tokens, n_embd_llm]."""
        P = self.patch_size
        side = self.side
        N = side * side
        x = pixels.reshape(3, side, P, side, P)
        x = x.transpose(1, 3, 0, 2, 4).reshape(N, 3 * P * P)
        x = x @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        x = x + p["pos_embd"][self._pos_ids()]
        return self._project(p, self._blocks(p, x))

    def _blocks(self, p, x):
        """Shared pre-norm ViT encoder + post-LN over [N, C] tokens
        (clip.cpp clip_graph::build_vit)."""
        N, C = x.shape
        hd = C // self.n_head
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
            down = self._ffn_act(up) @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down

        if p["post_ln_w"] is not None:
            x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)
        return x

    def _project(self, p, x):
        # gemma3 projector: avg-pool n_merge×n_merge over the patch grid,
        # RMS norm, single projection (siglip.cpp:18-39)
        side, C = self.side, self.n_embd
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

    def _load_extra(self, tensors, dtype):
        self.params["fc"] = jnp.asarray(
            tensors["mm.model.fc.weight"].to_numpy(), dtype)

    def _pos_ids(self):
        # Idefics3 buckets fractional coords scaled by (1-1e-6), so even a
        # full-size grid indexes positions [0, 0, 1, …, side-2] per axis
        # (Idefics3VisionEmbeddings.forward bucketize(right=True))
        side = self.side
        frac = (np.arange(side) / side) * (1 - 1e-6)
        bounds = np.arange(1, side) / side
        ids = np.searchsorted(bounds, frac, side="right")
        return (ids[:, None] * side + ids[None, :]).reshape(-1)

    def _project(self, p, x):
        # pixel_shuffle (modeling_idefics3.py:578): [h, w, C] →
        # [h/sf · w/sf, C·sf²] with column-major gather per shuffle block
        side, C = self.side, self.n_embd
        sf = self.n_merge
        x = x.reshape(side, side // sf, C * sf)
        x = x.transpose(1, 0, 2).reshape(side // sf, side // sf, C * sf * sf)
        x = x.transpose(1, 0, 2).reshape((side // sf) ** 2, C * sf * sf)
        return x @ p["fc"].T


class JanusVision(Gemma3Vision):
    """Janus-Pro: the SigLIP ViT trunk (exact-GELU FFN via clip.use_gelu)
    followed by the two-layer MLP aligner — mm.0 → ffn_op → mm.1
    (clip.cpp PROJECTOR_TYPE_JANUS_PRO, siglip.cpp:70-76; HF
    JanusVisionModel + aligner fc1/hidden_layers.0)."""

    def _load_extra(self, tensors, dtype):
        for k in ("mm.0.weight", "mm.0.bias", "mm.1.weight", "mm.1.bias"):
            self.params[k] = jnp.asarray(tensors[k].to_numpy(), dtype) \
                if k in tensors else None

    def _project(self, p, x):
        h = x @ p["mm.0.weight"].T
        if p["mm.0.bias"] is not None:
            h = h + p["mm.0.bias"]
        h = self._ffn_act(h)
        h = h @ p["mm.1.weight"].T
        if p["mm.1.bias"] is not None:
            h = h + p["mm.1.bias"]
        return h

    def encode_image(self, image) -> np.ndarray:
        # Janus pads to square with gray(127) — aspect-preserving resize
        # centered on the canvas (clip.cpp PROJECTOR_TYPE_JANUS_PRO
        # preprocessing + img_tool::resize add_padding branch)
        if not isinstance(image, np.ndarray):
            image = np.asarray(image.convert("RGB"))
        h, w_ = image.shape[:2]
        if h != w_:
            sz = self.image_size
            scale = min(sz / w_, sz / h)
            nw = min(int(np.ceil(w_ * scale)), sz)
            nh = min(int(np.ceil(h * scale)), sz)
            try:
                from PIL import Image

                small = np.asarray(Image.fromarray(image.astype(np.uint8))
                                   .resize((nw, nh), Image.BILINEAR))
            except ImportError:
                ys = (np.arange(nh) * h // nh).clip(0, h - 1)
                xs = (np.arange(nw) * w_ // nw).clip(0, w_ - 1)
                small = image[ys][:, xs]
            canvas = np.full((sz, sz, 3), 127, np.uint8)
            oy, ox = (sz - nh) // 2, (sz - nw) // 2
            canvas[oy:oy + nh, ox:ox + nw] = small
            image = canvas
        return super().encode_image(image)


class Lfm2Vision(Gemma3Vision):
    """LFM2-VL: SigLIP2-NaFlex ViT at dynamic resolution — learned position
    grid bilinear-resized (antialias) per image, pixel-unshuffle by
    scale_factor, optional input LayerNorm, then a 2-layer GELU MLP
    (clip.cpp PROJECTOR_TYPE_LFM2 + siglip.cpp resize_position_embeddings
    branch; HF Lfm2VlMultiModalProjector).  Images are resized
    aspect-preserving and snapped to patch_size·scale_factor multiples
    within [min, max] token limits (clip.cpp calc_size_preserved_ratio,
    set_limit_image_tokens(64, 1024))."""

    def _load_extra(self, tensors, dtype):
        def maybe(k):
            return jnp.asarray(tensors[k].to_numpy(), dtype) \
                if k in tensors else None

        self.params.update({
            "inp_norm_w": maybe("mm.input_norm.weight"),
            "inp_norm_b": maybe("mm.input_norm.bias"),
            "mm1_w": maybe("mm.1.weight"), "mm1_b": maybe("mm.1.bias"),
            "mm2_w": maybe("mm.2.weight"), "mm2_b": maybe("mm.2.bias"),
        })
        md = self.reader.metadata
        P, f = self.patch_size, self.n_merge
        self.min_pixels = 64 * P * P * f * f
        self.max_pixels = int(md.get("clip.vision.preproc_image_max_tokens",
                                     1024)) * P * P * f * f

    def _forward(self, p, pixels):
        """pixels [3, H, W] (H, W multiples of patch·merge) → [h/f·w/f, D]."""
        P = self.patch_size
        C = self.n_embd
        _, H, W = pixels.shape
        h, w = H // P, W // P
        x = pixels.reshape(3, h, P, w, P)
        x = x.transpose(1, 3, 0, 2, 4).reshape(h * w, 3 * P * P)
        x = x @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        nps = int(np.sqrt(p["pos_embd"].shape[0]))
        pos = p["pos_embd"].reshape(nps, nps, C)
        if (h, w) != (nps, nps):
            # F.interpolate(bilinear, antialias=True) ≡ jax.image.resize
            # with the default antialiasing triangle filter
            pos = jax.image.resize(pos, (h, w, C), method="bilinear",
                                   antialias=True)
        x = x + pos.reshape(h * w, C)
        x = self._blocks(p, x)

        # pixel unshuffle (HF Lfm2VlMultiModalProjector.pixel_unshuffle,
        # same algebra as clip.cpp build_patch_merge_permute)
        f = self.n_merge
        x = x.reshape(h, w // f, C * f)
        x = x.transpose(1, 0, 2).reshape(w // f, h // f, C * f * f)
        x = x.transpose(1, 0, 2).reshape((h // f) * (w // f), C * f * f)
        if p["inp_norm_w"] is not None:
            x = layer_norm(x, p["inp_norm_w"], p["inp_norm_b"], 1e-5)
        x = x @ p["mm1_w"].T
        if p["mm1_b"] is not None:
            x = x + p["mm1_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ p["mm2_w"].T
        if p["mm2_b"] is not None:
            x = x + p["mm2_b"]
        return x

    def _target_size(self, h, w):
        """calc_size_preserved_ratio (clip.cpp:2343): snap to
        patch·merge multiples within [min_pixels, max_pixels]."""
        a = self.patch_size * self.n_merge
        rnd = lambda x: max(a, int(round(x / a)) * a)
        h_bar, w_bar = rnd(h), rnd(w)
        if h_bar * w_bar > self.max_pixels:
            beta = np.sqrt(h * w / self.max_pixels)
            flo = lambda x: max(a, int(np.floor(x / a)) * a)
            h_bar, w_bar = flo(h / beta), flo(w / beta)
        elif h_bar * w_bar < self.min_pixels:
            beta = np.sqrt(self.min_pixels / (h * w))
            cei = lambda x: int(np.ceil(x / a)) * a
            h_bar, w_bar = cei(h * beta), cei(w * beta)
        return h_bar, w_bar

    def encode_image(self, image) -> np.ndarray:
        if not isinstance(image, np.ndarray):
            image = np.asarray(image.convert("RGB"))
        h, w = image.shape[:2]
        th, tw = self._target_size(h, w)
        if (h, w) != (th, tw):
            try:
                from PIL import Image

                image = np.asarray(Image.fromarray(image.astype(np.uint8))
                                   .resize((tw, th), Image.BILINEAR))
            except ImportError:
                ys = (np.arange(th) * h // th).clip(0, h - 1)
                xs = (np.arange(tw) * w // tw).clip(0, w - 1)
                image = image[ys][:, xs]
        x = image.astype(np.float32) / 255.0
        x = (x - self.image_mean) / self.image_std
        px = np.ascontiguousarray(x.transpose(2, 0, 1))
        return np.asarray(self._encode(self.params, jnp.asarray(px)))
