"""GLM-4V vision tower: RMS-norm ViT with 2-D M-RoPE, bicubic-interpolated
absolute position embeddings, a conv patch-merger downsample and a gated-MLP
projector.

Reference: tools/mtmd/models/glm4v.cpp (clip_graph_glm4v::build): temporal
pair conv (two patch kernels summed for still images), patch bias, RMS
pos-conv norm, BICUBIC-resized learned positions, M-RoPE vision rope
(sections d/4), then mm.patch_merger conv → mm.model.fc + LayerNorm +
gelu_erf → gated FFN (mm.gate/up/down).

TPU notes: like qwen_vl.py, each patch grid is a static shape compiled once;
tokens ride in 2×2 merge-block order so the downsample conv is a reshape +
one matmul. The bicubic position resize uses host-precomputed separable
weight matrices (PyTorch's a=-0.75 kernel) so the device work is two
matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm, rms_norm
from .qwen_vl import smart_resize


def _cubic_resize_weights(dst: int, src: int) -> np.ndarray:
    """Separable bicubic interpolation matrix [dst, src] matching
    F.interpolate/grid_sample(mode=bicubic, align_corners=False,
    padding=border): PyTorch's Keys kernel with a = -0.75, edge-clamped."""
    a = -0.75
    W = np.zeros((dst, src), np.float64)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        t = x - x0
        for k in range(-1, 3):
            d = abs(t - k)
            if d <= 1.0:
                wt = (a + 2) * d ** 3 - (a + 3) * d ** 2 + 1
            elif d < 2.0:
                wt = a * d ** 3 - 5 * a * d ** 2 + 8 * a * d - 4 * a
            else:
                continue
            j = min(max(x0 + k, 0), src - 1)
            W[i, j] += wt
    return W.astype(np.float32)


class Glm4vVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1536))
        self.n_layer = int(g("block_count", 24))
        self.n_head = int(g("attention.head_count", 12))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-5))
        self.merge = int(g("spatial_merge_size", 2))
        mp2 = (self.merge * self.patch_size) ** 2
        # ≡ clip.cpp PROJECTOR_TYPE_GLM4V set_limit_image_tokens(8, 4096)
        self.min_pixels = int(g("image_min_pixels", 8 * mp2))
        self.max_pixels = int(g("image_max_pixels", 4096 * mp2))
        self.image_mean = np.asarray(g("image_mean", [0.48145466, 0.4578275,
                                                      0.40821073]), np.float32)
        self.image_std = np.asarray(g("image_std", [0.26862954, 0.26130258,
                                                    0.27577711]), np.float32)

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        w0 = arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P)
        w1 = maybe("v.patch_embd.weight.1")
        # temporal_patch_size=2 with a duplicated still frame: fuse the pair
        if w1 is not None:
            w0 = w0 + w1.reshape(self.n_embd, 3 * P * P)
        m = self.merge
        merger_w = arr("mm.patch_merger.weight")  # [out, C, m, m]
        self.out_embd = merger_w.shape[0]
        self.params = {
            "patch_w": w0,
            "patch_b": maybe("v.patch_embd.bias"),
            "norm_embd": arr("v.norm_embd.weight"),
            "pos_embd": arr("v.position_embd.weight"),
            "post_ln_w": arr("v.post_ln.weight"),
            "merger_w": merger_w.reshape(self.out_embd, -1),
            "merger_b": maybe("mm.patch_merger.bias"),
            "fc_w": arr("mm.model.fc.weight"),
            "post_norm_w": arr("mm.post_norm.weight"),
            "post_norm_b": maybe("mm.post_norm.bias"),
            "gate_w": arr("mm.gate.weight"), "gate_b": maybe("mm.gate.bias"),
            "up_w": arr("mm.up.weight"), "up_b": maybe("mm.up.bias"),
            "down_w": arr("mm.down.weight"), "down_b": maybe("mm.down.bias"),
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"v.blk.{i}."
            self.params["layers"].append({
                "ln1_w": arr(p + "ln1.weight"),
                "wq": arr(p + "attn_q.weight"), "bq": maybe(p + "attn_q.bias"),
                "wk": arr(p + "attn_k.weight"), "bk": maybe(p + "attn_k.bias"),
                "wv": arr(p + "attn_v.weight"), "bv": maybe(p + "attn_v.bias"),
                "wo": arr(p + "attn_out.weight"),
                "ln2_w": arr(p + "ln2.weight"),
                "gate": arr(p + "ffn_gate.weight"),
                "up": arr(p + "ffn_up.weight"),
                "down": arr(p + "ffn_down.weight"),
            })
        self._jit_fwd = jax.jit(self._forward_impl)

    @functools.lru_cache(maxsize=32)
    def _pos_resize(self, ph: int, pw: int):
        nps = int(round(float(self.params["pos_embd"].shape[0]) ** 0.5))
        return (jnp.asarray(_cubic_resize_weights(ph, nps)),
                jnp.asarray(_cubic_resize_weights(pw, nps)))

    def _forward_impl(self, p, patches, rows, cols, wh, ww):
        """patches [N, 3·P²] in merge-block order; rows/cols [N]; wh/ww the
        bicubic position-resize matrices [ph, nps]/[pw, nps]."""
        N = patches.shape[0]
        C = self.n_embd
        hd = C // self.n_head
        x = patches @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        x = rms_norm(x, p["norm_embd"], self.eps)

        # absolute positions: bicubic grid resize + gather at (row, col)
        nps = p["pos_embd"].shape[0]
        nside = int(round(float(nps) ** 0.5))
        grid = p["pos_embd"].reshape(nside, nside, C)
        pos = jnp.einsum("hp,pqc,wq->hwc", wh, grid, ww)
        x = x + pos[rows, cols]

        # 2-D M-RoPE over the full head dim (≡ ggml_rope_multi VISION,
        # sections d/4 rows + d/4 cols, rotate-half)
        quarter = hd // 4
        inv = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
        inv = jnp.asarray(inv, jnp.float32)
        ang = jnp.concatenate([
            rows[:, None].astype(jnp.float32) * inv[None, :],
            cols[:, None].astype(jnp.float32) * inv[None, :],
        ], axis=1)
        cos = jnp.cos(jnp.concatenate([ang, ang], axis=1))
        sin = jnp.sin(jnp.concatenate([ang, ang], axis=1))

        def rope(v):  # [N, H, hd]
            h1, h2 = v[..., : hd // 2], v[..., hd // 2:]
            rot = jnp.concatenate([-h2, h1], axis=-1)
            return v * cos[:, None, :] + rot * sin[:, None, :]

        for lyr in p["layers"]:
            h = rms_norm(x, lyr["ln1_w"], self.eps)

            def proj(w, b):
                y = h @ lyr[w].T
                if lyr[b] is not None:
                    y = y + lyr[b]
                return y.reshape(N, self.n_head, hd)

            q = rope(proj("wq", "bq"))
            k = rope(proj("wk", "bk"))
            v = proj("wv", "bv")
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(N, C)
            x = x + attn @ lyr["wo"].T

            h = rms_norm(x, lyr["ln2_w"], self.eps)
            act = jax.nn.silu(h @ lyr["gate"].T) * (h @ lyr["up"].T)
            x = x + act @ lyr["down"].T

        x = rms_norm(x, p["post_ln_w"], self.eps)

        # downsample: conv(kernel=stride=merge) over each merge block — the
        # block-ordered tokens make this one matmul against [out, C·m·m]
        m = self.merge
        y = x.reshape(N // (m * m), m, m, C)
        y = y.transpose(0, 3, 1, 2).reshape(N // (m * m), C * m * m)
        y = y @ p["merger_w"].T
        if p["merger_b"] is not None:
            y = y + p["merger_b"]

        # merger: fc → LayerNorm → gelu_erf → gated silu FFN
        # (HF Glm4vVisionPatchMerger)
        y = y @ p["fc_w"].T
        y = layer_norm(y, p["post_norm_w"], p["post_norm_b"], 1e-5)
        y = jax.nn.gelu(y, approximate=False)
        out = (jax.nn.silu(y @ p["gate_w"].T) * (y @ p["up_w"].T))
        out = out @ p["down_w"].T
        if p["down_b"] is not None:
            out = out + p["down_b"]
        return out

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """pixels [3, H, W] normalized, H/W multiples of merge·patch."""
        P, m = self.patch_size, self.merge
        _, H, W = pixels.shape
        ph, pw = H // P, W // P
        self.last_grid = (ph // m, pw // m)  # LLM-token grid
        x = pixels.reshape(3, ph // m, m, P, pw // m, m, P)
        patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3 * P * P)
        yy = np.arange(ph).reshape(ph // m, m, 1, 1)
        xx = np.arange(pw).reshape(1, 1, pw // m, m)
        rows = np.broadcast_to(yy.transpose(0, 2, 1, 3),
                               (ph // m, pw // m, m, m)).reshape(-1)
        cols = np.broadcast_to(xx.transpose(0, 2, 1, 3),
                               (ph // m, pw // m, m, m)).reshape(-1)
        wh, ww = self._pos_resize(ph, pw)
        out = self._jit_fwd(self.params, jnp.asarray(patches),
                            jnp.asarray(rows), jnp.asarray(cols), wh, ww)
        return np.asarray(out)

    def encode_image(self, image) -> np.ndarray:
        if not isinstance(image, np.ndarray):
            image = np.asarray(image.convert("RGB"))
        h, w = image.shape[:2]
        th, tw = smart_resize(h, w, self.patch_size * self.merge,
                              self.min_pixels, self.max_pixels)
        try:
            from PIL import Image

            image = np.asarray(Image.fromarray(image.astype(np.uint8))
                               .resize((tw, th), Image.BICUBIC))
        except ImportError:
            ys = (np.arange(th) * h // th).clip(0, h - 1)
            xs = (np.arange(tw) * w // tw).clip(0, w - 1)
            image = image[ys][:, xs]
        px = (image.astype(np.float32) / 255.0 - self.image_mean) / self.image_std
        return self.encode_pixels(np.ascontiguousarray(px.transpose(2, 0, 1)))
