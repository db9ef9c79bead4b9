"""Kimi-VL (MoonViT) vision tower.

Reference: tools/mtmd/models/kimivl.cpp (clip_graph_kimivl::build) — a
LayerNorm ViT at dynamic resolution combining BOTH learned position
embeddings (bilinear-antialias resized to the patch grid,
clip.cpp resize_position_embeddings) and 2-D rope on q/k where the FIRST
half of each head carries the X/column axis and the second half the Y/row
axis (build_rope_2d with interleave_freq=false; within each half the
rotation is ggml "normal" style: adjacent (2i, 2i+1) pairs, angle
pos·θ^(-2i/(d/2))). GELU FFN, fused-qkv checkpoints split at conversion.

Projector: pixel-unshuffle by n_merge (clip.cpp build_patch_merge_permute,
grid padded to a multiple of the scale factor), LayerNorm applied per
ORIGINAL n_embd-wide patch embedding inside each merged feature vector
(kimivl.cpp views the [C·f², N] merge output as [C, N·f²] for
mm.input_norm), then the 2-layer GELU MLP (mm.1 / mm.2).

Preprocessing ≡ PROJECTOR_TYPE_KIMIVL (clip.cpp): aspect-preserving resize
snapped to patch·merge multiples within [8, 1024] image tokens
(calc_size_preserved_ratio), mean/std normalize.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm


class KimiVLVision:
    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1152))
        self.n_layer = int(g("block_count", 27))
        self.n_head = int(g("attention.head_count", 16))
        self.head_dim = self.n_embd // self.n_head
        self.eps = float(g("attention.layer_norm_epsilon", 1e-5))
        self.rope_theta = 10000.0  # clip.cpp KIMIVL hparams block
        self.n_merge = int(g("projector.scale_factor", 2))
        P, f = self.patch_size, self.n_merge
        # set_limit_image_tokens(8, 1024): token limits in merged patches
        self.min_pixels = 8 * P * P * f * f
        self.max_pixels = 1024 * P * P * f * f
        self.image_mean = np.asarray(
            g("image_mean", [0.5, 0.5, 0.5]), np.float32)
        self.image_std = np.asarray(
            g("image_std", [0.5, 0.5, 0.5]), np.float32)

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        self.params = {
            "patch_w": arr("v.patch_embd.weight").reshape(
                self.n_embd, 3 * P * P),
            "patch_b": maybe("v.patch_embd.bias"),
            "pos_embd": arr("v.position_embd.weight"),
            "post_ln_w": maybe("v.post_ln.weight"),
            "post_ln_b": maybe("v.post_ln.bias"),
            "inp_norm_w": arr("mm.input_norm.weight"),
            "inp_norm_b": arr("mm.input_norm.bias"),
            "mm1_w": arr("mm.1.weight"), "mm1_b": maybe("mm.1.bias"),
            "mm2_w": arr("mm.2.weight"), "mm2_b": maybe("mm.2.bias"),
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"v.blk.{i}."
            self.params["layers"].append({
                "ln1_w": arr(p + "ln1.weight"), "ln1_b": maybe(p + "ln1.bias"),
                "wq": arr(p + "attn_q.weight"), "bq": maybe(p + "attn_q.bias"),
                "wk": arr(p + "attn_k.weight"), "bk": maybe(p + "attn_k.bias"),
                "wv": arr(p + "attn_v.weight"), "bv": maybe(p + "attn_v.bias"),
                "wo": arr(p + "attn_out.weight"),
                "bo": maybe(p + "attn_out.bias"),
                "ln2_w": arr(p + "ln2.weight"), "ln2_b": maybe(p + "ln2.bias"),
                "up_w": arr(p + "ffn_up.weight"),
                "up_b": maybe(p + "ffn_up.bias"),
                "down_w": arr(p + "ffn_down.weight"),
                "down_b": maybe(p + "ffn_down.bias"),
            })
        self._jit_cache: dict = {}

    # -- rope -----------------------------------------------------------------

    def _cos_sin(self, rows: int, cols: int):
        """Per-position cos/sin [N, d/2] where the first d/4 pair slots use
        column positions and the rest row positions (build_rope_2d,
        interleave_freq=false: both halves share f_i = θ^(-2i/(d/2)))."""
        dh = self.head_dim // 2
        i = np.arange(0, dh, 2, dtype=np.float64)
        f = self.rope_theta ** (-i / dh)  # pair i: θ^(-2i/dh)
        hh, ww = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
        hh = hh.reshape(-1, 1).astype(np.float64)
        ww = ww.reshape(-1, 1).astype(np.float64)
        ang_w = ww * f  # [N, dh/2] first half: X axis
        ang_h = hh * f  # second half: Y axis
        ang = np.concatenate([ang_w, ang_h], axis=-1)  # [N, d/2]
        return (jnp.asarray(np.cos(ang), jnp.float32),
                jnp.asarray(np.sin(ang), jnp.float32))

    # -- forward --------------------------------------------------------------

    def _forward(self, p, patches, cos, sin, rows: int, cols: int):
        N = rows * cols
        H, D = self.n_head, self.head_dim
        C = self.n_embd
        x = patches @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]

        # learned positions, bilinear-antialias resized to (rows, cols)
        nps = int(np.sqrt(p["pos_embd"].shape[0]))
        pos = p["pos_embd"].reshape(nps, nps, C)
        if (rows, cols) != (nps, nps):
            pos = jax.image.resize(pos, (rows, cols, C), method="bilinear",
                                   antialias=True)
        x = x + pos.reshape(N, C)

        def rope(v):  # [N, H, D]: adjacent-pair rotation within each half
            pair = v.reshape(N, H, D // 2, 2)
            a, b = pair[..., 0], pair[..., 1]
            c = cos[:, None, :]
            s = sin[:, None, :]
            return jnp.stack([a * c - b * s, a * s + b * c], -1).reshape(
                N, H, D)

        for layer in p["layers"]:
            h = layer_norm(x, layer["ln1_w"], layer["ln1_b"], self.eps)

            def proj(w, b, h=h):
                y = h @ w.T
                return y if b is None else y + b

            q = rope(proj(layer["wq"], layer["bq"]).reshape(N, H, D))
            k = rope(proj(layer["wk"], layer["bk"]).reshape(N, H, D))
            v = proj(layer["wv"], layer["bv"]).reshape(N, H, D)
            scores = jnp.einsum("qhd,khd->hqk", q, k) * (D ** -0.5)
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(
                x.dtype)
            ctx = jnp.einsum("hqk,khd->qhd", probs, v).reshape(N, H * D)
            attn = ctx @ layer["wo"].T
            if layer["bo"] is not None:
                attn = attn + layer["bo"]
            x = x + attn
            h = layer_norm(x, layer["ln2_w"], layer["ln2_b"], self.eps)
            up = h @ layer["up_w"].T
            if layer["up_b"] is not None:
                up = up + layer["up_b"]
            dn = jax.nn.gelu(up.astype(jnp.float32),
                             approximate=False).astype(x.dtype)
            dn = dn @ layer["down_w"].T
            if layer["down_b"] is not None:
                dn = dn + layer["down_b"]
            x = x + dn

        if p["post_ln_w"] is not None:  # encoder.final_layernorm
            x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)

        # patch merger (build_patch_merge_permute): pad the grid to a
        # multiple of n_merge, group f consecutive along W then along H;
        # feature order per merged token = [dy][dx][channel]
        fm = self.n_merge
        gh = -rows % fm
        gw = -cols % fm
        grid = x.reshape(rows, cols, C)
        if gh or gw:
            grid = jnp.pad(grid, ((0, gh), (0, gw), (0, 0)))
        h2, w2 = rows + gh, cols + gw
        x = grid.reshape(h2, w2 // fm, C * fm)
        x = x.transpose(1, 0, 2).reshape(w2 // fm, h2 // fm, C * fm * fm)
        x = x.transpose(1, 0, 2).reshape((h2 // fm) * (w2 // fm),
                                         C * fm * fm)

        # projection norm applied per ORIGINAL patch embedding: view
        # [N', C·f²] as [N'·f², C], LayerNorm, view back (kimivl.cpp)
        n_merged = x.shape[0]
        x = x.reshape(n_merged * fm * fm, C)
        x = layer_norm(x, p["inp_norm_w"], p["inp_norm_b"], 1e-5)
        x = x.reshape(n_merged, C * fm * fm)

        x = x @ p["mm1_w"].T
        if p["mm1_b"] is not None:
            x = x + p["mm1_b"]
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(
            x.dtype)
        x = x @ p["mm2_w"].T
        if p["mm2_b"] is not None:
            x = x + p["mm2_b"]
        return x

    def encode_grid(self, patches: np.ndarray, rows: int, cols: int
                    ) -> np.ndarray:
        """patches [rows·cols, 3·P·P] (row-major grid) → [n_tokens, D_llm]."""
        key = (rows, cols)
        fn = self._jit_cache.get(key)
        if fn is None:
            cos, sin = self._cos_sin(rows, cols)
            fwd = functools.partial(self._forward, rows=rows, cols=cols)
            fn = jax.jit(lambda p, x: fwd(p, x, cos, sin))
            self._jit_cache[key] = fn
        return np.asarray(fn(self.params, jnp.asarray(patches)))

    def _target_size(self, h: int, w: int) -> tuple[int, int]:
        """calc_size_preserved_ratio: snap to patch·merge multiples within
        [min_pixels, max_pixels] (same helper the LFM2 tower uses)."""
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
                                   .resize((tw, th), Image.BICUBIC))
            except ImportError:
                ys = (np.arange(th) * h // th).clip(0, h - 1)
                xs = (np.arange(tw) * w // tw).clip(0, w - 1)
                image = image[ys][:, xs]
        x = image.astype(np.float32) / 255.0
        x = (x - self.image_mean) / self.image_std
        P = self.patch_size
        rows, cols = th // P, tw // P
        patches = (x.reshape(rows, P, cols, P, 3)
                   .transpose(0, 2, 4, 1, 3)
                   .reshape(rows * cols, 3 * P * P))
        return self.encode_grid(patches, rows, cols)
