"""Qwen2-VL / Qwen2.5-VL vision tower: dynamic-resolution ViT with 2-D
M-RoPE and the spatial 2×2 patch merger.

Reference: tools/mtmd/models/qwen2vl.cpp (clip_graph_qwen2vl::build) and the
input setup in tools/mtmd/clip.cpp:3481-3586 (positions, window permutation)
+ smart-resize preprocessing (clip.cpp:2342 calc_size_preserved_ratio).

TPU notes: each image grid (ph, pw) is a distinct static shape, so the
forward jit-compiles per grid and caches; all hot work is [N, C] matmuls on
the MXU. The sequence is laid out in 2×2 merge-block order (y-block,
x-block, dy, dx) — the same order the reference builds with its conv
permute dance — which makes the final merger a plain reshape.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm, rms_norm


def smart_resize(h: int, w: int, factor: int, min_pixels: int,
                 max_pixels: int) -> tuple[int, int]:
    """Aspect-preserving resize target with H·W in [min_pixels, max_pixels]
    and both sides multiples of `factor` (≡ clip.cpp:2343)."""
    round_f = lambda x: max(factor, int(round(x / factor)) * factor)
    ceil_f = lambda x: int(math.ceil(x / factor)) * factor
    floor_f = lambda x: max(factor, int(math.floor(x / factor)) * factor)
    h_bar, w_bar = round_f(float(h)), round_f(float(w))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt(h * w / max_pixels)
        h_bar, w_bar = floor_f(h / beta), floor_f(w / beta)
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        h_bar, w_bar = ceil_f(h * beta), ceil_f(w * beta)
    return h_bar, w_bar


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Qwen2VLVision:
    """proj_type ∈ {"qwen2vl_merger", "qwen2.5vl_merger"}; 2.5 switches the
    norms to RMS, the FFN to gated silu, and attends in 112-px windows with
    every n_wa_pattern-th layer full (clip.cpp:1158-1166)."""

    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        self.proj_type = md.get("clip.projector_type", "qwen2vl_merger")
        # qwen2.5o = qwen2.5-omni dual-modality mmproj; its vision half is
        # the 2.5-VL graph (clip.cpp PROJECTOR_TYPE_QWEN25O → QWEN25VL)
        self.is_25 = self.proj_type in ("qwen2.5vl_merger", "qwen2.5o")
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.patch_size = int(g("patch_size", 14))
        self.n_embd = int(g("embedding_length", 1280))
        self.n_ff = int(g("feed_forward_length", 0))
        self.n_layer = int(g("block_count", 32))
        self.n_head = int(g("attention.head_count", 16))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-6))
        self.merge = int(g("spatial_merge_size", 2))
        self.n_wa_pattern = int(g("n_wa_pattern", 0)) if self.is_25 else 0
        self.window_size = int(g("window_size", 112))
        mp2 = (self.merge * self.patch_size) ** 2
        # default token budget 8..4096 (≡ set_limit_image_tokens(8, 4096))
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
        # temporal_patch_size=2 with the still image duplicated: both conv
        # kernels see the same frame, so their sum is one fused kernel
        if w1 is not None:
            w0 = w0 + w1.reshape(self.n_embd, 3 * P * P)
        self.params = {
            "patch_w": w0,
            "post_ln_w": maybe("v.post_ln.weight"),  # merger ln_q
            "post_ln_b": maybe("v.post_ln.bias"),
            "mm0_w": arr("mm.0.weight"), "mm0_b": maybe("mm.0.bias"),
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
                "wo": arr(p + "attn_out.weight"), "bo": maybe(p + "attn_out.bias"),
                "ln2_w": arr(p + "ln2.weight"), "ln2_b": maybe(p + "ln2.bias"),
                "up_w": arr(p + "ffn_up.weight"), "up_b": maybe(p + "ffn_up.bias"),
                "gate_w": maybe(p + "ffn_gate.weight"),
                "gate_b": maybe(p + "ffn_gate.bias"),
                "down_w": arr(p + "ffn_down.weight"),
                "down_b": maybe(p + "ffn_down.bias"),
            })

    # -- graph -----------------------------------------------------------------

    def _norm(self, x, w, b):
        if self.is_25:
            return rms_norm(x, w, self.eps)
        return layer_norm(x, w, b, self.eps)

    def _is_full(self, li: int) -> bool:
        return self.n_wa_pattern == 0 or (li + 1) % self.n_wa_pattern == 0

    def _use_windows(self) -> bool:
        return self.n_wa_pattern > 0

    def _ffn_act(self, up):
        return _quick_gelu(up)

    def _pre_merge(self, p, x):
        return self._norm(x, p["post_ln_w"], p["post_ln_b"])

    def _forward(self, patches, rows, cols, win_id):
        if not hasattr(self, "_jit_fwd"):
            self._jit_fwd = jax.jit(self._forward_impl)
        return self._jit_fwd(self.params, patches, rows, cols, win_id)

    def _forward_impl(self, p, patches, rows, cols, win_id):
        """patches [N, 3·P²] in merge-block order; rows/cols [N] patch grid
        coordinates; win_id [N] attention-window id per patch (all-zero →
        full attention only)."""
        N = patches.shape[0]
        C = self.n_embd
        hd = C // self.n_head
        x = patches @ p["patch_w"].T

        # 2-D M-RoPE (≡ ggml_rope_multi GGML_ROPE_TYPE_VISION with sections
        # d/4·4: pair i<d/4 rotates by the row index, d/4≤i<d/2 by the
        # column — rotate-half over the full head dim)
        quarter = hd // 4
        inv = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
        inv = jnp.asarray(inv, jnp.float32)
        ang = jnp.concatenate([
            rows[:, None].astype(jnp.float32) * inv[None, :],
            cols[:, None].astype(jnp.float32) * inv[None, :],
        ], axis=1)  # [N, hd/2]
        cos = jnp.cos(jnp.concatenate([ang, ang], axis=1))  # [N, hd]
        sin = jnp.sin(jnp.concatenate([ang, ang], axis=1))

        def rope(v):  # [N, H, hd]
            h1, h2 = v[..., : hd // 2], v[..., hd // 2:]
            rot = jnp.concatenate([-h2, h1], axis=-1)
            return v * cos[:, None, :] + rot * sin[:, None, :]

        mask = jnp.where(win_id[:, None] == win_id[None, :], 0.0, -jnp.inf)

        for li, lyr in enumerate(p["layers"]):
            full = self._is_full(li)
            h = self._norm(x, lyr["ln1_w"], lyr["ln1_b"])

            def proj(w, b):
                y = h @ lyr[w].T
                if lyr[b] is not None:
                    y = y + lyr[b]
                return y.reshape(N, self.n_head, hd)

            q = rope(proj("wq", "bq"))
            k = rope(proj("wk", "bk"))
            v = proj("wv", "bv")
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            if not full:
                scores = scores + mask[None]
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(N, C)
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn

            h = self._norm(x, lyr["ln2_w"], lyr["ln2_b"])
            up = h @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            if lyr["gate_w"] is not None:  # 2.5: gated silu
                gate = h @ lyr["gate_w"].T
                if lyr["gate_b"] is not None:
                    gate = gate + lyr["gate_b"]
                act = jax.nn.silu(gate) * up
            else:  # 2.0: quick-gelu (youtuvl overrides with tanh-gelu)
                act = self._ffn_act(up)
            down = act @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down

        x = self._pre_merge(p, x)  # merger ln_q (youtuvl: post_ln + rms ln_q)
        m2 = self.merge * self.merge
        y = x.reshape(N // m2, m2 * C)
        y = y @ p["mm0_w"].T
        if p["mm0_b"] is not None:
            y = y + p["mm0_b"]
        y = jax.nn.gelu(y, approximate=False)
        y = y @ p["mm2_w"].T
        if p["mm2_b"] is not None:
            y = y + p["mm2_b"]
        return y

    # -- host-side input prep ---------------------------------------------------

    def _window_layout(self, ph: int, pw: int):
        """Window grouping over merge blocks (≡ clip.cpp:3520-3558): returns
        (group permutation inv_idx [G], inverse idx [G], win id per group
        [G]) with windows contiguous after permutation."""
        gw = max(1, self.window_size // self.patch_size // self.merge)
        bh, bw = ph // self.merge, pw // self.merge
        inv, wid = [], []
        w = 0
        for y in range(0, bh, gw):
            for x in range(0, bw, gw):
                for dy in range(min(gw, bh - y)):
                    for dx in range(min(gw, bw - x)):
                        inv.append((y + dy) * bw + (x + dx))
                        wid.append(w)
                w += 1
        inv = np.asarray(inv, np.int32)
        idx = np.empty_like(inv)
        idx[inv] = np.arange(inv.size, dtype=np.int32)
        return inv, idx, np.asarray(wid, np.int32)

    def encode_image(self, image) -> np.ndarray:
        """HWC uint8 / PIL image → [n_patches/merge², n_embd_llm]."""
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

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        """pixels [3, H, W] normalized, H/W multiples of merge·patch."""
        P, m = self.patch_size, self.merge
        _, H, W = pixels.shape
        ph, pw = H // P, W // P
        self.last_grid = (ph // m, pw // m)  # LLM-token grid (mrope h, w)
        # merge-block patch order: (y-block, x-block, dy, dx)
        x = pixels.reshape(3, ph // m, m, P, pw // m, m, P)
        patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3 * P * P)
        yy = np.arange(ph).reshape(ph // m, m, 1, 1)
        xx = np.arange(pw).reshape(1, 1, pw // m, m)
        rows = np.broadcast_to(yy.transpose(0, 2, 1, 3),
                               (ph // m, pw // m, m, m)).reshape(-1)
        cols = np.broadcast_to(xx.transpose(0, 2, 1, 3),
                               (ph // m, pw // m, m, m)).reshape(-1)
        m2 = m * m
        if self._use_windows():
            inv, idx, wid = self._window_layout(ph, pw)
            perm = (inv[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
            out = self._forward(
                jnp.asarray(patches[perm]), jnp.asarray(rows[perm]),
                jnp.asarray(cols[perm]), jnp.asarray(np.repeat(wid, m2)),
            )
            return np.asarray(out)[idx]  # restore merge-block order
        zeros = np.zeros(ph * pw, np.int32)
        out = self._forward(jnp.asarray(patches), jnp.asarray(rows),
                            jnp.asarray(cols), jnp.asarray(zeros))
        return np.asarray(out)


def _linear_ac_weights(dst: int, src: int) -> np.ndarray:
    """Align-corners bilinear interpolation matrix [dst, src]
    (≡ Qwen3VLVisionModel.fast_pos_embed_interpolate linspace(0, src-1, dst)
    with floor/ceil gathers)."""
    W = np.zeros((dst, src), np.float32)
    xs = np.linspace(0.0, src - 1.0, dst) if dst > 1 else np.zeros(1)
    for i, x in enumerate(xs):
        x0 = int(x)  # trunc, matches .int()
        x1 = min(x0 + 1, src - 1)
        t = x - x0
        W[i, x0] += 1.0 - t
        W[i, x1] += t
    return W


class Qwen3VLVision:
    """Qwen3-VL tower (proj_type "qwen3vl_merger", models/qwen3vl.cpp):
    LayerNorm ViT with fused-qkv M-RoPE attention, align-corners bilinear
    position interpolation, deepstack mergers tapping intermediate layers
    (clip.vision.is_deepstack_layers) and a LayerNorm + 2-layer GELU main
    merger; the output concatenates the main path with every deepstack
    feature along the embedding dim (out_dim × (1 + n_deepstack))."""

    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.patch_size = int(g("patch_size", 16))
        self.n_embd = int(g("embedding_length", 1152))
        self.n_layer = int(g("block_count", 27))
        self.n_head = int(g("attention.head_count", 16))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-6))
        self.merge = int(g("spatial_merge_size", 2))
        self.ds_layers = [bool(b) for b in g("is_deepstack_layers",
                                             [False] * self.n_layer)]
        mp2 = (self.merge * self.patch_size) ** 2
        self.min_pixels = int(g("image_min_pixels", 8 * mp2))
        self.max_pixels = int(g("image_max_pixels", 4096 * mp2))
        self.image_mean = np.asarray(g("image_mean", [0.5, 0.5, 0.5]), np.float32)
        self.image_std = np.asarray(g("image_std", [0.5, 0.5, 0.5]), np.float32)

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        P = self.patch_size
        w0 = arr("v.patch_embd.weight").reshape(self.n_embd, 3 * P * P)
        w1 = maybe("v.patch_embd.weight.1")
        if w1 is not None:
            w0 = w0 + w1.reshape(self.n_embd, 3 * P * P)
        self.params = {
            "patch_w": w0,
            "patch_b": maybe("v.patch_embd.bias"),
            "pos_embd": arr("v.position_embd.weight"),
            "post_ln_w": arr("v.post_ln.weight"),
            "post_ln_b": maybe("v.post_ln.bias"),
            "mm0_w": arr("mm.0.weight"), "mm0_b": maybe("mm.0.bias"),
            "mm1_w": arr("mm.1.weight"), "mm1_b": maybe("mm.1.bias"),
            "layers": [],
            "deepstack": {},
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
            if self.ds_layers[i]:
                d = f"v.deepstack.{i}."
                self.params["deepstack"][i] = {
                    "norm_w": arr(d + "norm.weight"),
                    "norm_b": maybe(d + "norm.bias"),
                    "fc1_w": arr(d + "fc1.weight"),
                    "fc1_b": maybe(d + "fc1.bias"),
                    "fc2_w": arr(d + "fc2.weight"),
                    "fc2_b": maybe(d + "fc2.bias"),
                }
        self._jit_fwd = jax.jit(self._forward_impl)

    def _forward_impl(self, p, patches, rows, cols, wh, ww):
        N = patches.shape[0]
        C = self.n_embd
        hd = C // self.n_head
        m2 = self.merge * self.merge
        x = patches @ p["patch_w"].T
        if p["patch_b"] is not None:
            x = x + p["patch_b"]
        nside = int(round(float(p["pos_embd"].shape[0]) ** 0.5))
        pos = jnp.einsum("hp,pqc,wq->hwc", wh,
                         p["pos_embd"].reshape(nside, nside, C), ww)
        x = x + pos[rows, cols]

        quarter = hd // 4
        inv = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
        inv = jnp.asarray(inv, jnp.float32)
        ang = jnp.concatenate([
            rows[:, None].astype(jnp.float32) * inv[None, :],
            cols[:, None].astype(jnp.float32) * inv[None, :],
        ], axis=1)
        cos = jnp.cos(jnp.concatenate([ang, ang], axis=1))
        sin = jnp.sin(jnp.concatenate([ang, ang], axis=1))

        def rope(v):
            h1, h2 = v[..., : hd // 2], v[..., hd // 2:]
            rot = jnp.concatenate([-h2, h1], axis=-1)
            return v * cos[:, None, :] + rot * sin[:, None, :]

        ds_feats = []
        for li, lyr in enumerate(p["layers"]):
            h = layer_norm(x, lyr["ln1_w"], lyr["ln1_b"], self.eps)

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
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn

            h = layer_norm(x, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            up = h @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            down = jax.nn.gelu(up, approximate=True) @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down

            if li in p["deepstack"]:
                ds = p["deepstack"][li]
                f = x.reshape(N // m2, C * m2)  # post-shuffle norm
                f = layer_norm(f, ds["norm_w"], ds["norm_b"], 1e-6)
                f = f @ ds["fc1_w"].T
                if ds["fc1_b"] is not None:
                    f = f + ds["fc1_b"]
                f = jax.nn.gelu(f, approximate=False)
                f = f @ ds["fc2_w"].T
                if ds["fc2_b"] is not None:
                    f = f + ds["fc2_b"]
                ds_feats.append(f)

        # main merger: LayerNorm on C, group m², 2-layer GELU MLP
        y = layer_norm(x, p["post_ln_w"], p["post_ln_b"], 1e-6)
        y = y.reshape(N // m2, C * m2)
        y = y @ p["mm0_w"].T
        if p["mm0_b"] is not None:
            y = y + p["mm0_b"]
        y = jax.nn.gelu(y, approximate=False)
        y = y @ p["mm1_w"].T
        if p["mm1_b"] is not None:
            y = y + p["mm1_b"]
        # concat main + deepstack features (clip.cpp qwen3vl graph tail)
        return jnp.concatenate([y] + ds_feats, axis=-1)

    def encode_pixels(self, pixels: np.ndarray) -> np.ndarray:
        P, m = self.patch_size, self.merge
        _, H, W = pixels.shape
        ph, pw = H // P, W // P
        self.last_grid = (ph // m, pw // m)  # LLM-token grid (mrope h, w)
        x = pixels.reshape(3, ph // m, m, P, pw // m, m, P)
        patches = x.transpose(1, 4, 2, 5, 0, 3, 6).reshape(ph * pw, 3 * P * P)
        yy = np.arange(ph).reshape(ph // m, m, 1, 1)
        xx = np.arange(pw).reshape(1, 1, pw // m, m)
        rows = np.broadcast_to(yy.transpose(0, 2, 1, 3),
                               (ph // m, pw // m, m, m)).reshape(-1)
        cols = np.broadcast_to(xx.transpose(0, 2, 1, 3),
                               (ph // m, pw // m, m, m)).reshape(-1)
        nside = int(round(float(self.params["pos_embd"].shape[0]) ** 0.5))
        wh = jnp.asarray(_linear_ac_weights(ph, nside))
        ww = jnp.asarray(_linear_ac_weights(pw, nside))
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


class YoutuVLVision(Qwen2VLVision):
    """Youtu-VL tower (proj_type "youtuvl", tools/mtmd/models/youtuvl.cpp):
    a SigLIP2-based LayerNorm ViT with the qwen2.5-VL window-attention
    machinery, except full-attention layers come from an EXPLICIT index list
    (clip.vision.wa_layer_indexes) instead of an every-Nth pattern, the FFN
    is plain tanh-GELU, and the VLPatchMerger applies the SigLIP2
    post_layernorm followed by an RMS ln_q (mm.input_norm) before the
    2×2-merge MLP (mm.0 → GELU → mm.2). Vision M-RoPE is identical
    (sections d/4·4, θ=10000). Token budget 1..62500 (clip.cpp
    set_limit_image_tokens for PROJECTOR_TYPE_YOUTUVL)."""

    def __init__(self, path, dtype=jnp.float32):
        super().__init__(path, dtype)
        md = self.reader.metadata
        idx = md.get("clip.vision.wa_layer_indexes")
        self.wa_full_layers = (
            set() if idx is None
            else {int(i) for i in np.atleast_1d(idx).tolist()})
        mp2 = (self.merge * self.patch_size) ** 2
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.min_pixels = int(g("image_min_pixels", 1 * mp2))
        self.max_pixels = int(g("image_max_pixels", 62500 * mp2))
        t = self.reader.tensors
        self.params["inp_norm_w"] = jnp.asarray(
            t["mm.input_norm.weight"].to_numpy(), dtype)

    def _is_full(self, li: int) -> bool:
        return not self.wa_full_layers or li in self.wa_full_layers

    def _use_windows(self) -> bool:
        return bool(self.wa_full_layers)

    def _ffn_act(self, up):
        return jax.nn.gelu(up, approximate=True)  # gelu_pytorch_tanh

    def _pre_merge(self, p, x):
        x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)
        return rms_norm(x, p["inp_norm_w"], 1e-6)  # merger ln_q
