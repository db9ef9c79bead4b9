"""Gemma3n vision tower: MobileNetV5 encoder + MSFA + Gemma3n embedder.

Reference: tools/mtmd/models/mobilenetv5.cpp (clip_graph_mobilenetv5::build)
— a timm MobileNetV5 backbone of four stages (stage starts downsample 2×):
stage-0 "edge residual" blocks (3×3 expand conv → RMSNorm2d → GELU → 1×1
pointwise-linear → RMSNorm2d), later-stage "universal inverted residual"
blocks (optional depthwise k×k → 1×1 expand → optional strided depthwise
mid → 1×1 project, each RMS-normalized, layer-scale + residual) and MQA
attention blocks (1×1 conv Q at full resolution against a single
depthwise-downsampled K/V head). Feature maps from the ends of stages 2
and 3 feed the Multi-Scale Fusion Adapter: nearest-upscale to the stage-2
resolution, channel concat, 1×1 expand/project FFN, average-pool to the
fixed 16×16 output grid, RMSNorm2d. The Gemma3n embedder then flattens to
256 tokens, scales by √C, soft-RMS-norms, projects to the text width and
RMS-norms again (mobilenetv5.cpp:390-447).

Strided convs replicate Conv2dSame: asymmetric SAME padding computed per
spatial dim (mobilenetv5.cpp pad_same_2d); unstrided ones use symmetric
k//2 padding. Tensor names follow clip-impl.h TN_MNV5_* /
tensor_mapping.py (v.conv_stem.*, v.blk.{stage}.{idx}.*, v.msfa.*,
mm.input_projection / mm.soft_emb_norm).

TPU notes: everything is NHWC through lax.conv_general_dilated (XLA lowers
these onto the MXU); the per-model block list is static Python, so the
whole encoder traces into one jitted program per image size.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from .clip import preprocess_image

# block-type tags (discovered from which tensors exist, ≡ clip.cpp's
# dynamic stage/block loader at clip.cpp:1578-1650)
_EDGE, _UIR, _ATTN = "edge", "uir", "attn"


def _rms2d(x, w, eps=1e-6):
    """RMSNorm over channels at every spatial position (NHWC; ≡
    rms_norm_2d's permute→ggml_rms_norm→permute with default eps 1e-6,
    models.h:84-87)."""
    x = x.astype(jnp.float32)
    y = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return y * w if w is not None else y


def _gelu(x):
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False)


def _pad_same(x, k, s):
    """Asymmetric SAME padding for stride-s k×k convs (pad_same_2d,
    mobilenetv5.cpp:23-53; dilation is always 1 here)."""
    H, W = x.shape[1], x.shape[2]
    ph = max(0, (math.ceil(H / s) - 1) * s + k - H)
    pw = max(0, (math.ceil(W / s) - 1) * s + k - W)
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2),
                       (pw // 2, pw - pw // 2), (0, 0)))


def _conv(x, w, stride=1, pad=0):
    """x [B,H,W,Ci], w (Co,Ci,kh,kw) as stored (torch layout) → [B,H',W',Co]."""
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _dwconv(x, w, stride=1, pad=0):
    """Depthwise conv; w (C,1,kh,kw) torch grouped layout."""
    C = w.shape[0]
    return jax.lax.conv_general_dilated(
        x, jnp.transpose(w, (2, 3, 1, 0)), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


class Gemma3nVision:
    """PROJECTOR_TYPE_GEMMA3NV tower over an mmproj GGUF."""

    def __init__(self, path, dtype=jnp.float32):
        r = GGUFReader(path)
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.vision.{k}", d)
        self.image_size = int(g("image_size", 768))
        # the converter stores patch_size = image_size // image_seq_length
        # and the runtime derives n_patches = image_size / patch_size
        # (clip.cpp:3242-3247); the MSFA output grid itself is fixed 16×16
        self.n_embd = int(g("embedding_length", 2048))
        self.image_mean = np.asarray(g("image_mean", [0.0, 0.0, 0.0]),
                                     np.float32)
        self.image_std = np.asarray(g("image_std", [1.0, 1.0, 1.0]),
                                    np.float32)
        t = r.tensors

        def arr(name, d=dtype):
            a = t[name].to_numpy()
            return jnp.asarray(np.ascontiguousarray(a), dtype=d)

        def vec(name, d=dtype):  # accept (C,) or ref-style (1,C,1,1)
            return arr(name, d).reshape(-1) if name in t else None

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        p = {
            "stem_w": arr("v.conv_stem.conv.weight"),
            "stem_b": vec("v.conv_stem.conv.bias"),
            "stem_bn": vec("v.conv_stem.bn.weight"),
            "msfa_exp_w": maybe("v.msfa.ffn.pw_exp.conv.weight"),
            "msfa_exp_bn": vec("v.msfa.ffn.pw_exp.bn.weight"),
            "msfa_proj_w": maybe("v.msfa.ffn.pw_proj.conv.weight"),
            "msfa_proj_bn": vec("v.msfa.ffn.pw_proj.bn.weight"),
            "msfa_norm": vec("v.msfa.norm.weight"),
            "input_proj": maybe("mm.input_projection.weight"),
            "soft_emb_norm": vec("mm.soft_emb_norm.weight"),
            "blocks": [],
        }
        # stage/block discovery ≡ clip.cpp:1578-1650: probe tensor names
        # stage by stage until a block index yields nothing
        self.block_kinds: list[str] = []
        self.stage_ends: list[int] = []
        for stage in range(4):
            found_in_stage = 0
            bi = 0
            while True:
                pre = f"v.blk.{stage}.{bi}."
                blk: dict = {}
                if pre + "conv_exp.weight" in t:
                    kind = _EDGE
                    blk = {
                        "exp_w": arr(pre + "conv_exp.weight"),
                        "bn1": vec(pre + "bn1.weight"),
                        "pwl_w": arr(pre + "conv_pwl.weight"),
                        "bn2": vec(pre + "bn2.weight"),
                    }
                elif pre + "attn.query.proj.weight" in t:
                    kind = _ATTN
                    blk = {
                        "norm": vec(pre + "norm.weight"),
                        "q_w": arr(pre + "attn.query.proj.weight"),
                        "k_w": arr(pre + "attn.key.proj.weight"),
                        "v_w": arr(pre + "attn.value.proj.weight"),
                        "o_w": arr(pre + "attn.output.proj.weight"),
                        "k_dw": maybe(pre + "attn.key.down_conv.weight"),
                        "k_norm": vec(pre + "attn.key.norm.weight"),
                        "v_dw": maybe(pre + "attn.value.down_conv.weight"),
                        "v_norm": vec(pre + "attn.value.norm.weight"),
                        "layer_scale": vec(pre + "layer_scale.gamma"),
                    }
                elif (pre + "dw_start.conv.weight" in t
                      or pre + "pw_exp.conv.weight" in t):
                    kind = _UIR
                    blk = {
                        "dw_start": maybe(pre + "dw_start.conv.weight"),
                        "dw_start_bn": vec(pre + "dw_start.bn.weight"),
                        "pw_exp": maybe(pre + "pw_exp.conv.weight"),
                        "pw_exp_bn": vec(pre + "pw_exp.bn.weight"),
                        "dw_mid": maybe(pre + "dw_mid.conv.weight"),
                        "dw_mid_bn": vec(pre + "dw_mid.bn.weight"),
                        "pw_proj": maybe(pre + "pw_proj.conv.weight"),
                        "pw_proj_bn": vec(pre + "pw_proj.bn.weight"),
                        "layer_scale": vec(pre + "layer_scale.gamma"),
                    }
                else:
                    break
                p["blocks"].append(blk)
                self.block_kinds.append(kind)
                found_in_stage += 1
                bi += 1
            if found_in_stage:
                self.stage_ends.append(len(p["blocks"]) - 1)
        if not p["blocks"]:
            raise ValueError(f"no v.blk.*.* tensors in {path}")
        self.params = p
        self._jit = functools.lru_cache(maxsize=4)(self._build)

    # -- block forwards (shape-static; traced under jit) --------------------

    def _edge(self, x, b, stride):
        if stride == 2:
            cur = _conv(_pad_same(x, b["exp_w"].shape[2], 2), b["exp_w"], 2)
        else:
            cur = _conv(x, b["exp_w"], 1, pad=1)
        cur = _gelu(_rms2d(cur, b["bn1"]))
        cur = _rms2d(_conv(cur, b["pwl_w"]), b["bn2"])
        if stride == 1 and cur.shape == x.shape:
            cur = cur + x
        return cur

    def _uir(self, x, b, stride):
        cur = x
        if b["dw_start"] is not None:
            k = b["dw_start"].shape[2]
            cur = _rms2d(_dwconv(cur, b["dw_start"], 1, pad=k // 2),
                         b["dw_start_bn"])
        if b["pw_exp"] is not None:
            cur = _gelu(_rms2d(_conv(cur, b["pw_exp"]), b["pw_exp_bn"]))
        if b["dw_mid"] is not None:
            k = b["dw_mid"].shape[2]
            if stride > 1:
                cur = _dwconv(_pad_same(cur, k, stride), b["dw_mid"], stride)
            else:
                cur = _dwconv(cur, b["dw_mid"], 1, pad=k // 2)
            cur = _gelu(_rms2d(cur, b["dw_mid_bn"]))
        if b["pw_proj"] is not None:
            cur = _rms2d(_conv(cur, b["pw_proj"]), b["pw_proj_bn"])
        if b["layer_scale"] is not None:
            cur = cur * b["layer_scale"]
        if cur.shape == x.shape:
            cur = cur + x
        return cur

    def _mqa(self, x, b):
        cur = _rms2d(x, b["norm"]) if b["norm"] is not None else x
        q = _conv(cur, b["q_w"])  # [1,H,W,nh*D]
        kin = cur
        if b["k_dw"] is not None:
            k = b["k_dw"].shape[2]
            kin = _dwconv(_pad_same(cur, k, 2), b["k_dw"], 2)
            kin = _rms2d(kin, b["k_norm"])
        kk = _conv(kin, b["k_w"])  # [1,Hk,Wk,D] single KV head
        vin = cur
        if b["v_dw"] is not None:
            k = b["v_dw"].shape[2]
            vin = _dwconv(_pad_same(cur, k, 2), b["v_dw"], 2)
            vin = _rms2d(vin, b["v_norm"])
        vv = _conv(vin, b["v_w"])

        H, W = q.shape[1], q.shape[2]
        D = kk.shape[-1]
        nh = q.shape[-1] // D
        N, M = H * W, kk.shape[1] * kk.shape[2]
        qf = q.reshape(N, nh, D).astype(jnp.float32)
        kf = kk.reshape(M, D).astype(jnp.float32)
        vf = vv.reshape(M, D).astype(jnp.float32)
        sc = jnp.einsum("nhd,md->hnm", qf, kf) / math.sqrt(D)
        pr = jax.nn.softmax(sc, axis=-1)
        ctx = jnp.einsum("hnm,md->nhd", pr, vf).reshape(1, H, W, nh * D)
        cur = _conv(ctx, b["o_w"])
        if cur.shape[2] == x.shape[2] and cur.shape[3] == x.shape[3]:
            if b["layer_scale"] is not None:
                cur = cur * b["layer_scale"]
            cur = cur + x
        return cur

    # -- full graph ---------------------------------------------------------

    def _forward(self, px):
        """px [3,H,W] f32 → [tokens, text_width]."""
        p = self.params
        x = jnp.transpose(px, (1, 2, 0))[None]  # NHWC
        x = _conv(_pad_same(x, p["stem_w"].shape[2], 2), p["stem_w"], 2)
        if p["stem_b"] is not None:
            x = x + p["stem_b"]
        x = _gelu(_rms2d(x, p["stem_bn"]))

        stage_starts = {0} | {e + 1 for e in self.stage_ends}
        if len(self.stage_ends) >= 4:
            fusion = {self.stage_ends[2], self.stage_ends[3]}
        else:
            fusion = {len(p["blocks"]) - 1}
        feats = []
        for i, (kind, blk) in enumerate(zip(self.block_kinds, p["blocks"])):
            stride = 2 if i in stage_starts else 1
            if kind == _EDGE:
                x = self._edge(x, blk, stride)
            elif kind == _ATTN:
                x = self._mqa(x, blk)
            else:
                x = self._uir(x, blk, stride)
            if i in fusion:
                feats.append(x)

        # MSFA (mobilenetv5.cpp:298-388)
        hi_h, hi_w = feats[0].shape[1], feats[0].shape[2]
        up = []
        for f in feats:
            if f.shape[1] < hi_h or f.shape[2] < hi_w:
                s = hi_w // f.shape[2]
                f = jnp.repeat(jnp.repeat(f, s, axis=1), s, axis=2)
            up.append(f)
        x = jnp.concatenate(up, axis=-1)
        if p["msfa_exp_w"] is not None:
            x = _gelu(_rms2d(_conv(x, p["msfa_exp_w"]), p["msfa_exp_bn"]))
        if p["msfa_proj_w"] is not None:
            x = _rms2d(_conv(x, p["msfa_proj_w"]), p["msfa_proj_bn"])
        out_res = 16  # fixed MSFA output resolution (mobilenetv5.cpp:370)
        if x.shape[2] > out_res:
            s = x.shape[2] // out_res
            B, H, W, C = x.shape
            x = x.reshape(B, H // s, s, W // s, s, C).mean(axis=(2, 4))
        x = _rms2d(x, p["msfa_norm"])

        # Gemma3n embedder (mobilenetv5.cpp:390-447): raster tokens
        C = x.shape[-1]
        toks = x.reshape(-1, C).astype(jnp.float32) * math.sqrt(C)
        rms = lambda v: v * jax.lax.rsqrt(
            jnp.mean(v * v, axis=-1, keepdims=True) + 1e-6)
        toks = rms(toks)
        if p["soft_emb_norm"] is not None:
            toks = toks * p["soft_emb_norm"]
        if p["input_proj"] is not None:
            toks = toks @ p["input_proj"].T  # weight [text_w, vision_w]
        return rms(toks)

    def _build(self, shape):
        return jax.jit(self._forward)

    def encode_pixels(self, px: np.ndarray) -> np.ndarray:
        """CHW f32 (preprocessed) → [tokens, text_width] numpy."""
        fn = self._jit(tuple(px.shape))
        return np.asarray(fn(jnp.asarray(px, jnp.float32)))

    def encode_image(self, image) -> np.ndarray:
        px = preprocess_image(image, self.image_size, self.image_mean,
                              self.image_std)
        return self.encode_pixels(px)
