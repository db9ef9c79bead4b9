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
            # llava projector: mm.0 (+bias) → GELU → mm.2 (+bias);
            # absent for the conv projectors (ldp/ldpv2/adapter)
            "mm0_w": maybe("mm.0.weight"),
            "mm0_b": maybe("mm.0.bias"),
            "mm2_w": maybe("mm.2.weight"),
            "mm2_b": maybe("mm.2.bias"),
            # mlp_norm (Yi-VL, clip.cpp PROJECTOR_TYPE_MLP_NORM): LayerNorms
            # after each linear — mm.0 → LN(mm.1) → GELU → mm.3 → LN(mm.4)
            "mm1_w": maybe("mm.1.weight"), "mm1_b": maybe("mm.1.bias"),
            "mm3_w": maybe("mm.3.weight"), "mm3_b": maybe("mm.3.bias"),
            "mm4_w": maybe("mm.4.weight"), "mm4_b": maybe("mm.4.bias"),
        }
        self.proj_type = md.get("clip.projector_type", "mlp")
        if self.proj_type == "ldp":
            # MobileVLM LDP (llava.cpp PROJECTOR_TYPE_LDP): MLP then two
            # depthwise-conv squeeze-excite blocks, the second at stride 2
            self.params.update({
                "mlp1_w": arr("mm.model.mlp.1.weight"),
                "mlp1_b": arr("mm.model.mlp.1.bias"),
                "mlp3_w": arr("mm.model.mlp.3.weight"),
                "mlp3_b": arr("mm.model.mlp.3.bias"),
            })
            for bi in (1, 2):
                pre = f"mm.model.mb_block.{bi}.block."
                self.params[f"mb{bi}"] = {
                    "dw_w": arr(pre + "0.0.weight"),
                    "ln0_w": arr(pre + "0.1.weight"),
                    "ln0_b": arr(pre + "0.1.bias"),
                    "fc1_w": arr(pre + "1.fc1.weight"),
                    "fc1_b": arr(pre + "1.fc1.bias"),
                    "fc2_w": arr(pre + "1.fc2.weight"),
                    "fc2_b": arr(pre + "1.fc2.bias"),
                    "pw_w": arr(pre + "2.0.weight"),
                    "ln2_w": arr(pre + "2.1.weight"),
                    "ln2_b": arr(pre + "2.1.bias"),
                }
        elif self.proj_type == "ldpv2":
            # MobileVLM-v2 LDPv2: MLP → 2×2 avg-pool → PEG depthwise conv
            # residual
            self.params.update({
                "mlp0_w": arr("mm.model.mlp.0.weight"),
                "mlp0_b": arr("mm.model.mlp.0.bias"),
                "mlp2_w": arr("mm.model.mlp.2.weight"),
                "mlp2_b": arr("mm.model.mlp.2.bias"),
                "peg_w": arr("mm.model.peg.0.weight"),
                "peg_b": arr("mm.model.peg.0.bias"),
            })
        elif self.proj_type == "adapter":
            # GLM-Edge (llava.cpp PROJECTOR_TYPE_GLM_EDGE): 2×2 stride-2
            # conv downsample + gated GLU + BOI/EOI marker embeddings
            self.params.update({
                "conv_w": arr("adapter.conv.weight"),
                "conv_b": arr("adapter.conv.bias"),
                "glu_lin_w": arr("adapter.linear.linear.weight"),
                "glu_ln_w": arr("adapter.linear.norm1.weight"),
                "glu_ln_b": arr("adapter.linear.norm1.bias"),
                "glu_up_w": arr("adapter.linear.dense_h_to_4h.weight"),
                "glu_gate_w": arr("adapter.linear.gate.weight"),
                "glu_down_w": arr("adapter.linear.dense_4h_to_h.weight"),
                "boi": arr("adapter.boi"),
                "eoi": arr("adapter.eoi"),
            })
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
        return self._project(p, x)

    def _project(self, p, x):
        if self.proj_type == "ldp":
            return self._project_ldp(p, x)
        if self.proj_type == "ldpv2":
            return self._project_ldpv2(p, x)
        if self.proj_type == "adapter":
            return self._project_glm_edge(p, x)
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

    # -- MobileVLM / GLM-Edge projector graphs (llava.cpp:197-364) ------------

    @staticmethod
    def _dwconv3x3(x, w, stride: int):
        """x [B, H, W, C]; w logical (C, 1, 3, 3) depthwise kernel, pad 1."""
        C = x.shape[-1]
        k = jnp.transpose(w.reshape(C, 3, 3), (1, 2, 0))[:, :, None, :]
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    @staticmethod
    def _hardswish(x):
        return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0

    @staticmethod
    def _hardsigmoid(x):
        return jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)

    def _mb_block(self, x, blk, stride: int):
        """One MobileVLM LDP depthwise SE block over [B, H, W, C]."""
        y = self._dwconv3x3(x, blk["dw_w"], stride)
        y = layer_norm(y, blk["ln0_w"], blk["ln0_b"], self.eps)
        hw = self._hardswish(y)
        se = hw.mean(axis=(1, 2))  # global average pool [B, C]
        se = jax.nn.relu(se @ blk["fc1_w"].T + blk["fc1_b"])
        se = self._hardsigmoid(se @ blk["fc2_w"].T + blk["fc2_b"])
        y = hw * se[:, None, None, :]
        y = jnp.einsum("bhwc,dc->bhwd", y, blk["pw_w"])  # pointwise conv
        return layer_norm(y, blk["ln2_w"], blk["ln2_b"], self.eps)

    def _project_ldp(self, p, x):
        B, N, _ = x.shape
        g = int(np.sqrt(N))
        y = jax.nn.gelu(x @ p["mlp1_w"].T + p["mlp1_b"], approximate=True)
        y = y @ p["mlp3_w"].T + p["mlp3_b"]
        grid = y.reshape(B, g, g, y.shape[-1])
        grid = grid + self._mb_block(grid, p["mb1"], 1)  # residual block
        grid = self._mb_block(grid, p["mb2"], 2)  # stride-2, no residual
        return grid.reshape(B, (g // 2) * (g // 2), grid.shape[-1])

    def _project_ldpv2(self, p, x):
        B, N, _ = x.shape
        g = int(np.sqrt(N))
        y = jax.nn.gelu(x @ p["mlp0_w"].T + p["mlp0_b"], approximate=True)
        y = y @ p["mlp2_w"].T + p["mlp2_b"]
        grid = y.reshape(B, g, g, y.shape[-1])
        pooled = grid.reshape(B, g // 2, 2, g // 2, 2, -1).mean(axis=(2, 4))
        peg = self._dwconv3x3(pooled, p["peg_w"], 1) + p["peg_b"]
        out = peg + pooled
        return out.reshape(B, (g // 2) * (g // 2), out.shape[-1])

    def _project_glm_edge(self, p, x):
        B, N, C = x.shape
        g = int(np.sqrt(N))
        grid = x.reshape(B, g, g, C)
        kw = p["conv_w"]  # logical (C_out, C_in, 2, 2)
        k = jnp.transpose(kw, (2, 3, 1, 0))  # HWIO
        y = jax.lax.conv_general_dilated(
            grid, k, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(B, (g // 2) * (g // 2), -1) + p["conv_b"]
        h = y @ p["glu_lin_w"].T
        h = layer_norm(h, p["glu_ln_w"], p["glu_ln_b"], self.eps)
        h = jax.nn.gelu(h, approximate=True)
        gate = jax.nn.silu(h @ p["glu_gate_w"].T)
        up = h @ p["glu_up_w"].T
        h = (gate * up) @ p["glu_down_w"].T
        boi = jnp.broadcast_to(p["boi"].reshape(1, 1, -1),
                               (B, 1, h.shape[-1]))
        eoi = jnp.broadcast_to(p["eoi"].reshape(1, 1, -1),
                               (B, 1, h.shape[-1]))
        return jnp.concatenate([boi, h, eoi], axis=1)

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
