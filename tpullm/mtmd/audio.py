"""Whisper-style audio encoder + mel preprocessing (mtmd audio modality).

Reference: tools/mtmd/mtmd-audio.cpp (log-mel spectrogram: 400-pt FFT,
hop 160, slaney mel filterbank, log10 → clamp(max−8) → (x+4)/4) and
tools/mtmd/models/whisper-enc.cpp (conv1d ×2 + gelu_erf → pos embd →
pre-norm transformer → qwen2a fc / ultravox stacked-swiglu projector).
mmproj tensor names: a.conv1d.{1,2}.*, a.position_embd.weight, a.blk.N.*,
a.post_ln.*, mm.a.fc.* / mm.a.mlp.{1,2}.weight + mm.a.norm_{pre,mid}.weight.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFReader
from ..ops.norms import layer_norm, rms_norm

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_FRAMES = 3000  # encoder accepts at most 30 s of mel frames per call


def mel_filterbank(n_mel: int, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale triangular filters [n_mel, n_fft//2+1]
    (≡ fill_mel_filterbank_matrix; matches librosa defaults)."""
    fmin, fmax = 0.0, 0.5 * sample_rate
    min_log_hz = 1000.0
    lin_slope = 3 / 200.0
    min_log_mel = min_log_hz * lin_slope
    log_step = np.log(6.4) / 27.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        return np.where(f < min_log_hz, f * lin_slope,
                        min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                        / log_step)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        return np.where(m < min_log_mel, m / lin_slope,
                        min_log_hz * np.exp((m - min_log_mel) * log_step))

    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mel + 2)
    hz = mel_to_hz(mel_pts)
    n_bins = n_fft // 2 + 1
    f = np.arange(n_bins) * (sample_rate / n_fft)

    left, center, right = hz[:-2, None], hz[1:-1, None], hz[2:, None]
    up = (f - left) / np.maximum(center - left, 1e-30)
    down = (right - f) / np.maximum(right - center, 1e-30)
    w = np.maximum(0.0, np.minimum(up, down))
    return w.astype(np.float32)  # slaney_area_norm off, scale 1 (whisper)


def log_mel_spectrogram(samples: np.ndarray, n_mel: int,
                        chunk_len_s: int = 30) -> np.ndarray:
    """f32 mono 16 kHz samples → whisper log-mel [n_mel, n_frames]
    (≡ mtmd_audio_preprocessor_whisper::preprocess, single chunk set)."""
    samples = np.asarray(samples, dtype=np.float32).reshape(-1)
    min_samples = SAMPLE_RATE * (chunk_len_s + 1)  # +1 s silence margin
    if samples.size < min_samples:
        samples = np.pad(samples, (0, min_samples - samples.size))
    n_samples = samples.size

    # periodic hann window (length 400, denominator N)
    n = np.arange(N_FFT)
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / N_FFT))

    n_len = n_samples // HOP
    n_computed = min(n_samples // HOP + 1, n_len)
    # frame the signal: rows of 400 samples at hop 160 (zero-padded tail)
    padded = np.pad(samples, (0, N_FFT))
    idx = np.arange(n_computed)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = padded[idx] * hann  # [n_computed, 400]
    spec = np.fft.rfft(frames, n=N_FFT, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2)  # [n_computed, 201]

    filters = mel_filterbank(n_mel)
    mel = power @ filters.T  # [n_computed, n_mel]
    out = np.full((n_len, n_mel), np.log10(1e-10))
    out[:n_computed] = np.log10(np.maximum(mel, 1e-10))

    # clamp to global max − 8 and normalize (whisper convention)
    mmax = out.max() - 8.0
    out = (np.maximum(out, mmax) + 4.0) / 4.0
    return out.T.astype(np.float32)  # [n_mel, n_len]


def chunk_mel(mel: np.ndarray) -> list[np.ndarray]:
    """Split [n_mel, n_len] into ≤3000-frame chunks (clip.cpp graph limit)."""
    return [mel[:, off:off + CHUNK_FRAMES]
            for off in range(0, mel.shape[1], CHUNK_FRAMES)]


class WhisperAudioEncoder:
    """Audio tower of an mmproj GGUF (clip.has_audio_encoder)."""

    def __init__(self, path_or_reader, dtype=jnp.float32):
        r = (path_or_reader if isinstance(path_or_reader, GGUFReader)
             else GGUFReader(path_or_reader))
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.audio.{k}", d)
        self.n_mel = int(g("num_mel_bins", 128))
        self.n_embd = int(g("embedding_length", 768))
        self.n_ff = int(g("feed_forward_length", 3072))
        self.n_layer = int(g("block_count", 4))
        self.n_head = int(g("attention.head_count", 8))
        self.eps = float(g("attention.layer_norm_epsilon", 1e-5))
        self.proj_type = str(md.get("clip.projector_type", "qwen2a"))
        self.stack_factor = int(g("projector.stack_factor", 8))
        # qwen2.5-omni: attention windows of n_window post-conv frames,
        # positions restarting per window (Qwen2_5OmniAudioEncoder)
        self.n_window = int(g("window_size", 100))

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        def maybe(name, d=dtype):
            return arr(name, d) if name in t else None

        self.params = {
            # conv1d kernels logical [out, in, k]
            "conv1_w": arr("a.conv1d.1.weight"),
            "conv1_b": arr("a.conv1d.1.bias"),
            "conv2_w": arr("a.conv1d.2.weight"),
            "conv2_b": arr("a.conv1d.2.bias"),
            "pos_embd": arr("a.position_embd.weight"),
            "post_ln_w": maybe("a.post_ln.weight"),
            "post_ln_b": maybe("a.post_ln.bias"),
            "layers": [],
            # qwen2a projector
            "fc_w": maybe("mm.a.fc.weight"),
            "fc_b": maybe("mm.a.fc.bias"),
            # ultravox / voxtral / music-flamingo / glma projector MLPs
            "mlp1_w": maybe("mm.a.mlp.1.weight"),
            "mlp1_b": maybe("mm.a.mlp.1.bias"),
            "mlp2_w": maybe("mm.a.mlp.2.weight"),
            "mlp2_b": maybe("mm.a.mlp.2.bias"),
            "norm_pre_w": maybe("mm.a.norm_pre.weight"),
            "norm_pre_b": maybe("mm.a.norm_pre.bias"),
            "norm_mid_w": maybe("mm.a.norm_mid.weight"),
            # glma (GLM-4-Voice adapter) audio BOI/EOI marker embeddings
            "boi": maybe("v.boi"),
            "eoi": maybe("v.eoi"),
        }
        for i in range(self.n_layer):
            p = f"a.blk.{i}."
            self.params["layers"].append({
                "ln1_w": arr(p + "ln1.weight"), "ln1_b": arr(p + "ln1.bias"),
                "wq": arr(p + "attn_q.weight"), "bq": arr(p + "attn_q.bias"),
                "wk": arr(p + "attn_k.weight"),  # whisper: no k bias
                "wv": arr(p + "attn_v.weight"), "bv": arr(p + "attn_v.bias"),
                "wo": arr(p + "attn_out.weight"), "bo": maybe(p + "attn_out.bias"),
                "ln2_w": arr(p + "ln2.weight"), "ln2_b": arr(p + "ln2.bias"),
                "up_w": arr(p + "ffn_up.weight"), "up_b": maybe(p + "ffn_up.bias"),
                "down_w": arr(p + "ffn_down.weight"),
                "down_b": maybe(p + "ffn_down.bias"),
            })
        self._encode = jax.jit(
            self._forward_omni if self.proj_type == "qwen2.5o"
            else self._forward)

    # -- graph ------------------------------------------------------------------

    def _conv1d(self, x, w, b, stride):
        """x [C_in, T], w [C_out, C_in, 3], pad 1 → [C_out, T'/stride]."""
        out = jax.lax.conv_general_dilated(
            x[None], w, window_strides=(stride,), padding=[(1, 1)],
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[0]
        return out + b[:, None]

    def _blocks(self, x, mask=None):
        """Pre-norm whisper encoder layers over [n_pos, E]; `mask` [T, T]
        additive (block-diagonal for qwen2.5-omni attention windows)."""
        p = self.params
        n_pos = x.shape[0]
        hd = self.n_embd // self.n_head
        for lyr in p["layers"]:
            h = layer_norm(x, lyr["ln1_w"], lyr["ln1_b"], self.eps)
            q = (h @ lyr["wq"].T + lyr["bq"]).reshape(n_pos, self.n_head, hd)
            k = (h @ lyr["wk"].T).reshape(n_pos, self.n_head, hd)
            v = (h @ lyr["wv"].T + lyr["bv"]).reshape(n_pos, self.n_head, hd)
            scores = jnp.einsum("thd,shd->hts", q, k) * (hd ** -0.5)
            if mask is not None:
                scores = scores + mask[None]
            probs = jax.nn.softmax(scores, axis=-1)  # bidirectional
            attn = jnp.einsum("hts,shd->thd", probs, v).reshape(n_pos, self.n_embd)
            attn = attn @ lyr["wo"].T
            if lyr["bo"] is not None:
                attn = attn + lyr["bo"]
            x = x + attn

            h = layer_norm(x, lyr["ln2_w"], lyr["ln2_b"], self.eps)
            up = h @ lyr["up_w"].T
            if lyr["up_b"] is not None:
                up = up + lyr["up_b"]
            act = jax.nn.gelu(up, approximate=False)  # whisper: gelu_erf
            down = act @ lyr["down_w"].T
            if lyr["down_b"] is not None:
                down = down + lyr["down_b"]
            x = x + down
        return x

    def _forward_omni(self, mel: jax.Array) -> jax.Array:
        """qwen2.5-omni audio: the mel splits into windows of 2·n_window
        frames — each conv'd with positions restarting at 0 and attending
        only within itself (Qwen2_5OmniAudioEncoder cu_seqlens) — then
        stride-2 avg pool → ln_post → fc over the whole sequence."""
        p = self.params
        nw2 = 2 * self.n_window
        L = mel.shape[1]
        xs, win = [], []
        for ci, off in enumerate(range(0, L, nw2)):
            c = mel[:, off:off + nw2]
            x = self._conv1d(c, p["conv1_w"], p["conv1_b"], 1)
            x = jax.nn.gelu(x, approximate=False)
            x = self._conv1d(x, p["conv2_w"], p["conv2_b"], 2)
            x = jax.nn.gelu(x, approximate=False)
            x = x.T
            x = x + p["pos_embd"][: x.shape[0]]
            xs.append(x)
            win.append(np.full(x.shape[0], ci))
        x = jnp.concatenate(xs, axis=0)
        wid = jnp.asarray(np.concatenate(win))
        mask = jnp.where(wid[:, None] == wid[None, :], 0.0, -jnp.inf)
        x = self._blocks(x, mask)
        T2 = (x.shape[0] // 2) * 2
        x = x[:T2].reshape(T2 // 2, 2, -1).mean(axis=1)
        x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)
        y = x @ p["fc_w"].T
        if p["fc_b"] is not None:
            y = y + p["fc_b"]
        return y

    def _forward(self, mel: jax.Array) -> jax.Array:
        """mel [n_mel, n_frames] → projected audio embeddings [n_tok, E_llm]."""
        p = self.params
        x = self._conv1d(mel, p["conv1_w"], p["conv1_b"], 1)
        x = jax.nn.gelu(x, approximate=False)
        x = self._conv1d(x, p["conv2_w"], p["conv2_b"], 2)
        x = jax.nn.gelu(x, approximate=False)
        x = x.T  # [n_pos, E]
        x = x + p["pos_embd"][: x.shape[0]]
        x = self._blocks(x)

        if self.proj_type in ("qwen2a", "music_flamingo"):
            # stride-2 avg pool over time BEFORE the post layernorm
            # (≡ clip.cpp audio_has_avgpool / HF avg_pooler;
            # odd trailing frame drops, AvgPool1d floor semantics)
            T2 = (x.shape[0] // 2) * 2
            x = x[:T2].reshape(T2 // 2, 2, -1).mean(axis=1)

        if p["post_ln_w"] is not None:
            x = layer_norm(x, p["post_ln_w"], p["post_ln_b"], self.eps)

        if self.proj_type == "ultravox":
            # StackAudioFrames: concat stack_factor consecutive frames
            sf = self.stack_factor
            pad = (-x.shape[0]) % sf
            x = jnp.pad(x, ((0, pad), (0, 0)))
            x = x.reshape(x.shape[0] // sf, sf * self.n_embd)
            x = rms_norm(x, p["norm_pre_w"], 1e-6)
            y = x @ p["mlp1_w"].T
            # swiglu with swapped halves: silu(second half) * first half
            a, b = jnp.split(y, 2, axis=-1)
            y = a * jax.nn.silu(b)
            y = rms_norm(y, p["norm_mid_w"], 1e-6)
            return y @ p["mlp2_w"].T
        if self.proj_type == "music_flamingo":
            # Music-Flamingo (whisper-enc.cpp PROJECTOR_TYPE_MUSIC_FLAMINGO):
            # avg-pooled frames through a biased 2-layer GELU-erf MLP
            y = x @ p["mlp1_w"].T
            if p["mlp1_b"] is not None:
                y = y + p["mlp1_b"]
            y = jax.nn.gelu(y, approximate=False)
            y = y @ p["mlp2_w"].T
            if p["mlp2_b"] is not None:
                y = y + p["mlp2_b"]
            return y
        if self.proj_type == "glma":
            # GLM audio adapter (whisper-enc.cpp PROJECTOR_TYPE_GLMA):
            # LayerNorm → StackAudioFrames → biased GELU-erf MLP → BOI/EOI
            x = layer_norm(x, p["norm_pre_w"], p["norm_pre_b"], self.eps)
            sf = self.stack_factor
            pad = (-x.shape[0]) % sf
            x = jnp.pad(x, ((0, pad), (0, 0)))
            x = x.reshape(x.shape[0] // sf, sf * self.n_embd)
            y = x @ p["mlp1_w"].T
            if p["mlp1_b"] is not None:
                y = y + p["mlp1_b"]
            y = jax.nn.gelu(y, approximate=False)
            y = y @ p["mlp2_w"].T
            if p["mlp2_b"] is not None:
                y = y + p["mlp2_b"]
            boi = p["boi"].reshape(1, -1)
            eoi = p["eoi"].reshape(1, -1)
            return jnp.concatenate([boi, y, eoi], axis=0)
        if self.proj_type == "voxtral":
            # stack sf frames then a 2-layer GELU-erf MLP (no norms/biases;
            # HF VoxtralEncoder applies NO avg pool — the projector input is
            # the raw conv-downsampled frames reshaped by intermediate/d_model)
            sf = self.stack_factor
            pad = (-x.shape[0]) % sf
            x = jnp.pad(x, ((0, pad), (0, 0)))
            x = x.reshape(x.shape[0] // sf, sf * self.n_embd)
            y = jax.nn.gelu(x @ p["mlp1_w"].T, approximate=False)
            return y @ p["mlp2_w"].T
        # qwen2a: single fc
        y = x @ p["fc_w"].T
        if p["fc_b"] is not None:
            y = y + p["fc_b"]
        return y

    # -- API --------------------------------------------------------------------

    def encode_mel(self, mel: np.ndarray) -> np.ndarray:
        return np.asarray(self._encode(jnp.asarray(mel, jnp.float32)))

    def encode_audio(self, samples: np.ndarray) -> np.ndarray:
        """16 kHz mono f32 samples → [n_tok, E_llm] across all 30 s chunks."""
        mel = log_mel_spectrogram(samples, self.n_mel)
        return np.concatenate([self.encode_mel(c) for c in chunk_mel(mel)])


def load_wav(path: str) -> np.ndarray:
    """PCM wav → mono f32 samples at 16 kHz (linear resample if needed)."""
    import wave

    with wave.open(path, "rb") as f:
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported wav sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    if rate != SAMPLE_RATE:
        n_out = int(round(x.size * SAMPLE_RATE / rate))
        x = np.interp(
            np.linspace(0.0, x.size - 1, n_out), np.arange(x.size), x
        ).astype(np.float32)
    return x


class ConformerAudioEncoder:
    """LFM2-Audio conformer encoder (tools/mtmd/models/conformer.cpp,
    PROJECTOR_TYPE_LFM2A): conv2d subsampling (×8 in time), NeMo-style
    conformer blocks — macaron half-FFNs (·0.5), relative-position
    self-attention with pos_bias_u/v and the Transformer-XL rel-shift, a
    GLU → depthwise-conv(k) → batchnorm-affine → silu → pointwise conv
    module — then an audio adapter (LayerNorm → GELU-erf MLP).

    Tensor names ≡ clip.cpp PROJECTOR_TYPE_LFM2A: a.conv1d.{0,2,3,5,6}.*,
    a.pre_encode.out.*, a.blk.N.{ffn_norm,ffn_up,ffn_down,ln1,attn_q/k/v/
    out,pos_bias_u,pos_bias_v,linear_pos,norm_conv,conv_pw1,conv_dw,
    conv_norm,conv_pw2,ffn_norm_1,ffn_up_1,ffn_down_1,ln2}.*, and the
    mm.a.mlp.{0,1,3} adapter."""

    def __init__(self, path_or_reader, dtype=jnp.float32):
        r = (path_or_reader if isinstance(path_or_reader, GGUFReader)
             else GGUFReader(path_or_reader))
        self.reader = r
        md = r.metadata
        g = lambda k, d=None: md.get(f"clip.audio.{k}", d)
        self.n_mel = int(g("num_mel_bins", 128))
        self.n_embd = int(g("embedding_length", 512))
        self.n_layer = int(g("block_count", 16))
        self.n_head = int(g("attention.head_count", 8))
        self.eps = 1e-5  # conformer.cpp hardcodes 1e-5 in every build_norm

        t = r.tensors

        def arr(name, d=dtype):
            return jnp.asarray(t[name].to_numpy(), dtype=d)

        self.params = {
            "pre": {i: (arr(f"a.conv1d.{i}.weight"),
                        arr(f"a.conv1d.{i}.bias"))
                    for i in (0, 2, 3, 5, 6)},
            "out_w": arr("a.pre_encode.out.weight"),
            "out_b": arr("a.pre_encode.out.bias"),
            "mm0_w": arr("mm.a.mlp.0.weight"), "mm0_b": arr("mm.a.mlp.0.bias"),
            "mm1_w": arr("mm.a.mlp.1.weight"), "mm1_b": arr("mm.a.mlp.1.bias"),
            "mm3_w": arr("mm.a.mlp.3.weight"), "mm3_b": arr("mm.a.mlp.3.bias"),
            "layers": [],
        }
        for i in range(self.n_layer):
            p = f"a.blk.{i}."
            names = {
                "ffn_norm": "ffn_norm", "ffn_up": "ffn_up",
                "ffn_down": "ffn_down", "ln1": "ln1", "wq": "attn_q",
                "wk": "attn_k", "wv": "attn_v", "wo": "attn_out",
                "norm_conv": "norm_conv", "conv_pw1": "conv_pw1",
                "conv_dw": "conv_dw", "conv_norm": "conv_norm",
                "conv_pw2": "conv_pw2", "ffn_norm_1": "ffn_norm_1",
                "ffn_up_1": "ffn_up_1", "ffn_down_1": "ffn_down_1",
                "ln2": "ln2",
            }
            lyr = {}
            for key, nm in names.items():
                lyr[key + "_w"] = arr(p + nm + ".weight")
                lyr[key + "_b"] = arr(p + nm + ".bias")
            lyr["pos_bias_u"] = arr(p + "pos_bias_u")
            lyr["pos_bias_v"] = arr(p + "pos_bias_v")
            lyr["linear_pos_w"] = arr(p + "linear_pos.weight")
            self.params["layers"].append(lyr)
        self._jit_cache: dict = {}

    # -- pre-encode conv subsampling -------------------------------------------

    @staticmethod
    def _conv2d(x, w, b, stride, pad, groups=1):
        """x [1, H, W, C]; w logical (O, I/groups, kh, kw)."""
        k = jnp.transpose(w, (2, 3, 1, 0))  # HWIO
        y = jax.lax.conv_general_dilated(
            x, k, window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups)
        return y + b

    def _pre_encode(self, mel):
        """mel [n_mel, T] → [T', d_model] (T' = T subsampled ×8)."""
        p = self.params
        # image layout: H = time, W = mel bins, 1 channel
        x = mel.T[None, :, :, None]
        w0, b0 = p["pre"][0]
        x = jax.nn.relu(self._conv2d(x, w0, b0, 2, 1))
        C = x.shape[-1]
        w2, b2 = p["pre"][2]
        x = self._conv2d(x, w2.reshape(C, 1, 3, 3), b2, 2, 1, groups=C)
        w3, b3 = p["pre"][3]
        x = jax.nn.relu(self._conv2d(x, w3, b3, 1, 0))
        C = x.shape[-1]
        w5, b5 = p["pre"][5]
        x = self._conv2d(x, w5.reshape(C, 1, 3, 3), b5, 2, 1, groups=C)
        w6, b6 = p["pre"][6]
        x = jax.nn.relu(self._conv2d(x, w6, b6, 1, 0))
        # flatten (freq, channel) with freq fastest (ggml reshape of
        # ne (W', C, H')): [1, T', W', C] → [T', C·W']
        _, Tq, Wq, Cq = x.shape
        feats = x[0].transpose(0, 2, 1).reshape(Tq, Cq * Wq)
        return feats @ p["out_w"].T + p["out_b"]

    # -- conformer blocks -------------------------------------------------------

    @staticmethod
    def _rel_shift(bd, k_len):
        """Transformer-XL relative shift (conformer.cpp rel-shift block);
        bd [h, q, p] → [h, q, k_len]."""
        h, q, p = bd.shape
        b = jnp.pad(bd, ((0, 0), (0, 0), (0, 1)))
        b = jnp.roll(b, 1, axis=2)
        b = b.reshape(h, p + 1, q)[:, 1:, :]
        b = b.reshape(h, q, p)
        return b[:, :, :k_len]

    def _pos_emb(self, L: int) -> np.ndarray:
        """Sinusoidal relative positions [2L−1, d_model], interleaved
        sin/cos at angle (L − pos − 1)·inv_freq (clip.cpp LFM2A input)."""
        d = self.n_embd
        inv = np.exp(-(np.log(10000.0) / d) * 2.0 * np.arange(d // 2))
        pos = np.arange(2 * L - 1)[:, None]
        ang = (L - pos - 1) * inv[None, :]
        out = np.empty((2 * L - 1, d), np.float32)
        out[:, 0::2] = np.sin(ang)
        out[:, 1::2] = np.cos(ang)
        return out

    def _forward(self, p, feats, pos_emb):
        ln = lambda x, w, b: layer_norm(x, w, b, self.eps)
        H = self.n_head
        C = self.n_embd
        hd = C // H
        x = feats
        T = x.shape[0]
        for lyr in p["layers"]:
            # macaron FFN 1 (silu, ·0.5)
            h = ln(x, lyr["ffn_norm_w"], lyr["ffn_norm_b"])
            h = jax.nn.silu(h @ lyr["ffn_up_w"].T + lyr["ffn_up_b"])
            h = h @ lyr["ffn_down_w"].T + lyr["ffn_down_b"]
            x = x + 0.5 * h

            # relative-position self-attention
            h = ln(x, lyr["ln1_w"], lyr["ln1_b"])
            q = (h @ lyr["wq_w"].T + lyr["wq_b"]).reshape(T, H, hd)
            k = (h @ lyr["wk_w"].T + lyr["wk_b"]).reshape(T, H, hd)
            v = (h @ lyr["wv_w"].T + lyr["wv_b"]).reshape(T, H, hd)
            qu = (q + lyr["pos_bias_u"].reshape(H, hd)).transpose(1, 0, 2)
            qv = (q + lyr["pos_bias_v"].reshape(H, hd)).transpose(1, 0, 2)
            kt = k.transpose(1, 0, 2)
            ac = jnp.einsum("hqd,hkd->hqk", qu, kt)
            pe = (pos_emb @ lyr["linear_pos_w"].T).reshape(-1, H, hd)
            bd = jnp.einsum("hqd,hpd->hqp", qv, pe.transpose(1, 0, 2))
            bd = self._rel_shift(bd, T)
            scores = (ac + bd) / np.sqrt(hd)
            probs = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.einsum("hqk,khd->qhd", probs,
                             v).reshape(T, C)
            x = x + ctx @ lyr["wo_w"].T + lyr["wo_b"]

            # conv module
            h = ln(x, lyr["norm_conv_w"], lyr["norm_conv_b"])
            y = h @ lyr["conv_pw1_w"].T + lyr["conv_pw1_b"]
            a, gate = jnp.split(y, 2, axis=-1)
            y = a * jax.nn.sigmoid(gate)  # GLU
            dw = lyr["conv_dw_w"]
            K = int(dw.size) // C
            kern = dw.reshape(C, K)
            half = (K - 1) // 2
            ypad = jnp.pad(y, ((half, half), (0, 0)))
            idx = jnp.arange(T)[:, None] + jnp.arange(K)[None, :]
            y = jnp.einsum("tkc,ck->tc", ypad[idx], kern) + lyr["conv_dw_b"]
            y = y * lyr["conv_norm_w"] + lyr["conv_norm_b"]  # folded BN
            y = jax.nn.silu(y)
            y = y @ lyr["conv_pw2_w"].T + lyr["conv_pw2_b"]
            x = x + y

            # macaron FFN 2 (silu, ·0.5)
            h = ln(x, lyr["ffn_norm_1_w"], lyr["ffn_norm_1_b"])
            h = jax.nn.silu(h @ lyr["ffn_up_1_w"].T + lyr["ffn_up_1_b"])
            h = h @ lyr["ffn_down_1_w"].T + lyr["ffn_down_1_b"]
            x = x + 0.5 * h

            x = ln(x, lyr["ln2_w"], lyr["ln2_b"])  # norm_out

        # audio adapter: LayerNorm → GELU-erf MLP
        x = ln(x, p["mm0_w"], p["mm0_b"])
        x = jax.nn.gelu(x @ p["mm1_w"].T + p["mm1_b"], approximate=False)
        return x @ p["mm3_w"].T + p["mm3_b"]

    # -- API --------------------------------------------------------------------

    def encode_mel(self, mel: np.ndarray) -> np.ndarray:
        mel = np.asarray(mel, np.float32)
        feats = self._pre_encode(jnp.asarray(mel))
        L = int(feats.shape[0])
        fn = self._jit_cache.get(L)
        if fn is None:
            fn = jax.jit(self._forward)
            self._jit_cache[L] = fn
        pos = jnp.asarray(self._pos_emb(L))
        return np.asarray(fn(self.params, feats, pos))

    def encode_audio(self, samples: np.ndarray) -> np.ndarray:
        mel = log_mel_spectrogram(samples, self.n_mel, chunk_len_s=1)
        return self.encode_mel(mel)
