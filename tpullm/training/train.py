"""Training / finetuning: loss + AdamW/SGD step over the same forward graph.

Role of the reference's ggml-opt (ggml/src/ggml-opt.cpp: cross-entropy loss +
backward graph + OPT_STEP_ADAMW) and the llama_opt_init/llama_opt_epoch API
(llama.h:1553-1555, examples/training/finetune.cpp) — here it is jax.grad +
optax over the functional forward, sharded with the same TP rules as
inference (pjit handles the backward collectives).

Training runs on dense (dequantized) weights; QLoRA-style training over
packed quant weights comes with the LoRA adapter layer.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from ..models.hparams import HParams
from ..runtime.kvcache import KVCache


@dataclass
class OptimConfig:
    """≡ ggml_opt_optimizer_params (adamw defaults per ggml-opt.h)."""

    optimizer: str = "adamw"  # adamw | sgd
    lr: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adamw":
        return optax.adamw(
            cfg.lr, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr)
    raise ValueError(cfg.optimizer)


def loss_fn(forward: Callable, hp: HParams, params, tokens: jax.Array) -> jax.Array:
    """Next-token cross-entropy over a [B, T] batch (≡ ggml_opt cross-entropy)."""
    B, T = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
    cache = KVCache.new(hp, B, T, jnp.bfloat16)
    logits, _ = forward(hp, params, tokens, positions, cache, 0)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(forward: Callable, hp: HParams, optimizer: optax.GradientTransformation):
    """Returns jitted (params, opt_state, tokens) -> (params, opt_state, loss)."""

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(forward, hp, p, tokens)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def train_epoch(
    forward: Callable,
    hp: HParams,
    params: Any,
    token_batches,
    cfg: OptimConfig | None = None,
) -> tuple[Any, list[float]]:
    """≡ ggml_opt_epoch: run optimizer steps over an iterable of [B,T] batches."""
    cfg = cfg or OptimConfig()
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    step = make_train_step(forward, hp, opt)
    losses = []
    for batch in token_batches:
        params, opt_state, loss = step(params, opt_state, jnp.asarray(batch))
        losses.append(float(loss))
    return params, losses
