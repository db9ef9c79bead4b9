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
import numpy as np
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


# eval steps shared across evaluate() calls (an epoch loop calling
# evaluate() per epoch must not re-jit — the compile is minutes on a real
# TPU model); keyed like runtime/engine._STEP_CACHE
_EVAL_STEP_CACHE: dict = {}


def make_eval_step(forward: Callable, hp: HParams):
    """Jitted (params, tokens) -> (sum_nll, n_correct, n) — the
    loss+accuracy accumulators of ggml_opt_result (ggml-opt.h result
    getters: ggml_opt_result_loss / _accuracy)."""
    key = (forward, repr(hp))
    cached = _EVAL_STEP_CACHE.get(key)
    if cached is not None:
        return cached

    @jax.jit
    def eval_step(params, tokens):
        B, T = tokens.shape
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        cache = KVCache.new(hp, B, T, jnp.bfloat16)
        logits, _ = forward(hp, params, tokens, positions, cache, 0)
        lg = logits[:, :-1].astype(jnp.float32)
        tgt = tokens[:, 1:]
        logp = jax.nn.log_softmax(lg, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        correct = (jnp.argmax(lg, axis=-1) == tgt).sum()
        return nll.sum(), correct, nll.size

    _EVAL_STEP_CACHE[key] = eval_step
    return eval_step


def evaluate(forward: Callable, hp: HParams, params, batches) -> dict:
    """Mean next-token loss + argmax accuracy over an iterable of [B, T]
    batches (≡ running ggml_opt_epoch with result_eval only)."""
    step = make_eval_step(forward, hp)
    s_nll, s_ok, n = 0.0, 0, 0
    for batch in batches:
        nll, ok, k = step(params, jnp.asarray(batch))
        s_nll += float(nll)
        s_ok += int(ok)
        n += int(k)
    if n == 0:
        return {"loss": float("nan"), "accuracy": float("nan"), "n": 0}
    return {"loss": s_nll / n, "accuracy": s_ok / n, "n": n}


def fit(
    forward: Callable,
    hp: HParams,
    params: Any,
    dataset,
    *,
    cfg: OptimConfig | None = None,
    epochs: int = 1,
    batch_size: int = 1,
    val_split: float = 0.0,
    seed: int = 0,
    callback: Callable | None = None,
    trainable: Callable | None = None,
) -> tuple[Any, list[dict]]:
    """One-call training loop (≡ ggml_opt_fit, ggml-opt.h:239): split the
    dataset front/back into train/eval, run `epochs` epochs of optimizer
    steps over shuffled train batches, evaluate after each epoch, invoke
    `callback(epoch_stats)` per epoch (≡ ggml_opt_epoch_callback).

    `trainable(path_key_tuple, leaf) -> bool` masks which leaves the
    optimizer updates (≡ llama_opt_init's param filter, llama.h:1553 —
    e.g. LoRA-only or norms-only finetunes); masked leaves keep their
    loaded values exactly.

    Returns (params, history) where history[i] = {"epoch", "train_loss",
    "eval_loss", "eval_accuracy"}.
    """
    cfg = cfg or OptimConfig()
    opt = make_optimizer(cfg)
    if trainable is not None:
        # multi_transform + set_to_zero freezes masked-out leaves exactly
        # (optax.masked would pass their RAW grads through as updates)
        labels = jax.tree_util.tree_map_with_path(
            lambda path, leaf: "train" if trainable(path, leaf)
            else "freeze", params)
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)
    step = make_train_step(forward, hp, opt)
    train_ds, eval_ds = dataset.split(val_split)
    if train_ds.ndata < batch_size:
        raise ValueError(
            f"train split has {train_ds.ndata} windows < batch_size "
            f"{batch_size} — zero optimizer steps would run (shrink "
            "--batch / --seq-len / --val-split, or grow the corpus)")
    rng = np.random.default_rng(seed)
    history: list[dict] = []
    for epoch in range(epochs):
        losses = []
        for batch in train_ds.batches(batch_size, rng=rng):
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(batch))
            losses.append(float(loss))
        stats = {
            "epoch": epoch,
            "train_loss": sum(losses) / max(len(losses), 1),
            "train_batches": len(losses),
        }
        if eval_ds.ndata > 0:
            # an explicit --val-split must always yield eval stats: shrink
            # the eval batch rather than silently skipping when the split
            # has fewer windows than batch_size
            eval_bs = min(batch_size, eval_ds.ndata)
            if eval_bs < batch_size and epoch == 0:
                import logging

                logging.getLogger(__name__).warning(
                    "eval split has %d windows < batch_size %d — "
                    "evaluating with batch %d",
                    eval_ds.ndata, batch_size, eval_bs)
            ev = evaluate(forward, hp, params,
                          eval_ds.batches(eval_bs))
            stats["eval_loss"] = ev["loss"]
            stats["eval_accuracy"] = ev["accuracy"]
        history.append(stats)
        if callback is not None:
            callback(stats)
    return params, history
