"""Diffusion-LM generation (≡ examples/diffusion/diffusion-cli.cpp).

Iterative unmasking over a fixed canvas: start from
[prompt | mask×(max_length−n_input)], run the bidirectional denoiser each
step, and commit the highest-confidence masked positions per the timestep
transfer schedule until nothing is masked.

  tpullm-diffusion -m dream.gguf -p "question" --steps 64 --max-length 128
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def get_num_transfer_tokens(mask_count: int, steps: int) -> list[int]:
    """Even split of masked positions across steps (diffusion-cli.cpp)."""
    base, rem = divmod(mask_count, steps)
    return [base + (1 if i < rem else 0) for i in range(steps)]


def diffusion_generate(
    eng,
    prompt_ids: list[int],
    *,
    max_length: int = 128,
    steps: int = 32,
    mask_token_id: int | None = None,
    algorithm: str = "confidence",  # confidence | entropy | margin | random
    temperature: float = 0.0,
    shift_logits: bool | None = None,
    cfg_scale: float = 0.0,
    seed: int = 0,
    step_callback=None,
) -> list[int]:
    """Returns the generated suffix token ids (≡ diffusion_generate,
    diffusion-cli.cpp:205-430, confidence/entropy/margin/random algorithms)."""
    import jax.numpy as jnp

    md = eng.reader.metadata
    if mask_token_id is None:
        mask_token_id = int(md.get("tokenizer.ggml.mask_token_id", -1))
        if mask_token_id < 0:
            raise ValueError("model has no tokenizer.ggml.mask_token_id")
    if shift_logits is None:
        # dream predicts position i from logits at i-1 (causal-pretrained)
        shift_logits = eng.hp.arch == "dream"

    rng = np.random.default_rng(seed)
    n_input = len(prompt_ids)
    if n_input >= max_length:
        raise ValueError("prompt longer than max_length")
    canvas = np.full(max_length, mask_token_id, dtype=np.int32)
    canvas[:n_input] = prompt_ids

    positions = jnp.asarray(np.arange(max_length)[None])
    spec = eng.arch

    import functools

    import jax

    @functools.partial(jax.jit)
    def step_fn(params, toks):
        logits, _ = spec.forward(eng.hp, params, toks, positions, eng.cache, 0)
        return logits

    transfer = get_num_transfer_tokens(max_length - n_input, steps)
    for step in range(steps):
        mask_pos = np.nonzero(canvas == mask_token_id)[0]
        if len(mask_pos) == 0:
            break
        if step_callback is not None:
            step_callback(step, steps, canvas.copy())
        logits = np.asarray(step_fn(eng.params, jnp.asarray(canvas[None])))[0]
        if cfg_scale > 0.0:
            un = canvas.copy()
            un[:n_input] = mask_token_id
            un_logits = np.asarray(step_fn(eng.params, jnp.asarray(un[None])))[0]
            logits = un_logits + (cfg_scale + 1.0) * (logits - un_logits)

        def logits_at(pos):
            return logits[pos - 1] if shift_logits else logits[pos]

        picks = np.empty(len(mask_pos), dtype=np.int64)
        conf = np.empty(len(mask_pos), dtype=np.float64)
        for j, pos in enumerate(mask_pos):
            lg = logits_at(pos).astype(np.float64)
            if temperature > 0.0:
                # gumbel trick (add_gumbel_noise)
                noise = np.maximum(rng.uniform(size=lg.shape), 1e-20)
                scores = np.exp(lg) / np.power(-np.log(noise), temperature)
                tok = int(np.argmax(scores))
            else:
                tok = int(np.argmax(lg))
            picks[j] = tok
            p = np.exp(lg - lg.max())
            p /= p.sum()
            if algorithm == "entropy":
                conf[j] = (p * np.log(p + 1e-10)).sum()  # −entropy, larger=confident
            elif algorithm == "margin":
                top2 = np.partition(p, -2)[-2:]
                conf[j] = top2[1] - top2[0]
            elif algorithm == "random":
                conf[j] = rng.uniform()
            else:  # confidence
                conf[j] = p[tok]
        n_commit = min(transfer[step], len(mask_pos))
        order = np.argsort(-conf, kind="stable")[:n_commit]
        canvas[mask_pos[order]] = picks[order]

    # any stragglers: commit greedily from the final logits
    mask_pos = np.nonzero(canvas == mask_token_id)[0]
    if len(mask_pos):
        logits = np.asarray(step_fn(eng.params, jnp.asarray(canvas[None])))[0]
        for pos in mask_pos:
            canvas[pos] = int(np.argmax(
                logits[pos - 1] if shift_logits else logits[pos]))
    return canvas[n_input:].tolist()


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpullm-diffusion", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", required=True)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--algorithm", default="confidence",
                    choices=["confidence", "entropy", "margin", "random"])
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--cfg-scale", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--visual", action="store_true",
                    help="print the canvas each step")
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine

    eng = Engine(args.model)
    ids = eng.tokenizer.tokenize(args.prompt, add_special=True)

    def cb(step, total, canvas):
        if args.visual:
            txt = eng.tokenizer.detokenize(
                [t for t in canvas[len(ids):] if t != canvas[-1]])
            print(f"[{step}/{total}] {txt!r}", file=sys.stderr)

    out = diffusion_generate(
        eng, ids, max_length=args.max_length, steps=args.steps,
        algorithm=args.algorithm, temperature=args.temp,
        cfg_scale=args.cfg_scale, seed=args.seed,
        step_callback=cb if args.visual else None,
    )
    print(eng.tokenizer.detokenize(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
