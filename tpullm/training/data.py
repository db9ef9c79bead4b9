"""Training dataset: tokenized windows with shuffle/batch/eval-split.

Role of the reference's ggml_opt_dataset (ggml/include/ggml-opt.h:39
ggml_opt_dataset_init / _shuffle / _get_batch): a corpus becomes ndata
fixed-length datapoints; training runs on the FRONT of the dataset and
evaluation on the BACK (ggml_opt_epoch's idata_split contract,
ggml-opt.h:219), with only the training subsection shuffled each epoch.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Dataset:
    """ndata fixed-length token windows, [ndata, seq_len] int32.

    For causal-LM training each window is both data and label (the loss
    shifts by one inside loss_fn), matching the reference finetune's
    ubatch layout (examples/training/finetune.cpp)."""

    windows: np.ndarray  # [ndata, seq_len] int32

    @property
    def ndata(self) -> int:
        return int(self.windows.shape[0])

    @property
    def seq_len(self) -> int:
        return int(self.windows.shape[1])

    @classmethod
    def from_tokens(cls, tokens, seq_len: int, stride: int | None = None
                    ) -> "Dataset":
        """Slice one long token stream into [ndata, seq_len] windows
        (stride defaults to seq_len = non-overlapping, ≡ finetune.cpp's
        n_ctx-sized ubatches)."""
        toks = np.asarray(tokens, np.int32).reshape(-1)
        stride = stride or seq_len
        if len(toks) < seq_len:
            raise ValueError(
                f"corpus has {len(toks)} tokens < seq_len {seq_len}")
        starts = range(0, len(toks) - seq_len + 1, stride)
        return cls(np.stack([toks[s:s + seq_len] for s in starts]))

    @classmethod
    def from_text(cls, tokenizer, text: str, seq_len: int,
                  stride: int | None = None) -> "Dataset":
        return cls.from_tokens(
            tokenizer.tokenize(text, add_special=True), seq_len, stride)

    def split(self, val_split: float) -> tuple["Dataset", "Dataset"]:
        """Front = train, back = eval (≡ ggml_opt_epoch idata_split —
        deterministic, so the eval set never leaks into training across
        epochs)."""
        if not 0.0 <= val_split < 1.0:
            raise ValueError(f"val_split {val_split} outside [0, 1)")
        n_eval = int(self.ndata * val_split)
        n_train = self.ndata - n_eval
        return (Dataset(self.windows[:n_train]),
                Dataset(self.windows[n_train:]))

    def batches(self, batch_size: int, rng: np.random.Generator | None = None):
        """Yield [B, seq_len] batches; when `rng` is given the datapoints
        are shuffled first (≡ ggml_opt_dataset_shuffle on the training
        subsection). The trailing partial batch is dropped so every step
        compiles to one fixed shape."""
        order = np.arange(self.ndata)
        if rng is not None:
            rng.shuffle(order)
        for i in range(0, self.ndata - batch_size + 1, batch_size):
            yield self.windows[order[i:i + batch_size]]
