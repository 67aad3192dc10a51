"""Text pipeline: chunk packing + MLM masking — the TPU equivalents of the
reference's dataset plumbing (`run_mlm.py:253-395` tokenize + `group_texts`,
HF `DataCollatorForLanguageModeling` masking; `run_clm.py` block packing with
`labels = input_ids`).

Tokenization itself is delegated to HF tokenizers when a real corpus is used
(the drivers accept pre-tokenized caches, matching `validate_mlm_config.py`'s
pre-tokenized path map `:219-233`); for hermetic tests/smoke runs
`synthetic_token_stream` produces a deterministic corpus with a Zipfian
unigram distribution.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


def synthetic_token_stream(
    n_tokens: int, vocab_size: int, seed: int = 0, order: int = 2
) -> np.ndarray:
    """Deterministic pseudo-corpus: Zipf unigrams mixed with a repeated-ngram
    process so models have actual structure to learn/predict."""
    rs = np.random.RandomState(seed)
    ranks = np.arange(1, vocab_size + 1)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()
    base = rs.choice(vocab_size, size=n_tokens, p=probs)
    # inject repeated phrases (structure)
    phrase = rs.choice(vocab_size, size=16, p=probs)
    for s in range(0, n_tokens - 16, 97):
        if rs.rand() < 0.3:
            base[s : s + 16] = phrase
    return base.astype(np.int32)


def group_texts(tokens: np.ndarray, block_size: int) -> np.ndarray:
    """Concatenate-and-chunk (`run_mlm.py:364-377`): drop the tail remainder,
    reshape to (N, block_size)."""
    n = (len(tokens) // block_size) * block_size
    return tokens[:n].reshape(-1, block_size)


def mlm_mask_batch(
    input_ids: np.ndarray,
    vocab_size: int,
    mask_token_id: int,
    mlm_probability: float = 0.15,
    special_ids: tuple = (),
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """HF DataCollatorForLanguageModeling semantics: select `mlm_probability`
    of positions; of those 80% → [MASK], 10% → random token, 10% → unchanged;
    labels are -100 everywhere else."""
    rs = np.random.RandomState(seed)
    ids = input_ids.copy()
    labels = input_ids.copy()
    prob = rs.rand(*ids.shape)
    special = np.isin(ids, np.asarray(special_ids)) if special_ids else np.zeros_like(ids, bool)
    masked = (prob < mlm_probability) & ~special
    labels[~masked] = -100
    action = rs.rand(*ids.shape)
    ids[masked & (action < 0.8)] = mask_token_id
    rand_pos = masked & (action >= 0.8) & (action < 0.9)
    ids[rand_pos] = rs.randint(0, vocab_size, rand_pos.sum())
    return {"input_ids": ids, "labels": labels}


def mlm_batches(
    blocks: np.ndarray,
    batch_size: int,
    vocab_size: int,
    mask_token_id: int,
    mlm_probability: float = 0.15,
    seed: int = 0,
    shuffle: bool = True,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    from outeffhop_tpu import native

    idx = np.arange(len(blocks))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for s in range(0, len(idx), batch_size):
        chunk = idx[s : s + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        # native (C++) counter-based masking; bit-identical NumPy fallback
        batch = native.mlm_mask(
            blocks[chunk], mlm_probability, seed + s, mask_token_id, vocab_size
        )
        batch["attention_mask"] = np.ones_like(batch["input_ids"])
        yield batch


def clm_batches(
    blocks: np.ndarray,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """CLM packing: labels = input_ids (`run_clm.py` block packing)."""
    idx = np.arange(len(blocks))
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    for s in range(0, len(idx), batch_size):
        chunk = idx[s : s + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        ids = blocks[chunk]
        yield {
            "input_ids": ids,
            "attention_mask": np.ones_like(ids),
            "labels": ids.copy(),
        }
