"""Real-corpus ingestion: HF datasets/tokenizer → tokenize → group_texts →
on-disk cache, in the reference's exact layout.

Reference: `/root/reference/OutEffHop/run_mlm.py:253-395` — dataset setups
(`transformers_language/dataset_setups.py`: wikitext_2 / wikitext_103 /
bookcorpus_and_wiki), the `tokenized_book_wiki_{seqlen}` load_from_disk cache,
`train[:N%]` subset splits, tokenize with `return_special_tokens_mask=True`,
and the concatenate-then-chunk `group_texts` (:364-377; small remainder per
map batch dropped, exactly as upstream).

This sandbox has no network egress, so everything here is import-guarded and
exercised in tests through a tiny in-memory corpus via `tokenize_and_group`
(the pure function the HF path feeds); the `load_corpus` entry point is the
parity surface for runs outside the sandbox. The produced arrays feed
`data/text.py:mlm_batches/clm_batches` (and the 52x native C++ masking path).
"""

from __future__ import annotations

import os
from itertools import chain
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

DATASET_SETUPS = ("wikitext_2", "wikitext_103", "bookcorpus_and_wiki", "synthetic")


def tokenize_and_group(
    texts: Iterable[str],
    tokenize: Callable[[List[str]], List[List[int]]],
    max_seq_length: int,
    map_batch_size: int = 1000,
) -> np.ndarray:
    """texts → token ids → concat-and-chunk blocks of `max_seq_length`.

    Reproduces the reference's two HF `.map(batched=True, batch_size=1000)`
    passes (`run_mlm.py:345-395`) including the quirk that group_texts drops a
    remainder PER MAP BATCH of 1000 texts, not one global remainder."""
    blocks: List[List[int]] = []
    batch: List[str] = []

    def flush(batch_texts):
        if not batch_texts:
            return
        ids = tokenize(batch_texts)
        concatenated = list(chain(*ids))
        total = (len(concatenated) // max_seq_length) * max_seq_length
        for i in range(0, total, max_seq_length):
            blocks.append(concatenated[i : i + max_seq_length])

    for t in texts:
        batch.append(t)
        if len(batch) >= map_batch_size:
            flush(batch)
            batch = []
    flush(batch)
    return np.asarray(blocks, dtype=np.int32)


def _hf_tokenizer(name_or_path: str):
    from transformers import AutoTokenizer  # import-guarded

    return AutoTokenizer.from_pretrained(name_or_path, use_fast=True)


def _split_expr(split: str, percentage: Optional[int]) -> str:
    return split if percentage is None else f"{split}[:{percentage}%]"


def load_corpus(
    dataset_setup: str,
    tokenizer_name: str,
    max_seq_length: int,
    data_cache_dir: str = "~/.hf_data",
    train_percentage: Optional[int] = None,
    validation_percentage: Optional[int] = None,
    preprocessing_num_workers: Optional[int] = None,
    overwrite_cache: bool = False,
) -> Dict[str, np.ndarray]:
    """Reference dataset pipeline → {'train': (N, L) int32, 'validation': ...}.

    Requires `datasets` + network access (unavailable in the hermetic
    sandbox); cached results are stored/loaded in the reference's
    `tokenized_book_wiki_{seqlen}` layout under `data_cache_dir`
    (`run_mlm.py:253-259`) as .npy block arrays.
    """
    if dataset_setup not in DATASET_SETUPS:
        raise ValueError(f"unknown dataset_setup {dataset_setup!r}; options {DATASET_SETUPS}")
    if dataset_setup == "synthetic":
        raise ValueError("synthetic corpora come from data.text.synthetic_token_stream")

    cache_dir = os.path.expanduser(data_cache_dir)
    cache = os.path.join(cache_dir, f"tokenized_book_wiki_{max_seq_length}")
    if dataset_setup != "bookcorpus_and_wiki":
        cache = os.path.join(cache_dir, f"tokenized_{dataset_setup}_{max_seq_length}")
    if not overwrite_cache and os.path.exists(os.path.join(cache, "train.npy")):
        return {
            "train": np.load(os.path.join(cache, "train.npy")),
            "validation": np.load(os.path.join(cache, "validation.npy")),
        }

    try:
        from datasets import load_dataset  # import-guarded: needs egress
    except ImportError as e:  # pragma: no cover - sandbox has no datasets pkg
        raise ImportError(
            "real-corpus ingestion needs the `datasets` package and network "
            "access; inside the hermetic sandbox use --dataset_setup synthetic "
            "or a pre-tokenized --image_dir/.npy cache"
        ) from e

    tok = _hf_tokenizer(tokenizer_name)
    tr_split = _split_expr("train", train_percentage)
    va_split = _split_expr("validation", validation_percentage)

    if dataset_setup == "wikitext_2":
        tr = load_dataset("wikitext", "wikitext-2-raw-v1", cache_dir=cache_dir, split=tr_split)
        va = load_dataset("wikitext", "wikitext-2-raw-v1", cache_dir=cache_dir, split=va_split)
        train_texts, val_texts = tr["text"], va["text"]
    elif dataset_setup == "wikitext_103":
        tr = load_dataset("wikitext", "wikitext-103-raw-v1", cache_dir=cache_dir, split=tr_split)
        va = load_dataset("wikitext", "wikitext-103-raw-v1", cache_dir=cache_dir, split=va_split)
        train_texts, val_texts = tr["text"], va["text"]
    else:  # bookcorpus_and_wiki (run_mlm.py:289-316)
        book = load_dataset("bookcorpus", cache_dir=cache_dir, split=tr_split)
        wiki_tr = load_dataset("wiki40b", "en", cache_dir=cache_dir, split=tr_split)
        wiki_va = load_dataset("wiki40b", "en", cache_dir=cache_dir, split=va_split)
        train_texts = list(book["text"]) + list(wiki_tr["text"])
        val_texts = list(wiki_va["text"])

    def tokenize(batch_texts):
        return tok(batch_texts)["input_ids"]

    out = {
        "train": tokenize_and_group(train_texts, tokenize, max_seq_length),
        "validation": tokenize_and_group(val_texts, tokenize, max_seq_length),
    }
    os.makedirs(cache, exist_ok=True)
    np.save(os.path.join(cache, "train.npy"), out["train"])
    np.save(os.path.join(cache, "validation.npy"), out["validation"])
    return out
