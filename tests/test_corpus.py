"""Real-corpus ingestion pipeline (data/corpus.py) — the tokenize →
group_texts → cache path of `run_mlm.py:253-395`, exercised hermetically
through an in-memory fake tokenizer."""

import numpy as np
import pytest

from outeffhop_tpu.data.corpus import DATASET_SETUPS, load_corpus, tokenize_and_group


def toy_tokenizer(texts):
    # char-code tokenizer: deterministic, no vocab needed
    return [[ord(c) % 97 for c in t] for t in texts]


def test_tokenize_and_group_chunks():
    texts = ["hello world", "abcdefgh", "x" * 50]
    blocks = tokenize_and_group(texts, toy_tokenizer, max_seq_length=8)
    total_tokens = sum(len(t) for t in texts)
    assert blocks.shape == (total_tokens // 8, 8)
    assert blocks.dtype == np.int32
    # content round-trips: first block = first 8 chars of the concat stream
    concat = [tok for t in texts for tok in toy_tokenizer([t])[0]]
    np.testing.assert_array_equal(blocks[0], concat[:8])


def test_tokenize_and_group_drops_remainder_per_map_batch():
    """The reference's group_texts drops a remainder per .map batch of 1000
    texts (run_mlm.py:382-385) — with map_batch_size=1, every text's tail
    beyond a block multiple is dropped independently."""
    texts = ["a" * 10, "b" * 10]  # 10 tokens each, block 8
    global_blocks = tokenize_and_group(texts, toy_tokenizer, 8, map_batch_size=1000)
    per_text_blocks = tokenize_and_group(texts, toy_tokenizer, 8, map_batch_size=1)
    assert global_blocks.shape == (2, 8)  # 20 // 8
    assert per_text_blocks.shape == (2, 8)  # 1 per text (10 // 8 each)
    # and the contents differ: the global variant packs across text boundaries
    assert not np.array_equal(global_blocks[1], per_text_blocks[1])


def test_load_corpus_uses_cache(tmp_path):
    """A pre-built cache in the reference layout loads without `datasets`."""
    import os

    cache = tmp_path / "tokenized_wikitext_2_8"
    os.makedirs(cache)
    tr = np.arange(16, dtype=np.int32).reshape(2, 8)
    va = np.arange(8, dtype=np.int32).reshape(1, 8)
    np.save(cache / "train.npy", tr)
    np.save(cache / "validation.npy", va)
    out = load_corpus("wikitext_2", "unused-tokenizer", 8, data_cache_dir=str(tmp_path))
    np.testing.assert_array_equal(out["train"], tr)
    np.testing.assert_array_equal(out["validation"], va)


def test_load_corpus_guards():
    with pytest.raises(ValueError, match="unknown dataset_setup"):
        load_corpus("imagenet", "x", 128)
    with pytest.raises(ValueError, match="synthetic"):
        load_corpus("synthetic", "x", 128)
    assert "bookcorpus_and_wiki" in DATASET_SETUPS
