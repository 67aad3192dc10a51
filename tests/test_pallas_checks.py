"""Static Mosaic block-spec validation — catches lowering-impossible specs on
CPU, the bug class that shipped in rounds 1 (int8 tiles) and 2 (packed flash
64-lane head slices). The validator mirrors
`jax/_src/pallas/mosaic/lowering.py:_check_block_mappings` exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from outeffhop_tpu.ops.pallas_checks import (
    BlockSpecError,
    check_block_shape,
    validate_block_specs,
)
from outeffhop_tpu.ops.flash import packed_head_group, packed_supported


def test_round2_packed_spec_rejected():
    """The exact spec that crashed bench.py on the chip in round 2:
    block (32, 128, 64) over array (32, 128, 768) — 64 lanes is neither a
    multiple of 128 nor the full minor dim."""
    with pytest.raises(BlockSpecError, match="last block dim 64"):
        check_block_shape((32, 128, 64), (32, 128, 768))


def test_round1_int8_tile_warns_in_strict_mode():
    """int8 blocks with sublane dim not a multiple of 32 force padded tiles
    (round-1 advisor finding) — caught only by the strict dtype check."""
    check_block_shape((8, 128), (64, 256), itemsize=1)  # legal for Mosaic
    with pytest.raises(BlockSpecError, match="native sublane tile 32"):
        check_block_shape((8, 128), (64, 256), itemsize=1, strict_dtype=True)


@pytest.mark.parametrize(
    "block,array",
    [
        ((1, 128, 64), (4, 128, 64)),    # last dim == array dim
        ((1, 512, 128), (8, 2048, 128)),  # %128 lanes, %8 sublanes
        ((32, 128, 128), (32, 128, 768)),  # 128-lane head-pair slice
        ((2, 200, 768), (2, 200, 768)),   # full array
        ((1, 1, 200), (4, 1, 200)),       # bias row: both dims == array dims
    ],
)
def test_legal_specs_pass(block, array):
    check_block_shape(block, array)


@pytest.mark.parametrize(
    "block,array,msg",
    [
        ((1, 100, 128), (4, 300, 128), "second-to-last"),  # 100 not %8/full
        ((1, 8, 64), (4, 8, 256), "last block dim"),       # 64 not %128/full
        ((1, 8, 512), (4, 8, 256), "exceeds"),             # block > array
        ((8, 128), (8, 128, 128), "rank"),
    ],
)
def test_illegal_specs_raise(block, array, msg):
    with pytest.raises(BlockSpecError, match=msg):
        check_block_shape(block, array)


def test_validate_block_specs_names_operand():
    with pytest.raises(BlockSpecError, match=r"operand\[1\]"):
        validate_block_specs(
            [((8, 128), (8, 128)), ((8, 64), (8, 256))], kernel="k"
        )


# ---------------------------------------------------------------------------
# packed kernel lane-group selection
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "heads,d,expect",
    [
        (12, 64, 2),    # BERT/OPT/ViT-base: two 64-wide heads = 128 lanes
        (16, 64, 2),    # ViT-large
        (12, 128, 1),   # 128-wide heads are already lane-aligned
        (4, 16, 4),     # tiny test config: no aligned group → full minor dim
        (8, 32, 4),     # 4 heads * 32 = 128
        (6, 64, 2),
        (3, 64, 3),     # base group 2 doesn't divide 3 → full minor dim
    ],
)
def test_packed_head_group(heads, d, expect):
    g = packed_head_group(heads, d)
    assert g == expect
    # the returned group must always produce a legal lane dim
    assert (g * d) % 128 == 0 or g == heads


def test_packed_supported_matches_wrapper():
    """The dispatch gate and the kernel wrapper share one predicate: whenever
    packed_supported says yes, flash_attention_packed must lower-check clean
    (validator inside the wrapper), and when it says no the wrapper raises."""
    from outeffhop_tpu.ops.flash import flash_attention_packed

    assert packed_supported(32, 128, 128, 12, 64)
    assert not packed_supported(1, 4096, 4096, 12, 64)  # score tile too big
    q = jnp.zeros((1, 4096, 768), jnp.bfloat16)
    with pytest.raises(ValueError, match="short-sequence"):
        flash_attention_packed(q, q, q, heads=12, interpret=True)


def test_packed_bert_base_shape_specs_validate():
    """Drive the real wrapper at the headline BERT-base shape (B32 S128 H12
    D64) far enough to exercise the validator — on CPU in interpret mode with
    a reduced batch so it stays fast. Round 2's spec dies in the validator
    before any pallas_call."""
    from outeffhop_tpu.ops.flash import flash_attention_packed, attention_reference

    rng = np.random.default_rng(0)
    b, h, t, d = 2, 12, 128, 64
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    def pack(x):
        bb, hh, tt, dd = x.shape
        return x.transpose(0, 2, 1, 3).reshape(bb, tt, hh * dd)

    got = flash_attention_packed(
        pack(q), pack(k), pack(v), heads=h, softmax_n=1.0, interpret=True
    )
    want = pack(attention_reference(q, k, v, softmax_n=1.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)
