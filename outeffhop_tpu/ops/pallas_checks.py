"""Static Mosaic-lowering constraint checks for Pallas BlockSpecs.

Mosaic (the Pallas TPU backend) refuses to lower a kernel whose block shapes
violate the lane/sublane tiling rules — but only at *compile time on a TPU*.
Interpreter-mode tests (`interpret=True`) skip the check entirely, which let
the same bug class ship twice (round-1 int8 tiles, round-2 packed flash
lane slices). This module mirrors the exact rule enforced by
`jax/_src/pallas/mosaic/lowering.py:_check_block_mappings` as a pure-Python
predicate over static shapes, so CPU tests and the kernel wrappers themselves
catch lowering-impossible specs before any hardware is involved:

    The last two dimensions of the block shape must be divisible by 8 and 128
    respectively, OR be equal to the respective dimensions of the array.

Every Pallas wrapper in this package calls `validate_block_specs` on its
in/out specs unconditionally (the check is static Python over static shapes —
zero trace/runtime cost under jit).

KERNEL-BODY rule (not statically checkable from specs; round-3 probe14 +
round-4 probe23/26/26b): Mosaic's ApplyVectorLayout pass SIGABRTs
(`Check failed: limits[i] <= dim(i)`) when a SINGLETON-dim value is
broadcast against a full-size operand in fragile positions inside a kernel
body — a (1, T, T) causal iota through `jnp.where` (round 3), and a
(bb, 1, t_k) bias row added DIRECTLY onto a matmul output (round 4: only
when scale == 1.0 elides the multiply in between — the identical add
compiles with a real `s * scale` separating it from the dot; probe26b A/B).
Rule: materialize in-kernel masks at the consumer's FULL static shape
(`ops/flash.py:_causal_keep`) and apply bias via ONE full-shape additive
tensor (`ops/flash.py:_bias_causal_fold`). Regressions:
tests/test_flash.py::test_kernel_masks_are_full_shape,
::test_kernel_bias_causal_fold_is_full_shape.

VALIDATE OUTPUT SPECS TOO: the round-4 dbias bug (a (bb, 1, t_k) block over
a (b, n_groups, t_k) array, illegal whenever n_groups > 1) shipped because
only input specs were passed to `validate_block_specs`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

# Minimum sublane tile per dtype itemsize (lane dim is always 128). Mosaic's
# hard lowering check uses 8 regardless of dtype; narrower dtypes pack more
# sublanes per tile, so (8k, 128) blocks remain legal — but int8/fp8 blocks
# whose sublane dim is not a multiple of 32 force padded tiles (round-1
# advisor finding). `strict_dtype` opts into that stronger check.
SUBLANE_FOR_ITEMSIZE = {4: 8, 2: 16, 1: 32}
LANE = 128


class BlockSpecError(ValueError):
    """A BlockSpec that Mosaic cannot lower on TPU."""


def check_block_shape(
    block_shape: Sequence[int],
    array_shape: Sequence[int],
    *,
    name: str = "operand",
    itemsize: int | None = None,
    strict_dtype: bool = False,
) -> None:
    """Raise BlockSpecError iff Mosaic's `_check_block_mappings` would.

    Args:
      block_shape: the BlockSpec block shape (same rank as the array).
      array_shape: the full operand shape.
      name: label for error messages.
      itemsize: operand dtype size in bytes (for the optional strict check).
      strict_dtype: additionally require the sublane dim be a multiple of the
        dtype's native tile (16 for 2-byte, 32 for 1-byte dtypes) or full —
        not a lowering failure, but a padded-tile performance trap.
    """
    bs = tuple(int(x) for x in block_shape)
    ash = tuple(int(x) for x in array_shape)
    if len(bs) != len(ash):
        raise BlockSpecError(
            f"{name}: block rank {len(bs)} != array rank {len(ash)} "
            f"(block {bs}, array {ash})"
        )
    if any(b < 1 or b > a for b, a in zip(bs, ash)):
        raise BlockSpecError(f"{name}: block {bs} exceeds array {ash}")
    if len(bs) == 0:
        return
    # lane (last) dim
    if not (bs[-1] % LANE == 0 or bs[-1] == ash[-1]):
        raise BlockSpecError(
            f"{name}: last block dim {bs[-1]} is neither a multiple of {LANE} "
            f"nor equal to the array dim {ash[-1]} (block {bs}, array {ash}) — "
            "Mosaic cannot lower this spec on TPU"
        )
    # sublane (second-to-last) dim
    if len(bs) >= 2 and not (bs[-2] % 8 == 0 or bs[-2] == ash[-2]):
        raise BlockSpecError(
            f"{name}: second-to-last block dim {bs[-2]} is neither a multiple "
            f"of 8 nor equal to the array dim {ash[-2]} (block {bs}, array "
            f"{ash}) — Mosaic cannot lower this spec on TPU"
        )
    if strict_dtype and itemsize is not None and len(bs) >= 2:
        sub = SUBLANE_FOR_ITEMSIZE.get(itemsize, 8)
        if not (bs[-2] % sub == 0 or bs[-2] == ash[-2]):
            raise BlockSpecError(
                f"{name}: second-to-last block dim {bs[-2]} is not a multiple "
                f"of the {itemsize}-byte dtype's native sublane tile {sub} "
                f"(block {bs}, array {ash}) — legal but forces padded tiles"
            )


def validate_block_specs(
    specs: Sequence[Tuple[Sequence[int], Sequence[int]]],
    *,
    kernel: str = "pallas kernel",
) -> None:
    """Check a list of (block_shape, array_shape) pairs; raise on the first
    violation with the kernel name attached."""
    for i, (bs, ash) in enumerate(specs):
        check_block_shape(bs, ash, name=f"{kernel} operand[{i}]")
