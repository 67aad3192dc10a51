"""Learned-ranges QAT: quantizer scales/zero-points as trainable parameters.

Reference capability: `QuantizationManager.learn_ranges` +
`make_range_trainable` turn each quantizer's delta/zero-point into
nn.Parameters so a fine-tuning loop optimizes them jointly with the weights
(`quantization/quantization_manager.py:80-87`, `qstates.py:7-13`,
`quantizers/base_quantizers.py:40-46`, `base_quantized_model.py:91-144`), with
optional LSQ gradient scaling `1/sqrt(int_max * numel)`
(`uniform_quantizers.py:150-157`).

Functional translation: `QParams` is already a registered pytree whose data
fields are (delta, zero_float) — a dict of QParams IS a trainable pytree. The
only transformation needed is moving delta to the log domain so a learned
scale can never go non-positive (the reference's `scale_domain="log"` option,
`uniform_quantizers.py:30-48`), which `make_ranges_trainable` does. Training
then optimizes the `{"w": ..., "a": ...}` ranges bundle alongside the model
params; the STE machinery in `fake_quant` (round_ste + scale_grad) provides
the gradients. `freeze_learned_ranges` converts back to the linear domain for
checkpointing/eval.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp

from outeffhop_tpu.quant.fake_quant import QParams

RangesBundle = Dict[str, Dict[str, Optional[QParams]]]  # {"w": ..., "a": ...}


def _to_log(qp: Optional[QParams]) -> Optional[QParams]:
    if qp is None or qp.scale_domain == "log":
        return qp
    return dataclasses.replace(
        qp,
        delta=jnp.log(jnp.maximum(qp.delta, qp.eps)),
        scale_domain="log",
    )


def _to_linear(qp: Optional[QParams]) -> Optional[QParams]:
    if qp is None or qp.scale_domain == "linear":
        return qp
    return dataclasses.replace(qp, delta=jnp.exp(qp.delta), scale_domain="linear")


def make_ranges_trainable(
    weight_qparams: Dict[str, Optional[QParams]],
    act_qparams: Dict[str, Optional[QParams]],
) -> RangesBundle:
    """Calibrated qparams → trainable ranges bundle (log-domain scales)."""
    return {
        "w": {k: _to_log(v) for k, v in weight_qparams.items()},
        "a": {k: _to_log(v) for k, v in act_qparams.items()},
    }


def freeze_learned_ranges(ranges: RangesBundle):
    """Trainable bundle → (weight_qparams, act_qparams) in the linear domain
    (the `fix_ranges` step after range learning, `qstates` learn→fix)."""
    wq = {k: _to_linear(v) for k, v in ranges["w"].items()}
    aq = {k: _to_linear(v) for k, v in ranges["a"].items()}
    return wq, aq
