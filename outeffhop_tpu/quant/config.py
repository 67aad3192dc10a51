"""Quantization configuration & policy system.

Functional replacement for the reference's config plumbing:
  * defaults of `get_quant_config()` (`transformers_language/quant_configs.py:7-33`):
    W8A8, weights symmetric-uniform + current_minmax (optionally per-channel /
    MSE), activations asymmetric-uniform + running_minmax, 16 calibration
    batches.
  * `val_qparams()` flattening (`transformers_language/utils.py:27-47`).
  * `quant_setup` head policies (`quantized_opt.py:733-756`): "all",
    "fp32_head", "fp32_head+int16_final_LN", "fp32_head+int16_all_LN"; BERT
    additionally always keeps the MLM cls head FP32 (`quantized_bert.py:865`).
  * the LayerNorm quant_dict knobs (`quantized_bert.py:56-69`).

Sites are identified by hierarchical string names with a kind suffix, e.g.
    "encoder.layer3.attention.query|w"      (weight)
    "encoder.layer3.attention.attn_probs|a" (activation)
    "final_ln.unary|a"                      (LN intermediate, unary bits)
and the policy maps a site name → SiteCfg (enabled, bits, method, estimator).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional

QUANT_SETUPS = (
    "all",
    "fp32_head",
    "fp32_head+int16_final_LN",
    "fp32_head+int16_all_LN",
    "LSQ",  # reference also accepts LSQ-style learned ranges via grad_scaling
)


@dataclasses.dataclass(frozen=True)
class SiteCfg:
    """Resolved per-site quantization settings."""

    enabled: bool = True
    n_bits: int = 8
    symmetric: bool = False
    per_channel: bool = False
    estimator: str = "running_minmax"
    estimator_kw: dict = dataclasses.field(default_factory=dict)
    grad_scaling: bool = False


@dataclasses.dataclass
class QuantizedModelConfig:
    """Whole-model quantization configuration (the `val_qparams` surface)."""

    n_bits: int = 8
    n_bits_act: int = 8
    # weights: symmetric_uniform + current_minmax by default
    weight_method: str = "symmetric_uniform"
    weight_range_method: str = "current_minmax"
    weight_range_options: dict = dataclasses.field(default_factory=dict)
    per_channel_weights: bool = False
    # activations: asymmetric_uniform + running_minmax by default
    act_method: str = "asymmetric_uniform"
    act_range_method: str = "running_minmax"
    act_range_options: dict = dataclasses.field(default_factory=dict)
    percentile: Optional[float] = None
    quant_setup: str = "all"
    est_num_batches: int = 16
    quantize_weights: bool = True
    quantize_acts: bool = True
    # LayerNorm decomposition knobs (DEFAULT_QUANT_DICT parity)
    layer_norm_ver: str = "v1"
    layer_norm_n_bits_unary: int = 8
    layer_norm_n_bits_binary: int = 8
    layer_norm_n_bits_params: int = 8
    # site-name regexes forced to FP32 (FP32Acts equivalents)
    fp32_acts_patterns: tuple = ()

    def __post_init__(self):
        if self.quant_setup not in QUANT_SETUPS:
            raise ValueError(
                f"unknown quant_setup {self.quant_setup!r}; options: {QUANT_SETUPS}"
            )

    # -- policy resolution ------------------------------------------------

    def _is_head_site(self, name: str) -> bool:
        return ".head." in name or name.startswith("head.") or name.endswith("|head")

    def _is_final_ln(self, name: str) -> bool:
        return "final_ln" in name or "final_layer_norm" in name

    def _ln_bits(self, name: str) -> Optional[int]:
        """int16-LayerNorm policies bump LN bit-widths (`quantized_opt.py:743-752`)."""
        if "|ln_" not in name:
            return None
        if self.quant_setup == "fp32_head+int16_all_LN":
            return 16
        if self.quant_setup == "fp32_head+int16_final_LN" and self._is_final_ln(name):
            return 16
        if name.endswith("|ln_unary"):
            return self.layer_norm_n_bits_unary
        if name.endswith("|ln_binary"):
            return self.layer_norm_n_bits_binary
        if name.endswith("|ln_param"):
            return self.layer_norm_n_bits_params
        return None

    def weight_site(self, name: str) -> SiteCfg:
        if not self.quantize_weights:
            return SiteCfg(enabled=False)
        if self.quant_setup.startswith("fp32_head") and self._is_head_site(name):
            return SiteCfg(enabled=False)
        if name.endswith("|ln_param"):
            # LN gamma/beta always symmetric + current_minmax (quantized_bert.py:126-141)
            return SiteCfg(
                enabled=True,
                n_bits=self._ln_bits(name) or self.layer_norm_n_bits_params,
                symmetric=True,
                per_channel=False,
                estimator="current_minmax",
            )
        return SiteCfg(
            enabled=True,
            n_bits=self.n_bits,
            symmetric=self.weight_method == "symmetric_uniform",
            per_channel=self.per_channel_weights,
            estimator=self.weight_range_method,
            estimator_kw=dict(self.weight_range_options),
            grad_scaling=self.quant_setup == "LSQ",
        )

    def act_site(self, name: str) -> SiteCfg:
        if not self.quantize_acts:
            return SiteCfg(enabled=False)
        if self.quant_setup.startswith("fp32_head") and self._is_head_site(name):
            return SiteCfg(enabled=False)
        for pat in self.fp32_acts_patterns:
            if re.search(pat, name):
                return SiteCfg(enabled=False)
        ln_bits = self._ln_bits(name)
        n_bits = ln_bits if ln_bits is not None else self.n_bits_act
        kw = dict(self.act_range_options)
        if self.percentile is not None:
            kw.setdefault("percentile", self.percentile)
        return SiteCfg(
            enabled=True,
            n_bits=n_bits,
            symmetric=self.act_method == "symmetric_uniform",
            per_channel=False,  # act quantizers are per-tensor in the reference
            estimator=self.act_range_method,
            estimator_kw=kw,
            grad_scaling=self.quant_setup == "LSQ",
        )


def default_quant_config(**overrides) -> QuantizedModelConfig:
    """`get_quant_config()` defaults + CLI-style overrides."""
    return QuantizedModelConfig(**overrides)
