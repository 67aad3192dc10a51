"""Serving: continuous-batching generation engine (new vs the reference)."""

from outeffhop_tpu.serving.engine import (
    EngineConfig,
    EngineState,
    ServingEngine,
    init_state,
    make_decode_step,
    make_prefill,
    resolve_kv_int8,
)

__all__ = [
    "EngineConfig",
    "EngineState",
    "ServingEngine",
    "init_state",
    "make_decode_step",
    "make_prefill",
    "resolve_kv_int8",
]
