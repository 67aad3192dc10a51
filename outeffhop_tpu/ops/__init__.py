from outeffhop_tpu.ops.softmax_variants import (
    softmax_n,
    softmax_1,
    vanilla_softmax,
    clipped_softmax,
    clipped_softmax1,
    SOFTMAX_MAPPING,
    resolve_softmax,
)
from outeffhop_tpu.ops.entmax import entmax15, sparsemax, entmax_bisect
from outeffhop_tpu.ops.telemetry import kurtosis, inf_norm
from outeffhop_tpu.ops.int8_matmul import w8a8_matmul, w8a8_matmul_pallas, w8a8_matmul_xla
