from outeffhop_tpu.quant.fake_quant import (
    QParams,
    fake_quant,
    to_integer,
    dequantize,
    qparams_from_range_asymmetric,
    qparams_from_range_symmetric,
    round_ste,
    scale_grad,
)
from outeffhop_tpu.quant.ranges import (
    RangeEstimator,
    CurrentMinMax,
    RunningMinMax,
    MSEEstimator,
    make_estimator,
)
from outeffhop_tpu.quant.config import QuantizedModelConfig, SiteCfg, default_quant_config
from outeffhop_tpu.quant.calibrate import (
    QuantCtx,
    ScopedQuantCtx,
    NULL_QCTX,
    compute_weight_qparams,
    freeze_act_qparams,
    run_calibration,
)
from outeffhop_tpu.quant.fp8 import (
    fp8_quantize,
    fp8_dequantize,
    fp8_round_trip,
    fp8_cast_params,
)
from outeffhop_tpu.quant.int8_exec import (
    Int8Dense,
    quantize_dense,
    quantize_dense_with_qparams,
    int8_dense_apply,
    build_int8_dense_map,
)
from outeffhop_tpu.quant.checkpoint import (
    save_quantized_ckpt,
    load_quantized_ckpt,
    quant_ctx_from_ckpt,
)
