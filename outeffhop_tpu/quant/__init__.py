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
