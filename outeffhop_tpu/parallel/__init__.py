from outeffhop_tpu.parallel.mesh import (
    make_mesh,
    param_pspecs,
    shard_params,
    batch_pspec,
)
from outeffhop_tpu.parallel.train import (
    TrainState,
    make_adamw,
    make_mlm_train_step,
    make_clm_train_step,
)

__all__ = [
    "make_mesh",
    "param_pspecs",
    "shard_params",
    "batch_pspec",
    "TrainState",
    "make_adamw",
    "make_mlm_train_step",
    "make_clm_train_step",
]
