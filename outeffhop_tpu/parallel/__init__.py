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
from outeffhop_tpu.parallel.pipeline import (
    make_pipe_mesh,
    make_pipeline_mlm_train_step,
    make_pipeline_clm_train_step,
    to_bert_pipeline_params,
    from_bert_pipeline_params,
    to_opt_pipeline_params,
    from_opt_pipeline_params,
    to_vit_pipeline_params,
    from_vit_pipeline_params,
    vit_pipeline_forward,
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
    "make_pipe_mesh",
    "make_pipeline_mlm_train_step",
    "make_pipeline_clm_train_step",
    "to_bert_pipeline_params",
    "from_bert_pipeline_params",
    "to_opt_pipeline_params",
    "from_opt_pipeline_params",
    "to_vit_pipeline_params",
    "from_vit_pipeline_params",
    "vit_pipeline_forward",
]
