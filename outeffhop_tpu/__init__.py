"""outeffhop_tpu — TPU-native outlier-efficient Hopfield attention framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
MAGICS-LAB/OutEffHop (ICML 2024, arXiv:2404.03828): softmax₁ / clipped-softmax /
gated attention variants as fused Pallas flash-attention kernels, plus a full
W8A8 post-training-quantization stack (calibrate → freeze → run), BERT/OPT/ViT/
STanHop model families, outlier telemetry (∞-norm, kurtosis), and mesh-sharded
multi-chip execution.

Layering (bottom-up):
    native/    C++ host dataio (MLM masking, CSV parse, window gather)
    ops/       softmax variants, entmax family, attention math, Pallas
               kernels (flash softmax_n, W8A8 matmul)
    quant/     fake-quant (STE), range estimators, calibration, policies,
               real-INT8 execution
    models/    BERT, OPT, ViT, STanHop
    theory/    MHN retrieval dynamics, Hopfield layers, ViH experiments
    parallel/  mesh + sharding rules, multi-host bootstrap, train steps
    serving/   continuous-batching generation engine
    data/      token + time-series pipelines (routed through native/)
    utils/     HF conversion, checkpointing, metrics, profiling, tracking
    drivers/   run_{mlm,clm,vit}, validate_{mlm,clm,vit}, main_stanhop
"""

__version__ = "0.1.0"
