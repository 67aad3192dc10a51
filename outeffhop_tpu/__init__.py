"""outeffhop_tpu — TPU-native outlier-efficient Hopfield attention framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
MAGICS-LAB/OutEffHop (ICML 2024, arXiv:2404.03828): softmax₁ / clipped-softmax /
gated attention variants as fused Pallas flash-attention kernels, plus a full
W8A8 post-training-quantization stack (calibrate → freeze → run), BERT/OPT/ViT/
STanHop model families, outlier telemetry (∞-norm, kurtosis), and mesh-sharded
multi-chip execution.

Layering (bottom-up):
    ops/       softmax variants, entmax family, attention math, Pallas kernels
    quant/     fake-quant (STE), range estimators, calibration, quant configs
    models/    BERT, OPT, ViT, STanHop, Hopfield theory layers
    parallel/  mesh construction + sharding rules (pjit/NamedSharding)
    utils/     HF checkpoint conversion, metrics, misc
    drivers/   validate_mlm / validate_clm / validate_vit / stanhop experiment
"""

__version__ = "0.1.0"
