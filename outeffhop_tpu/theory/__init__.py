"""Theory verification: modern Hopfield network (MHN) retrieval dynamics.

TPU-native re-design of the reference's `theory_verification/` sub-project —
energy functions, retrieval update rules, Hopfield layers, and the ViH
(Vision-Hopfield) classifier experiments used to verify the paper's
softmax_1 / sparsemax retrieval claims.
"""

from outeffhop_tpu.theory.functions import (
    MHN_energy,
    LMHN_energy,
    MHN_update_rule,
    UMHN_update_rule,
    LMHN_update_rule,
    dot_product,
    l2_distance,
    manhattan_distance,
    topk_softmax,
    random_mask_softmax,
    uniform_loss,
)

__all__ = [
    "MHN_energy",
    "LMHN_energy",
    "MHN_update_rule",
    "UMHN_update_rule",
    "LMHN_update_rule",
    "dot_product",
    "l2_distance",
    "manhattan_distance",
    "topk_softmax",
    "random_mask_softmax",
    "uniform_loss",
]
