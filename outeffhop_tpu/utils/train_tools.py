"""Training-loop utilities — `STanHop_time_seeries/utils/tools.py` parity.

`EarlyStopping` is functional (no torch.save side-effect): `update()` returns
(should_save, should_stop) and the caller persists the checkpoint; matches
`tools.py:22-51` semantics (score = −val_loss, counter reset on improvement,
delta threshold).

`adjust_learning_rate` halving schedules (`tools.py:5-20`): type1 halves at
epochs 2,4,6,8,10; type2 at 5,10,15,20,25. Returns the lr for an epoch (the
optax-friendly functional form of the reference's in-place param_group edit).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class EarlyStopping:
    patience: int = 7
    delta: float = 0.0
    counter: int = 0
    best_score: Optional[float] = None
    early_stop: bool = False
    val_loss_min: float = float("inf")

    def update(self, val_loss: float) -> Tuple[bool, bool]:
        """Returns (improved → save checkpoint, stop now)."""
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self.val_loss_min = val_loss
            return True, False
        if score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
            return False, self.early_stop
        self.best_score = score
        self.val_loss_min = val_loss
        self.counter = 0
        return True, False


def adjust_learning_rate(base_lr: float, epoch: int, lradj: str = "type1") -> float:
    """Epoch (1-based, as the reference calls it with epoch+1) → lr."""
    if lradj == "type1":
        table = {2: 1, 4: 2, 6: 3, 8: 4, 10: 5}
    elif lradj == "type2":
        table = {5: 1, 10: 2, 15: 3, 20: 4, 25: 5}
    else:
        return base_lr
    # the reference only changes lr AT the listed epochs; between entries the
    # last-set value persists
    power = 0
    for e, p in sorted(table.items()):
        if epoch >= e:
            power = p
    return base_lr * (0.5**power)
