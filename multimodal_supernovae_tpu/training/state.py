"""Train state: params + optimizer state + BatchNorm running stats."""

from __future__ import annotations

from typing import Any, Optional

from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with the ``batch_stats`` collection (needed
    by the ConvMixer image encoder; ``None`` for BN-free models)."""

    batch_stats: Optional[Any] = None
