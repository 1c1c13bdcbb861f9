"""KL-weight (beta) schedules from the reference runners."""

from __future__ import annotations


def linear_kl_warmup(epoch: int, warmup_epochs: int) -> float:
    """beta = min(1, (epoch+1)/warmup) (``mnist/mnist_clifpws.py:270-272``)."""
    return min(1.0, (epoch + 1) / max(1, warmup_epochs))


def cyclical_kl_beta(
    epoch: int,
    warmup_epochs: int,
    cycle_epochs: int,
    min_beta: float,
    max_beta: float,
) -> float:
    """Linear warmup then triangle wave in [min_beta, max_beta]
    (``cnn/fashion_train.py:837-855``, verbatim semantics)."""
    if epoch < warmup_epochs:
        return min(1.0, (epoch + 1) / max(1, warmup_epochs)) * max_beta
    if cycle_epochs <= 0:
        return max_beta
    cycle_pos = (epoch - warmup_epochs) % cycle_epochs
    half = max(1, cycle_epochs // 2)
    if cycle_pos <= half:
        t = cycle_pos / half
    else:
        t = (cycle_epochs - cycle_pos) / max(1, cycle_epochs - half)
    return min_beta + (max_beta - min_beta) * t
