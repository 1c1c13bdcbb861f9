"""Training layer (L4 support): schedules, train state, loops, checkpoints."""

from cliffordtpu.train.schedules import cyclical_kl_beta, linear_kl_warmup
from cliffordtpu.train.state import create_train_state

__all__ = ["cyclical_kl_beta", "linear_kl_warmup", "create_train_state"]
