"""Parallelism layer: device meshes, shardings, distributed train steps.

The reference is strictly single-device (no torch.distributed anywhere —
SURVEY.md §2.6); this layer is new, TPU-native capability: a
``jax.sharding.Mesh`` with ("data", "model") axes, batch sharded over ICI
for DP, attention/MLP kernels sharded over the model axis for TP, and XLA
inserting the collectives.
"""

from cliffordtpu.parallel.mesh import create_mesh, data_sharding
from cliffordtpu.parallel.sharding import (
    infer_param_sharding,
    make_sharded_cnn_train_step,
    shard_params,
)

__all__ = [
    "create_mesh",
    "data_sharding",
    "infer_param_sharding",
    "make_sharded_cnn_train_step",
    "shard_params",
]
