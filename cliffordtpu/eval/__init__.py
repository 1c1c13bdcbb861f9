"""Evaluation layer (L3b): latent adapters, binding-depth tests, class-mean
classifiers, kNN, FID, manifold plots, LaTeX/CSV tables.

Rebuild of ``utils/wandb_utils.py`` with the model access going through a
small explicit adapter (the reference duck-types torch modules,
``wandb_utils.py:16-42``; here a ``ModelHandle`` carries apply_fn + params +
static metadata so everything stays functional and jittable).
"""

from cliffordtpu.eval.adapters import ModelHandle
from cliffordtpu.eval.binding import (
    test_cross_class_bind_unbind,
    test_pairwise_bind_bundle_decode,
    test_self_binding,
    test_vsa_operations,
)
from cliffordtpu.eval.class_means import (
    compute_class_means,
    evaluate_mean_vector_cosine,
)
from cliffordtpu.eval.knn import perform_knn_evaluation

__all__ = [
    "ModelHandle",
    "compute_class_means",
    "evaluate_mean_vector_cosine",
    "perform_knn_evaluation",
    "test_cross_class_bind_unbind",
    "test_pairwise_bind_bundle_decode",
    "test_self_binding",
    "test_vsa_operations",
]
