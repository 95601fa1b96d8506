"""Pallas TPU kernels for the detection hot path.

These implement the few detector stages where XLA's op-by-op execution leaves
large factors on the table — primarily connected-component labeling, whose
iterative label propagation otherwise round-trips HBM on every step.
"""

from .ccl_pallas import connected_components_pallas, pallas_ccl_supported

__all__ = ["connected_components_pallas", "pallas_ccl_supported"]
