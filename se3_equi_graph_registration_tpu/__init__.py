"""se3_equi_graph_registration_tpu — TPU-native SE(3)-equivariant graph
registration framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the Equi-GSPR reference
(alexandor91/se3-equi-graph-registration, ECCV 2024) as a real library:
fixed-shape dense graphs on the MXU, vmapped/pjit-able models, a single
train/eval engine, and a distribution layer the reference never had.
"""
__version__ = "0.1.0"

from . import core, data, models, ops, registration, train  # noqa: F401
