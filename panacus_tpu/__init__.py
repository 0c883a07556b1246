"""panacus-tpu: a TPU-native pangenome counting and growth framework.

A from-scratch re-design of the capabilities of panacus
(marschall-lab/panacus, reference mounted read-only) for JAX/XLA/Pallas on
TPU: host-side columnar GFA ingestion feeding a packed node-x-group
membership bit matrix in device HBM, from which coverage histograms,
exact pangenome growth curves, ordered growth, similarity matrices, and
reports are derived as dense array programs.
"""

__version__ = "0.1.0"

from .utils import CountType, Threshold, ThresholdContainer  # noqa: F401
