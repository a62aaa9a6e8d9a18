"""MuRaL-TPU: a TPU-native framework for base-resolution germline mutation
rate estimation.

Re-designed from scratch for JAX/XLA/Flax/Pallas on TPU, with the same
capabilities as the reference MuRaL toolkit (CaiLiLab/MuRaL v1.2.0):

- ``mural_snv`` / ``mural_indel`` CLI tools with ``train``, ``transfer``,
  ``predict``, ``evaluate``, ``scale``, ``calc_scaling_factor`` and
  ``get_best_model`` sub-commands.
- Two-branch local-embedding + dual-scale ResNet SNV networks and a 1-D
  U-Net INDEL network (Flax).
- Segment-shared genome encoding, Dirichlet/Poisson probability
  calibration, k-mer / regional / motif correlation evaluation, ASHA
  hyper-parameter search, and genome-wide sharded prediction over a
  ``jax.sharding.Mesh``.
"""

from mural_tpu._version import __version__

__all__ = ["__version__"]
