"""gwinferno_tpu: a TPU-native hierarchical Bayesian inference framework for
gravitational-wave population analysis.

A from-scratch rebuild of the capabilities of FarrOutLab/GWInferno
(reference: /root/reference) designed TPU-first:

- pure-JAX numerics (L0): pdf kernels, cosmology, B-spline stack
- a compact probabilistic-programming layer (``gwinferno_tpu.ppl``) replacing
  NumPyro's model DSL (sample/deterministic/factor/plate primitives, effect
  handlers, potential-energy evaluation over unconstrained space)
- a native inference engine (``gwinferno_tpu.infer``): batched NUTS/HMC with
  dual-averaging + Welford mass-matrix adaptation designed around a chain axis
  (vmap/shard_map), SVI, and SMC with collective resampling
- hierarchical population likelihood (``gwinferno_tpu.pipeline``) with
  selection-effect (VT) correction
- Pallas TPU kernels for the hot Monte-Carlo reductions (``gwinferno_tpu.ops``)
- multi-device sharding utilities (``gwinferno_tpu.parallel``)
"""

__version__ = "0.1.0"
