"""ecad_tpu — a TPU-native (JAX/Flax/pjit/Pallas) rebuild of ECAD
(Evolutionary Caching to Accelerate Diffusion models, arXiv:2506.15682).

Reference implementation surveyed in SURVEY.md; this package re-designs the
same capabilities TPU-first rather than porting the CUDA/torch code.
"""

__version__ = "0.1.0"
