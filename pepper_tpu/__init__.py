"""pepper_tpu: TPU-native long-read variant calling and assembly polishing.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of PEPPER r0.8
(reference studied at /root/reference; behavior parity, new architecture).
"""
from pepper_tpu.version import __version__

__all__ = ["__version__"]
