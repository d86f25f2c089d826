"""PLADE-TPU: a TPU-native plane-based point-cloud registration framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
chsl/PLADE (TGRS 2020) — plane extraction, plane-pair line descriptors,
descriptor matching, pose hypothesis clustering and verification — designed
for TPU hardware: fixed-shape padded pytrees, batched dense linear algebra
on the MXU, and pair-level sharding over device meshes.
"""
__version__ = "0.1.0"
