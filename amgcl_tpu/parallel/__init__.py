"""Distributed (multi-chip SPMD) layer — the TPU-native equivalent of the
reference's amgcl/mpi/ domain-decomposition layer."""
