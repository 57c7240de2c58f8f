"""Pallas TPU kernels for the hot ops (weight-gen matmul, edge SpMM)."""
