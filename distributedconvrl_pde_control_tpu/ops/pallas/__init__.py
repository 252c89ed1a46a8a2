"""Pallas TPU kernels for the hot solver paths."""
