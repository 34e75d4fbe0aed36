"""Pallas TPU kernels for the hot geometry ops."""
