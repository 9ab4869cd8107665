"""Compute ops: plain-JAX oracle implementations and Pallas TPU kernels."""
