"""Compute kernels: dense XLA pipelines and Pallas TPU kernels."""
