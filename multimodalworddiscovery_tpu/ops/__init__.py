"""Pallas TPU kernels (with jnp reference implementations as oracles)."""
