"""Custom compute paths (Pallas TPU kernels) behind jnp fallbacks."""
