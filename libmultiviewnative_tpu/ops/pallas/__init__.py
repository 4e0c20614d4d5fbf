"""Pallas TPU kernels for the RL hot paths (fused elementwise epilogues)."""
