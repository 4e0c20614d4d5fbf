"""Utilities: metrics, bench logging rows, synthetic data."""
