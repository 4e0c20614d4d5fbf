"""Core single-device math: shapes, kernel wrapping, FFTs, RL elementwise ops."""
