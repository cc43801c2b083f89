"""Pallas TPU kernels (the hand-written hot paths)."""
