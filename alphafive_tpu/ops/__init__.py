"""Pallas TPU kernels for the compute hot path (SURVEY.md §7.9)."""
