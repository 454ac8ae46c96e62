"""Benchmark harnesses for the BASELINE.json north-star metrics."""
