"""Deterministic synthetic data generators (seed-fixed, no external data)."""
