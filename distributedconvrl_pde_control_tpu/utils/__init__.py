"""Shared utilities (profiling, RNG helpers)."""
