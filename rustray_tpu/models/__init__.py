"""Procedural scene generators for benchmarks/tests."""
