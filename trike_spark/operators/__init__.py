"""Reusable operator utilities that aren't single queries: skew-aware
joins, and room for future physical-strategy helpers."""
