"""Placeholder — filled in by a later milestone."""
