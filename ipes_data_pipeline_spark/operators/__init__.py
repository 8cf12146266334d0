"""Operator library: reusable, scale-aware DataFrame transformations."""
