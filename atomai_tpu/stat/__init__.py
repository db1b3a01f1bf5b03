"""Multivariate statistics layer (reference surface:
`atomai/stat/__init__.py:1-7`). Populated incrementally."""

__all__ = []
