"""Vectorized encoding kernels (numpy only, no Spark dependency)."""

from . import bitpack, bytearrays, deltabp, dictenc, hybrid, levels, plain, varint  # noqa: F401
