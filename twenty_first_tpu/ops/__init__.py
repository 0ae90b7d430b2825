"""Pallas TPU kernels for the hot compute paths."""

from . import tip5_pallas  # noqa: F401
