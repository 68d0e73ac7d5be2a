"""Pallas TPU kernels for the hot inner loops."""

from .rotate_peak import peak_kernel, rotate_peak_sweep_kernel, use_interpret

__all__ = ["peak_kernel", "rotate_peak_sweep_kernel", "use_interpret"]
