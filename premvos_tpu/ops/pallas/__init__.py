"""Pallas TPU kernels for the hot ops.

Opt-in via `PREMVOS_PALLAS=1` (dispatchers in ops/ check it); every kernel has
a jnp reference in the parent package that parity tests compare against.
"""
