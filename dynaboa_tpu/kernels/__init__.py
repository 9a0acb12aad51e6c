"""Pallas TPU kernels for the hot SMPL-layer contractions."""

from dynaboa_tpu.kernels.lbs import PallasSMPL, skinning_kernel_call

__all__ = ["PallasSMPL", "skinning_kernel_call"]
