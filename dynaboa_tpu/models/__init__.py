"""Model layer: SMPL body model and the HMR network."""

from dynaboa_tpu.models.smpl import (
    SMPLModel,
    SMPLOutput,
    smpl_forward,
    lbs,
    load_smpl_npz,
    synthetic_smpl_model,
    SMPL_PARENTS,
)

__all__ = [
    "SMPLModel", "SMPLOutput", "smpl_forward", "lbs", "load_smpl_npz",
    "synthetic_smpl_model", "SMPL_PARENTS",
]
