"""Evaluation metrics and observability."""

from dynaboa_tpu.metrics.eval import GenderedSMPL, evaluate_frame, h36m_14_joints

__all__ = ["GenderedSMPL", "evaluate_frame", "h36m_14_joints"]
