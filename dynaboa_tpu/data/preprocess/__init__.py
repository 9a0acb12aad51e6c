"""Offline data preparation tools (reference utils/data_preprocess/*,
vid2img.py)."""

from dynaboa_tpu.data.preprocess.internet import internet_data_extract
from dynaboa_tpu.data.preprocess.human36m import h36m_train_extract
from dynaboa_tpu.data.preprocess.video import video_to_images, extract_all

__all__ = ["internet_data_extract", "h36m_train_extract", "video_to_images",
           "extract_all"]
