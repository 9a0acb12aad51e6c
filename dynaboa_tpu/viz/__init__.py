"""Visualization and capture (layer L7)."""

from dynaboa_tpu.viz.renderer import (
    Renderer,
    convert_crop_cam_to_orig_img,
    render_overlay,
)

__all__ = ["Renderer", "convert_crop_cam_to_orig_img", "render_overlay"]
