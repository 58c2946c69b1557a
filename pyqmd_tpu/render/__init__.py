"""Headless rendering: device rasterizer + stdlib PNG/APNG export."""

from pyqmd_tpu.render.framebuffer import render_frame, render_to_host
from pyqmd_tpu.render.png import png_bytes, write_apng, write_png

__all__ = ["render_frame", "render_to_host", "png_bytes", "write_apng", "write_png"]
