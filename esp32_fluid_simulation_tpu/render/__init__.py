from .upscale import upscale_bilinear, pack_rgb565, render_rgb565, render_rgb8
from .smoke import render_smoke, heat_colormap

__all__ = ["upscale_bilinear", "pack_rgb565", "render_rgb565", "render_rgb8",
           "render_smoke", "heat_colormap"]
