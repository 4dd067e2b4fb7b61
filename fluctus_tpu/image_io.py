"""Image export: PNG (via PIL, the DevIL analogue) and Radiance HDR.

Mirrors CLContext::saveImage (clcontext.cpp:404-483): PNG gets the
postprocessed (tonemapped, gamma) image; HDR gets raw accumulated radiance
divided by sample count.
"""

from __future__ import annotations

import numpy as np

from . import rgbe


def save_png(path: str, rgb: np.ndarray):
    """rgb: float [H, W, 3] in [0, 1] (already tonemapped + gamma)."""
    from PIL import Image
    arr = np.clip(np.asarray(rgb) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(arr, "RGB").save(path)


def save_hdr(path: str, rgb: np.ndarray):
    """rgb: float [H, W, 3] linear radiance."""
    rgbe.write_hdr(path, np.asarray(rgb, np.float32))
