"""Host-side framebuffer output (replaces Image.cpp + FreeImage).

The reference writes binary PPM (P6) flipped vertically
(Image.cpp:98-115); we support PPM for bit-parity plus PNG via imageio.
Row 0 of the in-memory buffer is the BOTTOM scanline (eyeRay's v axis
grows upward, Camera.cpp:158), matching the reference's Image layout.
"""

from __future__ import annotations

import numpy as np


def write_ppm(path: str, rgb8: np.ndarray) -> None:
    """rgb8: (H, W, 3) uint8, bottom-up rows. PPM stores top-down."""
    rgb8 = np.asarray(rgb8, np.uint8)
    h, w = rgb8.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(np.ascontiguousarray(rgb8[::-1]).tobytes())


def write_png(path: str, rgb8: np.ndarray) -> None:
    import imageio.v3 as iio
    iio.imwrite(path, np.asarray(rgb8, np.uint8)[::-1])


def write_image(path: str, rgb8: np.ndarray) -> None:
    if path.endswith(".ppm"):
        write_ppm(path, rgb8)
    else:
        write_png(path, rgb8)
