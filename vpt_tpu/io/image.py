"""Image I/O: PNG read/write for rendered frames and environment maps."""

from __future__ import annotations

from pathlib import Path

import numpy as np


def to_uint8(image, flip: bool = True) -> np.ndarray:
    """HDR/display float image (H, W, 3|4) → uint8 RGB, top-down rows.

    Render images are bottom-up (OpenGL convention, row 0 = bottom); PNG rows
    are top-down, hence the default flip."""
    arr = np.asarray(image)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    if flip:
        arr = arr[::-1]
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


def write_png(path, image, flip: bool = True):
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8(image, flip=flip)).save(str(path))


def read_image(path, flip: bool = True) -> np.ndarray:
    """Read an image file → float32 (H, W, 4) RGBA in [0, 1], bottom-up."""
    from PIL import Image

    img = np.asarray(Image.open(str(path)).convert("RGBA"),
                     dtype=np.float32) / 255.0
    if flip:
        img = img[::-1]
    return np.ascontiguousarray(img)
