"""LDR image loading with the reference's linearization quirk.

The reference converts PNG/JPEG texels with ``LinearToGamma`` — i.e. it
applies **sqrt** where a true linearization would square
(rt/image_loader.go:68-78).  Renders therefore see sqrt-encoded texels, and
bit-for-bit behavioral parity requires reproducing that quirk (SURVEY.md
hard-part #4), which ``load_ldr`` does by default.
"""

from __future__ import annotations

import numpy as np


def load_ldr(path: str, *, reference_quirk: bool = True) -> np.ndarray:
    """Load an LDR image -> float32 [H, W, 3] in [0, 1].

    With ``reference_quirk`` (default) texel values are sqrt(v/max) exactly
    like the reference loader; with False they are left as-is (v/max).
    """
    from PIL import Image

    img = Image.open(path).convert("RGB")
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if reference_quirk:
        arr = np.sqrt(arr)
    return arr
