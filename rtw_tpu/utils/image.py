"""Image output: P3 PPM (stdout-compatible with the reference's printPPM,
Director.cpp:1010-1031) and PNG via PIL."""

from __future__ import annotations

import io
import sys

import numpy as np


def write_ppm(img_u8: np.ndarray, stream=None) -> None:
    """Write a top-row-first uint8 [H, W, 3] image as P3 PPM.

    Matches the reference byte format: header `P3\\n<W> <H>\\n255\\n` then one
    `r g b` triple per line (printPPM emits space-separated ints; the
    reference iterates bottom-up over a bottom-origin buffer which equals
    top-down over a top-origin image)."""
    if stream is None:
        stream = sys.stdout
    h, w, _ = img_u8.shape
    out = [f"P3\n{w} {h}\n255\n"]
    flat = img_u8.reshape(-1, 3)
    out.extend(f"{r} {g} {b}\n" for r, g, b in flat)
    stream.write("".join(out))


def write_png(img_u8: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(img_u8).save(path)


def write_image(img_u8: np.ndarray, path: str | None) -> None:
    """path=None or '-' -> PPM on stdout (reference behavior); *.ppm -> PPM
    file; otherwise PIL by extension."""
    if path is None or path == "-":
        write_ppm(img_u8)
    elif path.endswith(".ppm"):
        with open(path, "w") as f:
            write_ppm(img_u8, f)
    else:
        write_png(img_u8, path)
