"""Boxed-CelebA conditional pairs for the conditional-Glow workload.

Reference data_generators/celeba.py:9-53 downloads a 32x32 CelebA pickle
and builds (outer-box context, inner-box target) pairs for cGlow. The
download is gated here (zero-egress hosts); the masking transform works on
any [N, H, W, 3] array in [0, 1].
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np


def get_celeba(data_root: str) -> Optional[np.ndarray]:
    """Load a local 32x32 CelebA pickle ([N,32,32,3] float/uint8) if present."""
    for name in ("celeba_32.pkl", "celeba.pkl"):
        path = os.path.join(data_root, name)
        if os.path.exists(path):
            with open(path, "rb") as f:
                arr = pickle.load(f)
            arr = np.asarray(arr)
            if arr.dtype == np.uint8:
                arr = arr.astype(np.float32) / 255.0
            if arr.shape[1] == 3:  # NCHW -> NHWC
                arr = arr.transpose(0, 2, 3, 1)
            return arr.astype(np.float32)
    return None


def prepare_celeba(image_dir: str, out_path: str, size: int = 32,
                   limit: Optional[int] = None) -> int:
    """Convert a raw image directory (e.g. img_align_celeba) to the 32x32
    pickle the loader reads — the from-scratch acquisition path the
    reference only documents as a download (celeba.py:9-26).

    Center-crops each image to square, resizes to ``size``, stacks to
    [N, size, size, 3] float32 in [0, 1]; returns N.
    """
    from PIL import Image

    names = sorted(
        n for n in os.listdir(image_dir)
        if n.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if limit:
        names = names[:limit]
    if not names:
        raise FileNotFoundError(f"no images under {image_dir!r}")
    out = np.empty((len(names), size, size, 3), np.float32)
    for i, name in enumerate(names):
        img = Image.open(os.path.join(image_dir, name)).convert("RGB")
        w, h = img.size
        side = min(w, h)
        img = img.crop(((w - side) // 2, (h - side) // 2,
                        (w + side) // 2, (h + side) // 2))
        img = img.resize((size, size), Image.BILINEAR)
        out[i] = np.asarray(img, np.float32) / 255.0
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(out, f)
    return len(names)


def get_joint_conditioned_data(images: np.ndarray, box: int = 8
                               ) -> Tuple[np.ndarray, np.ndarray]:
    """(x = image with center box zeroed, y = the center box) pairs.

    Reference celeba.py:28-53: inner/outer-box masking so a conditional
    flow learns p(inner | outer).
    """
    n, h, w, c = images.shape
    y0, x0 = (h - box) // 2, (w - box) // 2
    y = images[:, y0 : y0 + box, x0 : x0 + box, :].copy()
    x = images.copy()
    x[:, y0 : y0 + box, x0 : x0 + box, :] = 0.0
    return x, y
