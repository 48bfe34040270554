"""Tile a batch of images into one grid image — parity with
baselines/common/tile_images.py:1-23 (used by VecEnv.render)."""

from __future__ import annotations

import numpy as np


def tile_images(img_nhwc):
    """(N, h, w, c) → (H*h, W*w, c) with N ≤ H*W, grid roughly square."""
    img_nhwc = np.asarray(img_nhwc)
    N, h, w, c = img_nhwc.shape
    H = int(np.ceil(np.sqrt(N)))
    W = int(np.ceil(float(N) / H))
    img_nhwc = np.array(
        list(img_nhwc) + [img_nhwc[0] * 0 for _ in range(N, H * W)]
    )
    img_HWhwc = img_nhwc.reshape(H, W, h, w, c)
    img_HhWwc = img_HWhwc.transpose(0, 2, 1, 3, 4)
    return img_HhWwc.reshape(H * h, W * w, c)
