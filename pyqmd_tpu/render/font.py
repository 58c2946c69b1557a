"""Tiny 5x7 bitmap font for framebuffer labels.

Covers exactly the glyphs the fm-ruler label needs ("0.5 fm" ... "500 fm",
rendering.py:115-116). Labels for the ten 'nice' ruler values are
pre-rendered at import into one fixed-size numpy stack so the jit'd
rasterizer can select one with a single small gather — no text layout at
trace time.
"""

from __future__ import annotations

import numpy as np

_GLYPHS = {
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    "2": ["01110", "10001", "00001", "00010", "00100", "01000", "11111"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    ".": ["00000", "00000", "00000", "00000", "00000", "01100", "01100"],
    "f": ["00110", "01000", "11110", "01000", "01000", "01000", "01000"],
    "m": ["00000", "00000", "11010", "10101", "10101", "10101", "10101"],
    " ": ["00000", "00000", "00000", "00000", "00000", "00000", "00000"],
}

GLYPH_H, GLYPH_W = 7, 5
_SPACING = 1


def render_text(text: str, scale: int = 2) -> np.ndarray:
    """Rasterize ``text`` to a float mask of shape (7*scale, len*6*scale)."""
    w = len(text) * (GLYPH_W + _SPACING)
    mask = np.zeros((GLYPH_H, w), np.float32)
    for i, ch in enumerate(text):
        glyph = _GLYPHS.get(ch)
        if glyph is None:
            continue
        x0 = i * (GLYPH_W + _SPACING)
        for r, row in enumerate(glyph):
            for c, bit in enumerate(row):
                if bit == "1":
                    mask[r, x0 + c] = 1.0
    return np.kron(mask, np.ones((scale, scale), np.float32))


def label_stack(labels: list[str], scale: int = 2) -> np.ndarray:
    """Pre-render labels into one (N, H, W) stack padded to a common width."""
    masks = [render_text(t, scale) for t in labels]
    h = masks[0].shape[0]
    w = max(m.shape[1] for m in masks)
    out = np.zeros((len(masks), h, w), np.float32)
    for i, m in enumerate(masks):
        out[i, :, : m.shape[1]] = m
    return out
