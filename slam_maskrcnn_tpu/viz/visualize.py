"""Detection visualization.

= ``Mask_RCNN/mrcnn/visualize.py``: ``display_instances`` (:84),
``random_colors`` (:60), ``apply_mask`` (:73), box drawing. matplotlib is
imported lazily (headless-safe with Agg); ``display_instances`` can also
return the composited array instead of showing a window.
"""

from __future__ import annotations

import colorsys
import random

import numpy as np


def random_colors(N, bright=True, seed=None):
    """HSV-spaced colors (visualize.py:60-70)."""
    brightness = 1.0 if bright else 0.7
    hsv = [(i / max(N, 1), 1, brightness) for i in range(N)]
    colors = list(map(lambda c: colorsys.hsv_to_rgb(*c), hsv))
    rng = random.Random(seed)
    rng.shuffle(colors)
    return colors


def apply_mask(image, mask, color, alpha=0.5):
    """Blend a boolean mask into an image (visualize.py:73-81)."""
    image = image.copy()
    for c in range(3):
        image[:, :, c] = np.where(
            mask == 1,
            image[:, :, c] * (1 - alpha) + alpha * color[c] * 255,
            image[:, :, c])
    return image


def draw_boxes(image, boxes, color=(1.0, 1.0, 0.0)):
    """Draw (y1, x1, y2, x2) rectangles (1px)."""
    import cv2

    out = image.copy()
    c = tuple(int(v * 255) for v in color)
    for y1, x1, y2, x2 in boxes.astype(int):
        cv2.rectangle(out, (x1, y1), (x2, y2), c, 1)
    return out


def display_instances(image, boxes, masks, class_ids, class_names,
                      scores=None, title="", figsize=(16, 16), ax=None,
                      show_mask=True, show_bbox=True, colors=None,
                      captions=None, show=True, save_path=None):
    """= visualize.display_instances (visualize.py:84-170). With show=False
    returns the composited uint8 image (no matplotlib window needed)."""
    N = boxes.shape[0]
    if N and boxes.shape[0] != masks.shape[-1]:
        raise ValueError("boxes and masks disagree")
    colors = colors or random_colors(N)
    masked = image.astype(np.float32).copy()
    if show_mask:
        for i in range(N):
            masked = apply_mask(masked, masks[:, :, i], colors[i])
    masked = masked.astype(np.uint8)
    if show_bbox and N:
        import cv2

        for i in range(N):
            y1, x1, y2, x2 = boxes[i].astype(int)
            c = tuple(int(v * 255) for v in colors[i])
            cv2.rectangle(masked, (x1, y1), (x2, y2), c, 2)
            if captions is None:
                cid = class_ids[i]
                label = class_names[cid] if cid < len(class_names) else str(cid)
                score = scores[i] if scores is not None else None
                caption = f"{label} {score:.3f}" if score is not None else label
            else:
                caption = captions[i]
            cv2.putText(masked, caption, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.4, c, 1)
    if save_path:
        import cv2

        cv2.imwrite(save_path, masked[:, :, ::-1])
    if show:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots(1, figsize=figsize)
        ax.imshow(masked)
        ax.set_title(title)
        ax.axis("off")
    return masked
