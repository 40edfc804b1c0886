"""Box utilities: dynamic-object feature filtering and batched NMS.

Parity:
- isInDynamicObject + match filtering (reference src/main.cpp:29-50,
  164-175): matches whose current-frame keypoint falls inside a detected
  box of a dynamic COCO class are dropped before pose estimation.
- cv::dnn::NMSBoxes (reference src/legacy/TRTInference.cpp:131): here a
  batched IoU-matrix greedy NMS with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aria_slam_tpu.core.types import Detections

# COCO ids of dynamic classes (reference src/main.cpp:29-40):
# person, bicycle, car, motorcycle, bus, train, truck, bird, cat, dog
DYNAMIC_CLASS_IDS = (0, 1, 2, 3, 5, 6, 7, 14, 15, 16)


def points_in_dynamic_boxes(xy: jnp.ndarray, det: Detections) -> jnp.ndarray:
    """(K, 2) points, Detections -> (K,) bool: inside any valid dynamic box."""
    dyn = jnp.zeros_like(det.valid)
    for cid in DYNAMIC_CLASS_IDS:
        dyn = dyn | (det.classes == cid)
    active = det.valid & dyn  # (D,)
    b = det.boxes  # (D, 4) x1 y1 x2 y2
    inside = (
        (xy[:, None, 0] >= b[None, :, 0])
        & (xy[:, None, 0] <= b[None, :, 2])
        & (xy[:, None, 1] >= b[None, :, 1])
        & (xy[:, None, 1] <= b[None, :, 3])
    )  # (K, D)
    return jnp.any(inside & active[None, :], axis=1)


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(D, 4) -> (D, D) pairwise IoU."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
        iou_threshold: float = 0.45, max_out: int | None = None) -> jnp.ndarray:
    """Greedy class-agnostic NMS with static shapes.

    Returns (D,) bool keep mask. Iterates max_out times (default D) of
    'pick best remaining, suppress overlaps' inside a fori_loop.
    """
    d = boxes.shape[0]
    max_out = max_out or d
    iou = iou_matrix(boxes)
    neg_inf = jnp.float32(-1e30)

    def body(_, st):
        keep, alive = st
        s = jnp.where(alive, scores, neg_inf)
        best = jnp.argmax(s)
        any_alive = s[best] > neg_inf
        keep = keep.at[best].set(keep[best] | any_alive)
        suppress = (iou[best] >= iou_threshold) & any_alive
        alive = alive & ~suppress & (jnp.arange(d) != best)
        return keep, alive

    keep0 = jnp.zeros(d, bool)
    alive0 = valid & (scores > 0)
    keep, _ = jax.lax.fori_loop(0, max_out, body, (keep0, alive0))
    return keep
