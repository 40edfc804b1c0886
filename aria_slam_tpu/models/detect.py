"""Object-detection wrapper: image -> Detections.

Parity: reference TRTInference (src/legacy/TRTInference.cpp):
preprocess (resize to 640x640, grayscale/BGR -> RGB, /255, CHW),
engine inference, postprocess (decode + confidence gate +
cv::dnn::NMSBoxes, box rescale to the input image). Here the engine is
the flax YOLO (XLA on the same chip as the SLAM kernels) and NMS is the
batched Pallas-free greedy mask in ops/boxes.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import DetectorConfig
from aria_slam_tpu.core.types import Detections
from aria_slam_tpu.models import yolo
from aria_slam_tpu.ops import boxes as box_ops
from aria_slam_tpu.ops.pyramid import _bilinear_matrix, _sep_matmul


def preprocess(image: jnp.ndarray, size: int) -> jnp.ndarray:
    """(H, W) grayscale [0,255] -> (1, size, size, 3) float32 [0,1]
    (parity: TRTInference::preprocess, resize + normalize; grayscale is
    replicated to 3 channels like cvtColor GRAY2RGB)."""
    h, w = image.shape
    resized = _sep_matmul(image, _bilinear_matrix(size, h), _bilinear_matrix(size, w))
    norm = resized / 255.0
    return jnp.broadcast_to(norm[None, :, :, None], (1, size, size, 3)).astype(jnp.float32)


def _resolve_variables(cfg: DetectorConfig, variables, weights_path):
    if variables is not None:
        return variables
    if weights_path:
        return yolo.load_weights(weights_path)
    _, variables = yolo.init_params(cfg)
    return variables


def _postprocess(bxs, scores, cfg: DetectorConfig, h, w,
                 use_nms: bool = True) -> Detections:
    """(A, 4) boxes in detector px + (A, C) scores -> Detections in
    source-image px (parity: TRTInference postprocess + NMSBoxes)."""
    conf = jnp.max(scores, -1)
    cls = jnp.argmax(scores, -1).astype(jnp.int32)
    gate = conf >= cfg.conf_threshold
    key = jnp.where(gate, conf, -1.0)
    top_conf, top_idx = jax.lax.top_k(key, cfg.max_detections)
    cand_boxes = bxs[top_idx]
    cand_cls = cls[top_idx]
    cand_valid = top_conf > 0.0
    if use_nms:
        keep = box_ops.nms(cand_boxes, jnp.maximum(top_conf, 0.0), cand_valid,
                           cfg.nms_iou_threshold)
        cand_valid = cand_valid & keep
    sx = w / cfg.input_size
    sy = h / cfg.input_size
    scaled = cand_boxes * jnp.array([sx, sy, sx, sy], jnp.float32)
    return Detections(boxes=scaled, scores=jnp.maximum(top_conf, 0.0),
                      classes=cand_cls, valid=cand_valid)


def make_detector(cfg: DetectorConfig, variables=None,
                  weights_path: Optional[str] = None) -> Callable:
    """Returns detect(image (H, W)) -> Detections, jit-friendly.

    variables: flax tree; weights_path: .npz from yolo.save_weights or
    models/convert_weights.py. Random init otherwise (latency/
    integration path; COCO accuracy requires converted weights)."""
    model = yolo.Yolo(cfg.num_classes, cfg.width_mult, cfg.depth_mult)
    variables = _resolve_variables(cfg, variables, weights_path)

    def detect(image: jnp.ndarray) -> Detections:
        h, w = image.shape
        x = preprocess(image, cfg.input_size)
        outs = model.apply(variables, x)
        bxs, scores = yolo.decode_predictions(outs, cfg.input_size, cfg.num_classes)
        return _postprocess(bxs[0], scores[0], cfg, h, w)

    return detect


def make_batched_detector(cfg: DetectorConfig, variables=None,
                          weights_path: Optional[str] = None,
                          use_nms: bool = True) -> Callable:
    """Returns detect_batch(images (C, H, W)) -> Detections with leading
    (C,) axis — the chunked-mode execution shape: ONE model forward over
    the whole chunk (the TPU analogue of the reference's per-frame
    detectAsync on a second CUDA stream, src/main.cpp:129-140; here the
    batch amortizes dispatch and fills the MXU).

    use_nms=False skips NMS: dynamic-object filtering only tests point
    containment, for which suppressed near-duplicate boxes change
    nothing, and the 300-iteration greedy NMS loop per frame is pure
    sequential latency inside an otherwise parallel program."""
    model = yolo.Yolo(cfg.num_classes, cfg.width_mult, cfg.depth_mult)
    variables = _resolve_variables(cfg, variables, weights_path)

    def detect_batch(images: jnp.ndarray) -> Detections:
        c, h, w = images.shape
        x = jax.vmap(lambda im: preprocess(im, cfg.input_size)[0])(images)
        outs = model.apply(variables, x)
        bxs, scores = yolo.decode_predictions(outs, cfg.input_size, cfg.num_classes)
        return jax.vmap(
            lambda b, s: _postprocess(b, s, cfg, h, w, use_nms=use_nms)
        )(bxs, scores)

    return detect_batch
