"""YOLO-class anchor-free object detector in flax, XLA-compiled.

Parity: the reference runs YOLO26s through TensorRT
(src/legacy/TRTInference.cpp: 640x640 input, [1, 300, 6] output of
(x1, y1, x2, y2, conf, class)). Here the detector is a JAX/flax model
sharing the chip with the SLAM kernels (SURVEY.md §2.1 row 'TensorRT
engine execution -> XLA-compiled JAX inference'): CSP backbone with C2f
blocks, PAN-FPN neck, decoupled anchor-free head with distribution
focal loss (DFL) box regression — the standard modern YOLO shape.

Weights: `load_weights` reads a .npz of this model's param tree
(converted offline); random init otherwise (architecture + latency are
exercised either way; COCO accuracy needs converted weights).
Compute dtype is bfloat16 — this is the one subsystem that *wants* the
MXU's fast path; the geometry stack pins f32 (see package __init__).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aria_slam_tpu.config import DetectorConfig


def _ch(c: int, w: float) -> int:
    return max(16, int(round(c * w / 8)) * 8)


def _n(d: int, mult: float) -> int:
    return max(1, int(round(d * mult)))


class ConvBnAct(nn.Module):
    out: int
    k: int = 3
    s: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit symmetric k//2 padding (ultralytics autopad), NOT
        # "SAME": at stride 2 XLA's SAME pads asymmetrically and the
        # conv windows shift by one pixel vs torch — converted weights
        # would silently misalign. BN eps matches ultralytics (1e-3).
        p = self.k // 2
        x = nn.Conv(self.out, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                         dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnAct(self.out, 3, dtype=self.dtype)(x, train)
        y = ConvBnAct(self.out, 3, dtype=self.dtype)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.out else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8-style)."""

    out: int
    n: int = 1
    shortcut: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.out // 2
        y = ConvBnAct(2 * h, 1, dtype=self.dtype)(x, train)
        parts = [y[..., :h], y[..., h:]]
        for _ in range(self.n):
            parts.append(Bottleneck(h, self.shortcut, dtype=self.dtype)(parts[-1], train))
        return ConvBnAct(self.out, 1, dtype=self.dtype)(
            jnp.concatenate(parts, -1), train
        )


class SPPF(nn.Module):
    out: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.out // 2
        x = ConvBnAct(h, 1, dtype=self.dtype)(x, train)
        p1 = nn.max_pool(x, (5, 5), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), padding="SAME")
        return ConvBnAct(self.out, 1, dtype=self.dtype)(
            jnp.concatenate([x, p1, p2, p3], -1), train
        )


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class YoloBackboneNeck(nn.Module):
    width: float = 0.5
    depth: float = 0.33
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w, d, dt = self.width, self.depth, self.dtype
        # backbone
        x = ConvBnAct(_ch(64, w), 3, 2, dt)(x, train)           # /2
        x = ConvBnAct(_ch(128, w), 3, 2, dt)(x, train)          # /4
        x = C2f(_ch(128, w), _n(3, d), True, dt)(x, train)
        x = ConvBnAct(_ch(256, w), 3, 2, dt)(x, train)          # /8
        p3 = C2f(_ch(256, w), _n(6, d), True, dt)(x, train)
        x = ConvBnAct(_ch(512, w), 3, 2, dt)(p3, train)         # /16
        p4 = C2f(_ch(512, w), _n(6, d), True, dt)(x, train)
        x = ConvBnAct(_ch(1024, w), 3, 2, dt)(p4, train)        # /32
        x = C2f(_ch(1024, w), _n(3, d), True, dt)(x, train)
        p5 = SPPF(_ch(1024, w), dt)(x, train)
        # PAN neck
        u4 = jnp.concatenate([_upsample2(p5), p4], -1)
        n4 = C2f(_ch(512, w), _n(3, d), False, dt)(u4, train)
        u3 = jnp.concatenate([_upsample2(n4), p3], -1)
        n3 = C2f(_ch(256, w), _n(3, d), False, dt)(u3, train)
        d4 = ConvBnAct(_ch(256, w), 3, 2, dt)(n3, train)
        m4 = C2f(_ch(512, w), _n(3, d), False, dt)(
            jnp.concatenate([d4, n4], -1), train)
        d5 = ConvBnAct(_ch(512, w), 3, 2, dt)(m4, train)
        m5 = C2f(_ch(1024, w), _n(3, d), False, dt)(
            jnp.concatenate([d5, p5], -1), train)
        return n3, m4, m5  # strides 8, 16, 32


class DetectHead(nn.Module):
    num_classes: int = 80
    reg_max: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        # branch widths follow ultralytics v8 Detect exactly (computed
        # from the FIRST level's channels, shared across levels) so that
        # converted checkpoints map 1:1
        ch0 = feats[0].shape[-1]
        c2 = max(16, ch0 // 4, 4 * self.reg_max)
        c3 = max(ch0, min(self.num_classes, 100))
        outs = []
        for f in feats:
            box = ConvBnAct(c2, 3, dtype=self.dtype)(f, train)
            box = ConvBnAct(c2, 3, dtype=self.dtype)(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype)(box)
            cls = ConvBnAct(c3, 3, dtype=self.dtype)(f, train)
            cls = ConvBnAct(c3, 3, dtype=self.dtype)(cls, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype)(cls)
            outs.append((box, cls))
        return outs


class Yolo(nn.Module):
    """Full detector; returns per-level (box_dfl, cls_logits) maps."""

    num_classes: int = 80
    width: float = 0.5
    depth: float = 0.33
    reg_max: int = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = YoloBackboneNeck(self.width, self.depth, self.dtype)(x, train)
        return DetectHead(self.num_classes, self.reg_max, self.dtype)(feats, train)


def decode_predictions(outs, input_size: int, num_classes: int, reg_max: int = 16):
    """Per-level DFL box decode -> ((A, 4) xyxy in input px, (A, C) scores)."""
    boxes_all, scores_all = [], []
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    for (box, cls) in outs:
        b, h, w, _ = box.shape
        stride = input_size // h
        dfl = box.reshape(b, h, w, 4, reg_max).astype(jnp.float32)
        dist = jnp.sum(jax.nn.softmax(dfl, -1) * bins, -1)  # (B,H,W,4) l,t,r,b
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        gy, gx = jnp.meshgrid(cy, cx, indexing="ij")
        x1 = gx[None] - dist[..., 0] * stride
        y1 = gy[None] - dist[..., 1] * stride
        x2 = gx[None] + dist[..., 2] * stride
        y2 = gy[None] + dist[..., 3] * stride
        boxes = jnp.stack([x1, y1, x2, y2], -1).reshape(b, h * w, 4)
        scores = jax.nn.sigmoid(cls.astype(jnp.float32)).reshape(b, h * w, num_classes)
        boxes_all.append(boxes)
        scores_all.append(scores)
    return jnp.concatenate(boxes_all, 1), jnp.concatenate(scores_all, 1)


def init_params(cfg: DetectorConfig, key=None):
    key = key if key is not None else jax.random.key(0)
    model = Yolo(cfg.num_classes, cfg.width_mult, cfg.depth_mult)
    dummy = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), jnp.float32)
    variables = model.init(key, dummy)
    return model, variables


def load_weights(path: str):
    """Load a flax param pytree from .npz (flat '/'-joined keys)."""
    import flax.traverse_util as tu

    flat = dict(np.load(path, allow_pickle=False))
    nested = tu.unflatten_dict({tuple(k.split("/")): jnp.asarray(v)
                                for k, v in flat.items()})
    return nested


def save_weights(variables, path: str):
    import flax.traverse_util as tu

    flat = tu.flatten_dict(variables)
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})
