"""PipelineFactory (parity: include/factory/PipelineFactory.hpp:9-47,
ExecutionMode {GPU, CPU, MOCK} -> here {TPU, CPU, MOCK}).

- create_tpu / create_cpu: the same jitted program; backend selection is
  just jax device placement (SURVEY.md §4: 'JAX makes the fake backend
  story trivial').
- create_mock: injects a deterministic mock extractor/matcher so the
  whole orchestration can be driven without images (parity with the
  reference's planned MockExtractor/MockMatcher wiring,
  docs/milestones/H12 via SURVEY.md §4.3).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

from aria_slam_tpu.config import PipelineConfig
from aria_slam_tpu.core.types import Features
from aria_slam_tpu.pipeline.slam_pipeline import SlamPipeline


class ExecutionMode(enum.Enum):
    TPU = "tpu"
    CPU = "cpu"
    MOCK = "mock"


def _mock_extractor(cfg: PipelineConfig):
    """Deterministic pseudo-features derived from image content: grid
    keypoints with descriptors hashed from local intensities."""
    k = cfg.orb.num_features
    bits = cfg.orb.descriptor_bits

    def extract(image: jnp.ndarray) -> Features:
        h, w = image.shape
        side = int(k**0.5) + 1
        ys = jnp.linspace(20, h - 20, side)
        xs = jnp.linspace(20, w - 20, side)
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)[:k].astype(jnp.float32)
        vals = image[xy[:, 1].astype(jnp.int32), xy[:, 0].astype(jnp.int32)]
        seeds = (vals * 2654435761.0).astype(jnp.uint32)
        cols = jnp.arange(bits, dtype=jnp.uint32)
        desc = (((seeds[:, None] >> (cols[None, :] % 31)) ^ cols[None, :]) & 1).astype(jnp.int8)
        return Features(
            xy=xy,
            response=jnp.ones((k,), jnp.float32),
            angle=jnp.zeros((k,), jnp.float32),
            octave=jnp.zeros((k,), jnp.int32),
            size=jnp.full((k,), 31.0, jnp.float32),
            desc=desc,
            valid=jnp.ones((k,), bool),
        )

    return extract


def create(mode: ExecutionMode | str = ExecutionMode.TPU,
           config: PipelineConfig | None = None,
           detector_weights: str | None = None, **kw) -> SlamPipeline:
    mode = ExecutionMode(mode) if isinstance(mode, str) else mode
    config = config or PipelineConfig()
    if config.enable_detection and "detector" not in kw:
        from aria_slam_tpu.models.detect import make_detector

        kw["detector"] = make_detector(
            config.detector,
            weights_path=detector_weights or config.detector_weights,
        )
    if mode is ExecutionMode.MOCK:
        return SlamPipeline(config, extractor=_mock_extractor(config), **kw)
    # TPU vs CPU: jax picks the default backend; tests pin JAX_PLATFORMS=cpu
    return SlamPipeline(config, **kw)


def create_tpu(config: PipelineConfig | None = None, **kw) -> SlamPipeline:
    return create(ExecutionMode.TPU, config, **kw)


def create_cpu(config: PipelineConfig | None = None, **kw) -> SlamPipeline:
    return create(ExecutionMode.CPU, config, **kw)


def create_mock(config: PipelineConfig | None = None, **kw) -> SlamPipeline:
    return create(ExecutionMode.MOCK, config, **kw)
