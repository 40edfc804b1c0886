"""Ports: the dependency-injection seams of the pipeline.

Parity: the reference's 8 pure-virtual interfaces
(include/interfaces/*.hpp — IFeatureExtractor, IMatcher, ILoopDetector,
IObjectDetector, ISensorFusion, IMapper, IAriaDevice, IAudioFeedback).
In the TPU design these are Python Protocols over *pure jax-traceable
functions*: any implementation that satisfies the signature can be
injected into the jitted frame step (real kernels, CPU-JAX, or mocks —
SURVEY.md §7.1 'the H12 port/adapter seams survive as Python
protocols'). Device/audio ports stay host-side (see io/aria.py,
utils/audio.py).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp

from aria_slam_tpu.core.types import Detections, EkfState, Features, MapState, Matches


@runtime_checkable
class FeatureExtractor(Protocol):
    """Parity: IFeatureExtractor (include/interfaces/IFeatureExtractor.hpp)."""

    def __call__(self, image: jnp.ndarray) -> Features: ...


@runtime_checkable
class Matcher(Protocol):
    """Parity: IMatcher (include/interfaces/IMatcher.hpp)."""

    def __call__(self, query: Features, train: Features) -> Matches: ...


@runtime_checkable
class ObjectDetector(Protocol):
    """Parity: IObjectDetector (include/interfaces/IObjectDetector.hpp)."""

    def __call__(self, image: jnp.ndarray) -> Detections: ...


@runtime_checkable
class PoseEstimator(Protocol):
    """The epipolar-VO stage (reference keeps it inline in the app loop,
    src/main.cpp:179-201; here it is an injectable port)."""

    def __call__(self, xy1, xy2, valid, key) -> "PoseDelta": ...  # noqa: F821


@runtime_checkable
class LoopDetector(Protocol):
    """Parity: ILoopDetector (include/interfaces/ILoopDetector.hpp)."""

    def __call__(self, db, feats: Features, frame_id, key) -> "LoopResult": ...  # noqa: F821


@runtime_checkable
class SensorFusion(Protocol):
    """Parity: ISensorFusion (include/interfaces/ISensorFusion.hpp:
    predictIMU/updateVO folded into one frame_step over a padded IMU
    window + VO measurement)."""

    def __call__(self, state: EkfState, imu_t, imu_accel, imu_gyro,
                 imu_valid, R_vo, t_vo, vo_valid, frame_t) -> EkfState: ...


@runtime_checkable
class Mapper(Protocol):
    """Parity: IMapper (include/interfaces/IMapper.hpp: triangulate into
    the padded map buffer)."""

    def __call__(self, map_state: MapState, K, T1_cw, T2_cw,
                 uv1, uv2, valid, image) -> MapState: ...
