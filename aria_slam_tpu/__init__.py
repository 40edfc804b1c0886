"""aria_slam_tpu — TPU-native visual-inertial SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capability set of the CUDA/C++
reference `robertteleng/aria-slam` (visual-inertial SLAM for Meta Aria
glasses): ORB front-end, Hamming matching on the MXU, essential-matrix
RANSAC VO, 15-state error-state EKF fusion, loop closure over a
device-resident keyframe database, SE3 pose-graph optimization, sparse
3D mapping with PLY/PCD export, and a YOLO-class object detector for
dynamic-feature filtering — all as pure, fixed-shape, jit-compiled
functions.

Reference parity map: see SURVEY.md §2 (component inventory). Each module
docstring cites the reference file it provides parity with.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry (Rodrigues, DLT, normal equations, EKF covariances) needs
# true-f32 matmuls; the default TPU MXU path (and this build's CPU backend)
# computes f32 matmuls in bf16 passes, which costs ~3 digits and breaks the
# 2 px reprojection / 1 px RANSAC gates. Integer (Hamming) matmuls are
# unaffected; the detector opts into bf16 explicitly where it wants speed.
_jax.config.update("jax_default_matmul_precision", "highest")

# Honor a user-set JAX_PLATFORMS via the config route: some device
# plugins (e.g. this rig's axon relay) ignore the env var at backend
# init, silently routing `JAX_PLATFORMS=cpu` CLI drives onto the
# tunneled TPU (where they hang if the relay is busy). The config
# route always wins; effective only before first backend use,
# harmless after.
import os as _os

_plat = _os.environ.get("JAX_PLATFORMS")
if _plat and all(p.strip() in ("cpu", "tpu")
                 for p in _plat.split(",") if p.strip()):
    # only values JAX core recognizes: the relay's own sitecustomize
    # exports its PLUGIN name (not a platform name), which must keep
    # going through the plugin's default selection
    _jax.config.update("jax_platforms", _plat)

from aria_slam_tpu.config import (  # noqa: F401
    CameraConfig,
    OrbConfig,
    MatcherConfig,
    RansacConfig,
    EkfConfig,
    LoopClosureConfig,
    MapperConfig,
    DetectorConfig,
    PipelineConfig,
)
