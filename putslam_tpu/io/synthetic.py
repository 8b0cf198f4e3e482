"""Synthetic RGB-D sequence generator (raycast box world).

Fills the role of the reference's dataset fixtures when no TUM/ICL data is on
disk (the reference replays datasets through ``FileGrabber``,
src/Grabber/fileGrabber.cpp:40-160; its only synthetic data is noise in
demos/demoKabsch.cpp:19-26). Here we render a *photoconsistent* world — a
procedurally textured axis-aligned room observed from an arbitrary camera
trajectory — entirely in JAX, so frames can be generated on-device at
benchmark speed with exact ground-truth poses and depth.

Conventions: camera looks down +z, x right, y down; a pose is camera→world
(world = R @ p_cam + t) in the se3 (...,7) layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from putslam_tpu.config import CameraConfig
from putslam_tpu.geometry import se3


# ---------------------------------------------------------------------------
# Procedural 3D texture: multi-scale hashed value noise → lots of corners.
# ---------------------------------------------------------------------------


def _hash3(ix, iy, iz, seed):
    # NB: float→uint32 of a negative value clamps to 0 in XLA; go through
    # int32 first so negative cells wrap (two's complement) and still vary.
    ix = ix.astype(jnp.int32).astype(jnp.uint32)
    iy = iy.astype(jnp.int32).astype(jnp.uint32)
    iz = iz.astype(jnp.int32).astype(jnp.uint32)
    h = (
        ix * jnp.uint32(73856093)
        ^ iy * jnp.uint32(19349663)
        ^ iz * jnp.uint32(83492791)
        ^ jnp.uint32(seed) * jnp.uint32(2654435761)
    )
    h = h ^ (h >> 13)
    h = h * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return (h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0


def texture3d(p, footprint=None, seed: int = 7):
    """Intensity in [0,1] at world points p (...,3): piecewise-constant cells at
    three scales (sharp edges → strong FAST corners) + a smooth shading term.

    ``footprint`` (...,) is the projected pixel size on the surface in world
    units; octaves whose cells are smaller than the footprint fade out
    (analytic mipmapping) so the texture stays photoconsistent across
    viewpoints instead of aliasing at grazing angles."""
    out = 0.0
    for octave, (scale, weight) in enumerate(((4.0, 0.45), (10.0, 0.3), (24.0, 0.15))):
        g = jnp.floor(p * scale)
        val = _hash3(g[..., 0], g[..., 1], g[..., 2], seed + octave)
        if footprint is not None:
            # cells per pixel footprint; fade to mid-gray as cells alias
            cpp = footprint * scale
            fade = jnp.clip((1.0 - cpp) / 0.6, 0.0, 1.0)
            val = fade * val + (1.0 - fade) * 0.5
        out = out + weight * val
    # smooth large-scale shading so walls are not uniformly bright
    out = out + 0.1 * (0.5 + 0.5 * jnp.sin(p[..., 0] * 1.7 + p[..., 2] * 0.9))
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Raycast renderer.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 4))
def render_frame(cam: CameraConfig, pose, box_min=None, box_max=None,
                 supersample: int = 2, seed: int = 7):
    """Render (gray, depth) for a camera pose inside an axis-aligned room.

    gray: (H,W) float32 in [0,1]; depth: (H,W) float32 metres (z-depth).
    ``supersample``: render the intensity at s× resolution and average-pool
    down (anti-aliasing — mimics camera optics; without it, fine texture
    shimmers between viewpoints and breaks descriptor photoconsistency).
    """
    if box_min is None:
        box_min = jnp.array([-3.0, -2.0, -3.0])
    if box_max is None:
        box_max = jnp.array([3.0, 2.0, 3.0])
    ss = supersample
    H, W = cam.height, cam.width
    u = (jnp.arange(W * ss, dtype=jnp.float32) + 0.5) / ss - 0.5
    v = (jnp.arange(H * ss, dtype=jnp.float32) + 0.5) / ss - 0.5
    uu, vv = jnp.meshgrid(u, v)
    # Unnormalized camera ray with z = 1 → ray parameter t equals z-depth.
    dir_cam = jnp.stack(
        [(uu - cam.cu) / cam.fu, (vv - cam.cv) / cam.fv, jnp.ones_like(uu)], axis=-1
    )
    R = se3.quat_to_matrix(se3.rotation_quat(pose))
    o = se3.translation(pose)
    d = jnp.einsum("ij,hwj->hwi", R, dir_cam)

    # Exit-t of a ray starting inside the box (slab method).
    safe_d = jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t_hi = (box_max - o) / safe_d
    t_lo = (box_min - o) / safe_d
    t_far = jnp.maximum(t_hi, t_lo)          # per-axis exit t
    t = jnp.min(t_far, axis=-1)              # first wall hit
    t = jnp.maximum(t, 1e-3)

    hit = o + t[..., None] * d
    # Pixel footprint on the hit surface: angular pixel size (1/fu at ss×
    # resolution) × ray length ÷ incidence cosine against the hit wall.
    axis = jnp.argmin(t_far, axis=-1)
    n_dot_d = jnp.take_along_axis(jnp.abs(d), axis[..., None], axis=-1)[..., 0]
    d_norm = jnp.linalg.norm(d, axis=-1)
    cos_inc = jnp.maximum(n_dot_d / jnp.maximum(d_norm, 1e-9), 0.05)
    footprint = (t * d_norm) / (cam.fu * ss) / cos_inc
    gray = texture3d(hit, footprint, seed)
    if ss > 1:
        gray = gray.reshape(H, ss, W, ss).mean(axis=(1, 3))
        t = t.reshape(H, ss, W, ss)[:, 0, :, 0]  # depth: plain subsample
    depth = t  # z-depth because dir_cam z-component is 1
    return gray, depth


def orbit_trajectory(n_frames: int, radius: float = 0.8, height_amp: float = 0.15,
                     yaw_amp: float = 0.35, dtype=jnp.float32):
    """Smooth looping trajectory inside the room: lateral arc + small yaw.

    Returns (n_frames, 7) camera→world poses. Motion magnitudes are chosen so
    consecutive frames overlap heavily (like a handheld TUM sequence).
    """
    s = jnp.linspace(0.0, 2.0 * jnp.pi, n_frames, dtype=dtype)
    t = jnp.stack(
        [radius * jnp.sin(s), height_amp * jnp.sin(2.0 * s),
         0.5 * radius * jnp.cos(s) - 0.5],
        axis=-1,
    )
    yaw = yaw_amp * jnp.sin(s)
    pitch = 0.1 * jnp.cos(2.0 * s)
    qz = jnp.stack([jnp.cos(yaw / 2), jnp.zeros_like(yaw), jnp.sin(yaw / 2),
                    jnp.zeros_like(yaw)], axis=-1)  # yaw about y
    qx = jnp.stack([jnp.cos(pitch / 2), jnp.sin(pitch / 2), jnp.zeros_like(yaw),
                    jnp.zeros_like(yaw)], axis=-1)  # pitch about x
    q = se3.quat_mul(qz, qx)
    return se3.make_pose(t, q)


def revisit_trajectory(n_frames: int, sweep: float = 1.2,
                       height_amp: float = 0.08, yaw_amp: float = 0.12,
                       dtype=jnp.float32):
    """Leave-and-return trajectory for loop-closure testing: the camera
    strafes out to ``sweep`` metres and comes back, ending where it started
    while always facing the same wall — the final frames re-observe the
    first frames' scene after a long excursion (no continuous covisibility
    bridge, unlike the orbit). The reference's loop-closure datasets have
    exactly this structure (fr1_room, PUT Kin sequences).

    Returns (n_frames, 7) camera→world poses."""
    s = jnp.linspace(0.0, 1.0, n_frames, dtype=dtype)
    # single out-and-back lobe; every component is symmetric in s ↔ 1−s so
    # the return leg retraces the outbound viewpoints exactly (a corridor
    # walked out and back) — the revisit is real, the drift is what differs
    lobe = jnp.sin(jnp.pi * s)
    t = jnp.stack(
        [sweep * lobe, height_amp * lobe, 0.15 * lobe - 0.5], axis=-1)
    yaw = yaw_amp * lobe
    qz = jnp.stack([jnp.cos(yaw / 2), jnp.zeros_like(yaw), jnp.sin(yaw / 2),
                    jnp.zeros_like(yaw)], axis=-1)
    return se3.make_pose(t, qz)


def handheld_trajectory(n_frames: int, seed: int = 0,
                        step_t: float = 0.013, step_r: float = 0.011,
                        pos_amp=(0.9, 0.45, 0.6), rot_amp: float = 0.35,
                        dtype=jnp.float32):
    """Pseudo-random handheld-style trajectory at fr1_desk-like dynamics.

    fr1_desk moves at ≈0.41 m/s / 23 °/s, i.e. ≈0.013 m and ≈0.77° per
    frame at 30 Hz — nothing like the smooth parametric orbit used by the
    benches. This generator produces Gaussian-smoothed random walks in
    translation and rotation, rescaled so the *median per-frame step*
    matches ``step_t`` metres / ``step_r`` radians, then amplitude-clamped
    to stay inside the render box (camera near (0,0,−0.5) facing the +z
    wall). Used to materialize the ≥600-frame on-disk TUM sequences the
    file-player acceptance path runs on (fileGrabber.cpp:40-160,
    runPUTSLAM.py:15-40).

    Returns (n_frames, 7) camera→world poses."""
    rng = np.random.default_rng(seed)
    sigma = 25.0
    pad = int(4 * sigma)
    k = np.exp(-0.5 * ((np.arange(-pad, pad + 1)) / sigma) ** 2)
    k /= k.sum()

    def smooth_channel(amp, target_step):
        raw = rng.normal(size=(n_frames + 2 * pad,))
        s = np.convolve(raw, k, mode="valid")[:n_frames]
        s = s - s.mean()
        d = np.abs(np.diff(s))
        scale = target_step / max(np.median(d), 1e-12)
        # clamp: never leave the room / never spin past rot_amp
        return np.clip(s * scale, -amp, amp)

    t = np.stack([smooth_channel(pos_amp[0], step_t),
                  smooth_channel(pos_amp[1], 0.6 * step_t),
                  smooth_channel(pos_amp[2], 0.8 * step_t)], axis=-1)
    t = t + np.array([0.0, 0.0, -0.5])
    rv = np.stack([smooth_channel(rot_amp * 0.6, 0.6 * step_r),
                   smooth_channel(rot_amp, step_r),
                   smooth_channel(rot_amp * 0.4, 0.4 * step_r)], axis=-1)
    q = jax.vmap(se3.so3_exp_quat)(jnp.asarray(rv, dtype))
    return se3.make_pose(jnp.asarray(t, dtype), q)


def degrade_sequence(grays, depths, seed: int = 0,
                     intensity_sigma: float = 0.0,
                     depth_dropout: float = 0.0,
                     depth_sigma: float = 0.0,
                     blur: int = 0):
    """Sensor-noise injection (the robustness fixtures the reference only
    has as demoKabsch's Gaussian perturbations, demos/demoKabsch.cpp:19-26):

    * ``intensity_sigma`` — additive Gaussian image noise (shot noise),
    * ``depth_dropout`` — fraction of pixels with missing depth (holes → 0,
      which the lifting path treats as invalid, like a real RGB-D sensor),
    * ``depth_sigma`` — additive Gaussian depth noise in metres,
    * ``blur`` — horizontal box blur of width 2·blur+1 px (motion blur).

    Returns (grays', depths') as jnp arrays."""
    key = jax.random.PRNGKey(seed)
    g = jnp.asarray(grays)
    d = jnp.asarray(depths)
    if intensity_sigma > 0:
        key, k = jax.random.split(key)
        g = jnp.clip(g + intensity_sigma * jax.random.normal(k, g.shape),
                     0.0, 1.0)
    if blur > 0:
        w = 2 * blur + 1
        kernel = jnp.ones((w,), g.dtype) / w
        g = jax.vmap(lambda img: jax.vmap(
            lambda row: jnp.convolve(row, kernel, mode="same"))(img))(g)
    if depth_sigma > 0:
        key, k = jax.random.split(key)
        d = jnp.maximum(d + depth_sigma * jax.random.normal(k, d.shape), 0.0)
    if depth_dropout > 0:
        key, k = jax.random.split(key)
        holes = jax.random.uniform(k, d.shape) < depth_dropout
        d = jnp.where(holes, 0.0, d)
    return g, d


def render_sequence(cam: CameraConfig, poses, seed: int = 7):
    """Render a whole trajectory with lax.map (memory-bounded): returns
    (grays (N,H,W), depths (N,H,W))."""
    def step(pose):
        return render_frame(cam, pose, seed=seed)

    return jax.lax.map(step, poses)


def synthetic_sequence(cam: CameraConfig, n_frames: int = 30, seed: int = 7,
                       motion: str = "orbit"):
    """Convenience: (grays, depths, gt_poses) as numpy arrays."""
    if motion == "orbit":
        poses = orbit_trajectory(n_frames)
    elif motion == "static":
        poses = jnp.tile(se3.identity(), (n_frames, 1))
    else:
        raise ValueError(motion)
    grays, depths = render_sequence(cam, poses, seed=seed)
    return np.asarray(grays), np.asarray(depths), np.asarray(poses)
