"""Pallas TPU kernel: fused FAST-9 score map + non-max suppression.

The XLA path (ops/fast.py) runs the 16 shifted compares, the 16-arc
contiguity test, and the windowed-max NMS as separate fusions over the
frame. This kernel executes the WHOLE detection response pipeline in one
VMEM-resident pass — the padded image loads once, every intermediate lives
in registers/VMEM, and one (H, W) score map is written back
(reference stage: src/Matcher/matcherOpenCV.cpp:118-196 detection).

Measured on the v5e (round 5): the XLA elementwise chain is already fused
well enough that this kernel lands at parity (±10 %), not ahead — kept as
a selectable path (`DetectorConfig.use_pallas_detect`) and as the
committed evidence that Pallas runs on this backend; the profile table in
BENCH_DETAIL carries the comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from putslam_tpu.ops.fast import FAST_OFFSETS

_PAD = 3


def _kernel(img_ref, thr_ref, out_ref, *, H: int, W: int, nms_radius: int):
    """img_ref: (H+6, W+6) padded intensities ×255; out: (H, W) NMS'd
    score."""
    t = thr_ref[0, 0]
    center = img_ref[_PAD:_PAD + H, _PAD:_PAD + W]

    mask_b = jnp.zeros((H, W), jnp.int32)
    mask_d = jnp.zeros((H, W), jnp.int32)
    excess_b = jnp.zeros((H, W), jnp.float32)
    excess_d = jnp.zeros((H, W), jnp.float32)
    for k, (dx, dy) in enumerate(FAST_OFFSETS):
        nb = img_ref[_PAD + dy:_PAD + dy + H, _PAD + dx:_PAD + dx + W]
        diff = nb - center
        mask_b = mask_b | ((diff > t).astype(jnp.int32) << k)
        mask_d = mask_d | ((diff < -t).astype(jnp.int32) << k)
        excess_b = excess_b + jnp.maximum(diff - t, 0.0)
        excess_d = excess_d + jnp.maximum(-diff - t, 0.0)

    is_bright = jnp.zeros((H, W), jnp.bool_)
    is_dark = jnp.zeros((H, W), jnp.bool_)
    full = (1 << 16) - 1
    for s in range(16):
        arc = (((0x1FF << s) | (0x1FF >> (16 - s))) & full)
        is_bright = is_bright | ((mask_b & arc) == arc)
        is_dark = is_dark | ((mask_d & arc) == arc)
    score = jnp.where(is_bright, excess_b, 0.0) \
        + jnp.where(is_dark, excess_d, 0.0)

    # kill the border where the circle leaves the image
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (rows >= _PAD) & (rows < H - _PAD) \
        & (cols >= _PAD) & (cols < W - _PAD)
    score = jnp.where(inside, score, 0.0)

    # separable windowed max over (2r+1)²: shifted maxes on a padded copy
    r = nms_radius
    pad_r = jnp.pad(score, ((0, 0), (r, r)), constant_values=-jnp.inf)
    row_max = score
    for d in range(-r, r + 1):
        if d != 0:
            row_max = jnp.maximum(row_max, pad_r[:, r + d:r + d + W])
    pad_c = jnp.pad(row_max, ((r, r), (0, 0)), constant_values=-jnp.inf)
    pooled = row_max
    for d in range(-r, r + 1):
        if d != 0:
            pooled = jnp.maximum(pooled, pad_c[r + d:r + d + H, :])
    out_ref[:] = jnp.where((score >= pooled) & (score > 0.0), score, 0.0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def fast_score_nms(gray: jnp.ndarray, threshold: float,
                   nms_radius: int) -> jnp.ndarray:
    """(H, W) [0,1] intensities → NMS'd FAST-9 score map, fused in one
    Pallas pass. Drop-in for fast.nms(fast.fast_score_map(g, t), r)."""
    H, W = gray.shape
    padded = jnp.pad(gray * 255.0, ((_PAD, _PAD), (_PAD, _PAD)))
    thr = jnp.full((1, 1), threshold, jnp.float32)
    interpret = jax.default_backend() != "tpu"   # CPU tests run interpreted
    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, nms_radius=nms_radius),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # the unrolled 16-offset chain keeps ~20 (H, W) f32 temporaries
        # live — beyond the 16 MB default scoped-vmem budget at 640×480;
        # the v5e has 128 MB physical VMEM, so raise the scoped limit
        # rather than tiling (one frame fits comfortably)
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(padded, thr)
