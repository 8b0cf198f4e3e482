"""Round-5 additions: engine-integrated distributed BA, overflow
enforcement, vectorized archive, RPE gate support.

Reference contracts: featuresMap.cpp:881-1026 (continuous optimization in
the loop), featuresMap.cpp:980-1025 (final optimization)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from putslam_tpu.config import tiny_test_config
from putslam_tpu.io import synthetic
from putslam_tpu.models import slam as slam_mod
from putslam_tpu.parallel import mesh as mesh_mod


def _small_run(n_frames=6):
    cfg = tiny_test_config()
    poses = synthetic.orbit_trajectory(n_frames, radius=0.05, yaw_amp=0.05)
    grays, depths = synthetic.render_sequence(cfg.camera, poses)
    st = slam_mod.slam_init(cfg, jnp.asarray(grays[0]), jnp.asarray(depths[0]))
    st, outs = slam_mod.slam_sequence(cfg, st, jnp.asarray(grays[1:]),
                                      jnp.asarray(depths[1:]))
    return cfg, st, poses


@pytest.mark.slow
def test_finalize_dist_matches_single_device():
    """The engine-integrated distributed finalize must land where the
    single-device finalize lands (same release/prune/polish contract,
    landmark axis sharded over the 8-device mesh)."""
    cfg, st, _ = _small_run()
    mesh = mesh_mod.make_mesh(8, axis="lm")
    st_single = slam_mod.finalize(cfg, st)
    st_dist = slam_mod.finalize_dist(cfg, st, mesh)
    kv = np.asarray(st.map.kf_valid)
    a = np.asarray(st_single.map.kf_pose)[kv]
    b = np.asarray(st_dist.map.kf_pose)[kv]
    # bf16 Schur curvature vs f32 scatter path: direction-only drift
    np.testing.assert_allclose(a, b, atol=5e-3)


@pytest.mark.slow
def test_global_ba_mesh_path_polishes():
    """global_bundle_adjust(mesh=...) must run the sharded window solves and
    produce keyframes comparable to the single-device sweep."""
    from putslam_tpu.slam_map.archive import MapArchive, global_bundle_adjust

    cfg, st, _ = _small_run()
    arch = MapArchive()
    arch.absorb(st)
    if arch.n_keyframes() < 2 or len(arch.obs) == 0:
        pytest.skip("degenerate tiny run")
    kw = dict(window=8, kf_cap=16, lm_cap=512, obs_cap=2048, pp_cap=64,
              sweeps=1, gn_iterations=4)
    kf_single = global_bundle_adjust(cfg, arch, **kw)
    mesh = mesh_mod.make_mesh(8, axis="lm")
    kf_dist = global_bundle_adjust(cfg, arch, mesh=mesh, **kw)
    np.testing.assert_allclose(kf_single, kf_dist, atol=5e-3)


def test_archive_vectorized_absorb_equivalence():
    """The chunked-array absorb must reproduce the old per-row semantics:
    every live keyframe/landmark snapshotted, fresh valid observations
    captured exactly once across repeated absorbs."""
    from putslam_tpu.slam_map.archive import MapArchive

    cfg, st, _ = _small_run()
    a1 = MapArchive()
    a1.absorb(st)
    n1_kf, n1_obs = a1.n_keyframes(), len(a1.obs)
    # double absorb of the same state must not duplicate edges
    a1.absorb(st)
    assert a1.n_keyframes() == n1_kf
    assert len(a1.obs) == n1_obs
    kf, lm, (obs_kf, obs_lm, obs_xyz, obs_w, obs_info), _ = a1.dense()
    n_valid_kf = int(np.asarray(st.map.kf_valid).sum())
    assert n1_kf == n_valid_kf
    assert len(obs_kf) == n1_obs
    # all edges reference archived vertices
    assert (obs_kf < len(kf)).all() and (obs_lm < len(lm)).all()
    n_valid_obs = int(np.asarray(st.graph.obs_valid).sum())
    assert n1_obs <= n_valid_obs
    assert n1_obs > 0
