import json
import os
import subprocess
import sys

import pytest

import jax.numpy as jnp
import numpy as np

from putslam_tpu.backend import graph as graph_mod, optimize
from putslam_tpu.config import BackendConfig, tiny_test_config
from putslam_tpu.geometry import se3
from putslam_tpu.io import g2o
from putslam_tpu.utils import checkpoint, timing

from test_backend import build_problem


def test_checkpoint_roundtrip(tmp_path):
    from putslam_tpu.io import synthetic
    from putslam_tpu.models import slam

    cfg = tiny_test_config()
    g, d = synthetic.render_frame(cfg.camera, se3.identity())
    st = slam.slam_init(cfg, g, d)
    path = str(tmp_path / "state.npz")
    checkpoint.save_state(path, st)
    st2 = checkpoint.load_state(path, slam.slam_init(cfg, g * 0, d))
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


import jax  # noqa: E402


def test_checkpoint_shape_mismatch_raises(tmp_path):
    s = {"a": jnp.zeros((3,))}
    path = str(tmp_path / "s.npz")
    checkpoint.save_state(path, s)
    try:
        checkpoint.load_state(path, {"a": jnp.zeros((4,))})
        assert False, "expected ValueError"
    except ValueError:
        pass


@pytest.mark.slow
def test_g2o_roundtrip_and_reoptimize(tmp_path, rng):
    kf_true, lm_true, kf_init, lm_init, g = build_problem(rng, K=5, L=32,
                                                          obs_per_kf=24)
    K, L = kf_init.shape[0], lm_init.shape[0]
    path = str(tmp_path / "graph.g2o")
    g2o.export_graph(path, kf_init, np.ones(K, bool), lm_init,
                     np.ones(L, bool), g)
    txt = open(path).read()
    assert "VERTEX_SE3:QUAT" in txt and "VERTEX_TRACKXYZ" in txt
    assert "EDGE_SE3_TRACKXYZ" in txt and "FIX 0" in txt

    kf2, kfv, lm2, lmv, g2, fixed = g2o.import_graph(path, K, L, 1024, 64)
    np.testing.assert_allclose(np.asarray(kf2), kf_init, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lm2), lm_init, atol=1e-5)
    assert int(g2.n_obs) == int(g.n_obs)

    # optimizing the imported graph converges like the original
    bcfg = BackendConfig(gn_iterations=6, robust_kernel="none", damping=1e-5)
    res = optimize.gauss_newton(bcfg, kf2, kfv, lm2, lmv, g2, fixed)
    chi = np.asarray(res.chi2)
    assert chi[-1] < chi[0]


def test_stage_timer_and_dumps(tmp_path):
    t = timing.StageTimer()
    with t.stage("detection"):
        pass
    t.add("matching", 0.002)
    t.add("matching", 0.004)
    s = t.summary()
    assert abs(s["matching"]["mean_ms"] - 3.0) < 1e-6
    t.write_times_txt(str(tmp_path / "times.txt"))
    out = open(tmp_path / "times.txt").read()
    assert "matching" in out and "detection" in out
    timing.write_fps(str(tmp_path / "fps.res"), 300, 10.0)
    assert open(tmp_path / "fps.res").read().strip() == "30.000"


@pytest.mark.slow
def test_run_cli_synthetic(tmp_path):
    """End-to-end CLI: synthetic sequence, VO-only (fast path)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from putslam_tpu.run import main;"
        f"main(['--synthetic','8','--only-vo','--out','{tmp_path}'])"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "VO_trajectory.res")
    assert os.path.exists(tmp_path / "fps.res")
    import json

    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    rep = json.loads(line)
    assert rep["frames"] == 8
    assert "ate_rmse_m" in rep


@pytest.mark.slow
def test_run_experiments_sweep(tmp_path):
    """Batch driver (runPUTSLAM.py + summarizeResults.py analog): sweep one
    reference-style preset over a synthetic sequence and aggregate."""
    import shutil

    ref_res = "/root/reference/resources"
    if not os.path.isdir(ref_res):
        pytest.skip("reference not mounted")
    preset = tmp_path / "configs" / "fr1"
    preset.mkdir(parents=True)
    for f in os.listdir(ref_res):
        if f.startswith("putslam") and f.endswith(".xml"):
            shutil.copy(os.path.join(ref_res, f), preset / f)
    shutil.copytree(os.path.join(ref_res, "datasetConfig"),
                    preset / "datasetConfig")

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.path.insert(0,'/root/repo');"
        "from tools.run_experiments import main;"
        f"raise SystemExit(main(['--configs','{tmp_path / 'configs'}',"
        f"'--synthetic','6','--dataset-name','freiburg1_desk',"
        f"'--out','{tmp_path / 'results'}']))"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(open(tmp_path / "results" / "resultSummary.json").read())
    assert "fr1" in summary["presets"]
    rep = summary["presets"]["fr1"]
    assert rep["frames"] == 6
    assert "ate_rmse_m" in rep
    assert summary["aggregate"]["fps"]["n"] == 1
