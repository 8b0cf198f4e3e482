import time
import jax, jax.numpy as jnp, numpy as np
from putslam_tpu.config import tum_fr1_config
from putslam_tpu.io import synthetic
from putslam_tpu.models import vo
from putslam_tpu.frontend import ransac as ransac_mod
from putslam_tpu.ops import matching, kabsch

T = 64

def fetch(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

def timeit(name, fn, *args, per=T-1, reps=10):
    out = fn(*args); fetch(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.time() - t0) / reps)
    print(f"{name:44s} {best*1e3:9.2f} ms/call {best/per*1e3:8.3f} ms/frame", flush=True)

cfg = tum_fr1_config()
poses = synthetic.orbit_trajectory(T, radius=0.10, yaw_amp=0.1)
grays, depths = synthetic.render_sequence(cfg.camera, poses)
feats = jax.jit(lambda g, d: vo.detect_sequence(cfg, g, d))(grays, depths)
fetch(feats.uv)
key = jax.random.PRNGKey(0)
prev = jax.tree.map(lambda x: x[:-1], feats)
curr = jax.tree.map(lambda x: x[1:], feats)
keys = jax.random.split(key, T - 1)
print("backend:", jax.default_backend(), "H:", cfg.ransac.n_hypotheses,
      "refits:", cfg.ransac.refit_iterations)

# matching only
def match_only(a, b):
    dist = matching.hamming_matrix(a.desc, b.desc, a.valid, b.valid)
    m = matching.mutual_nn(dist, cfg.matcher.max_hamming)
    return m.idx_b
timeit("hamming+mutual_nn", jax.jit(lambda a, b: jax.vmap(match_only)(a, b)), prev, curr)

# precompute matches for ransac-only timing
m_all = jax.jit(lambda a, b: jax.vmap(
    lambda aa, bb: matching.mutual_nn(
        matching.hamming_matrix(aa.desc, bb.desc, aa.valid, bb.valid),
        cfg.matcher.max_hamming))(a, b))(prev, curr)
p_all = jax.vmap(lambda c, m: c.xyz[m])(curr, m_all.idx_b)
q_all = prev.xyz
v_all = m_all.valid & prev.has_depth & jax.vmap(lambda c, m: c.has_depth[m])(curr, m_all.idx_b)
fetch(p_all)

rns = jax.jit(lambda k, p, q, v: jax.vmap(
    lambda kk, pp, qq, vv: ransac_mod.estimate(cfg.ransac, cfg.camera, kk, pp, qq, vv))(k, p, q, v))
timeit("ransac.estimate (full)", rns, keys, p_all, q_all, v_all)

# kabsch hypothesis fit alone: (T-1, H, 3, 3)
H = cfg.ransac.n_hypotheses
ki = jax.random.randint(key, (T-1, H, 3), 0, 512)
ps = jax.vmap(lambda pp, ii: pp[ii])(p_all, ki)
qs = jax.vmap(lambda qq, ii: qq[ii])(q_all, ki)
w = jnp.ones(ps.shape[:-1])
fetch(ps)
timeit("weighted_kabsch H hyps", jax.jit(lambda a, b, ww: kabsch.weighted_kabsch(a, b, ww)), ps, qs, w)

# error eval alone
Tb = jax.jit(lambda a, b, ww: kabsch.weighted_kabsch(a, b, ww))(ps, qs, w)
fetch(Tb)
err_fn = jax.jit(lambda Tt, p, q: jax.vmap(
    lambda T1, p1, q1: ransac_mod._pair_errors(cfg.ransac, cfg.camera, T1, p1, q1)[0])(Tt, p, q))
timeit("pair_errors (H,N)", err_fn, Tb, p_all, q_all)
