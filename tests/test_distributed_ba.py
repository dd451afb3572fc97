"""Distributed BA must agree with the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp

from spectavi_tpu.parallel.mesh import host_cpu_mesh
from spectavi_tpu.sfm.bundle_adjust import ba_step
from spectavi_tpu.sfm.distributed import make_sharded_ba_step, pad_observations
from tests.test_bundle_adjust import _synthetic_scene


def test_sharded_ba_step_matches_local(rng):
    cams, pts, ci, pi, uv = _synthetic_scene(rng, C=5, M=80)
    cams_n = cams + 0.01 * rng.standard_normal(cams.shape) * (np.arange(5) > 0)[:, None]
    pts_n = pts + 0.03 * rng.standard_normal(pts.shape)
    w = np.ones(len(uv))
    fixed = np.zeros(5, dtype=bool)
    fixed[0] = True

    mesh = host_cpu_mesh(8, n_blocks=1)
    step = make_sharded_ba_step(mesh, axis="pairs", cg_iters=120)
    ci8, pi8, uv8, w8 = pad_observations(ci, pi, uv, w, 8)

    from jax.sharding import NamedSharding, PartitionSpec as P

    put_obs = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("pairs")))
    put_rep = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))

    nc_s, np_s, cost_s = step(
        put_rep(cams_n),
        put_rep(pts_n),
        put_obs(ci8),
        put_obs(pi8),
        put_obs(uv8),
        put_obs(w8),
        put_rep(jnp.asarray(1e-3)),
        put_rep(jnp.asarray(fixed)),
        put_rep(jnp.zeros(2)),
    )

    nc_l, np_l, cost_l = ba_step(
        jnp.asarray(cams_n),
        jnp.asarray(pts_n),
        jnp.asarray(ci),
        jnp.asarray(pi),
        jnp.asarray(uv),
        jnp.asarray(w),
        jnp.asarray(1e-3),
        jnp.asarray(fixed),
        cg_iters=120,
    )

    assert np.isclose(float(cost_s), float(cost_l), rtol=1e-10)
    # CG at finite maxiter leaves O(1e-5) iterate differences from the
    # different (psum) summation order; the step *quality* must match
    np.testing.assert_allclose(np.asarray(nc_s), np.asarray(nc_l), atol=5e-4)
    np.testing.assert_allclose(np.asarray(np_s), np.asarray(np_l), atol=5e-4)
    from spectavi_tpu.sfm.bundle_adjust import ba_cost

    after_s = float(ba_cost(jnp.asarray(nc_s), jnp.asarray(np_s), jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w)))
    after_l = float(ba_cost(jnp.asarray(nc_l), jnp.asarray(np_l), jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w)))
    assert np.isclose(after_s, after_l, rtol=1e-4)
    assert after_s < float(cost_s)


def test_sharded_ba_converges(rng):
    """Run a few sharded LM steps and require monotone cost decrease."""
    cams, pts, ci, pi, uv = _synthetic_scene(rng, C=4, M=60)
    cams_n = cams + 0.005 * rng.standard_normal(cams.shape) * (np.arange(4) > 0)[:, None]
    pts_n = pts + 0.02 * rng.standard_normal(pts.shape)
    w = np.ones(len(uv))
    fixed = np.zeros(4, dtype=bool)
    fixed[0] = True

    mesh = host_cpu_mesh(4, n_blocks=1)
    step = make_sharded_ba_step(mesh, axis="pairs", cg_iters=80)
    ci4, pi4, uv4, w4 = pad_observations(ci, pi, uv, w, 4)

    from jax.sharding import NamedSharding, PartitionSpec as P

    put_obs = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("pairs")))
    put_rep = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))
    args = [put_obs(a) for a in (ci4, pi4, uv4, w4)]
    cams_j, pts_j = put_rep(cams_n), put_rep(pts_n)
    costs = []
    from spectavi_tpu.sfm.bundle_adjust import ba_cost

    for _ in range(5):
        cams_j, pts_j, cost = step(
            cams_j, pts_j, *args, put_rep(jnp.asarray(1e-4)),
            put_rep(jnp.asarray(fixed)), put_rep(jnp.zeros(2)),
        )
        costs.append(float(cost))
    final = float(ba_cost(cams_j, pts_j, jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w)))
    assert final < costs[0] * 1e-3


def test_point_aligned_sharding_matches_local(rng):
    """The landmark partition (point-aligned observation sharding) must
    give the same LM step as the single-device solver while skipping
    the per-CG-iteration point-space psum entirely."""
    from spectavi_tpu.sfm.distributed import shard_observations_by_point

    cams, pts, ci, pi, uv = _synthetic_scene(rng, C=5, M=80)
    cams_n = cams + 0.01 * rng.standard_normal(cams.shape) * (np.arange(5) > 0)[:, None]
    pts_n = pts + 0.03 * rng.standard_normal(pts.shape)
    w = np.ones(len(uv))
    fixed = np.zeros(5, dtype=bool)
    fixed[0] = True

    mesh = host_cpu_mesh(8, n_blocks=1)
    step = make_sharded_ba_step(mesh, axis="pairs", cg_iters=120,
                                point_aligned=True)
    ci8, pi8, uv8, w8 = shard_observations_by_point(8, ci, pi, uv, w)
    # contract check: every point's observations live on one shard
    per = len(ci8) // 8
    owner = {}
    for o in range(len(ci8)):
        if w8[o] > 0:
            s = o // per
            assert owner.setdefault(int(pi8[o]), s) == s

    from jax.sharding import NamedSharding, PartitionSpec as P

    put_obs = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("pairs")))
    put_rep = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))

    nc_s, np_s, cost_s = step(
        put_rep(cams_n), put_rep(pts_n),
        put_obs(ci8), put_obs(pi8), put_obs(uv8), put_obs(w8),
        put_rep(jnp.asarray(1e-3)), put_rep(jnp.asarray(fixed)),
        put_rep(jnp.zeros(2)),
    )
    nc_l, np_l, cost_l = ba_step(
        jnp.asarray(cams_n), jnp.asarray(pts_n),
        jnp.asarray(ci), jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w),
        jnp.asarray(1e-3), jnp.asarray(fixed), cg_iters=120,
    )
    assert np.isclose(float(cost_s), float(cost_l), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(nc_s), np.asarray(nc_l), atol=5e-4)
    np.testing.assert_allclose(np.asarray(np_s), np.asarray(np_l), atol=5e-4)


def test_sharded_ba_distortion_recovers_k(rng):
    """Round-2 verdict item: the sharded step must carry the radial
    (k1, k2) model — the same distortion-recovery contract as the
    single-device test, run through the 8-device mesh."""
    from spectavi_tpu.sfm.bundle_adjust import (
        ba_cost,
        fit_distortion,
        rodrigues,
    )

    k_true = np.array([-0.15, 0.03])
    C, M = 3, 120
    cams = np.zeros((C, 6))
    for c in range(1, C):
        cams[c, :3] = rng.normal(0, 0.05, 3)
        cams[c, 3:] = rng.normal(0, 0.3, 3)
    pts = rng.standard_normal((M, 3)) * [1, 1, 0.4] + [0, 0, 5.0]
    ci = np.repeat(np.arange(C), M).astype(np.int32)
    pi = np.tile(np.arange(M), C).astype(np.int32)
    uv = []
    for c, p in zip(ci, pi):
        R = np.asarray(rodrigues(jnp.asarray(cams[c, :3])))
        Xc = R @ pts[p] + cams[c, 3:]
        x = Xc[:2] / Xc[2]
        r2 = (x * x).sum()
        uv.append(x * (1 + k_true[0] * r2 + k_true[1] * r2 * r2))
    uv = np.asarray(uv)
    w = np.ones(len(uv))
    fixed = np.zeros(C, dtype=bool)
    fixed[0] = True

    mesh = host_cpu_mesh(8, n_blocks=1)
    step = make_sharded_ba_step(mesh, axis="pairs", cg_iters=120)
    ci8, pi8, uv8, w8 = pad_observations(ci, pi, uv, w, 8)

    from jax.sharding import NamedSharding, PartitionSpec as P

    put_obs = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("pairs")))
    put_rep = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))
    obs = [put_obs(a) for a in (ci8, pi8, uv8, w8)]
    cams_j, pts_j = put_rep(cams), put_rep(pts)

    # closed-form k against the (perfect) initial geometry, then a few
    # sharded LM steps with k threaded through — mirrors bundle_adjust's
    # estimate_distortion alternation
    k = fit_distortion(
        jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci),
        jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w),
    )
    np.testing.assert_allclose(np.asarray(k), k_true, atol=5e-3)
    cost0 = float(ba_cost(jnp.asarray(cams), jnp.asarray(pts), jnp.asarray(ci),
                          jnp.asarray(pi), jnp.asarray(uv), jnp.asarray(w)))
    for _ in range(3):
        cams_j, pts_j, cost = step(
            cams_j, pts_j, *obs, put_rep(jnp.asarray(1e-6)),
            put_rep(jnp.asarray(fixed)), put_rep(jnp.asarray(k)),
        )
    final = float(ba_cost(cams_j, pts_j, jnp.asarray(ci), jnp.asarray(pi),
                          jnp.asarray(uv), jnp.asarray(w), k=jnp.asarray(k)))
    # with k carried, the sharded solve sits at the numerical floor —
    # orders of magnitude below the pinhole-only cost of the same scene
    assert final < 1e-6 * cost0
