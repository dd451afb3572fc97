"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed paths to mirror; these tests pin the
new scale-out layer's contract: sharded execution must be bitwise
consistent with single-device execution (matching is exact; RANSAC is
deterministic given the key), per SURVEY.md §4's recommendation to test
DP/sharded matching on forced-host-device CPU meshes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spectavi_tpu.match.bruteforce import l1_topk2_xla
from spectavi_tpu.parallel.mesh import host_cpu_mesh
from spectavi_tpu.parallel.two_view import make_two_view_step, sharded_l1_topk2


def test_sharded_match_equals_local(rng):
    mesh = host_cpu_mesh(8, n_blocks=8)
    x = jnp.asarray(rng.integers(0, 255, size=(512, 32)).astype(np.int32))
    y = jnp.asarray(rng.integers(0, 255, size=(100, 32)).astype(np.int32))
    idx_s, dist_s = sharded_l1_topk2(mesh, x, y)
    idx_l, dist_l = l1_topk2_xla(x, y)
    np.testing.assert_array_equal(np.asarray(dist_s), np.asarray(dist_l))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_l))


def test_two_view_step_matches_single_device(rng):
    """The sharded step must reproduce the single-chip path: same L2
    matches, same on-device ratio-test mask, same RANSAC counts."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectavi_tpu.mvg.ransac import ransac_essential_core
    from spectavi_tpu.ops.l2nn import l2_topk_mxu
    from spectavi_tpu.parallel.mesh import BLOCKS, PAIRS

    mesh = host_cpu_mesh(8, n_blocks=2)
    B, X, Y, D = 8, 64, 32, 16
    # geometrically consistent pairs (a projected common scene with
    # near-duplicate descriptors) so the RANSAC winner is stable and
    # the sharded/single-chip essentials are comparable — on pure
    # noise the winner is a coin-flip among tied hypotheses
    desc0 = np.empty((B, X, D), np.uint8)
    desc1 = np.empty((B, Y, D), np.uint8)
    pts0 = np.empty((B, X, 2), np.float32)
    pts1 = np.empty((B, Y, 2), np.float32)
    a = 0.2
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    P1m = np.hstack([R, (-R @ np.array([1.0, 0.2, -0.5]))[:, None]])
    for b in range(B):
        base = rng.integers(0, 255, size=(Y, D))
        desc1[b] = base.astype(np.uint8)
        d0 = rng.integers(0, 255, size=(X, D))
        d0[:Y] = np.clip(base + rng.integers(-2, 3, size=(Y, D)), 0, 255)
        desc0[b] = d0.astype(np.uint8)
        Xw = rng.standard_normal((Y, 3)) * [1, 1, 0.5] + [0, 0, 5.0]
        Xh = np.hstack([Xw, np.ones((Y, 1))])
        x0h = Xh[:, :3]
        x1h = Xh @ P1m.T
        pts0[b, :Y] = (x0h[:, :2] / x0h[:, 2:]).astype(np.float32)
        pts0[b, Y:] = rng.standard_normal((X - Y, 2)).astype(np.float32)
        pts1[b] = (x1h[:, :2] / x1h[:, 2:]).astype(np.float32)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(3), B))

    min_ratio = 1.2
    step = make_two_view_step(
        mesh, trials=4, reproj_allowed=1e-2, min_ratio=min_ratio
    )
    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    E, cam, count, inl = step(
        put(desc0, P(PAIRS, BLOCKS, None)),
        put(desc1, P(PAIRS, None, None)),
        put(pts0, P(PAIRS, None, None)),
        put(pts1, P(PAIRS, None, None)),
        put(keys, P(PAIRS, None)),
    )
    assert inl.shape == (B, Y)

    # single-device reference: same matching + ratio mask + RANSAC keys
    for b in range(B):
        idx, dist = l2_topk_mxu(jnp.asarray(desc0[b]), jnp.asarray(desc1[b]), k=2)
        idx, dist = np.asarray(idx), np.asarray(dist)
        ratio_ok = dist[:, 1] >= (min_ratio**2) * np.maximum(dist[:, 0], 1e-12)
        x0 = pts0[b][idx[:, 0]]
        out = ransac_essential_core(
            jnp.asarray(keys[b]),
            jnp.asarray(x0),
            jnp.asarray(pts1[b]),
            trials=4,
            reproj_allowed=1e-2,
            svr_allowed=3e-2,
            point_mask=jnp.asarray(ratio_ok),
        )
        assert int(out["count"]) == int(count[b])
        np.testing.assert_array_equal(
            np.asarray(out["inlier_mask"]), np.asarray(inl[b])
        )
        Ea = np.asarray(out["essential"]).ravel()
        Eb = np.asarray(E[b]).ravel()
        na, nb_ = np.linalg.norm(Ea), np.linalg.norm(Eb)
        if na > 0 and nb_ > 0:
            cos = abs(Ea @ Eb) / (na * nb_)
            # counts/masks above are the bitwise contract; the model
            # direction only agrees up to f32 vmap-order divergence
            # amplified through the 7-point cubic
            assert cos > 0.99


def test_mesh_shapes():
    mesh = host_cpu_mesh(8, n_blocks=4)
    assert mesh.shape == {"pairs": 2, "blocks": 4}
    with pytest.raises(RuntimeError):
        host_cpu_mesh(1024)


def test_sharded_l2_match_equals_local(rng):
    import jax.numpy as jnp

    from spectavi_tpu.ops.l2nn import l2_topk2
    from spectavi_tpu.parallel.two_view import sharded_l2_topk2

    mesh = host_cpu_mesh(8, n_blocks=4)
    x = jnp.asarray(rng.integers(0, 255, size=(512, 128)).astype("uint8"))
    y = jnp.asarray(rng.integers(0, 255, size=(100, 128)).astype("uint8"))
    idx_s, dist_s = sharded_l2_topk2(mesh, x, y)
    idx_l, dist_l = l2_topk2(x, y)
    np.testing.assert_array_equal(np.asarray(dist_s), np.asarray(dist_l))
    np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_l))
