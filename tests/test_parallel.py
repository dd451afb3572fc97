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
    from jax.sharding import NamedSharding, PartitionSpec as P

    from spectavi_tpu.mvg.ransac import ransac_essential_core
    from spectavi_tpu.parallel.mesh import BLOCKS, PAIRS

    mesh = host_cpu_mesh(8, n_blocks=2)
    B, X, Y, D = 8, 64, 32, 16
    desc0 = rng.integers(0, 255, size=(B, X, D)).astype(np.int32)
    desc1 = rng.integers(0, 255, size=(B, Y, D)).astype(np.int32)
    pts0 = rng.standard_normal((B, X, 2)).astype(np.float32)
    pts1 = rng.standard_normal((B, Y, 2)).astype(np.float32)
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(3), B))

    step = make_two_view_step(mesh, trials=4, reproj_allowed=1e-2)
    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))
    E, cam, count = step(
        put(desc0, P(PAIRS, BLOCKS, None)),
        put(desc1, P(PAIRS, None, None)),
        put(pts0, P(PAIRS, None, None)),
        put(pts1, P(PAIRS, None, None)),
        put(keys, P(PAIRS, None)),
    )

    # single-device reference: same matching + same RANSAC keys
    for b in range(B):
        idx, _ = l1_topk2_xla(jnp.asarray(desc0[b]), jnp.asarray(desc1[b]))
        x0 = pts0[b][np.asarray(idx)[:, 0]]
        out = ransac_essential_core(
            jnp.asarray(keys[b]),
            jnp.asarray(x0),
            jnp.asarray(pts1[b]),
            trials=4,
            reproj_allowed=1e-2,
            svr_allowed=3e-2,
        )
        assert int(out["count"]) == int(count[b])
        # f32 batched-vs-vmapped eigh orderings differ at ~1e-4 rel;
        # compare directions (E is defined up to scale anyway)
        Ea = np.asarray(out["essential"]).ravel()
        Eb = np.asarray(E[b]).ravel()
        cos = abs(Ea @ Eb) / (np.linalg.norm(Ea) * np.linalg.norm(Eb))
        assert cos > 1.0 - 1e-6


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
