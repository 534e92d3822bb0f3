"""Pallas chunk intersector vs the dense oracle (interpret mode on CPU)."""

import pytest
import numpy as np
import jax.numpy as jnp

from tpu_pathtracer.ops.intersect import build_woop, closest_hit, tri_capacity
from tpu_pathtracer.ops.pallas_intersect import (
    CHUNK_TRIS,
    build_chunk_woop,
    closest_hit_chunks,
)
from tpu_pathtracer.scene.accel import (
    LEAF_SIZE,
    build_leaves,
    chunk_aabbs,
    leaf_woop,
    morton_order,
)

EPS = 1e-4


def _scene(n_tris, seed, spread=5.0):
    rng = np.random.default_rng(seed)
    center = rng.uniform(-spread, spread, size=(n_tris, 1, 3))
    verts = center + rng.uniform(-0.5, 0.5, size=(n_tris, 3, 3))
    cap = tri_capacity(n_tris)
    out = np.full((cap, 3, 3), 1e30, dtype=np.float64)
    out[:n_tris] = verts
    valid = np.zeros(cap, dtype=bool)
    valid[:n_tris] = True
    perm = morton_order(out, valid)
    return out[perm], valid[perm]


def test_chunk_kernel_matches_dense_interpret():
    verts, valid = _scene(2000, seed=0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(1)
    r = 256
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    pk = closest_hit_chunks(
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.asarray(cw),
        jnp.asarray(cmin),
        jnp.asarray(cmax),
        jnp.asarray(woop),
        EPS,
        ray_tile=128,
        interpret=True,
    )
    hd, hp = np.asarray(dense.hit), np.asarray(pk.hit)
    assert (hd == hp).mean() > 0.995
    both = hd & hp
    np.testing.assert_allclose(
        np.asarray(pk.t)[both], np.asarray(dense.t)[both], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(pk.tri)[both] == np.asarray(dense.tri)[both]).mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(pk.beta)[both], np.asarray(dense.beta)[both],
        rtol=1e-4, atol=1e-5,
    )


def test_group_sizes_agree_exactly():
    """The group size (chunks per grid step) is a pure perf knob: every
    group value must produce bit-identical hits — the in-kernel tmin cull
    only skips chunks that cannot beat the current best, and the strict
    ``<`` min-update keeps the lowest-index winner under ties regardless of
    grouping."""
    verts, valid = _scene(6000, seed=3, spread=12.0)  # 48 chunks
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    assert cw.shape[0] > 16

    rng = np.random.default_rng(4)
    r = 256
    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)

    # Mix of localized short-baseline rays and wide scene-crossing rays.
    target = verts[valid][0, 0]
    o = np.concatenate(
        [
            (target + rng.normal(scale=0.5, size=(r // 2, 3))),
            rng.uniform(-14, 14, size=(r // 2, 3)),
        ]
    ).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    results = [
        closest_hit_chunks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
            jnp.asarray(cmax), jnp.asarray(woop), group=g, **kw,
        )
        # 5 exercises group padding (48 % 5 != 0); 32 the bitmask's top bit.
        for g in (1, 5, 16, 32)
    ]
    base = results[0]
    assert np.asarray(base.hit).sum() > 30
    for other in results[1:]:
        np.testing.assert_array_equal(
            np.asarray(base.hit), np.asarray(other.hit)
        )
        both = np.asarray(base.hit)
        np.testing.assert_array_equal(
            np.asarray(base.tri)[both], np.asarray(other.tri)[both]
        )
        np.testing.assert_array_equal(
            np.asarray(base.t)[both], np.asarray(other.t)[both]
        )


def test_group_kernel_matches_dense_oracle():
    """Grouped kernel with the in-kernel slab+tmin cull against the exact
    dense sweep on a larger scene (the cull must never drop the closest
    hit)."""
    verts, valid = _scene(6000, seed=7, spread=12.0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(8)
    r = 256
    o = rng.uniform(-14, 14, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    pk = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), EPS, ray_tile=128,
        interpret=True,
    )
    hd, hp = np.asarray(dense.hit), np.asarray(pk.hit)
    assert (hd == hp).mean() > 0.995
    both = hd & hp
    np.testing.assert_allclose(
        np.asarray(pk.t)[both], np.asarray(dense.t)[both], rtol=1e-5, atol=1e-6
    )


def test_twopass_matches_dense_interpret():
    """The two-pass front-to-back worklist grid (current-best-t cutoff +
    residual recheck) must agree exactly with the dense bit-gated grid —
    both on localized rays (tight worklists, pass 2 nearly empty) and on
    wide rays piercing everything (pass-1 truncation + large residual
    buckets)."""
    verts, valid = _scene(16000, seed=11, spread=20.0)  # 128 chunks
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    assert cw.shape[0] >= 96

    rng = np.random.default_rng(12)
    r = 256
    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)

    target = verts[valid][0, 0]
    o1 = (target + rng.normal(scale=0.5, size=(r, 3))).astype(np.float32)
    o2 = rng.uniform(-22, 22, size=(r, 3)).astype(np.float32)
    # group=1 -> cg=128 (deep worklists, pass-1 cap truncates); group=2 ->
    # cg=64 (bucketed residual caps differ).  Both against the dense oracle.
    for o in (o1, o2):
        d = rng.normal(size=(r, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        for g in (1, 2):
            dense = closest_hit_chunks(
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw),
                jnp.asarray(cmin), jnp.asarray(cmax), jnp.asarray(woop),
                group=g, mode="dense", **kw,
            )
            # "items" = the same cascade with the compacted work-item grid
            # (one step per active (tile, group) pair) in place of the
            # per-tile slot grid.
            for mode in ("twopass", "items"):
                got = closest_hit_chunks(
                    jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw),
                    jnp.asarray(cmin), jnp.asarray(cmax), jnp.asarray(woop),
                    group=g, mode=mode, **kw,
                )
                np.testing.assert_array_equal(
                    np.asarray(dense.hit), np.asarray(got.hit)
                )
                both = np.asarray(dense.hit)
                np.testing.assert_array_equal(
                    np.asarray(got.tri)[both], np.asarray(dense.tri)[both]
                )
                np.testing.assert_array_equal(
                    np.asarray(got.t)[both], np.asarray(dense.t)[both]
                )


def test_super_block_gate_matches_dense(monkeypatch):
    """The coarse super-block gate (prefetched skip of whole activity
    steps) must not change results: rays that miss a 512-chunk super-AABB
    get zero activity from the gate instead of the slab sweep, and
    everything else is identical.  Forced on via the threshold so the small
    test scene exercises both kernel branches (tiles whose rays pierce the
    scene, and tiles aimed entirely away)."""
    import tpu_pathtracer.ops.pallas_intersect as pi

    verts, valid = _scene(16000, seed=21, spread=20.0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(22)
    r = 256
    o = rng.uniform(-24, 24, size=(r, 3)).astype(np.float32)
    # Aim at random spots inside the scene so most rays cross geometry.
    aim = rng.uniform(-10, 10, size=(r, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # Second half: far away, aimed away from the scene -> whole tiles gated.
    o[r // 2:] = 1e4
    d[r // 2:] = np.array([1.0, 0.0, 0.0], np.float32)

    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)
    dense = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), mode="dense", **kw,
    )
    # Round 4: the threshold moved from the module constant into
    # IntersectTuning.super_min (a static jit arg, so no cache clearing is
    # needed — a different tuning is a different trace).  super_tbound_min=1
    # additionally forces the T-BOUNDED coarse recheck gate so its
    # conservativeness is pinned by the same dense comparison.
    from tpu_pathtracer.config import IntersectTuning

    gated = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), mode="twopass",
        tuning=IntersectTuning(super_min=0, super_tbound_min=1), **kw,
    )
    assert np.asarray(dense.hit)[: r // 2].sum() > 50
    assert not np.asarray(dense.hit)[r // 2:].any()
    np.testing.assert_array_equal(np.asarray(dense.hit), np.asarray(gated.hit))
    both = np.asarray(dense.hit)
    np.testing.assert_array_equal(
        np.asarray(gated.t)[both], np.asarray(dense.t)[both]
    )


def test_gated_recheck_matches_ungated(monkeypatch):
    """Live-block-gated rechecks (TPU_PT_GATE_RECHECK, default on) skip
    activity grid steps whose column block has no active-untested group
    left.  Gating must be result-invariant: gated == ungated == dense.
    _ACT_COLS is shrunk so the small scene spans several column blocks and
    the gate has real skipping opportunities (rays that hit early tighten
    their t bound and kill whole far blocks between passes)."""
    import tpu_pathtracer.ops.pallas_intersect as pi

    verts, valid = _scene(16000, seed=41, spread=20.0)  # 125 chunks
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(42)
    r = 256
    o = rng.uniform(-24, 24, size=(r, 3)).astype(np.float32)
    aim = rng.uniform(-12, 12, size=(r, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)
    args = (
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop),
    )
    dense = closest_hit_chunks(*args, mode="dense", **kw)
    monkeypatch.setattr(pi, "_ACT_COLS", 64)  # 125 chunks -> 2 blocks
    for gate in ("1", "0"):
        monkeypatch.setenv("TPU_PT_GATE_RECHECK", gate)
        closest_hit_chunks.clear_cache()  # env + _ACT_COLS read at trace
        got = closest_hit_chunks(*args, mode="twopass", **kw)
        np.testing.assert_array_equal(
            np.asarray(dense.hit), np.asarray(got.hit)
        )
        both = np.asarray(dense.hit)
        np.testing.assert_array_equal(
            np.asarray(got.t)[both], np.asarray(dense.t)[both]
        )
        np.testing.assert_array_equal(
            np.asarray(got.tri)[both], np.asarray(dense.tri)[both]
        )


def test_activity_on_plane_zero_direction_component():
    """Regression: a ray whose origin lies exactly ON a chunk-AABB plane
    with a zero direction component along that axis must still activate the
    chunk (0 * inf = NaN in the slab test used to cull it falsely).

    Axis-aligned wall geometry puts chunk AABB planes exactly through the
    surfaces secondary rays spawn on, so this is a real configuration, not
    a pathological one."""
    # A floor quad in the z=0 plane plus a TILTED wall triangle in the same
    # chunk: the chunk AABB's min-z plane (z=0) passes exactly through the
    # ray origin, and the real hit is on the tilted triangle.
    verts = np.zeros((16, 3, 3))
    verts[:] = 1e30
    verts[0] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
    verts[1] = [[1, 0, 0], [1, 1, 0], [0, 1, 0]]
    verts[2] = [[2, -5, -0.0], [2, 5, -0.0], [3, 0.25, 5.0]]
    valid = np.zeros(16, bool)
    valid[:3] = True
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    assert float(cmin[0][2]) == 0.0  # the chunk min-z plane IS z=0... or -0
    r = 128
    # Origin exactly on the chunk's min-z plane, direction with d.z == 0,
    # aimed at the tilted triangle.
    o = np.tile(np.array([-0.5, 0.25, 0.0], np.float32), (r, 1))
    d = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (r, 1))

    hit = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), EPS, ray_tile=128,
        interpret=True,
    )
    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    # The dense oracle hits the tilted triangle; the chunked kernel must not
    # lose it to a NaN-culled activity bit (0 * inf on the on-plane axis).
    assert np.asarray(dense.hit).all()
    np.testing.assert_array_equal(np.asarray(hit.hit), np.asarray(dense.hit))
    np.testing.assert_allclose(
        np.asarray(hit.t), np.asarray(dense.t), rtol=1e-5
    )


def test_iterating_residual_matches_dense(monkeypatch):
    """Past the SMEM budget the residual runs as a while_loop of
    budget-sized worklist passes with a best-t recheck between them
    (whole-scene bit arrays overflowed SMEM at 820k tris).  Forced on via
    TPU_PT_MAX_CAP with wide rays that keep many groups active, so several
    iterations execute; must agree exactly with the dense oracle."""
    import tpu_pathtracer.ops.pallas_intersect as pi

    verts, valid = _scene(16000, seed=31, spread=20.0)  # 128 chunks
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(32)
    r = 256
    o = rng.uniform(-24, 24, size=(r, 3)).astype(np.float32)
    aim = rng.uniform(-12, 12, size=(r, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)
    dense = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), group=1, mode="dense", **kw,
    )
    monkeypatch.setenv("TPU_PT_MAX_CAP", "16")  # cg = 128 >> 16
    assert np.asarray(dense.hit).sum() > 100
    both = np.asarray(dense.hit)
    # "items" additionally clamps the near-ladder caps by the budget (the
    # 820k scene's unclamped pass-2 cap overflowed SMEM on chip).
    for mode in ("twopass", "items"):
        closest_hit_chunks.clear_cache()
        loop = closest_hit_chunks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
            jnp.asarray(cmax), jnp.asarray(woop), group=1, mode=mode, **kw,
        )
        np.testing.assert_array_equal(
            np.asarray(dense.hit), np.asarray(loop.hit)
        )
        np.testing.assert_array_equal(
            np.asarray(loop.t)[both], np.asarray(dense.t)[both]
        )
        np.testing.assert_array_equal(
            np.asarray(loop.tri)[both], np.asarray(dense.tri)[both]
        )


def test_nearest_box_ids_matches_dense_argmin():
    """The target-sort-key kernel's argmin box id equals a dense jnp oracle
    (entry-distance ties may pick either id — compared by entry t)."""
    from tpu_pathtracer.ops.pallas_intersect import (
        group_boxes,
        nearest_box_ids,
        ray_sort_key_target,
    )

    rng = np.random.default_rng(7)
    c = 37
    cmin = rng.uniform(-5, 4, size=(c, 3)).astype(np.float32)
    cmax = cmin + rng.uniform(0.1, 1.5, size=(c, 3)).astype(np.float32)
    glo, ghi = group_boxes(jnp.asarray(cmin), jnp.asarray(cmax))
    assert glo.shape == (-(-c // 8), 3)
    # Group boxes bound their member chunks.
    glo_np, ghi_np = np.asarray(glo), np.asarray(ghi)
    for g in range(c // 8):
        assert (glo_np[g] <= cmin[g * 8 : (g + 1) * 8]).all()
        assert (ghi_np[g] >= cmax[g * 8 : (g + 1) * 8]).all()

    r = 512
    o = rng.uniform(-6, 6, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ids = np.asarray(
        nearest_box_ids(
            jnp.asarray(o), jnp.asarray(d), glo, ghi, EPS,
            ray_tile=128, interpret=True,
        )
    )

    inv = 1.0 / np.where(d == 0, 1e-30, d)
    t1 = (glo_np[None] - o[:, None]) * inv[:, None]
    t2 = (ghi_np[None] - o[:, None]) * inv[:, None]
    lo = np.nanmax(np.minimum(t1, t2), axis=-1)
    hi = np.nanmin(np.maximum(t1, t2), axis=-1)
    ok = (lo <= hi) & (hi >= EPS)
    entry = np.where(ok, np.maximum(lo, EPS), np.inf)
    ref_t = entry.min(axis=1)
    for i in range(r):
        if np.isinf(ref_t[i]):
            assert ids[i] == -1
        else:
            assert ids[i] >= 0 and np.isclose(entry[i, ids[i]], ref_t[i])

    alive = rng.random(r) < 0.9
    key = np.asarray(
        ray_sort_key_target(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive), glo, ghi,
            EPS, ray_tile=128, interpret=True,
        )
    )
    assert (key[~alive] == (1 << 28)).all()
    live = key[alive]
    # Live keys are bucket*8 + octant with bucket <= group count.
    assert live.min() >= 0 and live.max() < (glo.shape[0] + 1) * 8


def test_chunk_width_64_matches_dense():
    """The kernels read chunk width from chunk_woop.shape[-1]; a 64-tri
    packing (TPU_PT_CHUNK_TRIS sweep value) must agree with the dense sweep
    exactly like the default 128."""
    verts, valid = _scene(2000, seed=9)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, 64 // LEAF_SIZE)
    cw = build_chunk_woop(woop, 64)
    assert cw.shape[-1] == 64

    rng = np.random.default_rng(10)
    r = 256
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    pk = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), EPS, ray_tile=128,
        interpret=True,
    )
    hd, hp = np.asarray(dense.hit), np.asarray(pk.hit)
    assert (hd == hp).mean() > 0.995
    both = hd & hp
    np.testing.assert_allclose(
        np.asarray(pk.t)[both], np.asarray(dense.t)[both], rtol=1e-5,
        atol=1e-6,
    )
    assert (np.asarray(pk.tri)[both] == np.asarray(dense.tri)[both]).mean() > 0.99


def test_cheap_recheck_matches_dense(monkeypatch):
    """TPU_PT_CHEAP_RECHECK=1 replaces the cascade's slab-sweep rechecks
    with a compare against the STORED per-sub-tile entry minima (bounded by
    the sub-tile max of the per-ray best t); =2 is the hybrid (cheap
    between near passes, full slab recheck before the residual).
    Conservative supersets of the per-ray recheck -> results must stay
    exactly equal to the dense oracle, in both pass-grid modes."""
    verts, valid = _scene(16000, seed=41, spread=20.0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(42)
    r = 256
    o = rng.uniform(-24, 24, size=(r, 3)).astype(np.float32)
    aim = rng.uniform(-12, 12, size=(r, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # ray_tile 128 with TPU_PT_SUB=64 -> n_sub=2: the cheap path engages.
    monkeypatch.setenv("TPU_PT_SUB", "64")
    kw = dict(min_dst=EPS, ray_tile=128, interpret=True)
    closest_hit_chunks.clear_cache()
    dense = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), mode="dense", **kw,
    )
    assert np.asarray(dense.hit).sum() > 100
    both = np.asarray(dense.hit)
    for cheap_mode in ("1", "2"):
        monkeypatch.setenv("TPU_PT_CHEAP_RECHECK", cheap_mode)
        for mode in ("twopass", "items"):
            closest_hit_chunks.clear_cache()
            got = closest_hit_chunks(
                jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw),
                jnp.asarray(cmin), jnp.asarray(cmax), jnp.asarray(woop),
                mode=mode, **kw,
            )
            np.testing.assert_array_equal(
                np.asarray(dense.hit), np.asarray(got.hit)
            )
            np.testing.assert_array_equal(
                np.asarray(got.t)[both], np.asarray(dense.t)[both]
            )
            np.testing.assert_array_equal(
                np.asarray(got.tri)[both], np.asarray(dense.tri)[both]
            )
    closest_hit_chunks.clear_cache()


def test_unknown_intersect_mode_rejected(monkeypatch):
    """A typo'd TPU_PT_INTERSECT/mode must raise, not silently fall through
    to the slot-grid cascade (which would ship the wrong variant's timing in
    an env-knob A/B campaign)."""
    verts, valid = _scene(512, seed=7, spread=8.0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    o = np.zeros((128, 3), np.float32)
    d = np.tile(np.array([1, 0, 0], np.float32), (128, 1))
    closest_hit_chunks.clear_cache()
    with pytest.raises(ValueError, match="unknown intersect mode"):
        closest_hit_chunks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw),
            jnp.asarray(cmin), jnp.asarray(cmax), jnp.asarray(woop),
            min_dst=EPS, ray_tile=128, interpret=True, mode="item",
        )
    closest_hit_chunks.clear_cache()


def test_production_scale_matches_oracle():
    """Exactness at a chunk count where the PRODUCTION thresholds engage on
    their own (super-block gate past 2048 chunks, SMEM-budgeted caps,
    iterating residual) — no forced knobs.  The XLA dense sweep is the
    oracle; its scanned TRI_BLOCK path rounds t differently from the
    broadcast-FMA form (~1 ulp), so t compares to 1e-5 relative while hit
    masks and triangle ids must be exactly equal (verified benign at 2M
    tris / 16008 chunks: 4/57 rays differed by <=8e-6 on the same tri)."""
    verts, valid = _scene(333_000, seed=51, spread=60.0)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    assert cw.shape[0] > 2048  # the super-block gate engages for real

    rng = np.random.default_rng(52)
    r = 128
    o = rng.uniform(-70, 70, size=(r, 3)).astype(np.float32)
    aim = rng.uniform(-40, 40, size=(r, 3)).astype(np.float32)
    d = aim - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    closest_hit_chunks.clear_cache()
    got = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), min_dst=EPS, ray_tile=128,
        interpret=True,
    )
    oracle = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    both = np.asarray(oracle.hit)
    assert both.sum() > 20
    np.testing.assert_array_equal(np.asarray(got.hit), both)
    np.testing.assert_array_equal(np.asarray(got.tri)[both],
                                  np.asarray(oracle.tri)[both])
    np.testing.assert_allclose(np.asarray(got.t)[both],
                               np.asarray(oracle.t)[both], rtol=1e-5)
    closest_hit_chunks.clear_cache()


def test_padding_chunks_never_activate():
    """All-padding chunks must be NEVER-HIT (NaN boxes), not inverted
    +inf/-inf boxes: the slab test's per-axis min/max swaps an inverted
    box's infinities into t_lo=-inf / t_hi=+inf, i.e. an always-hit box
    with the minimum possible entry distance — which would head every
    front-to-back worklist, burn near-ladder cap slots, and collapse the
    "target" sort key into a single bucket (code-review r3 finding)."""
    from tpu_pathtracer.ops.pallas_intersect import (
        group_boxes,
        nearest_box_ids,
        tile_chunk_activity,
    )

    # 1100 tris -> capacity 2048 (TRI_BLOCK multiple) -> chunks 9..15 are
    # all-padding.
    verts, valid = _scene(1100, seed=7)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    pad_chunks = ~np.isfinite(cmin[:, 0])
    assert pad_chunks.sum() >= 2 and pad_chunks[-1]
    assert np.isnan(cmin[pad_chunks]).all() and np.isnan(cmax[pad_chunks]).all()

    rng = np.random.default_rng(8)
    r = 128
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [
            jnp.asarray(o), jnp.ones((r, 1), jnp.float32),
            jnp.asarray(d), jnp.zeros((r, 1), jnp.float32),
        ],
        axis=1,
    )
    act, ent, _, _ = tile_chunk_activity(
        rays, jnp.asarray(cmin), jnp.asarray(cmax), EPS, ray_tile=128,
        interpret=True,
    )
    act, ent = np.asarray(act), np.asarray(ent)
    assert not act[:, pad_chunks].any()
    assert np.isinf(ent[:, pad_chunks]).all()
    # Real chunks in front of the rays still activate.
    assert act[:, ~pad_chunks].any()

    # The target sort key's first-entered-group argmin must never return a
    # padding group (with inverted boxes it returned one for EVERY ray not
    # strictly inside a real group box).
    g_lo, g_hi = group_boxes(jnp.asarray(cmin), jnp.asarray(cmax))
    ids = np.asarray(
        nearest_box_ids(
            jnp.asarray(o), jnp.asarray(d), g_lo, g_hi, EPS, ray_tile=128,
            interpret=True,
        )
    )
    pad_groups = np.nonzero(~np.isfinite(np.asarray(g_lo)[:, 0]))[0]
    assert not np.isin(ids, pad_groups).any()
    assert (ids >= 0).any()


def test_empty_light_clusters_are_nan():
    from tpu_pathtracer.scene.accel import light_clusters

    rng = np.random.default_rng(9)
    lv = np.zeros((256, 3, 3), np.float64)
    lv[:40] = rng.uniform(-2, 2, size=(40, 3, 3))
    cl_min, cl_max, _, _ = light_clusters(lv, count=40, cluster=128)
    assert np.isnan(cl_min[1]).all() and np.isnan(cl_max[1]).all()
    assert np.isfinite(cl_min[0]).all()


@pytest.mark.parametrize("n_tris,r,seed", [(2000, 256, 0), (20_000, 512, 3)])
def test_bins_mode_matches_dense(n_tris, r, seed):
    """mode="bins" (per-ray binned worklists — the round-4 lever #1,
    shipped as an opt-in experiment) is exact vs the dense oracle: the
    binned pair set is a superset of every hit-producing (ray, chunk)
    pair, the kernel is the shared _kernel_items, and the scatter-min
    tie-break (smallest tri id among equal t) matches the dense sweep."""
    verts, valid = _scene(n_tris, seed=seed)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)

    rng = np.random.default_rng(seed + 1)
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    closest_hit_chunks.clear_cache()
    got = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), EPS, ray_tile=128,
        interpret=True, mode="bins",
    )
    closest_hit_chunks.clear_cache()
    hd = np.asarray(dense.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), hd)
    np.testing.assert_allclose(
        np.asarray(got.t)[hd], np.asarray(dense.t)[hd], rtol=1e-5, atol=1e-6
    )
    assert (np.asarray(got.tri)[hd] == np.asarray(dense.tri)[hd]).mean() > 0.99


def test_bins_overflow_falls_back_dense(monkeypatch):
    """A bins capacity overflow (TPU_PT_BINS_CAP rows exceeded) must fall
    back to the bit-gated dense grid and stay exact."""
    monkeypatch.setenv("TPU_PT_BINS_CAP", "1")  # force overflow
    verts, valid = _scene(2000, seed=4)
    woop = build_woop(verts, valid)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    cw = build_chunk_woop(woop)
    rng = np.random.default_rng(5)
    r = 128
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dense = closest_hit(jnp.asarray(o), jnp.asarray(d), jnp.asarray(woop), EPS)
    closest_hit_chunks.clear_cache()
    got = closest_hit_chunks(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(cw), jnp.asarray(cmin),
        jnp.asarray(cmax), jnp.asarray(woop), EPS, ray_tile=128,
        interpret=True, mode="bins",
    )
    closest_hit_chunks.clear_cache()
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(dense.hit))
    hd = np.asarray(dense.hit)
    np.testing.assert_allclose(
        np.asarray(got.t)[hd], np.asarray(dense.t)[hd], rtol=1e-5, atol=1e-6
    )


def test_activity_m8_packing_matches_sub_entries():
    """The activity kernel's in-kernel m8 packing (round 5: bit s of chunk
    c's int32 = sub-tile s active) must equal the bits re-derived from the
    f32 sub-entry output, for every n_sub and for the gated kernel's
    skipped blocks — the contract every downstream consumer (group masks,
    bitpack, group stats) now builds on."""
    from tpu_pathtracer.ops.pallas_intersect import (
        super_block_bits,
        tile_chunk_activity,
    )

    verts, valid = _scene(900, seed=11)
    lmin, lmax = build_leaves(verts, valid, LEAF_SIZE)
    cmin, cmax = chunk_aabbs(lmin, lmax, CHUNK_TRIS // LEAF_SIZE)
    rng = np.random.default_rng(12)
    r = 256
    o = rng.uniform(-8, 8, size=(r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [
            jnp.asarray(o), jnp.ones((r, 1), jnp.float32),
            jnp.asarray(d), jnp.zeros((r, 1), jnp.float32),
        ],
        axis=1,
    )
    cmin_j, cmax_j = jnp.asarray(cmin), jnp.asarray(cmax)
    # Also exercise a finite per-ray t bound (the recheck form).
    tb = jnp.asarray(rng.uniform(0.5, 20.0, size=(r,)).astype(np.float32))
    for n_sub in (1, 2, 4, 8):
        for tbest in (None, tb):
            for gated in (False, True):
                cbits = (
                    super_block_bits(
                        rays, cmin_j, cmax_j, EPS, 128, True, tbest=tbest
                    )
                    if gated
                    else None
                )
                act, ent, m8, sub_ent = tile_chunk_activity(
                    rays, cmin_j, cmax_j, EPS, ray_tile=128, interpret=True,
                    tbest=tbest, coarse_bits=cbits, n_sub=n_sub,
                    want_sub_ent=True,
                )
                m8 = np.asarray(m8)
                bits = np.asarray(
                    np.isfinite(np.asarray(sub_ent)).astype(np.int32)
                )
                expect = np.zeros_like(m8)
                for s in range(n_sub):
                    expect |= bits[:, s, :] << s
                assert (m8 == expect).all(), (n_sub, tbest is None, gated)
                assert (np.asarray(act) == (expect != 0)).all()
                # Tile entry must be finite exactly where the tile is active.
                assert (
                    np.isfinite(np.asarray(ent)) == (expect != 0)
                ).all()
