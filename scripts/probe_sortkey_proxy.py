#!/usr/bin/env python
"""CPU proxy: how much pair ALU can a BETTER per-bounce ray order buy?

The cascade's pair-ALU floor is set by sub-tile UNION size: a 64-ray
sub-tile activates the union of its rays' pierced chunks (~132 on atrium
secondaries vs 6.5 per-ray truth — VERDICT r3 missing #1).  Rounds 1-3
sorted by geometry proxies (spawn chunk x octant = the "hint" default).
This probe asks the ordering question directly on a REAL secondary
wavefront: for each candidate order, what is sum over sub-tiles of
|union(pierced sets)| — i.e. the chunk-activation count that pair ALU is
proportional to — at 64-ray and 512-ray granularity, both t-bounded
(t_enter <= t_best, the cascade's exact prune) and unbounded?

Orders probed:
  hint        spawn-surface chunk id x octant (the production default)
  cell        origin Morton cell x octant (the round-2 key)
  hint+dir    hint key extended with fine direction bits within the
              octant (2x2 / 4x4 subdivision of the two minor axes)
  sig-lex     ORACLE-ISH: lexicographic sort by the ray's own pierced
              chunk list (first 4 ids) — clusters rays whose sets share
              prefixes; uses the answer to order the question, so it is
              an upper bound no cheap key can exceed
  greedy      ORACLE: seed each 64-block with the ray whose set is
              rarest, then greedily add the ray with max overlap
              (O(R^2) on a 8k subsample, extrapolated) — the clustering
              bound itself

Pure numpy/CPU (JAX cpu backend for the two closest-hit calls); writes
out/probe_sortkey_proxy.json.
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPU_PATHTRACER_PLATFORM", "cpu")

import numpy as np


def union_cost(order, sets_bits, block):
    """sum over blocks of `block` rays (in `order`) of |union of sets|.

    sets_bits: [R, W] packed uint64 bitmasks of pierced chunks."""
    sb = sets_bits[order]
    r = sb.shape[0]
    nb = r // block
    blocks = sb[: nb * block].reshape(nb, block, -1)
    un = np.bitwise_or.reduce(blocks, axis=1)
    return int(np.unpackbits(un.view(np.uint8)).sum())


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.models.pathtracer import (
        gen_rays,
        per_pixel_uniforms,
        scene_closest_hit,
    )
    from tpu_pathtracer.ops import sampling
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    r = int(os.environ.get("PROBE_R", str(64 * 1024)))
    detail = int(os.environ.get("PROBE_DETAIL", "2"))
    eps = 1e-4
    path = make_atrium_gltf("/tmp/probe_sortkey/a.gltf", detail=detail)
    scene = parse_gltf_scene(path, 1.0)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(512, 512))
    c = scene.chunk_woop.shape[0]
    chunk_tris = scene.chunk_woop.shape[-1]

    # --- real secondary wavefront (probe_bins2 recipe) -------------------
    pix = jnp.arange(r, dtype=jnp.int32) % (512 * 512)
    offs = per_pixel_uniforms(jax.random.key(0), pix, 2)
    o, d = gen_rays(scene.camera, pix, offs)
    hit0 = scene_closest_hit(scene, o, d, eps)
    row = scene.shade_attrs[hit0.tri]
    v = row[:, 0:9].reshape(-1, 3, 3)
    gn = jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    gn = jnp.where((jnp.sum(gn * d, axis=-1) > 0)[:, None], -gn, gn)
    u = per_pixel_uniforms(jax.random.key(1), pix, 2)
    d1 = np.asarray(sampling.cosine_sample(gn, u[0], u[1]))
    o1 = np.asarray(jnp.where(hit0.hit[:, None], o + hit0.t[:, None] * d, 1e30))
    alive = np.asarray(hit0.hit)
    spawn_chunk = np.where(alive, np.asarray(hit0.tri) // chunk_tris, -1)

    hit1 = scene_closest_hit(
        scene, jnp.asarray(o1), jnp.asarray(d1), eps
    )
    t_best = np.where(np.asarray(hit1.hit), np.asarray(hit1.t), np.inf)
    t_best = np.where(alive, t_best, -np.inf)  # dead rays pierce nothing

    # --- pierced sets: numpy slab test, [R, C] ---------------------------
    lo = np.asarray(scene.chunk_aabb_min)  # [C, 3]
    hi = np.asarray(scene.chunk_aabb_max)
    inv = 1.0 / np.where(d1 == 0.0, 1e-30, d1)  # [R, 3]
    t_lo = np.full((r, c), -np.inf, np.float32)
    t_hi = np.full((r, c), np.inf, np.float32)
    for a in range(3):
        t1 = (lo[None, :, a] - o1[:, a, None]) * inv[:, a, None]
        t2 = (hi[None, :, a] - o1[:, a, None]) * inv[:, a, None]
        np.maximum(t_lo, np.minimum(t1, t2), out=t_lo)
        np.minimum(t_hi, np.maximum(t1, t2), out=t_hi)
    pierced = (t_lo <= t_hi) & (t_hi >= eps)
    pierced_b = pierced & (t_lo <= t_best[:, None])

    def pack(bits):  # [R, C] bool -> [R, W] uint64
        pad = (-c) % 64
        b = np.pad(bits, ((0, 0), (0, pad)))
        by = np.packbits(b, axis=1)
        return by.view(np.uint64) if by.shape[1] % 8 == 0 else by

    emit = lambda **kw: print(json.dumps(kw), flush=True)
    results = {"rays": r, "chunks": c,
               "per_ray_unbounded": float(pierced.sum() / r),
               "per_ray_tbounded": float(pierced_b.sum() / alive.sum()),
               "alive": int(alive.sum())}
    emit(**results)

    octant = (
        (d1[:, 0] > 0).astype(np.int64) * 4
        + (d1[:, 1] > 0) * 2
        + (d1[:, 2] > 0)
    )

    # fine-direction bits: bucket the two LARGEST |d| minor axes? keep it
    # simple — bucket d1 (unit) components into nd bins each on the two
    # axes other than the octant's dominant one; dominant = argmax |d|.
    dom = np.argmax(np.abs(d1), axis=1)
    ax = np.arange(3)
    minor = np.stack([np.where(dom == 0, 1, 0), np.where(dom == 2, 1, 2)], 1)
    mvals = np.take_along_axis(d1, minor, axis=1)  # [-1, 1]

    def dir_bits(nd):
        b = np.clip(((mvals + 1) * 0.5 * nd).astype(np.int64), 0, nd - 1)
        return (dom * nd + b[:, 0]) * nd + b[:, 1]

    scene_lo = np.asarray(scene.chunk_aabb_min).min(0)
    scene_hi = np.asarray(scene.chunk_aabb_max).max(0)
    ext = np.maximum(scene_hi - scene_lo, 1e-30)
    cell16 = np.clip(((o1 - scene_lo) / ext * 16).astype(np.int64), 0, 15)

    def spread(x):
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = spread(cell16[:, 0]) * 4 + spread(cell16[:, 1]) * 2 + spread(
        cell16[:, 2]
    )

    keys = {
        "hint": np.where(alive, spawn_chunk * 8 + octant, 1 << 28),
        "cell": np.where(alive, octant * 4096 + morton, 1 << 28),
        "hint+dir2": np.where(
            alive, (spawn_chunk * 8 + octant) * 16 + dir_bits(2), 1 << 40
        ),
        "hint+dir4": np.where(
            alive, (spawn_chunk * 8 + octant) * 64 + dir_bits(4), 1 << 40
        ),
        "dir4+hint": np.where(
            alive, dir_bits(4) * (c + 1) * 8 + spawn_chunk * 8 + octant,
            1 << 40,
        ),
    }

    # sig-lex oracle: first 4 pierced (t-bounded) chunk ids, lexicographic.
    first4 = np.full((r, 4), c, np.int32)
    for i in range(r):
        ids = np.flatnonzero(pierced_b[i])[:4]
        first4[i, : len(ids)] = ids
    sig = (
        ((first4[:, 0].astype(np.int64) * (c + 1) + first4[:, 1]) * (c + 1)
         + first4[:, 2]) * (c + 1) + first4[:, 3]
    )
    keys["sig-lex"] = np.where(alive, sig, np.int64(1) << 60)

    pb = pack(pierced_b)
    pu = pack(pierced)
    out = {"shape": results, "orders": {}}
    for name, key in keys.items():
        order = np.argsort(key, kind="stable")
        out["orders"][name] = {
            "u64_tb": union_cost(order, pb, 64),
            "u512_tb": union_cost(order, pb, 512),
            "u64_unb": union_cost(order, pu, 64),
        }
        emit(order=name, **out["orders"][name])

    # greedy oracle on an 8k subsample (alive rays only), extrapolated.
    sub = np.flatnonzero(alive)[: 8192]
    sbits = pb[sub]
    popc = np.unpackbits(sbits.view(np.uint8), axis=1).sum(1)
    remaining = set(range(len(sub)))
    order_g = []
    # greedy: repeatedly start a block from the lowest-popcount remaining
    # ray, then add the 63 rays with max |intersection| with the block
    # union (recomputed every 8 adds to keep it O(R^2/8)).
    import heapq

    rem = np.ones(len(sub), bool)
    while rem.any():
        seed = int(np.flatnonzero(rem)[np.argmin(popc[rem])])
        blk = [seed]
        rem[seed] = False
        un = sbits[seed].copy()
        while len(blk) < 64 and rem.any():
            cand = np.flatnonzero(rem)
            inter = np.unpackbits(
                (sbits[cand] & un[None, :]).view(np.uint8), axis=1
            ).sum(1)
            extra = popc[cand] - inter
            take = cand[np.argsort(extra)[: 8]]
            for t_ in take:
                if len(blk) >= 64:
                    break
                blk.append(int(t_))
                rem[t_] = False
                un |= sbits[t_]
        order_g.extend(blk)
    order_g = np.asarray(order_g)
    g64 = union_cost(order_g, sbits, 64)
    # scale to the full wavefront by the alive ratio
    scale = int(alive.sum()) / len(sub)
    out["orders"]["greedy8k"] = {
        "u64_tb_sub": g64,
        "u64_tb_scaled": int(g64 * scale),
    }
    emit(order="greedy8k", **out["orders"]["greedy8k"])

    os.makedirs("out", exist_ok=True)
    with open("out/probe_sortkey_proxy.json", "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
