"""Pallas TPU kernel: chunk-skipping wavefront intersector.

The hot loop of the whole framework.  Measurement on real scenes showed the
gather-based leaf traversal (ops/traverse.py) is HBM-bound: a secondary ray
pierces ~70 leaf AABBs, and gathering each pierced leaf's triangle block from
HBM costs ~50 KB of random-access traffic per ray-bounce.  This kernel
inverts the dataflow so triangle data *streams* HBM->VMEM in large
sequential blocks instead:

* triangles (already spatially ordered by the build — chunk-aligned
  sweep-SAH treelets by default, Morton curve as A/B) are grouped into
  chunks of
  ``CHUNK_TRIS`` = 128 — one full VPU lane width;
* a prepass kernel (one grid step per ray tile, everything fused in VMEM)
  computes, per (ray-tile, chunk), whether ANY ray in the tile enters the
  chunk's AABB (the wavefront analog of a BVH node test,
  src/bvh.h:195-235) plus the tile's conservative AABB-entry distance,
  bit-packed / row-packed into int32/f32 maps;
* the main kernel runs on a (ray_tile, worklist-slot) grid — ``group``
  chunks per step, because on-chip measurement showed ~1 us of fixed cost
  per grid step — reading the activity bits from scalar-prefetched SMEM:
  inactive chunks are predicated off with ``@pl.when`` on
  *scalar-core-resident* conditions (predicates derived from in-kernel
  vector math measured 20-35 us/step in vector->scalar syncs; prefetched
  bits are free), and active chunks evaluate the exact Woop/Cramer test for
  all RT x 128 (ray, triangle) pairs, min-accumulating (t, triangle id)
  into VMEM-resident outputs.

Round-3 redesign — the ordered-descent prune, wavefront style.  The
reference's recursive BVH intersects the nearer child first and prunes the
farther subtree whenever the current best hit is closer
(src/bvh.h:207-226: ``if (res && res->t < snd_dst) return;``).  Round 2 had
no analog: every chunk ANY ray in a tile pierced was pair-tested against
the whole tile even after every ray already held a nearer hit — measured at
~25-50x redundant intersection ALU on sorted wavefronts.  The design:

  cascade    a ladder of small front-to-back worklist passes per tile
             (nearest active chunk groups first, ordered by tile
             AABB-entry distance), with the activity prepass RE-RUN
             between passes using each ray's best t so far as a per-ray
             far bound: ``t_enter(r, c) <= t_best(r)`` is the exact prune
             condition, so far chunks are usually culled before they are
             ever tested (escape rays keep t_best = inf, losing nothing);
  sub-tiles  the activity kernel emits per-64-ray-sub-tile chunk bits in
             the same pass, and the worklist kernel predicates each
             (chunk, sub-tile) pair separately — on enclosed-scene
             secondaries a 512-ray union activates ~388 chunks while a
             64-ray union activates ~132 (probe_granularity), an ALU cut
             direction-incoherent wavefronts cannot get from sorting;
  masks      the kernel prefetches per-worklist-slot group masks
             (take_along_axis by worklist ids), not whole-scene bit
             arrays, so SMEM scales with worklist length, not chunk count
             (whole-scene bits overflowed the 1 MB SMEM at 820k tris);
  residual   everything still active and untested runs front-to-back in a
             final pass sized by a ``lax.switch`` over count buckets;
             scenes whose group count exceeds the SMEM budget iterate
             budget-sized passes with a recheck between them until
             nothing remains (replaces the round-2 global dense fallback);
  super      one AABB per 512-chunk column block gates whole activity
             steps from a prefetched coarse bit, so prepass cost scales
             with pierced super-blocks, not total chunks.

All passes share one kernel that min-accumulates into (t, tri) outputs
initialized from the previous pass, so retests are idempotent and the
result is exactly the full union of tested chunks.

TPU_PT_INTERSECT=bins is the opt-in per-ray experiment (round-4 handoff
lever #1): a transposed activity kernel emits per-RAY per-group bits,
rays are re-binned group-major (each group gets its own dense ray list —
the structure a single global sort cannot express), and the shared items
kernel runs one pass over the binned blocks with scatter-min back per
ray.  Exact (oracle-tested incl. the capacity-overflow dense fallback);
unbounded activity + XLA gather/scatter glue traded for per-ray pair
granularity — on-chip A/B pending.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import IntersectTuning
from .intersect import Hit, _PRECISION

RAY_TILE = 512  # rays per grid tile
_SORT_CELLS = 16  # sort-key origin grid resolution per axis
CHUNK_TRIS = 128  # triangles per chunk (= 8 leaves of 16)

_GROUP = 8  # chunks per main-kernel grid step.  On-chip sweep (8/16/32,
# 82k-tri scene): 8 is 2.3-2.6x faster — the (group, 12, 128) block DMA
# degrades beyond ~48 KB — while amortizing the ~1 us per-step fixed cost.

_ACT_COLS = 512  # chunk columns per activity grid step (bounds vreg stack)
# Column blocks above which the coarse super-block gate engages.  3 makes
# it engage at enclosed-atrium scale (4 blocks): the r3b campaign measured
# 250.3k vs 249.0k samples/s with it off there (out/campaign_r3b.jsonl) —
# the gate also feeds the live-block recheck gate, so engaging it earlier
# compounds.  Env-overridable (TPU_PT_SUPER_MIN) for A/B.
_SUPER_BLOCK_MIN = 3


# Tuning knobs live in config.IntersectTuning (round-4: VERDICT r3 weak #5 —
# env sprawl folded into RenderConfig); the TPU_PT_* env vars remain as an
# override shim applied by IntersectTuning.resolve() at TRACE time.  A jit
# cache hit will NOT re-read the environment: env-driven probes must set
# knobs before the first call of a given shape signature (the campaign
# scripts restart the process per setting); the config path re-traces
# automatically because the tuning object is a static jit argument.


def _vma_of(*xs) -> frozenset:
    """Joined varying-manual-axes of the traced inputs.

    Under ``jax.shard_map`` (check_vma=True, the default) every value
    carries a vma type, and ``pl.pallas_call`` requires its out_shape
    structs to declare one explicitly — without it the whole Pallas
    intersector fails to TRACE inside a sharded program (found by the
    first real-chip ``render_pass_sharded`` run, round 4; the CPU-mesh
    tests could not see it because off-TPU backends take the gather
    traversal path).  Outside shard_map the attribute is an empty set and
    the structs behave exactly as before."""
    vma = frozenset()
    for x in xs:
        vma |= getattr(jax.typeof(x), "vma", frozenset())
    return vma


def _out_struct(shape, dtype, vma: frozenset) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _activity_kernel(
    rays_ref, aabb_ref, tbest_ref, *out_refs, min_dst, n_sub, want_sub
):
    _activity_body(
        pl.program_id(1), rays_ref, aabb_ref, tbest_ref, out_refs,
        min_dst=min_dst, n_sub=n_sub, want_sub=want_sub,
    )


def _activity_body(
    i, rays_ref, aabb_ref, tbest_ref, out_refs, *, min_dst, n_sub, want_sub
):
    """Per-tile chunk-AABB slab test, fused in VMEM: grid step (b, i) tests
    ray tile i against chunk-column block b.  The column block is the OUTER
    grid dim so the (t_tiles, _ACT_COLS) output blocks — indexed by b alone —
    stay resident while every tile row i is written, then flush complete.

    Outputs (``out_refs``, in order): optional ``sub_ref`` (present iff
    ``want_sub``) holding per-sub-tile f32 entry minima, then ``m8_ref``
    ([T, C] int32: bit s of chunk c's byte = sub-tile s active — the packed
    form every downstream consumer actually wants, emitted here so the XLA
    side never materialises the [T, 8, C] f32/int intermediates; at 16M-tri
    scale those were ~1 GB of pure glue traffic per pass), then ``ent_ref``.

    sub[i*n_sub + s, c] = 1 iff any ray of SUB-TILE s of tile i enters
    chunk c's AABB *no farther than that ray's current best hit* (tbest;
    +inf on the unbounded first pass — then this is the plain slab test).
    Sub-tile granularity is the round-3 answer to union inflation: on
    enclosed-scene secondaries a 256-ray union activates ~272 chunks while
    a 64-ray union activates ~132 and a single ray ~14 (probe_granularity),
    so the main kernel gates pair tests per (chunk, sub-tile) instead of
    per chunk.  Tile-level activity = any over the n_sub rows (XLA side).
    ent[i, c] = conservative tile entry distance: min over the tile's
    qualifying rays of max(t_enter, min_dst), +inf where act = 0.  This is
    the front-to-back ordering key (the wavefront form of the ordered
    descent's near/far child distances, src/bvh.h:207-226).

    (A single whole-width step was tried first: at Sponza+ chunk counts its
    [RT, cpad] intermediates overflow the 16 MB VMEM vector stack.)"""
    rays = rays_ref[:]  # [RT, 8]
    tb = tbest_ref[:]  # [RT, 1] per-ray far bound (inf = unbounded)
    t_lo = None
    t_hi = None
    for a in range(3):
        o = rays[:, a : a + 1]
        d = rays[:, 4 + a : 5 + a]
        # Robust against d == 0 with the origin exactly on an AABB plane
        # (secondary rays spawn ON surfaces whose chunk AABB planes pass
        # through them): 1/0 = inf makes 0 * inf = NaN, which would falsely
        # CULL the chunk.  A huge finite inverse keeps the select
        # conservative: inside the slab the interval covers everything,
        # outside it stays empty, on-plane gives t = 0 instead of NaN.
        inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
        t1 = (aabb_ref[a, :][None, :] - o) * inv  # [RT, _ACT_COLS]
        t2 = (aabb_ref[3 + a, :][None, :] - o) * inv
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        t_lo = lo if t_lo is None else jnp.maximum(t_lo, lo)
        t_hi = hi if t_hi is None else jnp.minimum(t_hi, hi)
    # Prune condition, per ray: the chunk can only improve ray r's hit if
    # the ray enters its AABB before r's current best t (<= keeps ties
    # conservatively; t_best = inf never prunes).
    hit = (t_lo <= t_hi) & (t_hi >= min_dst) & (t_lo <= tb)
    cols = hit.shape[-1]
    entry = jnp.where(hit, jnp.maximum(t_lo, min_dst), jnp.inf)
    # Per-SUB-TILE entry minima (f32, +inf = no qualifying ray): strictly
    # more information than 0/1 bits for the same bytes — finite = active,
    # and the caller can re-derive activity under a TIGHTER t bound without
    # re-running the slab sweep (the cheap cascade recheck): for any bound
    # b <= the tb used here, ``entry <= b`` over-approximates the per-ray
    # slab result only by sub-tile granularity.
    sub_ent = jnp.min(entry.reshape(n_sub, -1, cols), axis=1)
    if n_sub < 8:
        # The sub block is always 8 rows (TPU block shapes need the
        # second-minor dim divisible by 8); rows past n_sub are inf.
        sub_ent = jnp.concatenate(
            [sub_ent, jnp.full((8 - n_sub, cols), jnp.inf, jnp.float32)],
            axis=0,
        )
    if want_sub:
        sub_ref, m8_ref, ent_ref = out_refs
        sub_ref[:] = sub_ent
    else:
        m8_ref, ent_ref = out_refs
    # Packed per-chunk sub-tile byte: bit s = sub-tile s active (finite
    # entry).  Rows >= n_sub are +inf so they contribute no bits.
    fin = jnp.isfinite(sub_ent).astype(jnp.int32)
    weights = jax.lax.broadcasted_iota(jnp.int32, (8, cols), 0)
    m8_ref[i, :] = jnp.sum(fin << weights, axis=0)
    ent_ref[i, :] = jnp.min(entry, axis=0)


def _activity_kernel_gated(
    cbits_ref, rays_ref, aabb_ref, tbest_ref, *out_refs,
    min_dst, n_sub, want_sub
):
    """_activity_kernel with a prefetched coarse gate: grid step (b, i) is
    skipped outright (zero activity, inf entry) when no ray of tile i enters
    column-block b's super-AABB — the traversal level above chunks (VERDICT
    r2 missing #2).  Prepass cost then scales with *pierced* 512-chunk
    super-blocks instead of total chunks."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    word = cbits_ref[i, b // 32]
    bit = (word >> (b % 32)) & 1

    @pl.when(bit > 0)
    def _go():
        _activity_body(
            i, rays_ref, aabb_ref, tbest_ref, out_refs,
            min_dst=min_dst, n_sub=n_sub, want_sub=want_sub,
        )

    @pl.when(bit == 0)
    def _skip():
        if want_sub:
            sub_ref, m8_ref, ent_ref = out_refs
            sub_ref[:] = jnp.full_like(sub_ref, jnp.inf)
        else:
            m8_ref, ent_ref = out_refs
        m8_ref[i, :] = jnp.zeros_like(m8_ref[i, :])
        ent_ref[i, :] = jnp.full_like(ent_ref[i, :], jnp.inf)


def tile_chunk_activity(
    rays: jnp.ndarray,  # [R, 8] packed (o, 1, d, 0)
    chunk_min: jnp.ndarray,  # [C, 3]
    chunk_max: jnp.ndarray,  # [C, 3]
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
    tbest: jnp.ndarray | None = None,  # [R] per-ray far bound (None = inf)
    coarse_bits: jnp.ndarray | None = None,  # [T, ceil(nb/32)] block gate
    n_sub: int = 1,  # sub-tiles per ray tile (sub-tile activity rows)
    want_sub_ent: bool = False,  # also return the f32 per-sub-tile entry
    #   minima (the cheap-recheck input) — costs an extra [T, 8, C] f32
    #   kernel output, so only the cascade's INITIAL pass asks for it
):
    """Returns (act [T, C] int32, entry [T, C] f32, m8 [T, C] int32 packed
    per-chunk sub-tile bytes, sub_ent [T, n_sub, C] f32 or None) — see
    _activity_kernel.  act = (m8 != 0); bit s of m8 = sub-tile s active.
    The packing happens IN the kernel, so no [T, 8, C] intermediate ever
    reaches XLA unless ``want_sub_ent`` explicitly asks for the f32 form."""
    r = rays.shape[0]
    c = chunk_min.shape[0]
    t_tiles = r // ray_tile
    cpad = -(-c // _ACT_COLS) * _ACT_COLS
    pad = cpad - c
    if pad:
        # NaN-padded AABB columns can never pass the slab test.
        chunk_min = jnp.concatenate(
            [chunk_min, jnp.full((pad, 3), jnp.nan, chunk_min.dtype)]
        )
        chunk_max = jnp.concatenate(
            [chunk_max, jnp.full((pad, 3), jnp.nan, chunk_max.dtype)]
        )
    aabb_rows = jnp.concatenate(
        [chunk_min.T, chunk_max.T, jnp.zeros((2, cpad), chunk_min.dtype)],
        axis=0,
    )  # [8, cpad]
    if tbest is None:
        tbest = jnp.full((r, 1), jnp.inf, jnp.float32)
    else:
        tbest = tbest.reshape(r, 1).astype(jnp.float32)
    tile_spec = lambda: pl.BlockSpec(
        (t_tiles, _ACT_COLS), lambda b, i, *_: (0, b),
        memory_space=pltpu.VMEM,
    )
    vma = _vma_of(rays, tbest)
    out_specs = [tile_spec(), tile_spec()]  # m8, ent
    out_shape = [
        _out_struct((t_tiles, cpad), jnp.int32, vma),
        _out_struct((t_tiles, cpad), jnp.float32, vma),
    ]
    if want_sub_ent:
        out_specs.insert(0, pl.BlockSpec(
            (8, _ACT_COLS), lambda b, i, *_: (i, b),
            memory_space=pltpu.VMEM,
        ))
        out_shape.insert(0, _out_struct((t_tiles * 8, cpad), jnp.float32, vma))
    in_specs = [
        pl.BlockSpec(
            (ray_tile, 8), lambda b, i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (8, _ACT_COLS), lambda b, i, *_: (0, b), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (ray_tile, 1), lambda b, i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    ]
    if coarse_bits is None:
        outs = pl.pallas_call(
            functools.partial(
                _activity_kernel, min_dst=min_dst, n_sub=n_sub,
                want_sub=want_sub_ent,
            ),
            grid=(cpad // _ACT_COLS, t_tiles),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(rays, aabb_rows, tbest)
    else:
        outs = pl.pallas_call(
            functools.partial(
                _activity_kernel_gated, min_dst=min_dst, n_sub=n_sub,
                want_sub=want_sub_ent,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(cpad // _ACT_COLS, t_tiles),
                in_specs=in_specs,
                out_specs=out_specs,
            ),
            out_shape=out_shape,
            interpret=interpret,
        )(coarse_bits, rays, aabb_rows, tbest)
    if want_sub_ent:
        sub, m8, ent = outs
        sub_ent = sub.reshape(t_tiles, 8, cpad)[:, :n_sub, :c]
    else:
        m8, ent = outs
        sub_ent = None
    m8 = m8[:, :c]
    act = (m8 != 0).astype(jnp.int32)
    return act, ent[:, :c], m8, sub_ent


def super_block_bits(
    rays: jnp.ndarray,  # [R, 8]
    chunk_min: jnp.ndarray,  # [C, 3] (cg*group rows, NaN padded)
    chunk_max: jnp.ndarray,
    min_dst: float,
    ray_tile: int,
    interpret: bool,
    tbest: jnp.ndarray | None = None,  # [R] per-ray far bound (None = inf)
) -> jnp.ndarray:  # [T, ceil(nb/32)] int32
    """Coarse gate for the activity prepass: one AABB per _ACT_COLS-chunk
    column block (jnp nan-reductions — padded chunks are NaN and vanish),
    slab-tested by the SAME activity kernel at trivial width, bit-packed for
    SMEM prefetch.  Reused across every cascade recheck (the per-ray t
    bound only shrinks activity, so the unbounded coarse gate stays valid).

    ``tbest`` gives the T-BOUNDED form (round 4): a block whose entry lies
    beyond every ray's current best hit cannot improve any hit, so recheck
    grid steps for far blocks are skipped wholesale once rays have found
    near hits — the missing coarse-level analog of the per-ray far prune.
    probe_scale_r4 showed the unbounded gate stops helping past ~8M
    triangles (open-field rays pierce most blocks UNBOUNDED, but not
    within their best-t).  Cost is one trivial-width activity pass over
    nb block AABBs.
    """
    c = chunk_min.shape[0]
    pad = (-c) % _ACT_COLS
    if pad:
        chunk_min = jnp.concatenate(
            [chunk_min, jnp.full((pad, 3), jnp.nan, chunk_min.dtype)]
        )
        chunk_max = jnp.concatenate(
            [chunk_max, jnp.full((pad, 3), jnp.nan, chunk_max.dtype)]
        )
    nb = chunk_min.shape[0] // _ACT_COLS
    cb_min = jnp.nanmin(chunk_min.reshape(nb, _ACT_COLS, 3), axis=1)
    cb_max = jnp.nanmax(chunk_max.reshape(nb, _ACT_COLS, 3), axis=1)
    coarse_act, _, _, _ = tile_chunk_activity(
        rays, cb_min, cb_max, min_dst, ray_tile, interpret, tbest=tbest
    )
    return _bitpack(coarse_act)


def _bitpack(act: jnp.ndarray) -> jnp.ndarray:
    """[T, C] 0/1 -> [T, ceil(C/32)] int32 words (SMEM-friendly mask)."""
    t_tiles, c = act.shape
    pad = (-c) % 32
    if pad:
        act = jnp.concatenate(
            [act, jnp.zeros((t_tiles, pad), act.dtype)], axis=1
        )
    bits = act.astype(jnp.int32).reshape(t_tiles, -1, 32)
    weights = (1 << jnp.arange(32, dtype=jnp.int32))[None, None, :]
    return jnp.sum(bits * weights, axis=-1).astype(jnp.int32)


def _ray_group_kernel(rays_t_ref, aabb_cols_ref, out_ref, *, min_dst, group):
    """Per-RAY, per-worklist-GROUP slab activity, TRANSPOSED: grid step
    (b, i) tests ray tile i against chunk column block b and writes
    out[b's groups, tile i's rays] = 1 iff the ray enters ANY of the
    group's ``group`` chunk AABBs past min_dst (unbounded — no tbest).

    The transposed orientation (chunks on sublanes, rays on lanes) is
    chosen twice over: the slab broadcasts become a natural
    sublane-vector x lane-vector outer product with ZERO in-kernel
    transposes (rays arrive as a [8, RT] block, AABBs as [cols, 8]), and
    the [CG, R] output feeds the bins worklist's group-major nonzero
    directly.  This is the per-ray granularity the sub-tile activity
    kernel reduces away (it unions 64 rays per row) — the bins mode's
    whole point (docs/STATUS.md handoff lever #1)."""
    cols = aabb_cols_ref.shape[0]
    t_lo = None
    t_hi = None
    for a in range(3):
        o = rays_t_ref[a, :][None, :]  # [1, RT] (lanes = rays)
        d = rays_t_ref[4 + a, :][None, :]
        inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)  # same robustness as
        # _activity_body: on-plane origins give t = 0, not NaN-cull.
        lo_c = aabb_cols_ref[:, a][:, None]  # [cols, 1] (sublanes = chunks)
        hi_c = aabb_cols_ref[:, 3 + a][:, None]
        t1 = (lo_c - o) * inv  # [cols, RT]
        t2 = (hi_c - o) * inv
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        t_lo = lo if t_lo is None else jnp.maximum(t_lo, lo)
        t_hi = hi if t_hi is None else jnp.minimum(t_hi, hi)
    hit = (t_lo <= t_hi) & (t_hi >= min_dst)
    rt = hit.shape[-1]
    gb = jnp.any(hit.reshape(cols // group, group, rt), axis=1)
    out_ref[:] = gb.astype(jnp.int32)


def ray_group_bools(
    rays: jnp.ndarray,  # [R, 8] homogeneous (o,1,d,0) rows
    chunk_min: jnp.ndarray,  # [C, 3] (NaN rows never match)
    chunk_max: jnp.ndarray,
    min_dst: float,
    ray_tile: int = RAY_TILE,
    group: int = _GROUP,
    interpret: bool = False,
) -> jnp.ndarray:  # [CG, R] int32 0/1 (CG = padded-chunk count / group)
    r = rays.shape[0]
    c = chunk_min.shape[0]
    t_tiles = r // ray_tile
    cpad = -(-c // _ACT_COLS) * _ACT_COLS
    pad = cpad - c
    if pad:
        chunk_min = jnp.concatenate(
            [chunk_min, jnp.full((pad, 3), jnp.nan, chunk_min.dtype)]
        )
        chunk_max = jnp.concatenate(
            [chunk_max, jnp.full((pad, 3), jnp.nan, chunk_max.dtype)]
        )
    # Lane-padded to 128 (block lane dims must be 128-multiples on real
    # Mosaic; the 120 dead lanes cost ~1 MB of HBM, nothing in VMEM terms).
    aabb_cols = jnp.concatenate(
        [chunk_min, chunk_max, jnp.zeros((cpad, 122), chunk_min.dtype)],
        axis=1,
    )  # [cpad, 128]; cols 0-2 = min, 3-5 = max
    rays_t = rays.T  # [8, R]
    gpb = _ACT_COLS // group  # groups per column block
    out = pl.pallas_call(
        functools.partial(_ray_group_kernel, min_dst=min_dst, group=group),
        grid=(cpad // _ACT_COLS, t_tiles),
        in_specs=[
            pl.BlockSpec(
                (8, ray_tile), lambda b, i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_ACT_COLS, 128), lambda b, i: (b, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (gpb, ray_tile), lambda b, i: (b, i), memory_space=pltpu.VMEM
        ),
        out_shape=_out_struct((cpad // group, r), jnp.int32, _vma_of(rays)),
        interpret=interpret,
    )(rays_t, aabb_cols)
    return out


def _bins_worklist(gb: jnp.ndarray, br: int, p_cap: int):
    """Per-GROUP ray bins from the [CG, R] per-ray group activity: every
    (group, ray) pierced pair becomes one row of a group-major binned ray
    list, each group's segment padded to the ``br``-row kernel block.

    This is the structure a single global ray sort cannot express (the
    "target" key measured a LOSS because one order can't serve every
    group, docs/STATUS.md item 9): each group gets its OWN dense ray
    list, so the pair kernel tests exactly the pierced (ray, group)
    pairs instead of 64-ray sub-tile unions.

    Returns (r_pad [P_pad] int32 ray id per row (-1 = padding),
    block_group [NB] int32 worklist-group id per br-row block,
    n_blocks [] int32 used blocks, overflow [] bool)."""
    cg, r = gb.shape
    counts = jnp.sum(gb, axis=1)  # [CG]
    (fid,) = jnp.nonzero(gb.reshape(-1) > 0, size=p_cap, fill_value=cg * r)
    valid = fid < cg * r
    g = jnp.where(valid, fid // r, cg - 1)
    rid = (fid % r).astype(jnp.int32)
    seg_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    blocks_pg = -(-counts // br)
    pad_start = (
        jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(blocks_pg).astype(jnp.int32)]
        )
        * br
    )
    n_blocks = (pad_start[cg] // br).astype(jnp.int32)
    p_pad_cap = p_cap + cg * (br - 1)  # worst padding: every group partial
    nb_cap = p_pad_cap // br + 1
    p_pad_cap = nb_cap * br
    dst = pad_start[g] + (jnp.arange(p_cap, dtype=jnp.int32) - seg_start[g])
    dst = jnp.where(valid, dst, p_pad_cap)
    r_pad = (
        jnp.full((p_pad_cap,), -1, jnp.int32)
        .at[jnp.clip(dst, 0, p_pad_cap)]
        .set(rid, mode="drop")
    )
    boundaries = jnp.where(counts > 0, pad_start[:cg] // br, nb_cap)
    bg = (
        jnp.full((nb_cap,), -1, jnp.int32)
        .at[boundaries]
        .max(jnp.arange(cg, dtype=jnp.int32), mode="drop")
    )
    bg = jax.lax.cummax(bg, axis=0)
    overflow = (seg_start[cg] > p_cap) | (pad_start[cg] > p_pad_cap)
    n_blocks = jnp.minimum(n_blocks, nb_cap)
    return r_pad, jnp.maximum(bg, 0), n_blocks, overflow


def _pack_group_masks(m8: jnp.ndarray, group: int) -> jnp.ndarray:
    """[T, C] packed per-chunk sub-tile bytes (the activity kernel's m8
    output) -> [T, CG, W] int32 per-GROUP sub-tile masks (W =
    ceil(group/4); chunk k of a group owns byte k%4 of word k//4; bit st
    of that byte = sub-tile st active).  The worklist kernel prefetches
    only the masks of its *selected* groups (take_along_axis by worklist
    ids), so SMEM scales with worklist length — NOT with scene size (a
    whole-scene bit array overflowed the 1 MB SMEM at 820k tris).
    int32 products/sums wrap two's-complement, which is exactly bitwise
    composition for these non-overlapping byte fields."""
    t_tiles, c = m8.shape
    cg = c // group
    w = -(-group // 4)
    mg = m8.reshape(t_tiles, cg, group)
    padg = 4 * w - group
    if padg:
        mg = jnp.pad(mg, ((0, 0), (0, 0), (0, padg)))
    mg = mg.reshape(t_tiles, cg, w, 4)
    weights = (1 << (8 * jnp.arange(4, dtype=jnp.int32)))
    return jnp.sum(mg * weights[None, None, None, :], axis=-1).astype(
        jnp.int32
    )  # [T, CG, W]


def _live_block_bits(live: jnp.ndarray, group: int) -> jnp.ndarray:
    """[T, CG] bool of groups still worth rechecking -> [T, ceil(nb/32)]
    int32 gate words at activity-column-block granularity (nb blocks of
    ``_ACT_COLS`` chunks = ``_ACT_COLS // group`` groups each).

    Gates the cascade's activity RECHECKS: a recheck's result is only ever
    consumed as ``act & ~tested`` (group level), and activity under a
    tighter t bound is a subset of the previous activity — so a column
    block none of whose groups is (previously active AND untested) cannot
    contribute, and its whole grid step can be skipped outright.

    Expanded to chunk granularity before blocking so groups that straddle
    a column-block boundary (group not dividing _ACT_COLS) mark BOTH
    blocks."""
    t_tiles, _ = live.shape
    lc = jnp.repeat(live, group, axis=1)  # [T, cg*group] per-chunk live
    padb = (-lc.shape[1]) % _ACT_COLS
    if padb:
        lc = jnp.pad(lc, ((0, 0), (0, padb)))
    blk = jnp.any(
        lc.reshape(t_tiles, -1, _ACT_COLS), axis=2
    ).astype(jnp.int32)
    return _bitpack(blk)


def _group_stats(act, ent, group):
    """Chunk-level activity/entry -> group level: a group is active when any
    of its chunks is; its entry is the nearest active chunk entry."""
    t_tiles, c = act.shape
    cg = c // group
    ga = jnp.any(act.reshape(t_tiles, cg, group) > 0, axis=2)
    ge = jnp.min(ent.reshape(t_tiles, cg, group), axis=2)
    return ga, ge


def _worklist(ga, ge, cap):
    """Front-to-back per-tile worklist over active groups.

    Returns (idx [T, cap] int32, counts_c [T] = min(count, cap)).  Slot s of
    a tile holds its s-th nearest active group; slots past the count repeat
    the last in-count id so their block DMA is elided (the kernel gates
    their work off with ``live``).  Truncation is safe by construction: any
    group beyond cap remains un-tested and is picked up by the caller's
    recheck pass (pass-1 caller) or cannot exist (pass-2 caller sizes cap
    from max(counts))."""
    t_tiles, cg = ga.shape
    key = jnp.where(ga, ge, jnp.inf)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    counts = jnp.sum(ga.astype(jnp.int32), axis=1)
    counts_c = jnp.minimum(counts, cap)
    idx = order[:, :cap]
    # Clamp-before-gather (never out of bounds even when counts == 0 or the
    # cap truncates): index min(counts, cap) - 1, floored at 0.
    last = jnp.take_along_axis(
        idx, jnp.maximum(counts_c - 1, 0)[:, None], axis=1
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, (t_tiles, cap), 1)
    idx = jnp.where(pos < counts_c[:, None], idx, last)
    return idx, counts_c, counts


def _contract_o(x, w, r0):
    """[RT, 4] o-row (w=1) against Woop rows w[r0:r0+3] + constant row.

    Explicit broadcast-FMA instead of jnp.dot: the K=4 dot lowers ~1.8x
    slower on the VPU (probe_aluform on chip: 16.6 vs 29.9 Gpairs/s);
    three multiply-adds plus the constant-row add are the speed-of-light
    form, and the known homogeneous components (o.w = 1, d.w = 0) drop a
    quarter of the multiplies the dot cannot.  NaN-padded chunks still
    poison p (the constant row is NaN), so ok stays false."""
    acc = x[:, 0:1] * w[r0, :][None, :] + w[r0 + 3, :][None, :]
    acc = acc + x[:, 1:2] * w[r0 + 1, :][None, :]
    return acc + x[:, 2:3] * w[r0 + 2, :][None, :]


def _contract_d(x, w, r0):
    """[RT, 4] d-row (w=0) against Woop rows w[r0:r0+3] (see _contract_o)."""
    acc = x[:, 0:1] * w[r0, :][None, :]
    acc = acc + x[:, 1:2] * w[r0 + 1, :][None, :]
    return acc + x[:, 2:3] * w[r0 + 2, :][None, :]


def _chunk_body(o1, d0, wc_ref, tmin_ref, tidx_ref, g, j, min_dst):
    """Woop test of one 128-triangle chunk against the tile, min-accumulated
    into the VMEM-resident outputs.  Idempotent: retesting a chunk can never
    change the result (strict < keeps the first winner on exact ties)."""
    w = wc_ref[g]  # [12, CHUNK_TRIS]
    cw = w.shape[-1]

    p0, p1, p2 = (
        _contract_o(o1, w, 0), _contract_o(o1, w, 4), _contract_o(o1, w, 8)
    )
    q0, q1, q2 = (
        _contract_d(d0, w, 0), _contract_d(d0, w, 4), _contract_d(d0, w, 8)
    )
    t = -p2 / q2
    beta = p0 + t * q0
    gamma = p1 + t * q1
    ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= min_dst)
    t_m = jnp.where(ok, t, jnp.inf)
    chunk_min = jnp.min(t_m, axis=1, keepdims=True)  # [RT, 1]
    chunk_arg = jnp.argmin(t_m, axis=1).astype(jnp.int32)  # [RT]
    cur = tmin_ref[:]
    better = chunk_min < cur
    tmin_ref[:] = jnp.where(better, chunk_min, cur)
    tidx_ref[:] = jnp.where(
        better, j * cw + chunk_arg[:, None], tidx_ref[:]
    )


def _chunk_body_sub(
    o1, d0, wc_ref, tmin_ref, tidx_ref, g, j, st, rows, min_dst
):
    """_chunk_body restricted to sub-tile st (rows [st*rows, (st+1)*rows)):
    the pair-test ALU unit of the sub-tile-gated kernel."""
    w = wc_ref[g]  # [12, CHUNK_TRIS]
    cw = w.shape[-1]
    lo = st * rows
    hi = lo + rows

    o1s = o1[lo:hi]
    d0s = d0[lo:hi]
    p0, p1, p2 = (
        _contract_o(o1s, w, 0), _contract_o(o1s, w, 4), _contract_o(o1s, w, 8)
    )
    q0, q1, q2 = (
        _contract_d(d0s, w, 0), _contract_d(d0s, w, 4), _contract_d(d0s, w, 8)
    )
    t = -p2 / q2
    beta = p0 + t * q0
    gamma = p1 + t * q1
    ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= min_dst)
    t_m = jnp.where(ok, t, jnp.inf)
    chunk_min = jnp.min(t_m, axis=1, keepdims=True)  # [rows, 1]
    chunk_arg = jnp.argmin(t_m, axis=1).astype(jnp.int32)  # [rows]
    cur = tmin_ref[lo:hi]
    better = chunk_min < cur
    tmin_ref[lo:hi] = jnp.where(better, chunk_min, cur)
    tidx_ref[lo:hi] = jnp.where(
        better, j * cw + chunk_arg[:, None], tidx_ref[lo:hi]
    )


def _kernel_dense(
    active_ref, rays_ref, tmin0_ref, tidx0_ref, wc_ref, tmin_ref, tidx_ref,
    *, min_dst, group
):
    """Dense grid: step (i, jg) tests tile i against chunk group jg, gated
    per chunk by the prefetched activity bits.  Kept as the A/B probe and
    interpret-mode oracle for the worklist path (TPU_PT_INTERSECT=dense)."""
    i = pl.program_id(0)
    jg = pl.program_id(1)

    @pl.when(jg == 0)
    def _init():
        tmin_ref[:] = tmin0_ref[:]
        tidx_ref[:] = tidx0_ref[:]

    # Ray-side operands once per STEP, outside the predicated regions: the
    # [RT, 8] load + lane slices cost a relayout, and paying it per chunk
    # region measured ~2 us/region — it dwarfed the actual Woop math.
    rays = rays_ref[:]  # [RT, 8] = (o, 1, d, 0)
    o1 = rays[:, 0:4]
    d0 = rays[:, 4:8]

    for g in range(group):
        j = jg * group + g
        # Activity is bit-packed 32 chunks per int32 so the SMEM-resident
        # mask stays tiny even for Sponza-class chunk counts.
        word = active_ref[i, j // 32]
        bit = (word >> (j % 32)) & 1

        @pl.when(bit > 0)
        def _chunk(g=g, j=j):
            _chunk_body(o1, d0, wc_ref, tmin_ref, tidx_ref, g, j, min_dst)


def _kernel_pass(
    wl_ref, rays_ref, tmin0_ref, tidx0_ref, wc_ref,
    tmin_ref, tidx_ref, *, min_dst, group, n_sub, cap
):
    """Worklist grid: slot s of tile i processes the tile's s-th nearest
    ACTIVE chunk group; the group block DMA is indexed through the
    prefetched id, so mostly-inactive tiles stop paying the dense grid's
    fixed per-step cost.  (t, tri) accumulate over the previous pass's
    outputs (tmin0/tidx0 — +inf/0 on pass 1).

    ``wl_ref`` is ONE merged scalar-prefetch row per tile (see
    _pack_worklist): [count | cap group ids | cap*W mask words].  Merged
    because prefetched SMEM operands are lane-padded — the LAST dim is
    padded to 128, so a [T, cap, 2] masks array allocates 64x its nominal
    bytes and a (count, idx, masks) triple pays three separate 64 KB+
    floors; one wide row pays the padding once (the round-3 "SMEM-bounded"
    layout still blew the 1 MB SMEM on chip this way).

    The mask words carry the selected group's per-chunk 8-bit sub-tile
    masks (_pack_group_masks): each (chunk, sub-tile) pair is predicated
    separately, so only sub-tiles whose 64-ray union enters a chunk pay
    the 128-wide pair test (~2x less ALU on enclosed-scene secondaries
    than whole-tile gating, probe_granularity)."""
    i = pl.program_id(0)
    s = pl.program_id(1)

    @pl.when(s == 0)
    def _init():
        tmin_ref[:] = tmin0_ref[:]
        tidx_ref[:] = tidx0_ref[:]

    rays = rays_ref[:]  # [RT, 8]
    o1 = rays[:, 0:4]
    d0 = rays[:, 4:8]
    live = s < wl_ref[i, 0]
    jg = wl_ref[i, 1 + s]
    w_words = -(-group // 4)
    mask_base = 1 + cap + s * w_words
    rows = o1.shape[0] // n_sub

    for g in range(group):
        j = jg * group + g
        word = wl_ref[i, mask_base + g // 4]
        mask = (word >> (8 * (g % 4))) & 0xFF
        if n_sub == 1:
            @pl.when(live & (mask > 0))
            def _chunk(g=g, j=j):
                _chunk_body(o1, d0, wc_ref, tmin_ref, tidx_ref, g, j, min_dst)
        else:
            for st in range(n_sub):
                @pl.when(live & (((mask >> st) & 1) > 0))
                def _sub(g=g, j=j, st=st):
                    _chunk_body_sub(
                        o1, d0, wc_ref, tmin_ref, tidx_ref, g, j, st, rows,
                        min_dst,
                    )


def _kernel_items(
    wl_ref, rays_ref, tmin0_ref, tidx0_ref, wc_ref, tmin_ref, tidx_ref,
    *, min_dst, group, n_sub,
):
    """Compacted work-item grid: ONE step per ACTIVE (tile, group) pair.

    The slot grid (_kernel_pass) pays its fixed per-step cost for every
    (tile, slot) pair up to the cap even when a tile's worklist is short —
    measured on the atrium cascade, dead slots are a ~10 ms/iteration tax.
    Here the XLA side flattens all tiles' worklists into one item list
    SORTED BY TILE (scalar rows [tile | group | mask words], lane-major so
    SMEM lane padding is paid once per ROW, not per item), and the grid is
    exactly the item count: no dead steps, and per-tile caps stop costing
    anything when unused.

    Tile-major order keeps each output block's visits contiguous (blocks
    are flushed when the data-dependent index changes and never reloaded —
    a revisit would clobber earlier rows); the first item of a tile
    initializes the outputs from the previous pass (tiles with no items
    are patched by the caller with an XLA select)."""
    s = pl.program_id(0)
    tile = wl_ref[0, s]
    prev = wl_ref[0, jnp.maximum(s - 1, 0)]

    @pl.when((s == 0) | (tile != prev))
    def _init():
        tmin_ref[:] = tmin0_ref[:]
        tidx_ref[:] = tidx0_ref[:]

    rays = rays_ref[:]  # [RT, 8]
    o1 = rays[:, 0:4]
    d0 = rays[:, 4:8]
    jg = wl_ref[1, s]
    rows = o1.shape[0] // n_sub

    for g in range(group):
        word = wl_ref[2 + g // 4, s]
        mask = (word >> (8 * (g % 4))) & 0xFF
        if n_sub == 1:
            @pl.when(mask > 0)
            def _chunk(g=g):
                _chunk_body(
                    o1, d0, wc_ref, tmin_ref, tidx_ref, g, jg * group + g,
                    min_dst,
                )
        else:
            for st in range(n_sub):
                @pl.when(((mask >> st) & 1) > 0)
                def _sub(g=g, st=st):
                    _chunk_body_sub(
                        o1, d0, wc_ref, tmin_ref, tidx_ref, g,
                        jg * group + g, st, rows, min_dst,
                    )


def _item_rows(idx, counts, masks_sel):
    """Flatten per-tile worklists into tile-major item rows for
    _kernel_items: wl [2 + W, T*cap] int32 = [tile | group | mask words]
    per item column, valid items first (stable sort preserves tile-major
    order), padding columns repeating the last valid item (retests are
    idempotent, so repeats are harmless).  Returns (wl, m = item count)."""
    t_tiles, cap = idx.shape
    w = masks_sel.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (t_tiles, cap), 1)
    valid = (pos < counts[:, None]).reshape(-1)
    order = jnp.argsort(~valid, stable=True)
    tiles = jnp.broadcast_to(
        jnp.arange(t_tiles, dtype=jnp.int32)[:, None], (t_tiles, cap)
    ).reshape(-1)[order]
    groups = idx.reshape(-1)[order]
    masks = masks_sel.reshape(-1, w)[order]
    m = jnp.sum(counts).astype(jnp.int32)
    last = jnp.maximum(m - 1, 0)
    pad = jax.lax.broadcasted_iota(jnp.int32, tiles.shape, 0) >= m
    tiles = jnp.where(pad, tiles[last], tiles)
    groups = jnp.where(pad, groups[last], groups)
    masks = jnp.where(pad[:, None], masks[last], masks)
    wl = jnp.concatenate([tiles[None, :], groups[None, :], masks.T], axis=0)
    return wl, m


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_dst", "ray_tile", "interpret", "group", "mode", "pass1_cap",
        "tuning",
    ),
)
def closest_hit_chunks(
    origin: jnp.ndarray,  # [R, 3], R % ray_tile == 0
    direction: jnp.ndarray,  # [R, 3]
    chunk_woop: jnp.ndarray,  # [C, 12, CHUNK_TRIS]
    chunk_min: jnp.ndarray,  # [C, 3]
    chunk_max: jnp.ndarray,  # [C, 3]
    woop_cols: jnp.ndarray,  # [4, 3N] (winner barycentric recompute)
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
    group: int | None = None,
    mode: str | None = None,  # "twopass" (default) | "dense" (A/B oracle)
    pass1_cap: int | None = None,  # near-pass worklist slots (default: formula)
    tuning: IntersectTuning | None = None,  # perf knobs (None = defaults;
    #   TPU_PT_* env vars override either way, as the probe shim)
    woop_rows: jnp.ndarray | None = None,  # [N, 12] precomputed row-major
    #   view of woop_cols (scene.types.TriangleScene.woop_rows): skips the
    #   in-loop reshape/transpose the epilogue otherwise pays every bounce
) -> Hit:
    tuning = (tuning or IntersectTuning()).resolve()
    r = origin.shape[0]
    c = chunk_woop.shape[0]
    assert r % ray_tile == 0, (r, ray_tile)
    t_tiles = r // ray_tile
    group = group or _GROUP
    # Sub-tile gating granularity (pair tests predicated per 64-ray
    # sub-tile; probe_granularity sized the win).  Power-of-two divisor of
    # ray_tile, at most 8 bits per chunk in the packed activity words.
    sub_rows = tuning.sub_rows
    n_sub = max(1, min(8, ray_tile // sub_rows)) if ray_tile % sub_rows == 0 else 1

    # Pad the chunk count to a group multiple with NaN blocks: NaN AABBs can
    # never pass the slab test, NaN Woop rows can never intersect.
    cg = -(-c // group)
    pad = cg * group - c
    if pad:
        chunk_woop = jnp.concatenate(
            [
                chunk_woop,
                jnp.full(
                    (pad,) + chunk_woop.shape[1:], jnp.nan, chunk_woop.dtype
                ),
            ]
        )
        chunk_min = jnp.concatenate(
            [chunk_min, jnp.full((pad, 3), jnp.nan, chunk_min.dtype)]
        )
        chunk_max = jnp.concatenate(
            [chunk_max, jnp.full((pad, 3), jnp.nan, chunk_max.dtype)]
        )

    rays = jnp.concatenate(
        [
            origin,
            jnp.ones((r, 1), origin.dtype),
            direction,
            jnp.zeros((r, 1), origin.dtype),
        ],
        axis=1,
    )  # [R, 8]
    # Mode resolution before the prepass: "bins" replaces the tile-level
    # activity machinery wholesale (per-ray bits + binned worklists).
    mode = mode or tuning.mode
    if mode not in ("items", "twopass", "dense", "bins"):
        # Reject typos loudly: a silent fall-through to the slot grid would
        # ship the wrong variant's timing in an env-knob A/B campaign.
        raise ValueError(
            f"unknown intersect mode {mode!r} (TPU_PT_INTERSECT): "
            "expected items | twopass | dense | bins"
        )
    # Super-block gate: past ~4 column blocks (2048 chunks) the prepass
    # stops paying O(tiles x chunks) — steps whose 512-chunk super-AABB no
    # ray enters are skipped from a prefetched coarse bit (VERDICT r2
    # missing #2: the traversal level above chunks).
    cbits = None
    n_blocks = -(-cg * group // _ACT_COLS)
    if mode != "bins":
        if n_blocks > tuning.super_min:
            cbits = super_block_bits(
                rays, chunk_min, chunk_max, min_dst, ray_tile, interpret
            )
        # chunk_min was padded to cg*group rows above, so act/ent have
        # exactly cg*group columns.
        act, ent, m8, sub_ent0 = tile_chunk_activity(
            rays, chunk_min, chunk_max, min_dst, ray_tile, interpret,
            coarse_bits=cbits, n_sub=n_sub,
            # The f32 sub-entry minima feed only the cheap recheck form.
            want_sub_ent=(n_sub > 1 and tuning.cheap_recheck != 0),
        )
        bits = _bitpack(act)
    vma = _vma_of(rays)
    out_shape = [
        _out_struct((r, 1), jnp.float32, vma),
        _out_struct((r, 1), jnp.int32, vma),
    ]
    wc_spec = lambda index_map: pl.BlockSpec(
        (group, 12, chunk_woop.shape[-1]), index_map, memory_space=pltpu.VMEM
    )
    ray_spec = pl.BlockSpec(
        (ray_tile, 8), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM
    )
    col_spec = lambda: pl.BlockSpec(
        (ray_tile, 1), lambda i, j, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [col_spec(), col_spec()]
    tmin_inf = jnp.full((r, 1), jnp.inf, jnp.float32)
    tidx_zero = jnp.zeros((r, 1), jnp.int32)

    def run_dense(bits_, tmin0, tidx0):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # the bit-packed activity mask, in SMEM
            grid=(t_tiles, cg),
            in_specs=[
                ray_spec,
                col_spec(),
                col_spec(),
                wc_spec(lambda i, j, *_: (j, 0, 0)),
            ],
            out_specs=out_specs,
        )
        return pl.pallas_call(
            functools.partial(_kernel_dense, min_dst=min_dst, group=group),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(bits_, rays, tmin0, tidx0, chunk_woop)

    def run_pass(masks_sel, idx, counts, tmin0, tidx0, cap):
        # ONE merged prefetch row per tile: [count | ids | mask words].
        # Prefetched SMEM operands are lane-padded (last dim -> 128), so
        # separate (idx, counts, masks) operands each pay a 64 KB+ floor
        # and a [T, cap, W] mask array allocates 64x its nominal size —
        # measured on chip: 1 MB for s32[128,16,2], the whole SMEM.
        wl = jnp.concatenate(
            [
                counts.reshape(t_tiles, 1),
                idx,
                masks_sel.reshape(t_tiles, cap * (-(-group // 4))),
            ],
            axis=1,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # the merged worklist row
            grid=(t_tiles, cap),
            in_specs=[
                ray_spec,
                col_spec(),
                col_spec(),
                wc_spec(lambda i, s, wl_ref: (wl_ref[i, 1 + s], 0, 0)),
            ],
            out_specs=out_specs,
        )
        return pl.pallas_call(
            functools.partial(
                _kernel_pass, min_dst=min_dst, group=group, n_sub=n_sub,
                cap=cap,
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(wl, rays, tmin0, tidx0, chunk_woop)

    def run_pass_items(masks_sel, idx, counts, tmin0, tidx0, cap):
        # Compacted work-item grid (see _kernel_items): grid size is the
        # DYNAMIC total item count — dead slots never become grid steps.
        del cap
        wl, m = _item_rows(idx, counts[:, 0], masks_sel)
        # Interpret mode (CPU tests) runs the full padded grid — its
        # while-loop lowering of a dynamic grid bound is unreliable; the
        # padding items are idempotent retests of the last valid item.
        grid = (wl.shape[1],) if interpret else (jnp.maximum(m, 1),)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (ray_tile, 8), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                wc_spec(lambda s, wl_ref: (wl_ref[1, s], 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec(
                    (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
        )
        t_k, i_k = pl.pallas_call(
            functools.partial(
                _kernel_items, min_dst=min_dst, group=group, n_sub=n_sub
            ),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(wl, rays, tmin0, tidx0, chunk_woop)
        # Tiles with no items are never visited (their output blocks hold
        # garbage): patch them from the previous pass.  The select runs in
        # [T, ray_tile] shape — a pure bitcast view of the row-major (r, 1)
        # kernel buffers — because [R, 1]{1,0:T(8,128)} elementwise ops
        # occupy one lane in 128 (several such patch fusions measured
        # 0.6-0.75 ms/iter in the round-5 device trace); [T, ray_tile] is
        # lane-dense and the reshapes back to (r, 1) are free.
        vis = (counts[:, 0] > 0)[:, None]  # [T, 1]
        t_p = jnp.where(vis, t_k.reshape(t_tiles, ray_tile),
                        tmin0.reshape(t_tiles, ray_tile))
        i_p = jnp.where(vis, i_k.reshape(t_tiles, ray_tile),
                        tidx0.reshape(t_tiles, ray_tile))
        return t_p.reshape(r, 1), i_p.reshape(r, 1)

    def run_bins():
        """Per-ray binned intersect (the round-4 handoff's lever #1,
        implemented as an opt-in mode): per-ray per-group slab bits ->
        group-major binned ray lists -> ONE _kernel_items pass whose
        "tiles" are the binned ray blocks (identity ids, all-on masks) ->
        scatter-min per ray.  Pair tests touch exactly the pierced
        (ray, group) pairs — the per-ray granularity no tile union or
        global sort can reach — at the price of unbounded (no best-t)
        activity and XLA gather/scatter glue.  Capacity overflow (pair
        rows past TPU_PT_BINS_CAP x R) falls back to the bit-gated dense
        grid, derived conservatively from the same per-ray bits."""
        gb = ray_group_bools(
            rays, chunk_min, chunk_max, min_dst, ray_tile, group, interpret
        )[:cg]
        p_cap = r * tuning.bins_cap
        r_pad, bgrp, n_blocks, overflow = _bins_worklist(gb, ray_tile, p_cap)

        def bins_branch(_):
            live = r_pad >= 0
            rb = rays[jnp.clip(r_pad, 0)]  # [P_pad, 8]
            # Dead padding rows: park the origin far away (the dead-lane
            # convention); the real direction keeps the math finite.
            rb = jnp.concatenate(
                [jnp.where(live[:, None], rb[:, 0:4], 1e30), rb[:, 4:8]],
                axis=1,
            )
            nb_cap = r_pad.shape[0] // ray_tile
            wl = jnp.stack(
                [
                    jnp.arange(nb_cap, dtype=jnp.int32),
                    bgrp,
                    jnp.full((nb_cap,), -1, jnp.int32),
                    jnp.full((nb_cap,), -1, jnp.int32),
                ]
            )  # [4, NB]: block id | worklist group | all-on mask words
            grid = (
                (nb_cap,) if interpret else (jnp.maximum(n_blocks, 1),)
            )
            p_pad = r_pad.shape[0]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[
                    pl.BlockSpec(
                        (ray_tile, 8), lambda s, wl_ref: (wl_ref[0, s], 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                        memory_space=pltpu.VMEM,
                    ),
                    wc_spec(lambda s, wl_ref: (wl_ref[1, s], 0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
            )
            t_rows, i_rows = pl.pallas_call(
                functools.partial(
                    _kernel_items, min_dst=min_dst, group=group, n_sub=1
                ),
                grid_spec=grid_spec,
                out_shape=[
                    _out_struct((p_pad, 1), jnp.float32, vma),
                    _out_struct((p_pad, 1), jnp.int32, vma),
                ],
                interpret=interpret,
            )(wl, rb, jnp.full((p_pad, 1), jnp.inf, jnp.float32),
              jnp.zeros((p_pad, 1), jnp.int32), chunk_woop)
            # Scatter-min per ray; tri tie-break = smallest id among
            # exactly-equal t (the dense sweep's order, since woop order
            # is tri-id order).
            rid = jnp.where(live, r_pad, r)
            t_flat = jnp.where(live, t_rows[:, 0], jnp.inf)
            tb = (
                jnp.full((r + 1,), jnp.inf, jnp.float32)
                .at[rid]
                .min(t_flat, mode="drop")
            )
            won = live & jnp.isfinite(t_flat) & (t_flat == tb[rid])
            trib = (
                jnp.full((r + 1,), jnp.int32(1 << 30))
                .at[jnp.where(won, rid, r)]
                .min(i_rows[:, 0], mode="drop")
            )
            tri_col = jnp.where(
                jnp.isfinite(tb[:r]), trib[:r], 0
            ).astype(jnp.int32)
            return tb[:r, None], tri_col[:, None]

        def dense_branch(_):
            act_t = jnp.any(
                (gb > 0).reshape(cg, t_tiles, ray_tile), axis=2
            ).T  # [T, CG]
            bits_b = _bitpack(
                jnp.repeat(act_t, group, axis=1).astype(jnp.int32)
            )
            return run_dense(bits_b, tmin_inf, tidx_zero)

        return jax.lax.cond(overflow, dense_branch, bins_branch, None)

    # Default "items": the cascade with compacted work-item pass grids —
    # measured 53.3 ms/iter vs the slot grid's 59.2 on 64k atrium
    # secondaries (probe_items; equal checksums), on top of the ladder
    # retune's 70.7 -> 59.2.  "twopass" keeps the slot grid; "dense" is the
    # A/B oracle; "bins" is the per-ray binned experiment.
    if mode == "items":
        run_pass = run_pass_items
    if mode == "bins":
        t_best, tri = run_bins()
    elif mode == "dense":
        t_best, tri = run_dense(bits, tmin_inf, tidx_zero)
    else:
        ga, ge = _group_stats(act, ent, group)
        # Near-pass cascade: each pass tests only the next-nearest ``cap``
        # active groups per tile, then the activity is RECHECKED with the
        # per-ray best t so far (the ordered-descent prune) before the next
        # pass — so far groups are usually culled before they're ever
        # tested.  Cap sizing (scripts/probe_ladder, atrium secondaries):
        # tiny first caps over-pay the fixed cascade round cost (activity
        # 3.4 ms + worklist glue 2.4 ms per recheck) for pruning the later
        # passes mostly re-derive — pass1 ~cg/9 is the measured optimum
        # (59.3 ms/iter vs 73.5 at the old cg/64, all checksums equal).
        # The r3 on-chip campaign (out/campaign_r3.jsonl) then measured the
        # half-size ladder "2,6" fastest on the enclosed atrium under the
        # SAH build (246.4k vs 243.2k samples/s for "4,12"); pruning
        # schedules cannot change results (exactness is oracle-tested), so
        # the campaign winner is the default.
        if pass1_cap:
            ladder = (pass1_cap, pass1_cap * 3)
        else:
            base = max(tuning.pass1_min, cg // 9)
            ladder = tuple(
                int(x) * base // 4 for x in tuning.near.split(",")
            )
        # SMEM budget per pass, mode-dependent: the item layout is
        # [2 + W, T*cap] int32 lane-padded only (16*T bytes per cap slot —
        # the 820k scene's unclamped pass-2 cap 267 x 256 tiles allocated
        # 1.09 MB and failed AOT compile); the slot layout is the merged
        # [T, 1 + cap(1 + W)] row.  EVERY pass cap obeys it — near-pass
        # truncation is safe (untested groups are picked up by the next
        # recheck or the residual), and the residual branches below size
        # themselves from it.
        w_words = -(-group // 4)
        if mode == "items":
            max_cap = tuning.max_cap or max(
                16, 600_000 // (4 * (2 + w_words) * t_tiles)
            )
        else:
            max_cap = tuning.max_cap or max(
                16, (600_000 // (4 * t_tiles) - 128) // (1 + w_words)
            )
        near_caps = [min(c_, cg, max_cap) for c_ in ladder if c_ < cg]
        rows = jnp.arange(t_tiles, dtype=jnp.int32)[:, None]
        tested = jnp.zeros((t_tiles, cg), bool)
        t_cur, i_cur = tmin_inf, tidx_zero
        act_p, m8_p = act, m8

        def select(masks_full, idx):
            return jnp.take_along_axis(masks_full, idx[:, :, None], axis=1)

        # Recheck with the tightened t bound; activity only shrinks (the
        # bound adds a conjunct), so retests are never introduced and the
        # final union is exact.  Two forms, both conservative:
        #   full   re-run the slab sweep with the PER-RAY bound (3.4 ms);
        #   cheap  compare the STORED per-sub-tile entry minima against the
        #          sub-tile MAX of the per-ray bounds — pure XLA, ~free,
        #          but sub-tile-granular (looser: one boundless ray — e.g.
        #          an escape ray still at t=inf — un-prunes its whole
        #          64-ray sub-tile).
        # TPU_PT_CHEAP_RECHECK: 0 = full everywhere, 1 = cheap everywhere,
        # 2 = hybrid (cheap between near passes, full before the residual —
        # the residual is where a loose union costs the most pair ALU, so
        # it gets the tight per-ray bound while the ladder rechecks ride
        # the free form).
        cheap_mode = tuning.cheap_recheck if n_sub > 1 else 0

        def recheck(t_c, live=None, final=False):
            cheap = cheap_mode == 1 or (cheap_mode == 2 and not final)
            if not cheap:
                # Live-block gate: skip whole recheck grid steps whose
                # column block has no (previously active AND untested)
                # group left — valid because activity only shrinks under a
                # tighter t bound and the result is consumed as
                # ``act & ~tested`` (see _live_block_bits).
                gate = cbits
                if live is not None and tuning.gate_recheck:
                    gate = _live_block_bits(live, group)
                    if cbits is not None:
                        gate = gate & cbits
                if (
                    cbits is not None
                    and tuning.super_tbound_min
                    and n_blocks >= tuning.super_tbound_min
                ):
                    # T-BOUNDED coarse gate (round 4): recompute the
                    # super-block bits against the per-ray best t, so
                    # recheck grid steps for blocks no ray can still
                    # improve in are skipped wholesale.  Engaged only at
                    # large block counts — at atrium scale (4 blocks) the
                    # extra trivial-width pass cannot pay for itself.
                    cb_t = super_block_bits(
                        rays, chunk_min, chunk_max, min_dst, ray_tile,
                        interpret, tbest=t_c[:, 0],
                    )
                    gate = gate & cb_t  # gate != None: initialized from cbits
                act_, _, m8_, _ = tile_chunk_activity(
                    rays, chunk_min, chunk_max, min_dst, ray_tile, interpret,
                    tbest=t_c[:, 0], coarse_bits=gate, n_sub=n_sub,
                )
                return act_, m8_
            tb_sub = jnp.max(
                t_c[:, 0].reshape(t_tiles, n_sub, ray_tile // n_sub), axis=2
            )
            ok = jnp.isfinite(sub_ent0) & (sub_ent0 <= tb_sub[:, :, None])
            m8_ = jnp.sum(
                ok.astype(jnp.int32)
                << jnp.arange(n_sub, dtype=jnp.int32)[None, :, None],
                axis=1,
            )
            return (m8_ != 0).astype(jnp.int32), m8_

        for k, cap in enumerate(near_caps):
            ga_p, _ = _group_stats(act_p, ent, group)
            ga_p = ga_p & ~tested
            idx_p, counts_p, _ = _worklist(ga_p, ge, cap)
            t_cur, i_cur = run_pass(
                select(_pack_group_masks(m8_p, group), idx_p),
                idx_p, counts_p[:, None], t_cur, i_cur, cap,
            )
            tested = tested.at[rows, idx_p].set(True)
            act_p, m8_p = recheck(
                t_cur, live=ga_p & ~tested, final=k == len(near_caps) - 1
            )

        # Residual: everything still active and untested, front-to-back.
        # Small scenes (cg within the SMEM budget) run ONE residual pass
        # (count-bucketed caps in slot mode; the item grid sizes itself);
        # scenes whose group count exceeds the budget iterate budget-sized
        # passes with a best-t recheck between them until no active
        # untested group remains (each iteration tests >= min(m, max_cap)
        # groups, so it terminates; in practice the recheck collapses the
        # residual).
        def resid_state(t_c, i_c, tested_, act_, m8_):
            ga_r, _ = _group_stats(act_, ent, group)
            ga_r = ga_r & ~tested_
            cap_r = min(cg, max_cap)
            idx_r, counts_r, full_r = _worklist(ga_r, ge, cap_r)
            masks_r = select(_pack_group_masks(m8_, group), idx_r)
            return idx_r, counts_r, masks_r, jnp.max(full_r)

        idx_r, counts_r, masks_r, m = resid_state(
            t_cur, i_cur, tested, act_p, m8_p
        )
        if cg <= max_cap and mode == "items":
            # The item grid is already sized by the dynamic item count, so
            # the count-bucket switch is pointless (every bucket would
            # compile the same program).
            t_best, tri = run_pass(
                masks_r, idx_r, counts_r[:, None], t_cur, i_cur,
                min(cg, max_cap),
            )
        elif cg <= max_cap:
            caps = sorted({min(cg, max(4, -(-cg // 8))),
                           min(cg, max(8, -(-cg // 3))), cg})

            def bucket(cap):
                def run(_):
                    return run_pass(
                        masks_r[:, :cap], idx_r[:, :cap],
                        jnp.minimum(counts_r, cap)[:, None], t_cur, i_cur,
                        cap,
                    )
                return run

            branch = jnp.searchsorted(jnp.asarray(caps, jnp.int32), m)
            t_best, tri = jax.lax.cond(
                m > 0,
                lambda _: jax.lax.switch(
                    branch, [bucket(cap) for cap in caps], None
                ),
                lambda _: (t_cur, i_cur),
                None,
            )
        else:
            def cond(st):
                return st[6] > 0

            def body(st):
                t_c, i_c, tested_, idx_c, counts_c, masks_c, _m = st
                t_c, i_c = run_pass(
                    masks_c, idx_c, counts_c[:, None], t_c, i_c,
                    min(cg, max_cap),
                )
                tested_ = tested_.at[rows, idx_c].set(True)
                act_n, m8_n = recheck(t_c, final=True)
                idx_n, counts_n, masks_n, m_n = resid_state(
                    t_c, i_c, tested_, act_n, m8_n
                )
                return (t_c, i_c, tested_, idx_n, counts_n, masks_n, m_n)

            state = (t_cur, i_cur, tested, idx_r, counts_r, masks_r, m)
            t_best, tri = jax.lax.while_loop(cond, body, state)[:2]

    t_best = t_best[:, 0]
    tri = tri[:, 0]
    hit = jnp.isfinite(t_best)
    # Winner barycentric recompute (same epilogue as the dense path).
    tri_safe = jnp.where(hit, tri, 0)
    o1 = rays[:, 0:4]
    d0 = rays[:, 4:8]
    n3 = woop_cols.shape[1]
    if woop_rows is not None or n3 <= 3 * 4_194_304:
        # Row-major winner gather: the column-major [4, 3N] gather lands in
        # a {0,1:T(4,128)} result XLA then re-tiles (fusion.602 +
        # reshape.2030 = 1.28 ms/iter in the round-4 device trace).  The
        # [N, 12] view (rows[t, 4j+k] = cols[k, 3t+j]) is loop-invariant —
        # XLA hoists the transpose out of the bounce loop, one pass per
        # dispatch — and the per-ray fetch becomes ONE wide row gather.
        # Size-gated: above ~4M triangles the hoisted copy's HBM footprint
        # (48 B/tri) outweighs the epilogue's ~1 ms/iter.
        rows12 = (
            woop_rows
            if woop_rows is not None
            else woop_cols.reshape(4, n3 // 3, 3)
            .transpose(1, 2, 0)
            .reshape(n3 // 3, 12)
        )
        wr = rows12[tri_safe]  # [R, 12]

        def _dotw(vec, j):
            return jnp.sum(vec * wr[:, 4 * j:4 * j + 4], axis=1)

        t_r = -_dotw(o1, 2) / _dotw(d0, 2)
        beta = _dotw(o1, 0) + t_r * _dotw(d0, 0)
        gamma = _dotw(o1, 1) + t_r * _dotw(d0, 1)
    else:
        cols = tri_safe[:, None] * 3 + jnp.arange(3)[None, :]
        w = jnp.moveaxis(woop_cols[:, cols], 0, 1)  # [R, 4, 3]
        p = jnp.einsum("rk,rkj->rj", o1, w, precision=_PRECISION)
        q = jnp.einsum("rk,rkj->rj", d0, w, precision=_PRECISION)
        t_r = -p[..., 2] / q[..., 2]
        beta = p[..., 0] + t_r * q[..., 0]
        gamma = p[..., 1] + t_r * q[..., 1]
    return Hit(
        t=jnp.where(hit, t_best, jnp.inf),
        tri=tri_safe,
        beta=jnp.where(hit, beta, 0.0),
        gamma=jnp.where(hit, gamma, 0.0),
        hit=hit,
    )


def _kernel_light_pdf_items(
    wl_ref, rays_ref, sum0_ref, wc_ref, k_ref, sum_ref, *, min_dst
):
    """Compacted item grid over pierced (tile, cluster) pairs: each step
    accumulates one cluster's all-hits pdf projection terms into its tile's
    [RT, 1] running sum (the wavefront analog of the reference's light-BVH
    walk, src/raytracer.h:363-375: every pierced light contributes
    ``|x-y|^2 / (|cos| * area)``; here = t^2 |d|^2 k / |q_n| with
    k = 1/(2 area^2) precomputed — see scene/accel.py:light_clusters).
    wl rows = [tile | cluster | live]; tile-major items keep the sum block
    resident, the first item of a tile inits it from the PREVIOUS window's
    running sum (sum0 — zeros on the first window; windows keep each call's
    SMEM worklist under budget at huge cluster counts), and dead padding
    items are GATED (a sum is not idempotent — retesting double-counts)."""
    s = pl.program_id(0)
    tile = wl_ref[0, s]
    prev = wl_ref[0, jnp.maximum(s - 1, 0)]

    @pl.when((s == 0) | (tile != prev))
    def _init():
        sum_ref[:] = sum0_ref[:]

    rays = rays_ref[:]  # [RT, 8]
    o1 = rays[:, 0:4]
    d0 = rays[:, 4:8]
    d2 = jnp.sum(d0 * d0, axis=1, keepdims=True)  # |d|^2 (4th comp is 0)
    live = wl_ref[2, s] > 0

    @pl.when(live)
    def _cluster():
        w = wc_ref[0]  # [12, CL]
        k = k_ref[0]  # [CL]

        p0, p1, p2 = (
            _contract_o(o1, w, 0), _contract_o(o1, w, 4), _contract_o(o1, w, 8)
        )
        q0, q1, q2 = (
            _contract_d(d0, w, 0), _contract_d(d0, w, 4), _contract_d(d0, w, 8)
        )
        t = -p2 / q2
        beta = p0 + t * q0
        gamma = p1 + t * q1
        ok = (beta >= 0) & (gamma >= 0) & (beta + gamma <= 1) & (t >= min_dst)
        term = jnp.where(
            ok, t * t * d2 * k[None, :] / jnp.abs(q2), 0.0
        )
        sum_ref[:] = sum_ref[:] + jnp.sum(term, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("min_dst", "ray_tile", "interpret", "tuning")
)
def light_pdf_sum_chunks(
    origin: jnp.ndarray,  # [R, 3], R % ray_tile == 0
    direction: jnp.ndarray,  # [R, 3]
    cluster_woop: jnp.ndarray,  # [C, 12, CL]
    cluster_k: jnp.ndarray,  # [C, CL]
    cluster_min: jnp.ndarray,  # [C, 3]
    cluster_max: jnp.ndarray,  # [C, 3]
    light_count: jnp.ndarray,  # [] int32
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
    tuning: IntersectTuning | None = None,
) -> jnp.ndarray:  # [R] mean projection term (sum / count)
    """Sub-linear all-hits light pdf: cluster-AABB activity prepass + per-tile
    worklists, so cost scales with *pierced* clusters instead of L
    (``light_pdf_sum``'s dense reduce is O(L) per ray per bounce — VERDICT r2
    weak #3).  Exact: a cluster the slab test rejects contributes 0 from all
    its lights, and per-light validity inside pierced clusters is the same
    Woop window the dense oracle evaluates."""
    r = origin.shape[0]
    c = cluster_woop.shape[0]
    assert r % ray_tile == 0, (r, ray_tile)
    t_tiles = r // ray_tile

    rays = jnp.concatenate(
        [
            origin,
            jnp.ones((r, 1), origin.dtype),
            direction,
            jnp.zeros((r, 1), origin.dtype),
        ],
        axis=1,
    )
    act, ent, _, _ = tile_chunk_activity(
        rays, cluster_min, cluster_max, min_dst, ray_tile, interpret
    )
    # Group granularity == one cluster per worklist slot (the [12, CL] block
    # is already the DMA unit).
    ga, ge = _group_stats(act, ent, 1)
    idx_full, counts_full, _ = _worklist(ga, ge, c)
    # Compacted work-item grid (same design as _kernel_items): the grid is
    # the dynamic pierced-(tile, cluster) count — no dead slots, no
    # count-bucket switch.  Items are tile-major so each tile's [RT, 1] sum
    # block stays resident across its items; the first item zero-inits it,
    # tiles with no pierced cluster are patched to zero afterwards.
    wl, m = _item_rows(
        idx_full, counts_full,
        jnp.zeros((t_tiles, c, 1), jnp.int32),  # no mask fields needed
    )
    # Row 2 = live flag: the pdf SUM is not idempotent (unlike the
    # min-accumulating hit kernels), so padding items — which repeat the
    # last valid item — must be gated off, not retested.  (The dynamic grid
    # never reaches them; interpret mode's static grid does, and m = 0
    # dispatches one garbage step.)
    live = (
        jax.lax.broadcasted_iota(jnp.int32, (1, wl.shape[1]), 1) < m
    ).astype(jnp.int32)
    wl = jnp.concatenate([wl[:2], live], axis=0)  # [3, T*c]
    # SMEM budget: the [3, window] worklist is the only prefetched operand
    # (lane-padded rows, 4 bytes each); one unsplit [3, T*c] row exceeds the
    # 1 MB SMEM past ~650 clusters at 128 tiles (the exact AOT failure the
    # geometry path's max_cap fixed — code-review r3 finding).  Windows keep
    # each call under budget; the kernel chains each tile's running sum
    # through sum0, so window k starts from window k-1's totals.
    window = (tuning or IntersectTuning()).resolve().light_items
    out_shape = _out_struct((r, 1), jnp.float32, _vma_of(origin, direction))
    total = jnp.zeros((r, 1), jnp.float32)
    visited_any = jnp.zeros((t_tiles,), bool)
    for k0 in range(0, wl.shape[1], window):
        wl_k = wl[:, k0 : k0 + window]
        m_k = jnp.clip(m - k0, 0, wl_k.shape[1])
        grid = (wl_k.shape[1],) if interpret else (jnp.maximum(m_k, 1),)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (ray_tile, 8), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 12, cluster_woop.shape[-1]),
                    lambda s, wl_ref: (wl_ref[1, s], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, cluster_k.shape[-1]),
                    lambda s, wl_ref: (wl_ref[1, s], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (ray_tile, 1), lambda s, wl_ref: (wl_ref[0, s], 0),
                memory_space=pltpu.VMEM,
            ),
        )
        got = pl.pallas_call(
            functools.partial(_kernel_light_pdf_items, min_dst=min_dst),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(wl_k, rays, total, cluster_woop, cluster_k)
        # Tiles this window never visited hold stale buffer contents: keep
        # the previous running total for them (live items only — a window
        # whose dispatched step is all padding must also count as unvisited).
        live_k = wl_k[2] > 0
        vis_k = (
            jnp.zeros((t_tiles + 1,), bool)
            .at[jnp.where(live_k, wl_k[0], t_tiles)]
            .max(jnp.ones(wl_k.shape[1], bool))[:t_tiles]
        )
        # [T, ray_tile] view for the patch select: lane-dense, free bitcast
        # reshapes (an [R, 1]{1,0} select runs on one lane in 128).
        total = jnp.where(
            vis_k[:, None], got.reshape(t_tiles, ray_tile),
            total.reshape(t_tiles, ray_tile),
        ).reshape(r, 1)
        visited_any = visited_any | vis_k
    total = jnp.where(
        visited_any[:, None], total.reshape(t_tiles, ray_tile), 0.0
    ).reshape(r, 1)
    return total[:, 0] / jnp.maximum(light_count, 1).astype(jnp.float32)


def _nearest_kernel(rays_ref, aabb_ref, tmin_ref, arg_ref, *, min_dst):
    """Per-ray argmin of AABB entry distance over column blocks: grid step
    (i, b) tests ray tile i against AABB column block b, min-accumulating
    (entry t, column id) into the [RT, 1] outputs (b is the inner grid dim,
    so a tile's output block stays resident until all its b steps ran)."""
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _init():
        tmin_ref[:] = jnp.full_like(tmin_ref, jnp.inf)
        arg_ref[:] = jnp.full_like(arg_ref, -1)

    rays = rays_ref[:]  # [RT, 8]
    t_lo = None
    t_hi = None
    for a in range(3):
        o = rays[:, a : a + 1]
        d = rays[:, 4 + a : 5 + a]
        inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)  # see _activity_body
        t1 = (aabb_ref[a, :][None, :] - o) * inv
        t2 = (aabb_ref[3 + a, :][None, :] - o) * inv
        lo = jnp.minimum(t1, t2)
        hi = jnp.maximum(t1, t2)
        t_lo = lo if t_lo is None else jnp.maximum(t_lo, lo)
        t_hi = hi if t_hi is None else jnp.minimum(t_hi, hi)
    ok = (t_lo <= t_hi) & (t_hi >= min_dst)
    entry = jnp.where(ok, jnp.maximum(t_lo, min_dst), jnp.inf)
    bm = jnp.min(entry, axis=1, keepdims=True)  # [RT, 1]
    ba = (
        jnp.argmin(entry, axis=1).astype(jnp.int32)
        + b * entry.shape[-1]
    )[:, None]
    cur = tmin_ref[:]
    better = bm < cur
    tmin_ref[:] = jnp.where(better, bm, cur)
    arg_ref[:] = jnp.where(better & jnp.isfinite(bm), ba, arg_ref[:])


@functools.partial(
    jax.jit, static_argnames=("min_dst", "ray_tile", "interpret")
)
def nearest_box_ids(
    origin: jnp.ndarray,  # [R, 3], R % ray_tile == 0
    direction: jnp.ndarray,  # [R, 3]
    box_min: jnp.ndarray,  # [G, 3] (NaN rows never match)
    box_max: jnp.ndarray,  # [G, 3]
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
) -> jnp.ndarray:  # [R] int32: argmin entry-distance box id, -1 = none
    """The FIRST box each ray enters (argmin of slab entry distance) — the
    geometry-aware coherence key: rays sharing their first worklist group
    share the front of their front-to-back worklists, so sorting by this id
    drops tile-union inflation in a way no spawn-surface key can
    (ray_sort_key_hint keys on where the ray LEFT, not where it will land).
    Runs at worklist-group granularity (G = n_chunks/group boxes), ~1/8 the
    cost of the chunk-level activity prepass."""
    r = origin.shape[0]
    g = box_min.shape[0]
    assert r % ray_tile == 0, (r, ray_tile)
    t_tiles = r // ray_tile
    gpad = -(-g // _ACT_COLS) * _ACT_COLS
    pad = gpad - g
    if pad:
        box_min = jnp.concatenate(
            [box_min, jnp.full((pad, 3), jnp.nan, box_min.dtype)]
        )
        box_max = jnp.concatenate(
            [box_max, jnp.full((pad, 3), jnp.nan, box_max.dtype)]
        )
    aabb_rows = jnp.concatenate(
        [box_min.T, box_max.T, jnp.zeros((2, gpad), box_min.dtype)], axis=0
    )  # [8, gpad]
    rays = jnp.concatenate(
        [
            origin,
            jnp.ones((r, 1), origin.dtype),
            direction,
            jnp.zeros((r, 1), origin.dtype),
        ],
        axis=1,
    )
    tmin, arg = pl.pallas_call(
        functools.partial(_nearest_kernel, min_dst=min_dst),
        grid=(t_tiles, gpad // _ACT_COLS),
        in_specs=[
            pl.BlockSpec(
                (ray_tile, 8), lambda i, b: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (8, _ACT_COLS), lambda i, b: (0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (ray_tile, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (ray_tile, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            _out_struct((r, 1), jnp.float32, _vma_of(rays)),
            _out_struct((r, 1), jnp.int32, _vma_of(rays)),
        ],
        interpret=interpret,
    )(rays, aabb_rows)
    del tmin
    return arg[:, 0]


def group_boxes(
    chunk_min: jnp.ndarray, chunk_max: jnp.ndarray, group: int = _GROUP
):
    """Chunk AABBs -> worklist-group AABBs (NaN pad rows vanish; an all-NaN
    group yields a NaN box, which no slab test matches)."""
    c = chunk_min.shape[0]
    pad = (-c) % group
    if pad:
        chunk_min = jnp.concatenate(
            [chunk_min, jnp.full((pad, 3), jnp.nan, chunk_min.dtype)]
        )
        chunk_max = jnp.concatenate(
            [chunk_max, jnp.full((pad, 3), jnp.nan, chunk_max.dtype)]
        )
    cg = chunk_min.shape[0] // group
    return (
        jnp.nanmin(chunk_min.reshape(cg, group, 3), axis=1),
        jnp.nanmax(chunk_max.reshape(cg, group, 3), axis=1),
    )


def _dir_octant(direction: jnp.ndarray) -> jnp.ndarray:
    """[R, 3] -> [R] int32 direction octant (the shared major/minor term of
    every sort key; one definition so a future re-binning — e.g. the swept
    fine-direction bits — cannot silently diverge the policies)."""
    return (
        (direction[:, 0] > 0).astype(jnp.int32) * 4
        + (direction[:, 1] > 0).astype(jnp.int32) * 2
        + (direction[:, 2] > 0).astype(jnp.int32)
    )


def ray_sort_key_target(
    origin: jnp.ndarray,  # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    alive: jnp.ndarray,  # [R] bool
    group_min: jnp.ndarray,  # [G, 3] worklist-group AABBs
    group_max: jnp.ndarray,
    min_dst: float,
    ray_tile: int = RAY_TILE,
    interpret: bool = False,
) -> jnp.ndarray:  # [R] int32
    """Coherence key from the group each ray will FIRST ENTER (nearest_box
    argmin), direction octant as the minor tiebreak.  Rays that enter
    nothing (env escapes) share one bucket before the dead bucket."""
    g = group_min.shape[0]
    tgt = nearest_box_ids(
        origin, direction, group_min, group_max, min_dst, ray_tile, interpret
    )
    octant = _dir_octant(direction)
    bucket = jnp.where(tgt >= 0, tgt, g)
    key = bucket * 8 + octant
    return jnp.where(alive, key, jnp.int32(1 << 28))


def ray_sort_key_hint(
    direction: jnp.ndarray,  # [R, 3]
    alive: jnp.ndarray,  # [R] bool
    hint: jnp.ndarray,  # [R] int32: spawn-surface chunk id, -1 = no hint
    n_chunks: int,
) -> jnp.ndarray:  # [R] int32
    """Coherence key from the SURFACE the ray spawned on: direction octant
    (major) x the spatially-ordered chunk id of the previous bounce's hit.

    Chunks adapt to geometry (every id is 128 triangles of actual surface)
    where the origin-cell grid (ray_sort_key) mostly indexes empty air, so
    secondary wavefronts land in tiles whose chunk-activity unions are much
    tighter — the dominant cost in enclosed scenes, where cosine-sampled
    secondaries are maximally direction-incoherent (round-3 atrium sweep:
    secondary intersect 150-188 ms vs 37 ms primary at 64k).  Hintless rays
    (fresh primaries — all at the camera) share one bucket past the chunk
    ids; dead rays sort last."""
    octant = _dir_octant(direction)
    bucket = jnp.clip(jnp.where(hint >= 0, hint, n_chunks), 0, n_chunks)
    key = octant * (n_chunks + 1) + bucket
    return jnp.where(alive, key, jnp.int32(1 << 28))


def ray_sort_key_dirhint(
    direction: jnp.ndarray,  # [R, 3]
    alive: jnp.ndarray,  # [R] bool
    hint: jnp.ndarray,  # [R] int32 spawn-surface chunk id, -1 = none
    n_chunks: int,
) -> jnp.ndarray:  # [R] int32
    """Fine-direction-major coherence key: (dominant axis, 4x4 bins of the
    two minor direction components) major, spawn-surface chunk id, then
    octant minor.

    probe_sortkey_proxy (round 4, real atrium secondary wavefront,
    t-bounded pierced sets): 64-ray-union activations 57.0k vs the hint
    key's 71.5k (-20%) — the best implementable order measured; the
    clustering ORACLE itself only reaches 39.6k (union bloat is intrinsic
    hemisphere divergence), so this key captures ~half of everything any
    order can give.  (Chip A/B: LOSES 9.3% end-to-end — kept as an option
    with that evidence, out/campaign_r4.jsonl.)  Keys fit int32 to ~5.5M
    chunks (48 * 8 * (C + 1) < 2^31); the dead-ray sentinel is int32 max
    so dead rays sort last over that whole range (1 << 30 would fall
    below live keys past ~2.8M chunks — code-review r4 finding)."""
    octant = _dir_octant(direction)
    dom = jnp.argmax(jnp.abs(direction), axis=1)
    minor0 = jnp.where(dom == 0, direction[:, 1], direction[:, 0])
    minor1 = jnp.where(dom == 2, direction[:, 1], direction[:, 2])
    b0 = jnp.clip(((minor0 + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    b1 = jnp.clip(((minor1 + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    dir4 = (dom.astype(jnp.int32) * 4 + b0) * 4 + b1
    bucket = jnp.clip(jnp.where(hint >= 0, hint, n_chunks), 0, n_chunks)
    key = (dir4 * (n_chunks + 1) + bucket) * 8 + octant
    return jnp.where(alive, key, jnp.iinfo(jnp.int32).max)


def ray_sort_key(
    origin: jnp.ndarray,  # [R, 3]
    direction: jnp.ndarray,  # [R, 3]
    alive: jnp.ndarray,  # [R] bool
    scene_lo: jnp.ndarray,  # [3]
    scene_hi: jnp.ndarray,  # [3]
) -> jnp.ndarray:  # [R] int32
    """Coherence key for wavefront ray sorting: direction octant (3 bits,
    major) x Morton-interleaved origin cell in a 16^3 grid over the scene
    bounds (12 bits).  Rays sorted by this key land in tiles whose
    chunk-activity unions approach the per-ray minimum — Morton cell order
    keeps a tile's origins in one compact spatial blob, matching the
    spatially-ordered chunk layout; dead rays sort last so their tiles skip
    every chunk.  (A 64-direction-bin fine key was swept on chip and lost:
    15.24 s vs 17.32 s end-to-end.)"""
    octant = _dir_octant(direction)
    ext = jnp.maximum(scene_hi - scene_lo, 1e-30)
    nc = float(_SORT_CELLS)
    cell = jnp.clip(
        ((origin - scene_lo) / ext * nc).astype(jnp.int32), 0, _SORT_CELLS - 1
    )

    def spread(x):  # up to 8 bits -> every 3rd bit (Morton)
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    morton = (
        spread(cell[:, 0]) * 4 + spread(cell[:, 1]) * 2 + spread(cell[:, 2])
    )
    key = octant * (_SORT_CELLS ** 3) + morton
    return jnp.where(alive, key, jnp.int32(1 << 20))


def build_chunk_woop(
    woop_cols: np.ndarray, chunk_tris: int = CHUNK_TRIS
) -> np.ndarray:
    """[4, 3N] -> [C, 12, chunk_tris] chunk blocks (row = 4*comp + coef)."""
    four, n3 = woop_cols.shape
    n = n3 // 3
    pad = (-n) % chunk_tris
    w = woop_cols.reshape(4, n, 3)
    if pad:
        w = np.concatenate([w, np.full((4, pad, 3), np.nan, w.dtype)], axis=1)
        n += pad
    c = n // chunk_tris
    # Blocked permutation (chunk axis first) — see scene/accel.leaf_woop:
    # the former reshape(12, C, W)-then-transpose form cost two full-array
    # strided copies (10.3 s -> 0.04 s at 820k tris, bit-equal).
    w = w.reshape(4, c, chunk_tris, 3)  # [k, chunk, t, comp] view
    w = w.transpose(1, 3, 0, 2)  # [chunk, comp, k, t]; rows 4*comp+k
    return w.astype(np.float32, order="C").reshape(c, 12, chunk_tris)
