#!/usr/bin/env python
"""Headline workload: enclosed atrium, 1000x1000 @ 1000 spp, single chip.

The reference's only published number is this workload shape on enclosed
Sponza: ~47 min on a multi-core CPU (/root/reference/README.md:4).  This
script renders it end-to-end with checkpointing (resumable across tunnel
outages; counter RNG makes the resume sample-exact) and appends a ledger
line to out/headline_r3.json.

Env: HEADLINE_SPP (default 1000), HEADLINE_SIZE (default 1000),
HEADLINE_CKPT (default /tmp/headline_ck.npz), HEADLINE_OUT (default
out/samples/atrium_1000x1000_1000spp.ppm).
"""

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def supervise() -> int:
    """Stall watchdog: run the render in a child process, monitor checkpoint
    progress, and kill + respawn (the child resumes sample-exactly from the
    checkpoint) when no checkpoint lands for HEADLINE_STALL_S seconds.

    Exists because the shared tunnel can WEDGE mid-execution (observed
    round 3: 29 min with no progress, process alive and sleeping) — a
    failure mode the in-process chunk-retry (RenderConfig.failure_retries)
    cannot catch, since block_until_ready never returns.  Process-level
    restart + counter-RNG checkpoint resume is the honest recovery path.
    Env: HEADLINE_STALL_S (default 1200 — safely past the longest observed
    remote compile, since killing a client mid-compile can wedge the relay),
    HEADLINE_MAX_RESTARTS (default 20).
    """
    stall_s = float(os.environ.get("HEADLINE_STALL_S", "1200"))
    max_restarts = int(os.environ.get("HEADLINE_MAX_RESTARTS", "20"))
    ck = os.environ.get("HEADLINE_CKPT", "/tmp/headline_ck.npz")
    env = dict(os.environ)
    env.pop("HEADLINE_SUPERVISE", None)

    def ck_mtime():
        try:
            return os.path.getmtime(ck)
        except OSError:
            return 0.0

    for attempt in range(max_restarts + 1):
        child = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                 env=env)
        last = max(ck_mtime(), time.time())
        while True:
            rc = child.poll()
            if rc is not None:
                if rc == 0:
                    return 0
                print(json.dumps({"supervisor": "child_exit", "rc": rc,
                                  "attempt": attempt}), flush=True)
                break  # crash -> respawn (resumes from checkpoint)
            m = ck_mtime()
            if m > last:
                last = m
            elif time.time() - last > stall_s:
                print(json.dumps({"supervisor": "stall_kill",
                                  "stalled_s": round(time.time() - last),
                                  "attempt": attempt}), flush=True)
                child.kill()
                child.wait()
                break
            time.sleep(20)
        time.sleep(30)  # give the tunnel a moment before reconnecting
    print(json.dumps({"supervisor": "gave_up",
                      "restarts": max_restarts}), flush=True)
    return 1


def main() -> int:
    from tpu_pathtracer.cli import setup_backend

    setup_backend()
    from tpu_pathtracer.config import RenderConfig
    from tpu_pathtracer.parallel.checkpoint import render_with_checkpoints
    from tpu_pathtracer.scene.gltf import parse_gltf_scene
    from tpu_pathtracer.utils.image import quantize_u8, write_ppm
    from tpu_pathtracer.utils.testscenes import make_atrium_gltf

    spp = int(os.environ.get("HEADLINE_SPP", "1000"))
    size = int(os.environ.get("HEADLINE_SIZE", "1000"))
    ck = os.environ.get("HEADLINE_CKPT", "/tmp/headline_ck.npz")
    out = os.environ.get(
        "HEADLINE_OUT", "out/samples/atrium_1000x1000_1000spp.ppm"
    )
    # BENCH_RPB is honored so a campaign winner env that tunes the
    # wavefront width applies to the headline run too.
    config = RenderConfig(
        rays_per_batch=int(os.environ.get("BENCH_RPB", 1 << 16)),
        # Pool passes per chunk call: larger pools pay fewer drain tails at
        # the headline's 16-chunk shape (env-overridable for the A/B).
        spp_per_pass=int(os.environ.get("HEADLINE_SPP_PER_PASS", "16")),
    )

    path = make_atrium_gltf("/tmp/headline/atrium.gltf", detail=2)
    scene = parse_gltf_scene(path, 1.0, config)
    scene = dataclasses.replace(scene, camera=scene.camera.with_dims(size, size))
    n_tris = int(scene.valid.sum())
    print(f"headline: {n_tris} tris, {size}x{size} @ {spp} spp", flush=True)

    # Resumed offset must be read BEFORE rendering: the first progress
    # callback fires after the first pass with that pass already folded in,
    # so inferring the offset from it overcounts by one checkpoint pass
    # (and reports fresh_spp=0 for a short fresh run).  Replicate the
    # loader's validity checks so a stale checkpoint (which the renderer
    # ignores) counts as offset 0.
    from tpu_pathtracer.parallel.checkpoint import RenderState, scene_fingerprint

    resumed_from = 0
    if os.path.exists(ck):
        try:
            st = RenderState.load(ck)
            if (st.width, st.height, st.seed) == (size, size, 0) and (
                st.fingerprint in (0, scene_fingerprint(scene, config))
            ):
                # Clamp: a checkpoint already past `spp` renders nothing.
                resumed_from = min(st.samples_done, spp)
        except Exception:  # noqa: BLE001 — corrupt checkpoint = fresh start
            pass

    t0 = time.time()

    def progress(done, total):
        print(
            json.dumps(
                {"spp_done": done, "spp_total": total,
                 "elapsed_s": round(time.time() - t0, 1)}
            ),
            flush=True,
        )

    img = render_with_checkpoints(
        scene, spp=spp, seed=0, config=config, checkpoint_path=ck,
        checkpoint_every=int(os.environ.get("HEADLINE_CKPT_EVERY", "50")),
        progress=progress,
    )
    dt = time.time() - t0
    fresh_spp = spp - resumed_from
    samples = size * size * fresh_spp
    import numpy as np

    os.makedirs(os.path.dirname(out), exist_ok=True)
    write_ppm(out, np.asarray(quantize_u8(img)))
    ledger = {
        "workload": f"enclosed-atrium {n_tris} tris {size}x{size}@{spp}spp",
        "wall_s_this_run": round(dt, 1),
        "spp_rendered_this_run": fresh_spp,
        "samples_per_s": round(samples / dt, 1) if fresh_spp else None,
        "resumed_from_spp": resumed_from,
        "out": out,
    }
    os.makedirs("out", exist_ok=True)
    with open(os.environ.get("HEADLINE_LEDGER", "out/headline_r4.json"),
              "a") as f:
        f.write(json.dumps(ledger) + "\n")
    print(json.dumps(ledger), flush=True)
    return 0


if __name__ == "__main__":
    if os.environ.get("HEADLINE_SUPERVISE"):
        raise SystemExit(supervise())
    raise SystemExit(main())
