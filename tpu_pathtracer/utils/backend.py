"""Backend liveness helpers for the tunnel-backed TPU in this environment.

A wedged axon relay makes ANY jax backend-init call hang (not raise), so
anything that must not hang — the bench, the driver entry points — probes in
a subprocess first and falls back to CPU.
"""

from __future__ import annotations

import os
import subprocess
import sys


def tpu_alive(timeout_s: int = 300, attempts: int = 3) -> bool:
    """True if default-backend init + a trivial op completes in a subprocess.

    Retries: the shared relay has multi-minute congestion windows during
    which a healthy tunnel can exceed any single timeout — a false "dead"
    verdict downgrades a real benchmark run to the CPU liveness fallback,
    which is far worse than waiting out the congestion.
    """
    for i in range(attempts):
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; print(float(jnp.arange(3.).sum()))"],
                capture_output=True, timeout=timeout_s, text=True,
            )
            if p.returncode == 0 and "3.0" in p.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(
            f"tpu liveness probe attempt {i + 1}/{attempts} failed",
            file=sys.stderr,
        )
    return False


def ensure_live_backend(timeout_s: int = 240) -> None:
    """Force the CPU platform when the default (tunnel) backend is dead.

    No-op when a platform override is already set or the backend is healthy.
    """
    override = os.environ.get("TPU_PATHTRACER_PLATFORM")
    if override:
        # Apply it, don't just skip the probe: callers outside the CLI
        # (__graft_entry__, probes) otherwise still initialize the default
        # tunnel backend and hang when it is dead.
        import jax

        jax.config.update("jax_platforms", override)
        return
    if not tpu_alive(timeout_s):
        import jax

        jax.config.update("jax_platforms", "cpu")
