"""Chained-GEMM throughput probe: is the chip HEALTHY, not just UP?

Observed 2026-08-19 (r5): the tunnel can be fully responsive (matmul
readback works, roundtrip ~43-59 ms) while the chip's compute runs
~25-50x slow — a 50x-chained 4096^3 bf16 GEMM measured 1.9 TFLOP/s
against the >100 TFLOP/s a healthy v5e sustains on the same program.
Every timing captured in that state is garbage that looks plausible
(the r5-capture bench tail recorded RTF 0.2703, uniformly ~25x slow).

A tiny-matmul probe (bench.py `_probe_backend`) cannot see this: one
128x128 dispatch is all roundtrip latency.  This probe chains enough
MXU work under one dispatch that the answer is compute-bound, then
reports achieved TFLOP/s.

Exit code 0 iff achieved >= --min-tflops (default 50: half of healthy,
25x above the degraded state — a wide, unambiguous margin).

Usage:
  python tools/chip_health.py [--min-tflops 50] [--json]
  python tools/chip_health.py --wait [--budget-s 14400] [--interval-s 600]

--wait re-probes every --interval-s until healthy or --budget-s is
exhausted (the process stays resident so the ~200 s backend init is paid
once, not per probe).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# The one healthy/degraded boundary, shared with bench.py's chip_degraded
# flag: half of the >100 TFLOP/s a healthy v5e sustains on this program,
# 25x above the observed degraded state — a wide, unambiguous margin.
HEALTHY_FLOOR_TFLOPS = 50.0


def probe_tflops(n: int = 4096, length: int = 50) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    x = jnp.ones((n, n), jnp.bfloat16)

    def body(c, _):
        return (c @ x) * jnp.bfloat16(1e-4), ()

    f = jax.jit(lambda a: lax.scan(body, a, None, length=length)[0])
    np.asarray(f(x))  # compile + warm
    t0 = time.monotonic()
    np.asarray(f(x))
    dt = time.monotonic() - t0
    return 2 * n**3 * length / dt / 1e12


def _probe_subprocess(timeout_s: float = 900.0) -> float:
    """Re-probe in a FRESH process.  Used after an in-process probe raises:
    a tunnel RPC reset can leave the resident (cached) backend dead, so
    every later in-process probe would fail even once the chip recovers —
    a fresh process re-inits the backend from scratch (~200 s, paid only
    on the failure path)."""
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--json"],
        capture_output=True, text=True, timeout=timeout_s,
    )
    for line in out.stdout.splitlines():
        try:
            return float(json.loads(line)["tflops"])
        except (ValueError, KeyError):
            continue
    raise RuntimeError(f"subprocess probe unparseable (rc={out.returncode})")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-tflops", type=float, default=HEALTHY_FLOOR_TFLOPS)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--wait", action="store_true",
                    help="re-probe until healthy or budget exhausted")
    ap.add_argument("--budget-s", type=float, default=14400.0)
    ap.add_argument("--interval-s", type=float, default=600.0)
    args = ap.parse_args()

    t_start = time.monotonic()
    backend_poisoned = False  # an in-process probe raised at least once
    while True:
        # A transient exception (tunnel RPC reset while the chip recovers)
        # must count as a DEGRADED probe, not abort a multi-hour --wait
        # gate; and once the resident backend has raised, later probes run
        # in fresh subprocesses — the cached backend may be dead for good.
        try:
            if backend_poisoned:
                tf = _probe_subprocess()
            else:
                tf = probe_tflops()
        except Exception as e:  # noqa: BLE001 — probe failure != gate abort
            backend_poisoned = True
            print(f"chip_health: probe failed ({type(e).__name__}: "
                  f"{str(e)[:200]}) — treating as DEGRADED", flush=True)
            tf = 0.0
        healthy = tf >= args.min_tflops
        rec = {"tflops": round(tf, 2), "min_tflops": args.min_tflops,
               "healthy": healthy,
               "elapsed_s": round(time.monotonic() - t_start, 1)}
        print(json.dumps(rec) if args.json
              else f"chip_health: {tf:.1f} TFLOP/s "
                   f"({'HEALTHY' if healthy else 'DEGRADED'}, "
                   f"floor {args.min_tflops:.0f})",
              flush=True)
        if healthy:
            return 0
        if not args.wait:
            return 1
        if time.monotonic() - t_start + args.interval_s > args.budget_s:
            print("chip_health: budget exhausted, still degraded",
                  flush=True)
            return 1
        time.sleep(args.interval_s)


if __name__ == "__main__":
    sys.exit(main())
