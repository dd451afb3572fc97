"""Benchmark: descriptor-matching throughput, TPU vs the native CPU baseline.

Workload: one "pair" = exact top-2 matching of two 4096 x 128 uint8
SIFT-like descriptor sets (real sur-ogre descriptors resampled with
noise, so CPU pruning behaves as on real data) — the hot step of the
reference's ex01 pipeline.  The TPU side runs the framework's fused
Pallas matcher (``ops/l2nn_pallas.py`` — exact int8-MXU squared-L2,
Lowe's original SIFT metric; the reference's L1 was an SSE-specific
compromise).  Distances are cross-checked against a numpy oracle
before any timing counts.

Measurement methodology (important on this image): the TPU is reached
through a high-latency tunnel whose ``block_until_ready`` returns
before execution finishes, and a host value pull costs ~0.5 s
regardless of compute.  Naive host-side rep loops therefore measure
dispatch artifacts, not kernels (round 1 recorded such an artifact).
Here the rep loop runs ON DEVICE (``lax.scan`` whose carry consumes
every output element), the result is pulled by value, and the
throughput is the SLOPE between two rep counts — which cancels the
constant tunnel latency exactly.

Robustness (the tunnel's relay process can die under load, round 2
recorded a 1200 s hang):

1. the CPU baseline is measured FIRST and is always reported;
2. relay liveness is probed with a plain TCP connect before any JAX
   import — a dead relay fails in milliseconds, not watchdog-minutes;
3. the TPU measurement runs in a SUBPROCESS with its own watchdog and
   is retried with backoff (a wedged attempt cannot poison the next);
4. the single stdout JSON line always carries the partial results and
   a machine-readable ``error`` when the accelerator was unreachable.

Baseline: the reference's own SSE backend cannot be built here (its
submodules are not checked out), so the denominator is
``native/hostops.cpp`` — an independent, faithful re-implementation of
the reference's SSE2 ``_mm_sad_epu8`` + OpenMP + pruning kernel
(src/BruteForceNnL1K2.h) — measured on this machine's CPU with all
cores, matching the same pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

N_ROWS = 4096
DIM = 128
R_SMALL = 256
R_BIG = 2304

# The axon relay multiplexes these local ports over its external
# transport; 8093 carries remote_compile.  If nothing listens, the
# tunnel is definitively down and every TPU op would hang forever.
RELAY_PORTS = (8082, 8093)
ATTEMPT_TIMEOUTS = (420, 480, 480)  # per-attempt watchdogs, seconds
ATTEMPT_BACKOFFS = (30, 60)  # sleep between attempts


def make_descriptors():
    sift_path = os.path.join("/root/reference/data/sift-test/sur-ogre.sift")
    rng = np.random.default_rng(0)
    if os.path.exists(sift_path):
        base = np.loadtxt(sift_path)[:, 4:]  # (1168, 128) in [0, 255]
    else:
        base = rng.uniform(0, 255, size=(1168, DIM))
    idx = rng.integers(0, base.shape[0], size=N_ROWS)
    noise = rng.normal(0, 6.0, size=(N_ROWS, DIM))
    x = np.clip(base[idx] + noise, 0, 255).astype(np.uint8)
    idx = rng.integers(0, base.shape[0], size=N_ROWS)
    noise = rng.normal(0, 6.0, size=(N_ROWS, DIM))
    y = np.clip(base[idx] + noise, 0, 255).astype(np.uint8)
    return x, y


def relay_alive(timeout=2.0):
    """True iff the TPU tunnel's local relay accepts TCP connections."""
    for port in RELAY_PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout):
                pass
        except OSError:
            return False
    return True


def bench_cpu(x, y, reps=3):
    from spectavi_tpu.utils.hostops import l1k2_nn_cpu

    l1k2_nn_cpu(x[:256], y[:256])  # warm / ensure built
    t0 = time.perf_counter()
    for _ in range(reps):
        idx, dist = l1k2_nn_cpu(x, y)
    dt = (time.perf_counter() - t0) / reps
    return dt, idx, dist


def bench_tpu(x, y):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from spectavi_tpu.ops.l2nn import l2_topk2

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)

    # exactness gate first: one real call, full pull
    idx, dist = l2_topk2(xj, yj)
    tpu_idx = np.asarray(idx)
    tpu_dist = np.asarray(dist)

    @partial(jax.jit, static_argnames=("r",))
    def loop(x, y, r):
        # each iteration matches a row-rotated query set: identical
        # work per pair, different data, nothing for the compiler or
        # the tunnel to cache/elide; the carry consumes every output
        def body(carry, i):
            idx, dist = l2_topk2(x, jnp.roll(y, i, axis=0))
            return carry + idx.sum() + dist.sum(), None

        out, _ = jax.lax.scan(body, jnp.int64(0) if jax.config.jax_enable_x64 else jnp.int32(0), jnp.arange(r))
        return out

    walls = {}
    for r in (R_SMALL, R_BIG):
        _ = int(loop(xj, yj, r))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = int(loop(xj, yj, r))  # value pull forces completion
            best = min(best, time.perf_counter() - t0)
        walls[r] = best
    per_pair = (walls[R_BIG] - walls[R_SMALL]) / (R_BIG - R_SMALL)
    return per_pair, tpu_idx, tpu_dist


def tpu_child():
    """Subprocess entry: measure, oracle-check, print one JSON line."""
    x, y = make_descriptors()
    per_pair, tpu_idx, tpu_dist = bench_tpu(x, y)

    # exactness gate: matcher must agree with the numpy L2 oracle on a
    # query subset before its timing counts (full 4096^2 int64
    # broadcast would exhaust this 16 GB host)
    sub = 256
    d = ((x.astype(np.int64)[None] - y[:sub].astype(np.int64)[:, None]) ** 2).sum(-1)
    gd = np.sort(d, axis=1)[:, :2]
    ok = bool(np.array_equal(tpu_dist[:sub].astype(np.int64), gd))
    print(json.dumps({"ok": ok, "per_pair_s": per_pair}), flush=True)
    sys.exit(0 if ok else 4)


def run_tpu_attempts(record):
    """Try the TPU measurement up to len(ATTEMPT_TIMEOUTS) times in
    subprocesses.  Returns per-pair seconds or None; annotates
    ``record`` with attempt outcomes."""
    outcomes = []
    for i, budget in enumerate(ATTEMPT_TIMEOUTS):
        if i:
            time.sleep(ATTEMPT_BACKOFFS[min(i - 1, len(ATTEMPT_BACKOFFS) - 1)])
        if not relay_alive():
            outcomes.append("relay_down")
            record["attempts"] = outcomes
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tpu-child"],
                capture_output=True,
                text=True,
                timeout=budget,
            )
        except subprocess.TimeoutExpired:
            outcomes.append(f"watchdog_{budget}s")
            record["attempts"] = outcomes
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            child = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            tail = (proc.stderr or "").strip().splitlines()[-3:]
            outcomes.append("crash:" + " | ".join(tail)[-200:])
            record["attempts"] = outcomes
            continue
        if not child.get("ok"):
            outcomes.append("oracle_mismatch")
            record["attempts"] = outcomes
            # a wrong-answer kernel is not retryable
            record["error"] = "accelerator distances disagree with oracle"
            return None
        outcomes.append("ok")
        record["attempts"] = outcomes
        return float(child["per_pair_s"])
    return None


def main():
    if "--tpu-child" in sys.argv:
        tpu_child()
        return

    record = {
        "metric": "match_pairs_per_s_per_chip",
        "value": 0.0,
        "unit": "pairs/s",
        "vs_baseline": 0.0,
    }
    x, y = make_descriptors()
    cpu_dt, _, _ = bench_cpu(x, y)
    baseline = 1.0 / cpu_dt
    record["cpu_baseline_pairs_per_s"] = round(baseline, 3)

    if not relay_alive():
        record["attempts"] = ["relay_down"]
        record["error"] = (
            "TPU tunnel relay is not listening (its ports accept no TCP "
            "connections); CPU baseline measured and reported. Last "
            "verified on-chip number: 25.9k pairs/s (docs/ROUND2.md)."
        )
        print(json.dumps(record), flush=True)
        return

    per_pair = run_tpu_attempts(record)
    if per_pair is None:
        record.setdefault(
            "error",
            "TPU measurement failed after retries "
            f"({record.get('attempts')}); CPU baseline measured and "
            "reported. Last verified on-chip number: 25.9k pairs/s "
            "(docs/ROUND2.md).",
        )
        print(json.dumps(record), flush=True)
        return

    value = 1.0 / per_pair
    record["value"] = round(value, 3)
    record["vs_baseline"] = round(value / baseline, 3)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
