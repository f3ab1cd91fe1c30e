#!/usr/bin/env python
"""Hardware parallel-bandwidth envelope probe.

Measures how a pure numpy memory-streaming workload (shaped like the
codec kernels: copies, gathers, prefix sums) scales with process count on
THIS machine — no Spark, no Python-level coordination. The ratio
throughput(4N)/(4*throughput(N)) is the ceiling any memory-bound job can
reach between those parallelism levels; compare BENCH_SCALING.json's
scaling_efficiency against it (software ≥ envelope ⇒ the engine scales as
well as the hardware allows; the 10^12-row target runs on clusters where
each executor brings its own memory buses and disks).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np


def _stream(_):
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, 25_000_000, dtype=np.uint8)
    idx = rng.integers(0, len(a), 5_000_000)
    # warmup pass (first-touch page faults excluded from timing)
    _ = a.copy(), a[idx], np.cumsum(a[:10_000_000].astype(np.int64))
    t0 = time.perf_counter()
    for _i in range(3):
        _b = a.copy()
        _c = np.cumsum(a[:10_000_000].astype(np.int64))
        _d = a[idx]
    return time.perf_counter() - t0


def measure(levels=(1, 2, 4, 8, 16, 32), repeats: int = 3) -> dict:
    out = {}
    for n in levels:
        best = None
        for _ in range(repeats):
            with mp.Pool(n) as p:
                t0 = time.perf_counter()
                p.map(_stream, range(n))
                wall = time.perf_counter() - t0
            best = wall if best is None else min(best, wall)
        out[n] = {"wall_s": round(best, 3), "throughput": round(n / best, 3)}
    return out


def main() -> None:
    levels = tuple(int(x) for x in os.environ.get("ENVELOPE_LEVELS", "1,2,4,8").split(","))
    res = measure(levels)
    envelopes = {}
    for a in levels:
        if 4 * a in res:
            envelopes[f"{a}->{4*a}"] = round(res[4 * a]["throughput"] / (4 * res[a]["throughput"]), 4)
    out = {"levels": res, "envelope_efficiency": envelopes}
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_ENVELOPE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
