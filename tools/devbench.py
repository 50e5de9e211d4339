"""Trustworthy device timing on tunneled TPUs.

Wall-clock timing through the axon tunnel is unreliable at sub-ms scales
(async dispatch can report impossibly fast times).  ``device_time`` runs a
callable under the JAX profiler and sums *device-side* op durations from the
xplane trace — the only signal that matches end-to-end frame timings.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import shutil
import tempfile


def _load_trace(tmpdir):
    files = glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                      recursive=True)
    with gzip.open(files[0]) as f:
        return json.load(f)


def device_time(fn, *args, iters: int = 3, by_source: bool = False):
    """Run ``fn(*args)`` ``iters`` times under the profiler; return total
    device ms per iteration (and per-source-line breakdown if asked)."""
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    tmp = tempfile.mkdtemp(prefix="devbench")
    try:
        jax.profiler.start_trace(tmp)
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        jax.profiler.stop_trace()
        data = _load_trace(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    pids = {e["pid"]: e["args"]["name"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    total = 0
    by_src = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X":
            continue
        if "TPU" not in pids.get(e.get("pid"), ""):
            continue
        if tids.get((e["pid"], e["tid"])) != "XLA Ops":
            continue
        total += e.get("dur", 0)
        if by_source:
            by_src[e.get("args", {}).get("source", "?")] += e.get("dur", 0)
    ms = total / 1000.0 / iters
    if by_source:
        return ms, {k: v / 1000.0 / iters for k, v in by_src.most_common()}
    return ms
