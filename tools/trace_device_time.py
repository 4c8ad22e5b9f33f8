"""Extract real per-program device time from a jax.profiler trace.

The ground-truth check behind every throughput claim (docs/performance.md
"Measurement methodology"): `jax.block_until_ready` is not a completion
barrier through the tunneled test TPU, so wall-clock loops can measure
dispatch rather than execution. The device timeline in the profiler trace
cannot lie about execution.

Usage:
    python tools/trace_device_time.py /tmp/sf_bench_trace_grid_battle
prints total device-busy time per top-level program (jit_* entries) and the
implied per-iteration cost.
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
from os.path import join


def analyze(trace_dir: str) -> dict:
    files = sorted(glob.glob(join(trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    path = files[-1]
    data = json.load(gzip.open(path))
    events = data["traceEvents"]

    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items() if "TPU" in n or "device" in n.lower()}

    prog = defaultdict(float)
    cnt = defaultdict(int)
    tmin, tmax = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        tmin = min(tmin, e["ts"])
        tmax = max(tmax, e["ts"] + e.get("dur", 0))
        name = e["name"]
        if name.startswith("jit_"):
            # strip the executable fingerprint suffix
            key = name.split("(")[0]
            prog[key] += e.get("dur", 0)
            cnt[key] += 1
    return {
        "trace": path,
        "device_span_s": (tmax - tmin) / 1e6 if tmax else 0.0,
        "programs": {
            k: {"total_s": round(v / 1e6, 4), "count": cnt[k], "per_call_ms": round(v / cnt[k] / 1e3, 3)}
            for k, v in sorted(prog.items(), key=lambda kv: -kv[1])
        },
    }


if __name__ == "__main__":
    out = analyze(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_bench_trace_grid_battle")
    print(json.dumps(out, indent=2))
