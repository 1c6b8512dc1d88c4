"""Profile the flagship LTX LoRA train step and print a per-op device-time table.

Runs the exact bench.py workload under jax.profiler, parses the captured
xplane proto (tensorflow's xplane_pb2), and aggregates device-plane op events
by fusion/op name so the hot spots are measurable rather than guessed.

Usage: python tools/profile_step.py [--steps N] [--out DIR]
Env:   BENCH_REMAT (as bench.py), PROFILE_GROUP=op|fusion (default fusion)
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, steps: int) -> None:
    import jax
    import numpy as np

    import bench

    # Reuse bench.py's setup by running its main with a profiler hook: simplest
    # is to inline the same step construction here via bench internals.
    os.environ.setdefault("BENCH_TIMED_STEPS", str(steps))
    # Profiled steps run a few % slow under the trace; don't let them
    # overwrite the tunnel-flap fallback cache with a degraded figure.
    os.environ["BENCH_NO_RECORD"] = "1"
    import json as _json
    import io
    import contextlib

    # Run bench.main() but wrap the timed loop with the profiler by tracing the
    # whole main (compile happens before the timed region; we trace everything
    # and filter by step markers being absent -- device ops dominate anyway).
    buf = io.StringIO()
    with jax.profiler.trace(trace_dir):
        with contextlib.redirect_stdout(buf):
            bench.main()
    print(buf.getvalue().strip())


CATEGORIES = [
    ("flash_fwd", re.compile(r"flash_attention_kernel|flash_attention_impl")),
    ("flash_bwd_dkv", re.compile(r"flash_attention_dkv")),
    ("flash_bwd_dq", re.compile(r"flash_attention_dq")),
    ("matmul", re.compile(r"^(loop_)?(fusion|dot|convert_fusion).*dot|^dot|dot_general|fusion.*gemm", re.I)),
    ("copy/dus", re.compile(r"dynamic-update-slice|dynamic_update_slice|^copy|copy-start|copy-done")),
]


def analyze(trace_dir: str, top: int = 40) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        totals: dict = collections.defaultdict(float)
        counts: dict = collections.defaultdict(int)
        line_totals: dict = collections.defaultdict(float)
        for line in plane.lines:
            lname = line.name
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                line_totals[lname] += dur
                # only aggregate op-level lines (XLA Ops / TensorFlow Ops)
                if "Ops" in lname or "ops" in lname or "XLA" in lname:
                    totals[name] += dur
                    counts[name] += 1
        print(f"\n=== plane: {plane.name} ===")
        for lname, t in sorted(line_totals.items(), key=lambda kv: -kv[1]):
            print(f"  line {lname!r}: {t:.1f} ms total")
        if not totals:
            # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    totals[name] += ev.duration_ps / 1e9
                    counts[name] += 1
        print(f"\n  top {top} ops by total device time:")
        ssum = sum(totals.values())
        for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"   {t:10.1f} ms  x{counts[name]:<5d} {name[:140]}")
        print(f"   {'':10s} total op time: {ssum:.1f} ms")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/ft_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--analyze-only", action="store_true")
    args = ap.parse_args()
    if not args.analyze_only:
        os.makedirs(args.out, exist_ok=True)
        capture(args.out, args.steps)
    analyze(args.out, args.top)


if __name__ == "__main__":
    main()
