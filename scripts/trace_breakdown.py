"""Aggregate a jax.profiler Chrome trace into a per-op-class time breakdown.

Usage: python scripts/trace_breakdown.py /tmp/prof_dir [--top 25]

Reads plugins/profile/*/*.trace.json.gz, sums device-event durations
(the TPU device rows), groups ops by fusion/custom-call name, and prints
a table.  Used for the PERF_NOTES breakdowns.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(profile_dir):
    paths = sorted(glob.glob(
        os.path.join(profile_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    if not paths:
        sys.exit(f"no trace under {profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def classify(name):
    n = name.lower()
    # fused Pallas loss kernels surface as jvp__/transpose_jvp___ custom calls
    if re.match(r"(transpose_)?jvp_", n):
        return "pallas:fused-loss"
    if "custom-call" in n or "tpu_custom_call" in n or re.search(r"self_attn|flash", n):
        return "pallas:attention"
    if n.startswith("fusion") or ".fusion" in n or "fused" in n or "_fusion" in n:
        return "xla:fusion"
    if "copy" in n or "bitcast" in n or "transpose" in n or "pad" in n:
        return "copy/layout"
    if "dot" in n or "conv" in n:
        return "dot/conv"
    if "all-reduce" in n or "all-gather" in n or "reduce-scatter" in n or "collective" in n:
        return "collective"
    if "dynamic" in n or "scatter" in n or "gather" in n:
        return "gather/scatter"
    if "infeed" in n or "outfeed" in n or "send" in n or "recv" in n:
        return "host-io"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=None,
                    help="divide totals by N steps for ms/step")
    ap.add_argument("--klass", type=str, default=None,
                    help="restrict the top-ops table to one class "
                         "(e.g. 'copy/layout')")
    args = ap.parse_args()

    events = load_events(args.profile_dir)
    # device rows: pick pids whose process_name metadata mentions TPU/device,
    # else fall back to every complete ('X') event with a duration.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "device" in n.lower() or "/device" in n
    }

    per_name = collections.Counter()
    per_class = collections.Counter()
    total = 0.0
    envelope = re.compile(r"^(jit_|\d+$)")  # module/step rows, not leaf ops
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if envelope.match(name):
            continue
        dur = e["dur"] / 1e3  # us -> ms
        if args.klass is None or classify(name) == args.klass:
            per_name[name] += dur
        per_class[classify(name)] += dur
        total += dur

    div = args.steps or 1
    print(f"device pids: {sorted(device_pids) or 'ALL'}   "
          f"total device time: {total/div:.1f} ms"
          + (f" / step ({args.steps} steps)" if args.steps else ""))
    print("\n-- by class --")
    for k, v in per_class.most_common():
        print(f"  {k:36s} {v/div:9.2f} ms  {100*v/total:5.1f}%")
    print(f"\n-- top {args.top} ops"
          + (f" in class {args.klass}" if args.klass else "") + " --")
    for k, v in per_name.most_common(args.top):
        print(f"  {v/div:9.2f} ms  {100*v/total:5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main()
