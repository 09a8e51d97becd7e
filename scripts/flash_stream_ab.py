"""Step-level A/B of the flash fwd kernel family (KDSS_FLASH_STREAM).

VERDICT r4 #1: the `bound` streaming kernel became the default on
kernel-level microbenches alone, and the same round's BENCH recorded
baseline_depth at 3.36 samples/s vs 3.88 in r3 — untriaged.  This driver
records the promised step-level evidence: every (mode, stream) arm runs
in ONE process and ONE session window, so

* arms share the session's tunnel weather (a bad window shifts all arms
  together — the r4 ambiguity was exactly a cross-window comparison),
* the remote compile service shares subprograms across the close program
  variants (513 s -> 76 s measured, docs/PERF_NOTES.md), and
* the loss traces land in the same JSON for the numerical-parity check
  (stream kernels are exact within their envelope: traces must match
  to the printed 5 decimals).

KDSS_FLASH_STREAM is read at TRACE time, so flipping os.environ between
arms retraces cleanly — each arm builds a fresh step closure inside
bench_train (new function object -> new jit cache entry).

Usage (background, durable incremental output):
    python scripts/flash_stream_ab.py --out docs/AB_STREAM_r05.json \
        [--arms kd:bound kd:off ...] [--steps 6]

Results append to --out after EVERY arm (tunnel outages lose at most the
in-flight arm; rerun skips completed arms by key).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


DEFAULT_ARMS = [
    # kd first: largest program, shares its subprograms with everything
    # compiled after it in the session
    "kd:bound",
    "kd:off",
    "baseline_depth:bound",
    "baseline_depth:off",
    "generation:bound",
    "generation:off",
]


def run_arm(mode: str, stream: str, steps: int, extra=()) -> dict:
    """``extra``: additional bench.py argv tokens (arm syntax
    ``mode:stream:tok1 tok2 ...`` — e.g. ``kd:bound:--accum 8``).
    Tokens of the form ``env:KEY=VAL`` set trace-time env flags for the
    arm instead (e.g. ``env:KDSS_SBOUND_FWD_POISON=lse``)."""
    argv = ["--mode", mode, "--flash_stream", stream, "--steps", str(steps)]
    for tok in extra:
        if tok.startswith("env:"):
            k, _, v = tok[4:].partition("=")
            os.environ[k] = v
        else:
            argv.append(tok)
    args = bench.build_parser().parse_args(argv)
    # env flags are trace-time reads: set for THIS arm before any tracing
    os.environ["KDSS_FLASH_STREAM"] = "0" if stream == "off" else stream
    t0 = time.time()
    if mode == "generation":
        res = bench.bench_generation(args)
    elif mode == "eval_loop":
        res = bench.bench_eval_loop(args)
    else:
        res = bench.bench_train(args, mode)
    res["wall_s"] = round(time.time() - t0, 1)
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/AB_STREAM_r05.json")
    ap.add_argument("--arms", nargs="*", default=DEFAULT_ARMS,
                    help="mode:stream pairs, run in order")
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    # one-time process env (block budgets, persistent cache) — taken from
    # a non-cpu bench namespace with flash_stream left 'default' so it
    # does not pre-pin KDSS_FLASH_STREAM
    bench.setup_env(bench.build_parser().parse_args(["--mode", "kd"]))

    done: dict = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = json.load(f)

    for arm in args.arms:
        if arm in done:
            print(f"[ab] {arm}: already recorded, skipping", file=sys.stderr)
            continue
        parts = arm.split(":", 2)
        mode, stream = parts[0], parts[1]
        extra = parts[2].split() if len(parts) > 2 else ()
        print(f"[ab] === {arm} ===", file=sys.stderr)
        env_snap = dict(os.environ)  # env: tokens must not leak across arms
        try:
            res = run_arm(mode, stream, args.steps, extra)
        except Exception as e:  # record the failure, keep going
            res = {"error": f"{type(e).__name__}: {e}"}
        finally:
            os.environ.clear()
            os.environ.update(env_snap)
        done[arm] = res
        with open(args.out, "w") as f:
            json.dump(done, f, indent=1)
        print(f"[ab] {arm}: {json.dumps(res)}", file=sys.stderr)

    print(json.dumps(done, indent=1))


if __name__ == "__main__":
    main()
