"""Summarize a jax.profiler trace: top ops by total device time.

Usage:
  python tools/trace_summary.py /tmp/prof_dir [--top 30] [--steps N]

Reads the perfetto trace.json(.gz) written under
<dir>/plugins/profile/*/  (bench.py --profile DIR / cli/train.py
--profile_dir write these), aggregates device-lane slice durations by
op name, and prints a table of the top offenders plus the total device
busy time. With --steps N, also prints per-step ms (total / N).

This is the round-2/3/4 profiling loop's analysis step as a checked-in
tool (previously ad hoc): find the largest non-conv cost, design a
kernel or layout fix, re-measure.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(path):
  if os.path.isfile(path):
    return path
  pats = [
      os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz"),
      os.path.join(path, "plugins", "profile", "*", "trace.json.gz"),
      os.path.join(path, "**", "*.trace.json.gz"),
      os.path.join(path, "**", "trace.json"),
  ]
  for p in pats:
    hits = sorted(glob.glob(p, recursive=True))
    if hits:
      return hits[-1]
  raise FileNotFoundError(f"no trace.json(.gz) under {path}")


def load_events(trace_path):
  op = gzip.open if trace_path.endswith(".gz") else open
  with op(trace_path, "rt") as f:
    data = json.load(f)
  return data.get("traceEvents", data)


def device_pids(events):
  """Process ids whose name looks like a TPU/accelerator device lane."""
  names = {}
  for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
      names[e["pid"]] = e.get("args", {}).get("name", "")
  dev = {pid for pid, n in names.items()
         if any(k in n for k in ("TPU", "/device:", "Device", "XLA Op"))
         and "CPU" not in n and "Host" not in n.title()}
  return dev or set(names)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("path")
  ap.add_argument("--top", type=int, default=30)
  ap.add_argument("--steps", type=int, default=None,
                  help="divide totals by N steps for per-step ms")
  args = ap.parse_args()

  trace = find_trace(args.path)
  events = load_events(trace)
  dev = device_pids(events)

  total_by_name = collections.Counter()
  count_by_name = collections.Counter()
  busy_us = 0.0
  envelope_us = 0.0
  for e in events:
    if e.get("ph") != "X" or e.get("pid") not in dev:
      continue
    dur = float(e.get("dur", 0.0))
    name = e.get("name", "?")
    # Envelope slices (the whole-module "jit_step(...)" span and the
    # bare-numbered per-step spans) CONTAIN the op slices — counting
    # them would double every per-op number and the busy total.
    if name.startswith("jit_") or name.isdigit():
      envelope_us += dur
      continue
    total_by_name[name] += dur
    count_by_name[name] += 1
    busy_us += dur

  denom = args.steps or 1
  print(f"trace: {trace}", file=sys.stderr)
  print(f"device slices: {sum(count_by_name.values())}  "
        f"op busy {busy_us/1e3:.1f} ms"
        + (f"  ({busy_us/1e3/denom:.2f} ms/step)" if args.steps else "")
        + (f"  [envelopes {envelope_us/1e3:.1f} ms excluded]"
           if envelope_us else ""),
        file=sys.stderr)
  w = max((len(n) for n, _ in total_by_name.most_common(args.top)),
          default=10)
  for name, us in total_by_name.most_common(args.top):
    per = f"  {us/1e3/denom:8.3f} ms/step" if args.steps else ""
    print(f"{name:<{w}}  {us/1e3:10.2f} ms  x{count_by_name[name]:<6}{per}")


if __name__ == "__main__":
  main()
