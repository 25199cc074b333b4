"""Summarize a jax.profiler trace: top ops by total device time.

Usage:
  python tools/trace_summary.py /tmp/prof_dir [--top 30] [--steps N]
  python tools/trace_summary.py /tmp/prof_dir --steps N --roofline

Reads the perfetto trace.json(.gz) written under
<dir>/plugins/profile/*/  (bench.py --profile DIR / cli/train.py
--profile_dir write these), aggregates device-lane slice durations by
op name, and prints a table of the top offenders plus the total device
busy time. With --steps N, also prints per-step ms (total / N).

--roofline additionally aggregates each op's `bytes_accessed` and
`model_flops` (XLA's per-op compiler estimates, present in TPU traces)
and prints achieved HBM GB/s and GFLOP/s against the chip's peaks, the
binding roof (bw/mxu) and the percent-of-roof — i.e. whether each hot
op is already at its hardware ceiling or is an optimization candidate.
Peaks default to TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM); override
with --peak_tflops/--peak_gbps for other chips.

This is the round-2..5 profiling loop's analysis step as a checked-in
tool (previously ad hoc): find the largest non-conv cost, check it
against its roof, design a kernel or layout fix, re-measure.
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
  ap.add_argument("--roofline", action="store_true",
                  help="add bytes/flops roofline columns per op")
  ap.add_argument("--peak_tflops", type=float, default=197.0,
                  help="chip bf16 peak TFLOP/s (default TPU v5e)")
  ap.add_argument("--peak_gbps", type=float, default=819.0,
                  help="chip HBM bandwidth GB/s (default TPU v5e)")
  args = ap.parse_args()

  trace = find_trace(args.path)
  events = load_events(trace)
  dev = device_pids(events)

  total_by_name = collections.Counter()
  count_by_name = collections.Counter()
  bytes_by_name = collections.Counter()
  flops_by_name = collections.Counter()
  longname_by_name = {}
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
    a = e.get("args", {})
    bytes_by_name[name] += int(a.get("bytes_accessed", 0))
    flops_by_name[name] += int(a.get("model_flops", 0))
    if name not in longname_by_name and "long_name" in a:
      longname_by_name[name] = a["long_name"]

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
  if args.roofline:
    tot_b = sum(bytes_by_name.values())
    tot_f = sum(flops_by_name.values())
    print(f"whole-trace aggregate: {tot_b/1e9:.2f} GB accessed "
          f"({tot_b/1e9/denom*1e3:.1f} MB/step), "
          f"{tot_f/1e12:.2f} TFLOP ({tot_f/1e12/denom*1e3:.1f} GFLOP/step); "
          f"mean BW {tot_b/busy_us/1e3:.0f} GB/s "
          f"({tot_b/busy_us/1e3/args.peak_gbps*100:.0f}% of "
          f"{args.peak_gbps:.0f} GB/s peak over busy time)",
          file=sys.stderr)
  for name, us in total_by_name.most_common(args.top):
    per = f"  {us/1e3/denom:8.3f} ms/step" if args.steps else ""
    line = (f"{name:<{w}}  {us/1e3:10.2f} ms  "
            f"x{count_by_name[name]:<6}{per}")
    if args.roofline:
      secs = us / 1e6
      gbps = bytes_by_name[name] / 1e9 / secs if secs else 0.0
      gfps = flops_by_name[name] / 1e9 / secs if secs else 0.0
      pct_bw = gbps / args.peak_gbps * 100.0
      pct_fl = gfps / (args.peak_tflops * 1e3) * 100.0
      roof = "bw " if pct_bw >= pct_fl else "mxu"
      line += (f"  {gbps:7.1f} GB/s {gfps/1e3:7.2f} TF/s  "
               f"{roof} {max(pct_bw, pct_fl):5.1f}%ofroof")
    print(line)
  if args.roofline:
    print("\n# attribution (first long_name per op):")
    for name, _ in total_by_name.most_common(args.top):
      ln = longname_by_name.get(name, "")
      if len(ln) > 300:
        ln = ln[:300] + "…"
      print(f"{name}: {ln}")


if __name__ == "__main__":
  main()
