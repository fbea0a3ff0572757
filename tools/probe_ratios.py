#!/usr/bin/env python3
"""Scale-probe ratio table from a bench artifact.

For every bench_scaleprobe_<family>_{base,scaled} pair in
bench_last.json (or the artifact passed as argv[1]), print the
scaled/base ratio on BOTH accountings:

  - wall ratio: scaled wall / base wall — the headline, but wall on
    1-8 s entries swings with machine contention (the r13 diskann
    probe read 1.9x in the builder run and 7.0x in the contended
    driver run on identical bytes).
  - busy-cpu ratio: (cpu - gc*gcThreads) scaled / base — the
    stall-invariant accounting the suite's own io_suspect taxonomy
    uses; contention inflates wall but not busy cpu.

Adjudication rule (BASELINE.md, round 14): a probe family is
sub-linear for the 10x row scale-up if EITHER ratio is < 10.
Both are printed so the committed BASELINE.md table can carry both.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_last.json"
gc_threads = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
stats = json.load(open(path))["entry_stats"]

families = sorted({
    k[len("bench_scaleprobe_"):].rsplit("_", 1)[0]
    for k in stats
    if k.startswith("bench_scaleprobe_") and
    k.rsplit("_", 1)[1] in ("base", "scaled")
})


def busy(e):
    return max(e["cpu"] - e["gc"] * gc_threads, 0.0)


print(f"{'family':<12} {'wall_base':>9} {'wall_scaled':>11} "
      f"{'wall_ratio':>10} {'busycpu_ratio':>13} sub-linear(<10)")
for fam in families:
    b = stats.get(f"bench_scaleprobe_{fam}_base")
    s = stats.get(f"bench_scaleprobe_{fam}_scaled")
    if not b or not s or b["wall"] <= 0 or s["wall"] <= 0:
        print(f"{fam:<12} MISSING/FAILED")
        continue
    wr = s["wall"] / b["wall"]
    bb = busy(b)
    cr = busy(s) / bb if bb > 1e-9 else float("nan")
    ok = wr < 10 or cr < 10
    print(f"{fam:<12} {b['wall']:>9.2f} {s['wall']:>11.2f} "
          f"{wr:>10.2f} {cr:>13.2f} {'yes' if ok else 'NO'}")
