#!/usr/bin/env python3
"""Per-query bench regression diff: compare a fresh bench_last.json against
a previous round's BENCH_r{N}.json (or another bench_last.json), flag
queries slower than a threshold ratio, and annotate with the per-iteration
spread from bench_iters_last.json so one-off JIT/GC noise (min stable, max
inflated) is distinguishable from a real plan regression (every iteration
slow) without re-running anything.

Usage:
    python3 tools/diff_bench.py BENCH_r07.json bench_last.json [ratio=1.5]
"""
import json
import os
import sys


def load_queries(path):
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]  # driver BENCH_r{N}.json wrapper
    qs = doc.get("queries", {})
    # driver rounds may record short ids ("q26b"); keep them as-is and
    # match on the short id of the other side
    return {k.split("_")[0]: (k, float(v)) for k, v in qs.items()}, doc


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old, old_doc = load_queries(sys.argv[1])
    new, new_doc = load_queries(sys.argv[2])
    iters = {}
    ipath = os.path.join(os.path.dirname(sys.argv[2]), "bench_iters_last.json")
    if os.path.exists(ipath):
        with open(ipath) as fh:
            iters = {k.split("_")[0]: v
                     for k, v in json.load(fh).get("queries", {}).items()}

    tot_old = sum(v for _, v in old.values())
    tot_new = sum(v for _, v in new.values())
    print(f"total: {tot_old:.1f}s ({len(old)} queries) -> "
          f"{tot_new:.1f}s ({len(new)} queries)")
    added = sorted(set(new) - set(old))
    gone = sorted(set(old) - set(new))
    if added:
        print("added:  " + ", ".join(added))
    if gone:
        print("removed:" + ", ".join(gone))

    flagged = []
    for sid in sorted(set(old) & set(new)):
        (name, t_old), (_, t_new) = old[sid], new[sid]
        if t_old > 0 and t_new / t_old >= ratio and t_new - t_old > 0.2:
            it = iters.get(sid, {})
            spread = it.get("spread")
            times = it.get("times", [])
            noise = (" [noisy: spread %.2fs of min %.2fs]" % (spread, t_new)
                     if spread is not None and t_new > 0
                     and spread > 0.5 * t_new else "")
            flagged.append(
                f"  {name:30s} {t_old:6.2f}s -> {t_new:6.2f}s "
                f"({t_new / t_old:4.1f}x) times={times}{noise}")
    if flagged:
        print(f"regressions >= {ratio}x (and >0.2s absolute):")
        print("\n".join(flagged))
        sys.exit(1)
    print(f"no per-query regression >= {ratio}x")


if __name__ == "__main__":
    main()
