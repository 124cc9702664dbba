#!/usr/bin/env python3
"""Turn a multi-scale graft.Bench sweep into the SCALE.md scaling table.

    python3 tools/scale_curve.py bench_sf001.json bench_sf01.json bench_sf1.json

Inputs are the one-line JSON artifacts Bench prints, assumed to be 10x
apart in data size (sf0.01 -> sf0.1 -> synthetic sf1 via graft.ScaleData).
Emits per-family totals with decade-over-decade ratios, plus the per-query
list of super-linear suspects (last-decade ratio > FLAG). Small queries
(< FLOOR_S at the largest scale) are never flagged — constant overheads
(session, planning, file listing) dominate them, not data volume.
"""
import json
import sys
from collections import defaultdict

FLAG = 15.0   # 10x data; > 15x time = super-linear suspect (n log n ~ 11-12)
FLOOR_S = 2.0


def family(q):
    if q.startswith("d"):
        return "d (dedup/text/corpus)"
    if q.startswith("e"):
        return "e (embeddings/ANN)"
    if q.startswith("s"):
        return "s (streaming twins)"
    if q.startswith("m"):
        return "m (multimodal)"
    if q.startswith("c"):
        return "c (curation funnel)"
    return "q (relational/pipeline)"


def main():
    paths = sys.argv[1:]
    if len(paths) < 2:
        sys.exit(__doc__)
    runs = []
    for p in paths:
        with open(p) as fh:
            runs.append(json.load(fh))
    labels = [r.get("sf", p).rstrip("/").split("/")[-1]
              for r, p in zip(runs, paths)]
    common = set(runs[0]["queries"])
    for r in runs[1:]:
        common &= set(r["queries"])
    fam_tot = [defaultdict(float) for _ in runs]
    for q in common:
        for i, r in enumerate(runs):
            fam_tot[i][family(q)] += r["queries"][q]

    print(f"| family | " + " | ".join(labels) +
          " | " + " | ".join(f"x{labels[i + 1]}/{labels[i]}"
                             for i in range(len(runs) - 1)) + " |")
    print("|---" * (1 + len(runs) + len(runs) - 1) + "|")
    for fam in sorted(fam_tot[0]):
        tots = [ft[fam] for ft in fam_tot]
        ratios = [tots[i + 1] / tots[i] if tots[i] > 0 else float("nan")
                  for i in range(len(tots) - 1)]
        print(f"| {fam} | " + " | ".join(f"{t:.1f}s" for t in tots) +
              " | " + " | ".join(f"{r:.1f}x" for r in ratios) + " |")
    grand = [sum(ft.values()) for ft in fam_tot]
    print(f"| **total ({len(common)} queries)** | " +
          " | ".join(f"{t:.1f}s" for t in grand) + " | " +
          " | ".join(f"{grand[i + 1] / grand[i]:.1f}x"
                     for i in range(len(grand) - 1)) + " |")

    last, prev = runs[-1]["queries"], runs[-2]["queries"]
    sus = sorted(((q, prev[q], last[q], last[q] / max(prev[q], 1e-9))
                  for q in common
                  if last[q] >= FLOOR_S and last[q] / max(prev[q], 1e-9) > FLAG),
                 key=lambda t: -t[3])
    print()
    if sus:
        print(f"Super-linear suspects (last decade ratio > {FLAG}x, "
              f">= {FLOOR_S}s at {labels[-1]}):")
        for q, a, b, r in sus:
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.1f}x)")
    else:
        print(f"No super-linear suspects (every query >= {FLOOR_S}s at "
              f"{labels[-1]} scaled <= {FLAG}x over the last decade).")
    print()
    top = sorted(common, key=lambda q: -last[q])[:12]
    print(f"Slowest at {labels[-1]}:")
    for q in top:
        print(f"  {q}: {last[q]:.2f}s (prev {prev[q]:.2f}s, "
              f"{last[q] / max(prev[q], 1e-9):.1f}x)")


if __name__ == "__main__":
    main()
