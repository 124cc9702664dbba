#!/usr/bin/env python3
"""Isolated re-measure protocol as a TOOL (r15 verdict ask #7): the manual
counter-measurement rounds 5/6/15 ran by hand, automated end to end.

Diffs two bench JSONs (driver BENCH_r{N}.json wrappers or raw
bench_last.json lines both work), picks the top-N movers (new/old ratio
above --ratio with the new min above --min-sec), re-runs exactly those
queries in ONE isolated Bench invocation (SPARK_GRAFT_BENCH_ONLY —
best-of-K per query with clearCache+GC between runs, away from the full
suite's cache/GC churn), and emits a verdict artifact: per mover, the old
min, the suite min, the ISOLATED min, the machine-noise probes, and
  "noise"       isolated min collapses back to <= old * ratio_ok * env
  "regression"  isolated min stays above it (every run slow = real)
where env = max(1, isolated_probe_start / --healthy-probe): the fixed
CPU calibration probe is the environment meter this repo built for
exactly this call — when the VM is in one of its measured degraded
periods (probes 1.5-2x the healthy band on IDENTICAL code) a uniform
1.4x on untouched plans is the machine, not a plan regression, and the
verdict must not cry wolf. env rides the artifact per run so a reader
can audit the correction.

Usage:
    python3 tools/remeasure.py OLD.json NEW.json \
        [--top 8] [--ratio 1.5] [--ratio-ok 1.3] [--min-sec 0.5] \
        [--iters 3] [--sf-dir /root/testdata/sf0.1] \
        [--out remeasure_verdict.json] [--dry-run]
"""
import argparse
import json
import os
import subprocess
import sys


def load(path):
    with open(path) as fh:
        doc = json.load(fh)
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]  # driver BENCH_r{N}.json wrapper
    qs = {k: float(v) for k, v in doc.get("queries", {}).items()}
    # short-id key (q26b, d35 — verified unique in Bench) for matching
    # across files that archive different name tiers
    return {k.split("_")[0]: (k, v) for k, v in qs.items()}, doc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=8)
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--ratio-ok", type=float, default=1.3)
    ap.add_argument("--healthy-probe", type=float, default=0.10,
                    help="calibration-probe seconds on a healthy machine "
                         "(r15/r16 measured 0.07-0.11)")
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="remeasure_verdict.json")
    ap.add_argument("--dry-run", action="store_true",
                    help="report the mover list without re-running")
    ap.add_argument("--queries", default=None,
                    help="comma-separated short-ids to re-measure, "
                         "overriding automatic mover selection")
    args = ap.parse_args()

    old, old_doc = load(args.old)
    new, new_doc = load(args.new)
    movers = []
    if args.queries:
        for sid in args.queries.split(","):
            sid = sid.strip()
            if sid not in old or sid not in new:
                print(f"  {sid}: not in both files — skipped")
                continue
            oname, ov = old[sid]
            nname, nv = new[sid]
            if ov <= 0:
                # same guard the automatic path has: a 0.0 old time has no
                # meaningful ratio and would crash the division
                print(f"  {sid}: old time is 0 — skipped")
                continue
            movers.append({"query": nname, "short": sid,
                           "old_sec": ov, "suite_sec": nv,
                           "suite_ratio": round(nv / ov, 3)})
    else:
        for sid in sorted(set(old) & set(new)):
            oname, ov = old[sid]
            nname, nv = new[sid]
            if nv >= args.min_sec and ov > 0 and nv / ov >= args.ratio:
                movers.append({"query": nname, "short": sid,
                               "old_sec": ov, "suite_sec": nv,
                               "suite_ratio": round(nv / ov, 3)})
        movers.sort(key=lambda m: -(m["suite_sec"] - m["old_sec"]))
        movers = movers[:args.top]
    if not movers:
        print("no movers above threshold — nothing to re-measure")
        out = {"old": args.old, "new": args.new, "movers": [],
               "old_probe": old_doc.get("probe"),
               "new_probe": new_doc.get("probe")}
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        return
    print(f"{len(movers)} movers:")
    for m in movers:
        print(f"  {m['query']}: {m['old_sec']:.2f}s -> "
              f"{m['suite_sec']:.2f}s ({m['suite_ratio']}x)")
    if args.dry_run:
        return

    # one isolated Bench run over exactly the movers: best-of-iters per
    # query, clearCache+GC between runs, probes at both ends
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = ",".join(m["query"] for m in movers)
    env["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    env["SPARK_GRAFT_BENCH_ITERS"] = str(args.iters)
    print("re-running isolated (one sbt invocation)...", flush=True)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"], env=env,
                   check=True, stdout=subprocess.DEVNULL)
    with open("/tmp/graft_bench.json") as fh:
        iso = json.load(fh)
    with open("/tmp/graft_bench_iters.json") as fh:
        iso_iters = json.load(fh)

    # Explicit None check: a missing probe must NOT read as "healthy"
    # (0.0-or-absent would previously fall back to healthy_probe and
    # silently scale every verdict). And cap the environment correction
    # at 2.0x: beyond that the machine is too degraded to adjudicate at
    # all — stamp "inconclusive" rather than absorbing any slowdown.
    # BOTH probes must sit in a trusted band: a window that degrades
    # mid-run (r17 measured 0.107 -> 0.22 across one 6-query isolated
    # pass) inflates the later iterations and the best-of-K with them —
    # the r17 evidence is isolated minima EXCEEDING the same query's
    # same-day full-suite time, which a real plan regression cannot do
    # (suite contention only adds time).
    probe = iso_iters.get("probe_start_sec")
    probe_end = iso_iters.get("probe_end_sec")
    ENV_CAP = 2.0
    def in_band(p):
        return p is not None and p > 0 and p / args.healthy_probe <= ENV_CAP
    if not in_band(probe):
        env = None  # untrusted window — no calibration available
    else:
        env = min(max(1.0, probe / args.healthy_probe), ENV_CAP)
    # trust bands, stated once: start probe within 2.0x of healthy
    # (in_band), end probe within the TIGHTER 1.5x — a window that is
    # merely acceptable at the start but degrading by the end inflates
    # the later iterations. in_band already rejects None/<=0.
    probe_trusted = (in_band(probe) and in_band(probe_end)
                     and probe_end <= args.healthy_probe * 1.5)
    for m in movers:
        iv = iso.get("queries", {}).get(m["query"])
        m["isolated_sec"] = iv
        m["isolated_times"] = (iso_iters.get("queries", {})
                               .get(m["query"], {}).get("times"))
        if iv is None:
            m["verdict"] = "failed"
        elif not probe_trusted:
            m["verdict"] = "inconclusive"
        elif iv <= m["old_sec"] * args.ratio_ok * env:
            m["verdict"] = "noise"
        else:
            m["verdict"] = "regression"
        envs = f"x{env:.2f}" if env is not None else "UNTRUSTED"
        print(f"  {m['query']}: isolated {iv}s (env {envs}) "
              f"-> {m['verdict']}")

    out = {"old": args.old, "new": args.new,
           "ratio": args.ratio, "ratio_ok": args.ratio_ok,
           "healthy_probe": args.healthy_probe,
           "env_factor": round(env, 3) if env is not None else None,
           "probe_trusted": probe_trusted,
           "iters": args.iters, "sf_dir": args.sf_dir,
           "old_probe": old_doc.get("probe"),
           "new_probe": new_doc.get("probe"),
           "isolated_probe_start": iso_iters.get("probe_start_sec"),
           "isolated_probe_end": iso_iters.get("probe_end_sec"),
           "movers": movers,
           "n_regressions": sum(1 for m in movers
                                if m["verdict"] == "regression")}
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {args.out}: {out['n_regressions']} regression(s), "
          f"{sum(1 for m in movers if m['verdict'] == 'noise')} noise")


if __name__ == "__main__":
    sys.exit(main())
