#!/usr/bin/env python3
"""Self-maintaining isolated decade measurements: find registry queries that
SCALE.md's auto-appended table has not measured yet, bench ONLY those at
sf0.1 and the synthetic sf1 (isolated best-of-N via graft.Bench, stripping
suite contention), and append the rows.

    # once per round, after new registry rows land:
    sbt "runMain graft.ScaleData /root/testdata/sf0.1 /tmp/graft_sf1 10"
    python3 tools/scale_new_rows.py /root/testdata/sf0.1 /tmp/graft_sf1

Idempotent: already-measured names are skipped, so each round only pays for
its additions.
"""
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE_MD = os.path.join(REPO, "SCALE.md")
HEADING = "## Isolated decade measurements (auto-appended by tools/scale_new_rows.py)"
TABLE_HDR = ("| query | sf0.1 | sf1 | x10 ratio |\n"
             "|---|---|---|---|\n")


def sbt(args, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(["sbt", "-batch"] + args, cwd=REPO, env=e,
                          capture_output=True, text=True, check=True).stdout


def registry_names():
    out = sbt(["runMain graft.QueryList"])
    return [m.group(1) for m in re.finditer(r"QUERY (\S+)", out)]


def measured_names(text):
    # the full-sweep artifacts carry the per-query decade pairs for every
    # row that existed when the sweep ran; the appendix carries everything
    # added since — together they define "already measured". The sweep
    # stores SHORT ids (the bench stdout degrade tier), so both the full
    # name and its short id count as a hit.
    names = set()
    sweep = os.path.join(REPO, "bench_scale", "bench_sf1.json")
    if os.path.exists(sweep):
        with open(sweep) as fh:
            names |= set(json.load(fh)["queries"])
    if HEADING in text:
        section = text.split(HEADING, 1)[1]
        names |= set(re.findall(r"^\| (\w+) \|", section, re.M))
    return names


def is_measured(name, measured):
    return name in measured or name.split("_")[0] in measured


def bench(sf_dir, names):
    out = sbt(["runMain graft.Bench"], env={
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(names),
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")})
    line = next(l for l in out.splitlines() if '{"metric"' in l)
    return json.loads(line[line.index("{"):])["queries"]


def main():
    sf01, sf1 = sys.argv[1], sys.argv[2]
    text = open(SCALE_MD).read()
    mtime = os.path.getmtime(SCALE_MD)
    measured = measured_names(text)
    missing = [n for n in registry_names() if not is_measured(n, measured)]
    if not missing:
        print("no unmeasured registry rows — SCALE.md is current")
        return
    print(f"measuring {len(missing)} new rows: {', '.join(missing)}")
    t01 = bench(sf01, missing)
    t1 = bench(sf1, missing)
    rows = "".join(
        f"| {n} | {t01.get(n, float('nan')):.2f}s | "
        f"{t1.get(n, float('nan')):.2f}s | "
        f"{t1.get(n, 0) / max(t01.get(n, 0), 1e-9):.1f}x |\n"
        for n in sorted(missing))
    if os.path.getmtime(SCALE_MD) != mtime:
        # a concurrent edit landed while the bench ran — re-read so the
        # rewrite can't clobber it (measured names were computed from the
        # old text; re-filter against the fresh appendix to stay idempotent)
        text = open(SCALE_MD).read()
        fresh = measured_names(text)
        rows = "".join(r + "\n" for r in rows.rstrip("\n").split("\n")
                       if not is_measured(r.split(" | ")[0].lstrip("| "), fresh))
        if not rows:
            print("all rows already present after concurrent edit")
            return
    if HEADING in text:
        text = text.rstrip("\n") + "\n" + rows
    else:
        text = (text.rstrip("\n") + f"\n\n{HEADING}\n\n"
                "Per-query isolated best-of-N (graft.Bench, one query per\n"
                "run family) at sf0.1 vs the synthetic 10x sf1 — appended\n"
                "automatically when new registry rows land.\n\n"
                + TABLE_HDR + rows)
    open(SCALE_MD, "w").write(text)
    print(f"appended {len(missing)} rows to SCALE.md")


if __name__ == "__main__":
    main()
