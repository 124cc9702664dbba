#!/usr/bin/env python3
"""Self-maintaining isolated decade measurements: find registry queries that
SCALE.md's auto-appended table has not measured yet, bench ONLY those at
sf0.1 and the synthetic sf1 (isolated best-of-N via graft.Bench, stripping
suite contention), and append the rows.

    # once per round, after new registry rows land:
    sbt "runMain graft.ScaleData /root/testdata/sf0.1 /tmp/graft_sf1 10"
    python3 tools/scale_new_rows.py /root/testdata/sf0.1 /tmp/graft_sf1

Idempotent: already-measured names are skipped, so each round only pays for
its additions. Queries that FAIL a bench run are reported and left
unmeasured (so the next run retries them), never written as nan rows.
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
SIDE_FILE = "/tmp/graft_bench.json"


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
    # read the SIDE FILE, not stdout: the stdout line degrades to short-id
    # keys and ELIDES fast rows once the query set is large, so a big
    # bootstrap run would come back all-missing; the side file always
    # carries every successful query under its full name at 3 decimals
    if os.path.exists(SIDE_FILE):
        os.remove(SIDE_FILE)
    sbt(["runMain graft.Bench"], env={
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(names),
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32")})
    with open(SIDE_FILE) as fh:
        return json.load(fh)["queries"]


def insert_rows(text, rows):
    """Place `rows` right after the last CONTIGUOUS row of the appendix's
    OWN table (anchored on its literal header line) — never after
    whatever table happens to be last in the section: any later table
    added under the same heading (the two-decades table was) would
    otherwise swallow the new rows. Never at EOF either, which corrupts
    the table as soon as any prose follows it."""
    if HEADING not in text:
        return (text.rstrip("\n") + f"\n\n{HEADING}\n\n"
                "Per-query isolated best-of-N (graft.Bench, one query per\n"
                "run family) at sf0.1 vs the synthetic 10x sf1 — appended\n"
                "automatically when new registry rows land.\n\n"
                + TABLE_HDR + rows + "\n")
    head, section = text.split(HEADING, 1)
    lines = section.split("\n")
    hdr_line = TABLE_HDR.splitlines()[0]
    try:
        hdr = lines.index(hdr_line)
    except ValueError:  # heading present but table gone — rebuild it
        return (head + HEADING + section.rstrip("\n") + "\n\n"
                + TABLE_HDR + rows)
    last_row = hdr
    while last_row + 1 < len(lines) and lines[last_row + 1].startswith("|"):
        last_row += 1
    lines[last_row] = lines[last_row] + "\n" + rows.rstrip("\n")
    return head + HEADING + "\n".join(lines)


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
    ok = [n for n in sorted(missing) if n in t01 and n in t1]
    failed = [n for n in missing if n not in ok]
    if failed:
        # left out of the table entirely -> retried on the next run
        print(f"FAILED (no row appended, will retry): {', '.join(failed)}")
    if not ok:
        sys.exit(1)
    rows = "".join(
        f"| {n} | {t01[n]:.2f}s | {t1[n]:.2f}s | "
        f"{t1[n] / max(t01[n], 1e-9):.1f}x |\n"
        for n in ok)
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
    open(SCALE_MD, "w").write(insert_rows(text, rows))
    print(f"appended {len(ok)} rows to SCALE.md")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
