#!/usr/bin/env python3
"""Round-start checklist: cross-reference the driver's latest artifacts
against the registry so silent breakage is visible in one screen.

    python3 tools/round_status.py [round_number]

Checks (the round-7 lesson — ten queries erred at driver time while the
test suite stayed green, visible only as ABSENCE from CORRECTNESS):
  1. registry names (from the last Verify dump's oracle_sql.json, or
     bench_last.json) missing from CORRECTNESS_r{N}.json -> those queries
     THREW during the driver run;
  2. CORRECTNESS rows that are red (rows/schema/hash);
  3. BENCH_r{N}.json "failed" list and parse health;
  4. testdata physical schema drift for the drift-prone events.ts column.
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest(pattern):
    files = sorted(glob.glob(os.path.join(REPO, pattern)),
                   key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    return files[-1] if files else None


def registry_names():
    bench = os.path.join(REPO, "bench_last.json")
    if os.path.exists(bench):
        with open(bench) as fh:
            return set(json.load(fh).get("queries", {}))
    return set()


def main():
    rnd = sys.argv[1] if len(sys.argv) > 1 else None
    cpath = (os.path.join(REPO, f"CORRECTNESS_r{int(rnd):02d}.json")
             if rnd else latest("CORRECTNESS_r*.json"))
    bpath = (os.path.join(REPO, f"BENCH_r{int(rnd):02d}.json")
             if rnd else latest("BENCH_r*.json"))
    ok = True

    if cpath is None or not os.path.exists(cpath):
        # fresh clone / round 1: nothing to cross-reference yet
        print("no CORRECTNESS_r*.json artifact found — nothing to check "
              "(round 1 or fresh clone); STATUS: N/A")
        sys.exit(0)

    with open(cpath) as fh:
        correctness = json.load(fh)
    red = {k: v for k, v in correctness.items()
           if not (v.get("rows_match") and v.get("hash_match"))}
    print(f"{os.path.basename(cpath)}: {len(correctness)} rows, "
          f"{len(red)} red")
    for k, v in sorted(red.items()):
        ok = False
        print(f"  RED {k}: rows={v.get('rows_match')} "
              f"schema={v.get('schema_match')} hash={v.get('hash_match')} "
              f"err={str(v.get('err'))[:120]}")

    reg = registry_names()
    if reg:
        missing = sorted(reg - set(correctness))
        if missing:
            # mid-round this usually just means the query postdates the
            # artifact being checked; at round START (bench_last from the
            # prior full fleet) it means the driver pass threw
            ok = False
            print(f"  MISSING from correctness (newer than this round's "
                  f"artifact, or threw at driver time): "
                  f"{', '.join(missing)}")
        else:
            print(f"  all {len(reg)} locally-benched queries present")

    if bpath and os.path.exists(bpath):
        with open(bpath) as fh:
            bench = json.load(fh)
        parsed = bench.get("parsed") if "parsed" in bench else bench
        if not parsed:
            ok = False
            print(f"{os.path.basename(bpath)}: PARSE FAILED (tail window?)")
        else:
            failed = parsed.get("failed") or []
            print(f"{os.path.basename(bpath)}: total {parsed.get('value')}s "
                  f"over {len(parsed.get('queries', {}))} queries, "
                  f"failed: {failed or 'none'}")
            if failed:
                ok = False

    try:
        import pyarrow.parquet as pq
        # probe EVERY sf dir (the spec pins sf0.001, the driver verifies at
        # sf0.01, the bench runs sf0.1 — drift can hit any of them
        # independently since each is generated separately)
        for d in sorted(glob.glob("/root/testdata/sf*")):
            ts = pq.read_schema(os.path.join(d, "events.parquet")).field("ts")
            print(f"testdata {os.path.basename(d)} events.ts encoding: "
                  f"{ts.type} (Tables.events must normalize this; "
                  f"TestdataSchemaSpec guards it)")
    except Exception as e:
        print(f"testdata check skipped: {e}")

    print("STATUS:", "CLEAN" if ok else "ACTION NEEDED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
