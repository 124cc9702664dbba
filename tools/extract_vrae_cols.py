#!/usr/bin/env python3
"""Extract the VRAE dummy-column template (the literal `cols = [...]` list at
run.py:104 — transaction_amt/timediff/time_day/debit/credit + the fixed
mcc/currency/hour/dow/dom/month one-hot vocabulary) into a committed
resource, one name per line, so `pipeline/VraeFeatures.scala` can rebuild the
exact 391-column reindex surface (plus the 3 appended cumsums = the
394-feature encoder input) without parsing Python at runtime.

Usage: python3 tools/extract_vrae_cols.py /root/reference/run.py \
           src/main/resources/graft/vrae_cols.txt
"""
import ast
import re
import sys


def main():
    run_py, out = sys.argv[1], sys.argv[2]
    src = open(run_py).read()
    m = re.search(r"^\s*cols = (\[.*?\])\s*$", src, re.M | re.S)
    assert m, "cols = [...] literal not found"
    cols = ast.literal_eval(m.group(1))
    assert cols[:5] == ["transaction_amt", "timediff", "time_day",
                        "debit", "credit"], cols[:5]
    with open(out, "w") as fh:
        fh.write("\n".join(cols) + "\n")
    print(f"wrote {out}: {len(cols)} columns")


if __name__ == "__main__":
    main()
