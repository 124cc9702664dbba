#!/usr/bin/env python3
"""Golden-fixture generator for the model-scored registry queries (q80 GRU,
q83 LSTM latent): an INDEPENDENT pure-Python float64 forward pass over the
same committed weights and the same assembled input tensors, so the driver's
DuckDB oracle can hash-check a computation that is not SQL-expressible.

Inputs come from `sbt "runMain graft.FixtureDump <sfDir> <dumpDir>"`:
  <dumpDir>/q80_model.txt   — the seqmodel text artifact (weights)
  <dumpDir>/q80_seqs/*.parquet — (user_id, seq: list<list<double>>)

Usage:
    python3 tools/make_rnn_fixture.py <dumpDir> q80 [--check <verifyDir>]
                                      [--tag sf001]

Writes src/main/resources/graft/fixtures/q80_expected_<tag>.parquet and, with
--check, compares against the Spark output graft.Verify dumped (must be
bit-identical after the shared HALF_UP round-6). Run once per scale dir
(sf0.001 -> --tag sf0001, sf0.01 -> sf001, sf0.1 -> sf01) so graft.Verify is
hash-green at every scale the driver runs.

Independence note: this forward pass is written from the torch GRU/LSTM gate
equations directly (https://pytorch.org/docs/stable/generated/torch.nn.GRU),
not ported from the Scala — Python floats are IEEE float64 like the JVM's
Double, and both sides round HALF_UP at 6 decimals, so agreement requires
the recurrence math to be right on both sides to ~1e-13.
"""
import glob
import math
import os
import sys
from decimal import Decimal, ROUND_HALF_UP

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "src/main/resources/graft/fixtures")


def parse_seqmodel(path):
    lines = [ln.strip() for ln in open(path) if ln.strip()]
    assert lines[0] == "seqmodel", lines[0]
    m = {"mats": {}, "vecs": {}, "edges": {}}
    i = 1
    while i < len(lines):
        parts = lines[i].split()
        if parts[0] == "seqlen":
            m["seqlen"] = int(parts[1])
        elif parts[0] == "features":
            m["features"] = parts[1:]
        elif parts[0] == "hidden":
            m["hidden"] = int(parts[1])
        elif parts[0] == "matrix":
            rows = int(parts[2])
            m["mats"][parts[1]] = [
                [float(x) for x in lines[i + 1 + r].split()]
                for r in range(rows)]
            i += rows
        elif parts[0] == "vector":
            m["vecs"][parts[1]] = [float(x) for x in lines[i + 1].split()]
            i += 1
        elif parts[0] == "edges":
            m["edges"][parts[1]] = [float(x) for x in lines[i + 1].split()]
            i += 1
        else:
            raise ValueError(lines[i])
        i += 1
    return m


def sigmoid(x):
    return 1.0 / (1.0 + math.exp(-x))


def dot(w, x):
    s = 0.0
    for i in range(len(x)):
        s += w[i] * x[i]
    return s


def gru_step(wih, whh, bih, bhh, hidden, x, h):
    out = [0.0] * hidden
    for j in range(hidden):
        r = sigmoid(dot(wih[j], x) + bih[j] + dot(whh[j], h) + bhh[j])
        z = sigmoid(dot(wih[hidden + j], x) + bih[hidden + j]
                    + dot(whh[hidden + j], h) + bhh[hidden + j])
        n = math.tanh(dot(wih[2 * hidden + j], x) + bih[2 * hidden + j]
                      + r * (dot(whh[2 * hidden + j], h) + bhh[2 * hidden + j]))
        out[j] = (1.0 - z) * n + z * h[j]
    return out


def seqmodel_forward(m, seq):
    """Class-1 probability for one (T x F) index sequence — the reference
    dataflow: embed -> biGRU -> [max, avg, interleaved-last] -> MLP ->
    softmax (model.py:57-76)."""
    feats, hidden = m["features"], m["hidden"]
    mats, vecs = m["mats"], m["vecs"]
    xs = []
    for step in seq:
        x = []
        for fi, f in enumerate(feats):
            table = mats[f"embed_{f}"]
            idx = int(step[fi])
            row = table[idx] if 0 <= idx < len(table) else table[0]
            x.extend(row)
        xs.append(x)
    t = len(xs)
    h = [0.0] * hidden
    sf = []
    for i in range(t):
        h = gru_step(mats["fwd_wih"], mats["fwd_whh"], vecs["fwd_bih"],
                     vecs["fwd_bhh"], hidden, xs[i], h)
        sf.append(h)
    h = [0.0] * hidden
    sb = [None] * t
    for i in range(t - 1, -1, -1):
        h = gru_step(mats["bwd_wih"], mats["bwd_whh"], vecs["bwd_bih"],
                     vecs["bwd_bhh"], hidden, xs[i], h)
        sb[i] = h
    two_h = 2 * hidden
    mx = [-math.inf] * two_h
    av = [0.0] * two_h
    for i in range(t):
        for j in range(hidden):
            f, b = sf[i][j], sb[i][j]
            if f > mx[j]:
                mx[j] = f
            if b > mx[hidden + j]:
                mx[hidden + j] = b
            av[j] += f
            av[hidden + j] += b
    for j in range(two_h):
        av[j] /= t
    last = [0.0] * two_h
    for j in range(hidden):
        last[2 * j] = sf[t - 1][j]
        last[2 * j + 1] = sb[0][j]
    combined = mx + av + last
    w1, b1 = mats["cls_w1"], vecs["cls_b1"]
    h1 = []
    for j in range(len(b1)):
        s = b1[j]
        for k in range(len(combined)):
            s += w1[j][k] * combined[k]
        h1.append(s if s > 0 else 0.0)
    w2, b2 = mats["cls_w2"], vecs["cls_b2"]
    logits = []
    for j in range(2):
        s = b2[j]
        for k in range(len(h1)):
            s += w2[j][k] * h1[k]
        logits.append(s)
    mmax = max(logits)
    e0 = math.exp(logits[0] - mmax)
    e1 = math.exp(logits[1] - mmax)
    return e1 / (e0 + e1)


def parse_latentmodel(path):
    lines = [ln.strip() for ln in open(path) if ln.strip()]
    assert lines[0] == "latentmodel", lines[0]
    m = {"mats": {}, "vecs": {}}
    i = 1
    while i < len(lines):
        parts = lines[i].split()
        if parts[0] in ("nfeatures", "hidden", "latent"):
            m[parts[0]] = int(parts[1])
        elif parts[0] == "matrix":
            rows = int(parts[2])
            m["mats"][parts[1]] = [
                [float(x) for x in lines[i + 1 + r].split()]
                for r in range(rows)]
            i += rows
        elif parts[0] == "vector":
            m["vecs"][parts[1]] = [float(x) for x in lines[i + 1].split()]
            i += 1
        else:
            raise ValueError(lines[i])
        i += 1
    return m


def lstm_step(wih, whh, bih, bhh, hidden, x, h, c):
    """torch LSTM gate order i,f,g,o in the stacked 4H rows."""
    h_n = [0.0] * hidden
    c_n = [0.0] * hidden
    for j in range(hidden):
        i_g = sigmoid(dot(wih[j], x) + bih[j] + dot(whh[j], h) + bhh[j])
        f_g = sigmoid(dot(wih[hidden + j], x) + bih[hidden + j]
                      + dot(whh[hidden + j], h) + bhh[hidden + j])
        g_g = math.tanh(dot(wih[2 * hidden + j], x) + bih[2 * hidden + j]
                        + dot(whh[2 * hidden + j], h) + bhh[2 * hidden + j])
        o_g = sigmoid(dot(wih[3 * hidden + j], x) + bih[3 * hidden + j]
                      + dot(whh[3 * hidden + j], h) + bhh[3 * hidden + j])
        c_n[j] = f_g * c[j] + i_g * g_g
        h_n[j] = o_g * math.tanh(c_n[j])
    return h_n, c_n


def latent_forward(m, seq):
    """Latent mean for one (T x F) dense sequence — LSTM final hidden ->
    hidden_to_mean (vrae/vrae.py:30-47,57-84 eval path)."""
    hidden = m["hidden"]
    mats, vecs = m["mats"], m["vecs"]
    h = [0.0] * hidden
    c = [0.0] * hidden
    for x in seq:
        h, c = lstm_step(mats["enc_wih"], mats["enc_whh"], vecs["enc_bih"],
                         vecs["enc_bhh"], hidden, x, h, c)
    mw, mb = mats["mean_w"], vecs["mean_b"]
    z = []
    for j in range(len(mb)):
        s = mb[j]
        for k in range(hidden):
            s += mw[j][k] * h[k]
        z.append(s)
    return z


def round_half_up(p, digits):
    """BigDecimal(p).setScale(digits, HALF_UP).toDouble — Decimal(float) is
    the exact binary expansion on both sides, so this matches bit-for-bit
    (Python's round() is banker's and would NOT)."""
    q = Decimal(p).quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP)
    return float(q)


def load_seqs(dump_dir, name):
    con = duckdb.connect()
    pq = glob.glob(f"{dump_dir}/{name}_seqs/*.parquet")
    assert pq, f"no parquet under {dump_dir}/{name}_seqs"
    rows = con.sql(
        f"SELECT user_id, seq FROM read_parquet({pq!r}) ORDER BY user_id"
    ).fetchall()
    return rows


def write_fixture(rows, out_path, cols):
    os.makedirs(FIXDIR, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE TABLE fx ({cols})")
    placeholders = ", ".join("?" * len(rows[0]))
    con.executemany(f"INSERT INTO fx VALUES ({placeholders})", rows)
    con.sql(f"COPY fx TO '{out_path}' (FORMAT parquet)")
    print(f"wrote {out_path}: {len(rows)} rows")


def check_against_spark(fix_rows, verify_dir, qname, value_cols):
    con = duckdb.connect()
    pq = glob.glob(f"{verify_dir}/{qname}/*.parquet")
    assert pq, f"no Spark dump under {verify_dir}/{qname}"
    # project to exactly the fixture's columns: SELECT * would silently
    # compare different shapes if the Spark dump ever gains or reorders
    # columns (only the length assert would notice)
    cols = ", ".join(["user_id"] + list(value_cols))
    spark = con.sql(
        f"SELECT {cols} FROM read_parquet({pq!r}) ORDER BY user_id"
    ).fetchall()
    assert len(spark) == len(fix_rows), (len(spark), len(fix_rows))
    n_bad = 0
    for s, f in zip(spark, fix_rows):
        if s != f:
            n_bad += 1
            if n_bad <= 5:
                print(f"MISMATCH spark={s} fixture={f}")
    if n_bad:
        sys.exit(f"{n_bad}/{len(spark)} rows differ — fixture NOT committed "
                 f"bit-identical; investigate before registering the oracle")
    print(f"check OK: {len(spark)} rows bit-identical to Spark ({qname})")


def make_q80(dump_dir, check_dir, tag):
    m = parse_seqmodel(f"{dump_dir}/q80_model.txt")
    rows = []
    for user_id, seq in load_seqs(dump_dir, "q80"):
        p = seqmodel_forward(m, seq)
        rows.append((user_id, round_half_up(p, 6)))
    out = os.path.join(FIXDIR, f"q80_expected_{tag}.parquet")
    write_fixture(rows, out, "user_id BIGINT, target DOUBLE")
    if check_dir:
        check_against_spark(rows, check_dir, "q80_rnn_scores", ["target"])


def make_q83(dump_dir, check_dir, tag):
    m = parse_latentmodel(f"{dump_dir}/q83_model.txt")
    rows = []
    for user_id, seq in load_seqs(dump_dir, "q83"):
        z = latent_forward(m, seq)
        rows.append((user_id, *[round_half_up(v, 6) for v in z]))
    n = m["latent"]
    cols = "user_id BIGINT, " + ", ".join(f"z_{j} DOUBLE" for j in range(n))
    out = os.path.join(FIXDIR, f"q83_expected_{tag}.parquet")
    write_fixture(rows, out, cols)
    if check_dir:
        check_against_spark(rows, check_dir, "q83_vrae_latent",
                            [f"z_{j}" for j in range(n)])


def main():
    dump_dir, which = sys.argv[1], sys.argv[2]
    check_dir = None
    if "--check" in sys.argv:
        check_dir = sys.argv[sys.argv.index("--check") + 1]
    # --tag sf0001|sf001|sf01: the scale suffix of the committed fixture
    # (must match Fixtures.scaleTag of the sfDir FixtureDump ran on).
    # Validated against Fixtures.scaleTags: a typo (e.g. sf0_01) would
    # write a fixture whose suffix extractRegistered never extracts —
    # silently dead.
    known_tags = {"sf0001", "sf001", "sf01"}  # mirrors Fixtures.scaleTags
    tag = "sf001"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    if tag not in known_tags:
        sys.exit(f"--tag {tag!r} is not a known scale tag "
                 f"({sorted(known_tags)}); it would produce a fixture "
                 "Fixtures.extractRegistered never extracts")
    if which == "q80":
        make_q80(dump_dir, check_dir, tag)
    elif which == "q83":
        make_q83(dump_dir, check_dir, tag)
    else:
        sys.exit(f"unknown fixture target: {which}")


if __name__ == "__main__":
    main()
