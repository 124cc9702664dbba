#!/usr/bin/env python3
"""Convert a CatBoost JSON model export into the TreeEnsembleModel text
artifact (`pipeline/TreeEnsemble.scala` format), closing the loop from the
reference's `model_cb.cbm` (`run.py:466`) to the engine's committed scorer:

    # in the reference's own environment (has catboost):
    CatBoostClassifier().load_model("model_cb.cbm") \\
        .save_model("model_cb.json", format="json")
    # anywhere (no catboost needed):
    python3 tools/convert_catboost_json.py model_cb.json model.txt
    # then: graft.Submit in.csv out.csv model.txt
    # VRAE models (digit feature ids = latent columns): add --latent to
    # rename 0..39 -> z_0..z_39 for Submit's latent branch

CatBoost oblivious trees: every level of a depth-d tree tests the SAME
split, and leaf index = sum_j [x(f_j) > border_j] << j over the tree's
splits list. The converter expands each to an explicit binary tree: the
node at depth k tests splits[d-1-k] (so a path's decisions read as the
leaf index's bits, high to low), `x <= border` descends left — exactly the
TreeEnsembleModel convention. `scale_and_bias` folds into leaf values /
the bias line. Raw-score parity only (CatBoostClassifier.predict_proba
applies a sigmoid on top; apply it downstream if probabilities are
needed).

`--selftest` builds a small model in this documented format, converts it,
and replays 200 random inputs through BOTH the oblivious leaf-index rule
and the emitted binary tree — exact float equality required.
"""
import itertools
import json
import random
import sys


def feature_names(doc, latent=False):
    feats = doc.get("features_info", {}).get("float_features", [])
    names = []
    for i, f in enumerate(feats):
        fid = f.get("feature_id") or f.get("feature_name")
        name = str(fid) if fid not in (None, "") else f"f{i}"
        # --latent only: model_cb_vrae's latent features arrive as pandas
        # integer column names 0..39 (run.py:178-179 df_z concat); the
        # engine names them z_0..z_39 (Submit.runWithLatent /
        # LatentTransformer). A generic model trained on an unnamed numpy
        # matrix ALSO has digit ids, and renaming those would silently
        # bind them to latent columns downstream — so the rename is
        # opt-in, never inferred.
        if latent and (name.isdigit()
                       or (name.startswith("-") and name[1:].isdigit())):
            name = f"z_{name}"
        names.append(name)
    return names


def convert(doc, latent=False):
    """CatBoost JSON dict -> TreeEnsembleModel text lines."""
    names = feature_names(doc, latent)
    scale, bias = 1.0, 0.0
    sb = doc.get("scale_and_bias")
    if sb:
        scale = float(sb[0])
        b = sb[1]
        bias = float(b[0] if isinstance(b, list) else b)
    lines = ["features " + " ".join(names), f"bias {bias!r}"]
    for tree in doc["oblivious_trees"]:
        splits = tree["splits"]
        leaves = [float(v) * scale for v in tree["leaf_values"]]
        d = len(splits)
        if len(leaves) != (1 << d):
            raise SystemExit(
                f"tree depth {d} expects {1 << d} leaves, got {len(leaves)}")
        lines.append("tree")
        out = []
        next_id = itertools.count()

        def emit(depth, idx_bits):
            nid = next(next_id)
            if depth == d:
                out.append(f"l {nid} {leaves[idx_bits]!r}")
                return nid
            s = splits[d - 1 - depth]  # node depth k tests bit d-1-k
            fi = s.get("float_feature_index", s.get("feature_index"))
            border = float(s["border"])
            left = emit(depth + 1, idx_bits)               # bit -> 0
            right = emit(depth + 1, idx_bits | (1 << (d - 1 - depth)))
            out.append(f"n {nid} {names[fi]} {border!r} {left} {right}")
            return nid

        emit(0, 0)
        lines.extend(out)
    return lines


def oblivious_score(doc, x):
    """Reference scorer: the documented leaf-index rule, straight off the
    JSON — the ground truth the converted tree must match."""
    scale, bias = 1.0, 0.0
    sb = doc.get("scale_and_bias")
    if sb:
        scale = float(sb[0])
        b = sb[1]
        bias = float(b[0] if isinstance(b, list) else b)
    total = bias
    for tree in doc["oblivious_trees"]:
        idx = 0
        for j, s in enumerate(tree["splits"]):
            fi = s.get("float_feature_index", s.get("feature_index"))
            if x[fi] > float(s["border"]):
                idx |= 1 << j
        total += float(tree["leaf_values"][idx]) * scale
    return total


def text_score(lines, x, names):
    """Walk the emitted text artifact (same parse as fromLines)."""
    feat_idx = {n: i for i, n in enumerate(names)}
    bias, trees, cur = 0.0, [], None
    for ln in lines:
        p = ln.split()
        if p[0] == "bias":
            bias = float(p[1])
        elif p[0] == "tree":
            if cur is not None:
                trees.append(cur)
            cur = {}
        elif p[0] == "l":
            cur[int(p[1])] = ("l", float(p[2]))
        elif p[0] == "n":
            cur[int(p[1])] = ("n", p[2], float(p[3]), int(p[4]), int(p[5]))
    if cur is not None:
        trees.append(cur)
    total = bias
    for t in trees:
        nid = 0
        while t[nid][0] == "n":
            _, f, thr, l, r = t[nid]
            nid = l if x[feat_idx[f]] <= thr else r
        total += t[nid][1]
    return total


def selftest():
    rng = random.Random(20230206)
    doc = {
        "features_info": {"float_features": [
            {"feature_id": "freq_a"}, {"feature_id": "freq_b"},
            {"feature_id": "td_mean"}]},
        "scale_and_bias": [0.5, [0.25]],
        "oblivious_trees": [
            {"splits": [
                {"float_feature_index": 0, "border": 1.5},
                {"float_feature_index": 2, "border": 40000.0},
                {"float_feature_index": 1, "border": 3.5}],
             "leaf_values": [rng.uniform(-1, 1) for _ in range(8)]},
            {"splits": [{"float_feature_index": 1, "border": 0.5}],
             "leaf_values": [-0.3, 0.7]},
        ]}
    lines = convert(doc)
    names = feature_names(doc)
    for _ in range(200):
        x = [rng.uniform(-1, 6), rng.uniform(-1, 6), rng.uniform(0, 90000)]
        a, b = oblivious_score(doc, x), text_score(lines, x, names)
        if a != b:
            raise SystemExit(f"selftest FAILED: {a!r} != {b!r} at x={x}")
    print(f"selftest OK: 200/200 inputs score identically "
          f"({len(lines)} artifact lines)")


def main():
    argv = list(sys.argv[1:])
    latent = "--latent" in argv
    if latent:
        argv.remove("--latent")
    if argv == ["--selftest"]:
        selftest()
        return
    if len(argv) != 2:
        sys.exit(__doc__)
    with open(argv[0]) as fh:
        doc = json.load(fh)
    lines = convert(doc, latent)
    with open(argv[1], "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"{len(doc['oblivious_trees'])} trees, "
          f"{len(feature_names(doc, latent))} features -> {argv[1]}")


if __name__ == "__main__":
    main()
