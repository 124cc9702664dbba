#!/usr/bin/env python3
"""Convert the reference's torch checkpoint + preprocessing bins
(`nn_weights.ckpt` loaded at model.py:233, `nn_bins.pickle` at
model.py:223) into the engine's `seqmodel` text artifact
(`pipeline/SequenceModel.scala`), WITHOUT torch: a torch zip checkpoint is
`data.pkl` (a pickle whose persistent IDs name storage entries) plus one
raw little-endian buffer per storage under `data/`. A custom Unpickler
stub resolves `_rebuild_tensor_v2` and persistent IDs, then tensors are
reassembled from the buffers with plain struct/array math.

Usage:
    python3 tools/convert_nn_ckpt.py nn_weights.ckpt nn_bins.pickle out.txt[.gz]
    python3 tools/convert_nn_ckpt.py --selftest

Emitted sections (SequenceModel.fromLines grammar): features in the
reference's embedding order (model.py:14-22 / bins["features"]), per-feature
`embed_*` tables, `edges` lines carrying the pd.cut digitization bins
(model.py:172-181), both GRU directions (torch key suffix `_reverse`), and
the two classifier layers. seqlen is fixed at the reference's 300
(model.py:186). A `.gz` suffix gzips the output (the full-size artifact is
~8 MB of text; SequenceModel.fromResource handles .gz transparently).
"""
import gzip
import io
import pickle
import struct
import sys
import zipfile
from collections import OrderedDict

STORAGE_FMT = {
    "FloatStorage": ("f", 4),
    "DoubleStorage": ("d", 8),
    "LongStorage": ("q", 8),
    "IntStorage": ("i", 4),
    "HalfStorage": ("e", 2),
}


class _Stub:
    """Callable/instantiable stand-in for any torch class we don't need."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return self

    def __setstate__(self, state):
        self.state = state


def _rebuild_tensor_v2(storage, offset, size, stride, requires_grad=None,
                       backward_hooks=None, *extra):
    return {"storage": storage, "offset": offset,
            "size": tuple(size), "stride": tuple(stride)}


class CkptUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2":
            return _rebuild_tensor_v2
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        if module.startswith("torch") and name.endswith("Storage"):
            return name  # dtype tag travels as a plain string
        return _Stub

    def persistent_load(self, pid):
        # ('storage', storage_type, key, location, numel)
        assert pid[0] == "storage", pid
        return {"type": pid[1] if isinstance(pid[1], str) else pid[1],
                "key": pid[2], "numel": pid[4]}


def load_state_dict(ckpt_path):
    z = zipfile.ZipFile(ckpt_path)
    pkl_name = next(n for n in z.namelist() if n.endswith("data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]
    obj = CkptUnpickler(io.BytesIO(z.read(pkl_name))).load()
    state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj

    def materialize(t):
        st = t["storage"]
        fmt, width = STORAGE_FMT[st["type"]]
        raw = z.read(f"{prefix}data/{st['key']}")
        flat = list(struct.unpack(f"<{len(raw) // width}{fmt}", raw))
        n = 1
        for s in t["size"]:
            n *= s
        flat = flat[t["offset"]: t["offset"] + n]
        return t["size"], t["stride"], flat

    out = {}
    for k, v in state.items():
        if isinstance(v, dict) and "storage" in v:
            out[k] = materialize(v)
    return out


def rows(size, stride, flat):
    """Tensor dict -> list of row lists (2-D) or a flat list (1-D)."""
    if len(size) == 1:
        return [flat[i * stride[0]] for i in range(size[0])]
    assert len(size) == 2, size
    r, c = size
    return [[flat[i * stride[0] + j * stride[1]] for j in range(c)]
            for i in range(r)]


def fmt(x):
    return repr(float(x))


def emit(state, bins, seqlen=300):
    features = [str(f) for f in bins["features"]]
    lines = ["seqmodel", f"seqlen {seqlen}",
             "features " + " ".join(features)]

    def matrix(name, m):
        lines.append(f"matrix {name} {len(m)} {len(m[0])}")
        lines.extend(" ".join(fmt(v) for v in row) for row in m)

    def vector(name, v):
        lines.append(f"vector {name} {len(v)}")
        lines.append(" ".join(fmt(x) for x in v))

    emb_keys = sorted(
        (k for k in state if "_transaction_cat_embeddings" in k
         and k.endswith(".weight")),
        key=lambda k: int(k.split(".")[-2]))
    assert len(emb_keys) == len(features), (emb_keys, features)
    # hidden from the bias length (3H)
    bih_key = next(k for k in state if k.endswith("bias_ih_l0"))
    hidden = len(rows(*state[bih_key])) // 3
    lines.insert(3, f"hidden {hidden}")

    for f, k in zip(features, emb_keys):
        matrix(f"embed_{f}", rows(*state[k]))
    for f in features:
        if f in bins and f != "features":
            edges = [float(e) for e in bins[f]]
            lines.append(f"edges {f} {len(edges)}")
            lines.append(" ".join(fmt(e) for e in edges))

    def gru(prefix, suffix):
        base = next(k for k in state
                    if k.endswith(f"weight_ih_l0{suffix}"))
        stem = base[: -len(f"weight_ih_l0{suffix}")]
        matrix(f"{prefix}_wih", rows(*state[f"{stem}weight_ih_l0{suffix}"]))
        matrix(f"{prefix}_whh", rows(*state[f"{stem}weight_hh_l0{suffix}"]))
        vector(f"{prefix}_bih", rows(*state[f"{stem}bias_ih_l0{suffix}"]))
        vector(f"{prefix}_bhh", rows(*state[f"{stem}bias_hh_l0{suffix}"]))

    gru("fwd", "")
    gru("bwd", "_reverse")

    cls_keys = sorted(k for k in state if "_top_classifier" in k)
    w = [k for k in cls_keys if k.endswith(".weight")]
    b = [k for k in cls_keys if k.endswith(".bias")]
    matrix("cls_w1", rows(*state[w[0]]))
    vector("cls_b1", rows(*state[b[0]]))
    matrix("cls_w2", rows(*state[w[1]]))
    vector("cls_b2", rows(*state[b[1]]))
    return lines


def selftest():
    # shape-level test: a fabricated 2-feature state dict round-trips
    # through emit() with the right section dims
    def t2(r, c):
        return ((r, c), (c, 1), [float(i) for i in range(r * c)])

    def t1(n):
        return ((n,), (1,), [float(i) for i in range(n)])

    h, e = 4, 5
    state = {
        "_transaction_cat_embeddings.0.weight": t2(3, 2),
        "_transaction_cat_embeddings.1.weight": t2(4, 3),
        "_gru.weight_ih_l0": t2(3 * h, e),
        "_gru.weight_hh_l0": t2(3 * h, h),
        "_gru.bias_ih_l0": t1(3 * h),
        "_gru.bias_hh_l0": t1(3 * h),
        "_gru.weight_ih_l0_reverse": t2(3 * h, e),
        "_gru.weight_hh_l0_reverse": t2(3 * h, h),
        "_gru.bias_ih_l0_reverse": t1(3 * h),
        "_gru.bias_hh_l0_reverse": t1(3 * h),
        "_top_classifier.0.weight": t2(6, 6 * h),
        "_top_classifier.0.bias": t1(6),
        "_top_classifier.2.weight": t2(2, 6),
        "_top_classifier.2.bias": t1(2),
    }
    bins = {"features": ["a", "b"], "a": [0, 1, 2]}
    lines = emit(state, bins, seqlen=7)
    assert lines[0] == "seqmodel" and "seqlen 7" in lines
    assert "matrix fwd_wih 12 5" in lines
    assert "matrix cls_w1 6 24" in lines
    assert "edges a 3" in lines
    print("selftest OK")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    if len(sys.argv) != 4:
        sys.exit(__doc__)
    ckpt, bins_path, out = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(bins_path, "rb") as fh:
        bins = pickle.load(fh)
    state = load_state_dict(ckpt)
    text = "\n".join(emit(state, bins)) + "\n"
    if out.endswith(".gz"):
        with gzip.open(out, "wt") as fh:
            fh.write(text)
    else:
        with open(out, "w") as fh:
            fh.write(text)
    print(f"wrote {out}: {len(text)} chars, "
          f"{len(state)} tensors, {len(bins['features'])} features")


if __name__ == "__main__":
    main()
