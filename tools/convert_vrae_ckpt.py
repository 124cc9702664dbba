#!/usr/bin/env python3
"""Convert the reference's VRAE torch checkpoint (`model_dir/vrae_5896.pth`,
loaded at run.py:176) into the engine's `latentmodel` text artifact
(`pipeline/LatentEncoder.scala`), WITHOUT torch — reuses the zip+pickle
storage reader from convert_nn_ckpt.py.

Only the transform path is exported: the encoder LSTM
(`encoder.model.*_l0`, vrae/vrae.py:30-47) and the latent-mean head
(`lmbd.hidden_to_mean.*`, vrae/vrae.py:57-84). The decoder and the logvar
head exist only for training/reconstruction and are not part of `run.py`'s
eval dataflow (vrae.py:389-408 transform → Lambda eval branch → mean).

Usage:
    python3 tools/convert_vrae_ckpt.py vrae_5896.pth out.txt[.gz]
    python3 tools/convert_vrae_ckpt.py --selftest
"""
import gzip
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from convert_nn_ckpt import load_state_dict, rows, fmt  # noqa: E402


def emit(state):
    wih = rows(*state["encoder.model.weight_ih_l0"])
    whh = rows(*state["encoder.model.weight_hh_l0"])
    bih = rows(*state["encoder.model.bias_ih_l0"])
    bhh = rows(*state["encoder.model.bias_hh_l0"])
    mw = rows(*state["lmbd.hidden_to_mean.weight"])
    mb = rows(*state["lmbd.hidden_to_mean.bias"])
    hidden = len(bih) // 4
    assert len(whh[0]) == hidden and len(mw[0]) == hidden, "shape mismatch"
    nfeat = len(wih[0])
    lines = ["latentmodel", f"nfeatures {nfeat}", f"hidden {hidden}",
             f"latent {len(mb)}"]

    def matrix(name, m):
        lines.append(f"matrix {name} {len(m)} {len(m[0])}")
        lines.extend(" ".join(fmt(v) for v in row) for row in m)

    def vector(name, v):
        lines.append(f"vector {name} {len(v)}")
        lines.append(" ".join(fmt(x) for x in v))

    matrix("enc_wih", wih)
    matrix("enc_whh", whh)
    vector("enc_bih", bih)
    vector("enc_bhh", bhh)
    matrix("mean_w", mw)
    vector("mean_b", mb)
    return lines


def selftest():
    def t2(r, c):
        return ((r, c), (c, 1), [float(i) for i in range(r * c)])

    def t1(n):
        return ((n,), (1,), [float(i) for i in range(n)])

    h, f, l = 3, 5, 2
    state = {
        "encoder.model.weight_ih_l0": t2(4 * h, f),
        "encoder.model.weight_hh_l0": t2(4 * h, h),
        "encoder.model.bias_ih_l0": t1(4 * h),
        "encoder.model.bias_hh_l0": t1(4 * h),
        "lmbd.hidden_to_mean.weight": t2(l, h),
        "lmbd.hidden_to_mean.bias": t1(l),
    }
    lines = emit(state)
    assert lines[0] == "latentmodel" and "nfeatures 5" in lines
    assert "matrix enc_wih 12 5" in lines and "matrix mean_w 2 3" in lines
    print("selftest OK")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    ckpt, out = sys.argv[1], sys.argv[2]
    state = load_state_dict(ckpt)
    text = "\n".join(emit(state)) + "\n"
    if out.endswith(".gz"):
        with gzip.open(out, "wt") as fh:
            fh.write(text)
    else:
        with open(out, "w") as fh:
            fh.write(text)
    print(f"wrote {out}: {len(text)} chars")


if __name__ == "__main__":
    main()
