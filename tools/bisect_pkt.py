"""Conformance bisection harness: re-encode one dumped P-frame tile with
block-level mutations, splice it as the last packet of a truncated IVF,
and check dav1d acceptance.  Debug tool for enc/dec-shared-logic desyncs
(see memory: conformance-debug-workflow).

Usage:
  python tools/bisect_pkt.py DUMP_PKL BASE_IVF PKT_INDEX  [--mode MODE]

The dump comes from SVT_DUMP_DIR (video_encoder._encode_p_part hook).
"""

from __future__ import annotations

import pickle
import struct
import subprocess
import sys

import numpy as np

sys.path.insert(0, ".")

from svtav1_tpu.encoder.headers import FrameConfig, assemble_frame
from svtav1_tpu.encoder.tile_codec import TileCoder
from svtav1_tpu.encoder.intra_encoder import EncoderConfig, IntraEncoder


def load_pkts(path):
    with open(path, "rb") as f:
        hdr = f.read(32)
        rest = f.read()
    pkts = []
    off = 0
    while off < len(rest):
        sz, pts = struct.unpack("<IQ", rest[off:off + 12])
        pkts.append((pts, rest[off + 12:off + 12 + sz]))
        off += 12 + sz
    return hdr, pkts


def write_ivf(path, hdr, pkts):
    with open(path, "wb") as f:
        f.write(hdr)
        for pts, data in pkts:
            f.write(struct.pack("<IQ", len(data), pts))
            f.write(data)


def encode_frame_from_dump(d, mutate=None):
    """Re-run the host tile encode from a dump; mutate(d) may edit the
    block arrays in place first.  Returns the frame TU payload."""
    d = {k: (v.copy() if isinstance(v, np.ndarray) else v)
         for k, v in d.items()}
    if mutate is not None:
        mutate(d)
    q, w, h, lf, T = d["q"], d["w"], d["h"], d["lf"], d["T"]
    seq = IntraEncoder(EncoderConfig(width=w, height=h,
                                     qindex=q)).seq
    tw_px = w // T
    tiles = []
    for t in range(T):
        tc = TileCoder(tw_px, h, q, d["cdf_update"], kf=False,
                       cdf_init=d["cdf0"], comp=d["comp"],
                       mi_col_off=t * tw_px // 4,
                       frame_mi_cols=w // 4)
        tile, _ = tc.encode(d["part"][t], d["y_mi"][t], d["y_lev"][t],
                            d["u_lev"][t], d["v_lev"][t], d["y_smi"][t],
                            d["y_slev"][t], d["u_slev"][t],
                            d["v_slev"][t], d["mv_t"][t], d["mv_s"][t],
                            d["cands"], d["cands_sub"], d["n_i_top"],
                            d["n_i_sub"], stx_sub=d["y_stx"][t])
        tiles.append(tile)
    hdr_extra = dict(d["hdr_extra"])
    primary_ref = hdr_extra.pop("primary_ref_frame", 7)
    fr = FrameConfig(frame_type=1, base_q_idx=q,
                     disable_cdf_update=not d["cdf_update"],
                     disable_frame_end_update_cdf=not d["cdf_update"],
                     primary_ref_frame=primary_ref,
                     filter_level=(lf[0], lf[1]),
                     filter_level_u=lf[2], filter_level_v=lf[3],
                     tile_cols_log2=T.bit_length() - 1,
                     **hdr_extra)
    return assemble_frame(seq, fr, tiles if T > 1 else tiles[0],
                          first=False)


def dav1d_ok(ivf_path):
    r = subprocess.run(["./tools/av1dec", ivf_path, "/tmp/_bis.yuv"],
                       capture_output=True, text=True)
    return "err" not in r.stdout and "err" not in r.stderr


def check(dump, hdr, pkts, pkt_idx, mutate=None, tag=""):
    payload = encode_frame_from_dump(dump, mutate)
    test = pkts[:pkt_idx] + [(pkts[pkt_idx][0], payload)]
    write_ivf("/tmp/_bis.ivf", hdr, test)
    ok = dav1d_ok("/tmp/_bis.ivf")
    print(f"{tag}: {'OK' if ok else 'FAIL'}")
    return ok


def main():
    dump_path, ivf_path, pkt_idx = sys.argv[1], sys.argv[2], int(sys.argv[3])
    with open(dump_path, "rb") as f:
        d = pickle.load(f)
    hdr, pkts = load_pkts(ivf_path)
    print("baseline (re-encode, no mutation):")
    check(d, hdr, pkts, pkt_idx, None, "identity")


if __name__ == "__main__":
    main()
