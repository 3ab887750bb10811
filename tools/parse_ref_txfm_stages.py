#!/usr/bin/env python3
"""Dev-time tool: extract the *structure* of the normative AV1 inverse/forward
transform butterfly networks from the reference C (read-only) into JSON golden
test data.

The AV1 spec (§7.13.2) fully constrains these butterfly networks — every
conforming codec must reproduce them bit-exactly, including each intermediate
rounding.  This tool records that normative structure as data so our
independently-written recursive generator (svtav1_tpu/ops/txfm_tables.py) can
be tested against it stage-by-stage.  Output: tests/data/txfm_stages_ref.json.

Row-op encoding (per output row):
  ["btf", w0, i0, w1, i1]   out = round2(w0*x[i0] + w1*x[i1], cos_bit)
  ["add", s0, i0, s1, i1]   out = clamp(s0*x[i0] + s1*x[i1], stage_range)
  ["pass", i0]              out = x[i0]
Weights are written as signed cospi indices: +k means cospi[k], encoded
["c", k] / ["-c", k]; sinpi as ["s", k] / ["-s", k].
"""

import json
import re
import sys
from pathlib import Path

REF = Path("/root/reference/Source/Lib/Common/Codec/EbInvTransforms.c")
REF_FWD = Path("/root/reference/Source/Lib/Encoder/Codec/EbTransforms.c")
OUT = Path(__file__).resolve().parent.parent / "svtav1_tpu/spec/data/txfm_stages.json"

FUNCS_INV = ["svt_av1_idct4_new", "svt_av1_idct8_new", "svt_av1_idct16_new",
             "svt_av1_idct32_new", "svt_av1_idct64_new",
             "svt_av1_iadst8_new", "svt_av1_iadst16_new"]
FUNCS_FWD = ["svt_av1_fdct4_new", "svt_av1_fdct8_new", "svt_av1_fdct16_new",
             "svt_av1_fdct32_new", "svt_av1_fdct64_new",
             "svt_av1_fadst8_new", "svt_av1_fadst16_new"]


def extract_fn(text, name):
    m = re.search(re.escape(name) + r"\s*\(const int32_t \*input.*?\n(.*?)\n}\n",
                  text, re.S)
    if not m:
        raise SystemExit(f"function {name} not found")
    return m.group(1)


WEIGHT_RE = r"(-?)cospi\[(\d+)\]"


def parse_weight(sign, idx):
    return ["-c" if sign == "-" else "c", int(idx)]


def parse_body(body):
    """Split into stages; parse each bf1[i] = ... statement."""
    stages = []
    cur = None
    for line in body.splitlines():
        line = line.strip()
        if line.startswith("// stage"):
            if cur is not None and cur:
                stages.append(cur)
            cur = {}
            continue
        if line == "stage++;":
            continue
        m = re.match(r"bf1\[(\d+)\]\s*=\s*(.*);", line)
        if not m or cur is None:
            continue
        row, expr = int(m.group(1)), m.group(2)
        b = re.match(
            r"half_btf\((-?)cospi\[(\d+)\],\s*(?:bf0|input)\[(\d+)\],\s*(-?)cospi\[(\d+)\],\s*(?:bf0|input)\[(\d+)\],\s*cos_bit\)",
            expr)
        if b:
            cur[row] = ["btf", parse_weight(b.group(1), b.group(2)), int(b.group(3)),
                        parse_weight(b.group(4), b.group(5)), int(b.group(6))]
            continue
        a = re.match(
            r"clamp_value\((-?)bf0\[(\d+)\]\s*([+-])\s*bf0\[(\d+)\],\s*stage_range\[stage\]\)",
            expr)
        if a:
            s0 = -1 if a.group(1) == "-" else 1
            s1 = -1 if a.group(3) == "-" else 1
            cur[row] = ["add", s0, int(a.group(2)), s1, int(a.group(4))]
            continue
        p = re.match(r"(?:bf0|input)\[(\d+)\]$", expr)
        if p:
            cur[row] = ["pass", int(p.group(1))]
            continue
        ng = re.match(r"-(?:bf0|input)\[(\d+)\]$", expr)
        if ng:
            cur[row] = ["neg", int(ng.group(1))]
            continue
        # forward transforms use plain adds without clamp: bf0[a] + bf0[b]
        a2 = re.match(r"(-?)(?:bf0|input)\[(\d+)\]\s*([+-])\s*(?:bf0|input)\[(\d+)\]$", expr)
        if a2:
            s0 = -1 if a2.group(1) == "-" else 1
            s1 = -1 if a2.group(3) == "-" else 1
            cur[row] = ["addnc", s0, int(a2.group(2)), s1, int(a2.group(4))]
            continue
        raise SystemExit(f"unparsed: {expr!r}")
    if cur:
        stages.append(cur)
    out = []
    for st in stages:
        n = max(st) + 1
        out.append([st[i] for i in range(n)])
    return out


def main():
    result = {}
    text = REF.read_text()
    for fn in FUNCS_INV:
        result[fn] = parse_body(extract_fn(text, fn))
    if REF_FWD.exists():
        tf = REF_FWD.read_text()
        for fn in FUNCS_FWD:
            try:
                result[fn] = parse_body(extract_fn(tf, fn))
            except SystemExit as e:
                print(f"skip {fn}: {e}", file=sys.stderr)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps(result))
    for k, v in result.items():
        print(k, "stages:", len(v), "rows:", [len(s) for s in v])


if __name__ == "__main__":
    main()
