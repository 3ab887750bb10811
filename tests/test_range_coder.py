"""Range coder: byte-exact vs reference EC goldens + round-trip."""

from pathlib import Path

import numpy as np
import pytest

from svtav1_tpu.ec.range_coder import RangeDecoder, RangeEncoder

DATA = Path(__file__).parent / "data" / "golden_ec.npz"


def _replay(ops, cdfs, cdflens):
    enc = RangeEncoder()
    seq = []   # for decode check: (kind, value, icdf-or-f)
    ci = 0
    off = 0
    for kind, v, aux in ops:
        if kind == 0:
            n = cdflens[ci]
            icdf = np.concatenate([cdfs[off:off + n],
                                   np.zeros(1, cdfs.dtype)])
            off += n
            ci += 1
            enc.encode_symbol(int(v), icdf)
            seq.append((0, int(v), icdf))
        elif kind == 1:
            enc.encode_bool(int(v), int(aux))
            seq.append((1, int(v), int(aux)))
        else:
            enc.encode_bool(int(v), 0x4000)
            seq.append((1, int(v), 0x4000))
    return enc, seq


@pytest.mark.parametrize("case", range(6))
def test_byte_exact_vs_reference(case):
    d = np.load(DATA)
    ops = d[f"case{case}_ops"]
    enc, _ = _replay(ops, d[f"case{case}_cdfs"], d[f"case{case}_cdflens"])
    got = enc.done()
    want = d[f"case{case}_bytes"].tobytes()
    assert got == want


@pytest.mark.parametrize("case", range(6))
def test_roundtrip_decode(case):
    d = np.load(DATA)
    ops = d[f"case{case}_ops"]
    enc, seq = _replay(ops, d[f"case{case}_cdfs"], d[f"case{case}_cdflens"])
    dec = RangeDecoder(enc.done())
    for kind, v, aux in seq:
        if kind == 0:
            assert dec.decode_symbol(aux) == v
        else:
            assert dec.decode_bool(aux) == v


def test_literal_roundtrip():
    enc = RangeEncoder()
    vals = [(5, 3), (0, 1), (255, 8), (1023, 10), (1, 1)]
    for v, b in vals:
        enc.encode_literal(v, b)
    dec = RangeDecoder(enc.done())
    for v, b in vals:
        assert dec.decode_literal(b) == v
