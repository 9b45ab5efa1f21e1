"""Independent Python references, batch 20: the multimodal query
family — payloads rebuilt from the documented construction (md5
channel planes / digest PCM16), then independently parsed byte-by-byte
(fresh P6 header walk, struct int16 decode) with the metrics
recomputed — no shared code with the engine kernels or the md5-hex
oracle arithmetic."""

import hashlib
import math
import os
import struct
import sys
from collections import Counter, defaultdict

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rhu(x, digits):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _ppm_payload(text: str, side: int = 4) -> bytes:
    t = text.encode("utf-8")
    planes = [hashlib.md5(t + suf).digest() for suf in (b"", b"g", b"b")]
    px = bytearray()
    for i in range(side * side):
        for p in planes:
            px.append(p[i % 16])
    return f"P6\n{side} {side}\n255\n".encode("ascii") + bytes(px)


def _ahash_from_payload(b: bytes) -> int:
    """Fresh P6 parse: header walk, row-major RGB, integer-mean bits."""
    assert b[:2] == b"P6"
    parts = b.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    assert int(parts[2]) == 255
    raw = parts[3][: w * h * 3]
    grays = [
        (raw[3 * i] + raw[3 * i + 1] + raw[3 * i + 2]) // 3 for i in range(w * h)
    ]
    s = sum(grays)
    return sum((1 << k) for k, g in enumerate(grays) if g * len(grays) >= s)


def test_multimodal_ahash_dedup_matches_python(spark):
    got = {
        r["media_id"]: (r["ahash"], r["bucket_size"])
        for r in Q.queries()["multimodal_ahash_dedup"](spark, SF).collect()
    }
    hashes = {
        int(r.doc_id): _ahash_from_payload(_ppm_payload(r.text))
        for r in _docs().itertuples()
    }
    sizes = Counter(hashes.values())
    want = {mid: (h, sizes[h]) for mid, h in hashes.items()}
    assert got == want


def test_multimodal_ahash_hamming1_matches_python(spark):
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in Q.queries()["multimodal_ahash_hamming1"](spark, SF).collect()
    }
    hashes = {
        int(r.doc_id): _ahash_from_payload(_ppm_payload(r.text))
        for r in _docs().itertuples()
    }
    by_hash = defaultdict(list)
    for mid, h in hashes.items():
        by_hash[h].append(mid)
    want = {}
    for mid, h in hashes.items():
        for probe in [h] + [h ^ (1 << i) for i in range(16)]:
            for other in by_hash.get(probe, ()):
                if other == mid:
                    continue
                a, b = min(mid, other), max(mid, other)
                want[(a, b)] = bin(hashes[a] ^ hashes[b]).count("1")
    assert got == want


def test_multimodal_decode_matches_python(spark):
    # round-10: the query now splits the corpus into real PNG / PPM /
    # WAV / deliberately-unparseable classes by doc_id%4 and decodes
    # REAL headers; the independent expectation is the per-class
    # (fmt, dims, ok) contract of the encoders' parameters.
    got = {
        r["media_id"]: (r["fmt"], r["width"], r["height"], r["ok"])
        for r in Q.queries()["multimodal_decode"](spark, SF).collect()
    }
    by_cls = {
        0: ("png", 5, 5, True),
        1: ("ppm", 4, 4, True),
        2: ("wav", None, None, True),
        3: (None, None, None, False),
    }
    want = {int(r.doc_id): by_cls[int(r.doc_id) % 4] for r in _docs().itertuples()}
    assert got == want


def test_multimodal_wav_roundtrip_matches_python(spark):
    got = {
        r["media_id"]: (
            r["sample_rate"], r["n_samples"], r["duration_ms"], r["rms"], r["peak"],
        )
        for r in Q.queries()["multimodal_wav_roundtrip"](spark, SF).collect()
    }
    want = {}
    for r in _docs().itertuples():
        samples = struct.unpack("<8h", hashlib.md5(r.text.encode("utf-8")).digest())
        rms = _rhu(math.sqrt(sum(float(x) * float(x) for x in samples) / 8), 4)
        peak = max(abs(x) for x in samples)
        want[int(r.doc_id)] = (8000, 8, _rhu(8 * 1000.0 / 8000, 4), rms, peak)
    assert set(got) == set(want)
    for k, (sr, n, dur, rms, peak) in want.items():
        g = got[k]
        assert g[0] == sr and g[1] == n and g[4] == peak, k
        assert abs(g[2] - dur) < 1e-9 and abs(g[3] - rms) < 1e-6, k
