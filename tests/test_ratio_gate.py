"""Ratio gate vs the reference (SURVEY.md §7.1 step 8, BASELINE.md).

The north rule: engine compressed size ≤ pyppmd PPMd var.H size on the
same partition bytes. When the reference extension is importable (built
out-of-tree under /tmp/refbuild), compare live; otherwise assert against
PINNED sizes measured in this sandbox (deterministic fixture, seed 42):

    fixture source_files n=8000 seed=42, first 4 MiB block (3,684,182 B
    canonical bytes) → pyppmd var.H o6/16MB = 344,129 B (10.71x)
    [measured 2026-08-17, gcc -O3 build of /root/reference]
"""

from __future__ import annotations

import sys

import pytest

PINNED = {
    # (fixture_rows, seed, block_budget): (canonical_bytes, ppmd_varH_bytes)
    (8000, 42, 4 << 20): (3_684_182, 344_129),
}


@pytest.fixture(scope="module")
def block_and_bytes():
    from pyppmd_ray.fixtures import generate_source_table
    from pyppmd_ray.stages.blocks import canonical_column_bytes, encode_block, split_by_bytes

    t = generate_source_table(8000, seed=42)
    p0 = split_by_bytes(t, 4 << 20)[0]
    row = encode_block(p0)
    allb = b"".join(b"".join(canonical_column_bytes(p0[c])) for c in p0.column_names)
    return row, allb


def test_engine_beats_pinned_ppmd_size(block_and_bytes):
    row, allb = block_and_bytes
    exp_bytes, ppmd_size = PINNED[(8000, 42, 4 << 20)]
    assert len(allb) == exp_bytes, (
        "fixture drifted — re-pin the reference size for the new bytes"
    )
    assert row["encoded_bytes"] <= ppmd_size, (
        f"engine {row['encoded_bytes']} > pyppmd var.H {ppmd_size}"
    )


def test_engine_beats_live_ppmd_if_built(block_and_bytes):
    sys.path.insert(0, "/tmp/refbuild/src")
    pyppmd = pytest.importorskip("pyppmd")
    row, allb = block_and_bytes
    ref = pyppmd.compress(allb, max_order=6, mem_size=16 << 20, variant="H")
    assert row["encoded_bytes"] <= len(ref), (
        f"engine {row['encoded_bytes']} > live pyppmd var.H {len(ref)}"
    )
    # and the reference's own round-trip contract holds for it too —
    # var.H needs the plaintext length out-of-band (the framing wart this
    # engine fixes; /root/reference/src/ext/_ppmdmodule.c:398-407)
    dec = pyppmd.Ppmd7Decoder(6, 16 << 20)
    assert dec.decode(ref, len(allb)) == allb


# F2 csv-like corpus (FIXTURES.md): the reference's own benchmark family
# (10000SalesRecords.csv, /root/reference/tests/test_ppmd7.py:73). Round-1
# verdict: engine lost this gate by 2.8%; the fieldt typed-exception paths
# (header row no longer poisons numeric columns) now win it with margin.
F2_PINNED_PPMD = 306_037  # var.H o6/16MB on generate_csv_like() [2026-08-17]


@pytest.fixture(scope="module")
def f2_corpus():
    from pyppmd_ray.fixtures import generate_csv_like

    return generate_csv_like()


def test_f2_engine_beats_pinned_ppmd(f2_corpus):
    from pyppmd_ray.codecs import decode_blob
    from pyppmd_ray.codecs.fieldt import encode_fieldt

    blob = encode_fieldt(f2_corpus)
    assert decode_blob(blob) == f2_corpus
    assert len(blob) <= F2_PINNED_PPMD, (
        f"engine {len(blob)} > pyppmd var.H {F2_PINNED_PPMD} on F2"
    )


def test_f2_engine_beats_live_ppmd_if_built(f2_corpus):
    sys.path.insert(0, "/tmp/refbuild/src")
    pyppmd = pytest.importorskip("pyppmd")
    from pyppmd_ray.codecs.fieldt import encode_fieldt

    ref = pyppmd.compress(f2_corpus, max_order=6, mem_size=16 << 20, variant="H")
    blob = encode_fieldt(f2_corpus)
    assert len(blob) <= len(ref), f"engine {len(blob)} > live pyppmd var.H {len(ref)}"


# F3 prose corpus: the documents text column — the corpus class where the
# round-4 engine still lost to var.H by 6%. The r5 wtok m=2 path
# (15-bit-precision rANS over token ids + front-coded vocab) flipped it:
# 173,603 B vs var.H's 175,771 B on the sf0.1 text data [2026-08-17].
F3_PINNED_PPMD = 175_771  # var.H o6/16MB on the sf0.1 documents text data part
F3_SF_DIR = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def f3_text_bytes():
    import os

    import pyarrow.parquet as pq

    from pyppmd_ray.stages.blocks import canonical_column_bytes

    path = os.path.join(F3_SF_DIR, "documents.parquet")
    if not os.path.exists(path):
        pytest.skip("sf0.1 testdata not present")
    t = pq.read_table(path, columns=["text"])
    _, data = canonical_column_bytes(t["text"])
    return data


def test_f3_prose_engine_beats_pinned_ppmd(f3_text_bytes):
    from pyppmd_ray.codecs import decode_blob
    from pyppmd_ray.codecs.wtok import encode_wtok

    blob = encode_wtok(f3_text_bytes)
    assert decode_blob(blob) == f3_text_bytes
    assert len(blob) <= F3_PINNED_PPMD, (
        f"engine {len(blob)} > pyppmd var.H {F3_PINNED_PPMD} on prose"
    )


def test_f3_prose_engine_beats_live_ppmd_if_built(f3_text_bytes):
    sys.path.insert(0, "/tmp/refbuild/src")
    pyppmd = pytest.importorskip("pyppmd")
    from pyppmd_ray.codecs.wtok import encode_wtok

    ref = pyppmd.compress(f3_text_bytes, max_order=6, mem_size=16 << 20, variant="H")
    blob = encode_wtok(f3_text_bytes)
    assert len(blob) <= len(ref), (
        f"engine {len(blob)} > live pyppmd var.H {len(ref)} on prose"
    )
