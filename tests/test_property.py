"""Property-based round-trip tests (FIXTURES.md F5), mirroring the
reference's hypothesis fuzzer (`/root/reference/tests/test_fuzzer.py:15-60`:
random unicode text × random params → round-trip equality)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from pyppmd_ray.codecs import decode_blob, encode_column
from pyppmd_ray.codecs.fsst import encode_fsst
from pyppmd_ray.codecs.lined import encode_lined
from pyppmd_ray.codecs.lz import encode_lz
from pyppmd_ray.codecs.numeric import encode_int_auto
from pyppmd_ray.codecs.rans import encode_rans0
from pyppmd_ray.codecs.rans_ctx import encode_rans1

import pyppmd_ray as ppr

DEADLINE = 2000  # ms; codec calls on tiny inputs are fast but CI-safe


@settings(max_examples=40, deadline=DEADLINE)
@given(st.binary(min_size=0, max_size=4096))
def test_byte_codecs_roundtrip(data):
    for enc in (encode_rans0, encode_rans1, encode_fsst, encode_lz, encode_lined):
        assert decode_blob(enc(data)) == data


@settings(max_examples=40, deadline=DEADLINE)
@given(st.text(min_size=1, max_size=2000))
def test_highlevel_unicode_roundtrip(text):
    # the reference's test_fuzzer:15-37 shape: unicode → compress → equal
    assert ppr.decompress_str(ppr.compress(text)) == text


@settings(max_examples=40, deadline=DEADLINE)
@given(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=300)
)
def test_int_codec_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    out = np.asarray(decode_blob(encode_int_auto(arr)))
    np.testing.assert_array_equal(out, arr)


@settings(max_examples=30, deadline=DEADLINE)
@given(
    st.lists(st.one_of(st.none(), st.text(max_size=60)), max_size=200),
)
def test_string_column_roundtrip(vals):
    arr = pa.array(vals, type=pa.string())
    out = decode_blob(encode_column(arr))
    assert out.equals(arr)


@settings(max_examples=20, deadline=DEADLINE)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.floats(allow_nan=False, width=32), max_size=8)),
        max_size=50,
    )
)
def test_list_float_column_roundtrip(vals):
    arr = pa.array(vals, type=pa.list_(pa.float32()))
    out = decode_blob(encode_column(arr))
    assert out.equals(arr)


@settings(max_examples=25, deadline=DEADLINE)
@given(st.binary(min_size=0, max_size=2000), st.integers(min_value=64, max_value=1024))
def test_streaming_blocks_roundtrip(data, block_size):
    c = ppr.BlockCompressor(codec="lz", block_size=block_size)
    out = c.compress(data) + c.flush()
    d = ppr.BlockDecompressor()
    assert d.decompress(out) == data


@settings(max_examples=25, deadline=DEADLINE)
@given(
    st.lists(
        st.lists(st.text(alphabet="abc0123456789.-", max_size=8), min_size=3, max_size=3),
        max_size=80,
    )
)
def test_fieldt_roundtrip_structured(rows):
    from pyppmd_ray.codecs.fieldt import encode_fieldt

    data = "\n".join(",".join(r) for r in rows).encode()
    assert decode_blob(encode_fieldt(data)) == data


@settings(max_examples=15, deadline=DEADLINE)
@given(st.integers(0, 2**31), st.booleans(), st.booleans())
def test_fieldt_typed_exceptions_roundtrip(seed, with_header, with_odd):
    """The typed INT/DEC2 paths with verbatim exceptions (header rows,
    -0.00, leading zeros, over-long digits) must round-trip exactly."""
    import numpy as np

    from pyppmd_ray.codecs.fieldt import encode_fieldt

    rng = np.random.default_rng(seed)
    lines = []
    if with_header:
        lines.append("id,price,qty")  # regular delimiter count, non-numeric
    for i in range(600):
        lines.append(
            f"{rng.integers(10**8, 10**9)},{rng.uniform(1, 700):.2f},{rng.integers(1, 10000)}"
        )
    if with_odd:
        lines.insert(50, "-0.00,007,12345678901234567890123")
    data = ("\n".join(lines) + "\n").encode()
    blob = encode_fieldt(data)
    assert decode_blob(blob) == data


def test_fieldt_header_does_not_defeat_typed_paths():
    """Round-1 regression: one header row (regular comma count) must not
    knock the numeric columns off the typed paths — the typed encode is
    ~2x smaller than generic entropy coding on this shape."""
    import numpy as np

    from pyppmd_ray.codecs.fieldt import encode_fieldt

    rng = np.random.default_rng(0)
    plain = [f"{rng.integers(10**8, 10**9)},{rng.uniform(1, 700):.2f}" for _ in range(5000)]
    with_hdr = ("id,price\n" + "\n".join(plain) + "\n").encode()
    without = ("\n".join(plain) + "\n").encode()
    b_hdr, b_no = encode_fieldt(with_hdr), encode_fieldt(without)
    assert decode_blob(b_hdr) == with_hdr
    # header costs at most a few hundred bytes, not a mode change
    assert len(b_hdr) <= len(b_no) + 400


# ---------------------------------------------------- round-3 type surface

_DECIMALS = st.decimals(
    min_value=-(10**15), max_value=10**15, places=3, allow_nan=False,
    allow_infinity=False,
)


@settings(max_examples=30, deadline=DEADLINE)
@given(st.lists(st.one_of(st.none(), _DECIMALS), max_size=120))
def test_decimal_column_roundtrip(vals):
    arr = pa.array(vals, type=pa.decimal128(20, 3))
    assert decode_blob(encode_column(arr)).equals(arr)


@settings(max_examples=30, deadline=DEADLINE)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {"a": st.integers(-(2**31), 2**31), "b": st.one_of(st.none(), st.text(max_size=20))}
            ),
        ),
        max_size=100,
    )
)
def test_struct_column_roundtrip(vals):
    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array(vals, type=t)
    assert decode_blob(encode_column(arr)).equals(arr)


@settings(max_examples=30, deadline=DEADLINE)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.tuples(st.text(max_size=8), st.integers(-(2**31), 2**31)),
                max_size=6,
                unique_by=lambda kv: kv[0],
            ),
        ),
        max_size=60,
    )
)
def test_map_column_roundtrip(vals):
    t = pa.map_(pa.string(), pa.int64())
    arr = pa.array(vals, type=t)
    assert decode_blob(encode_column(arr)).equals(arr)


@settings(max_examples=30, deadline=DEADLINE)
@given(st.lists(st.one_of(st.none(), st.sampled_from(["x", "y", "z", "w"])), min_size=1, max_size=150))
def test_dictionary_column_roundtrip(vals):
    arr = pa.array(vals).dictionary_encode()
    assert decode_blob(encode_column(arr)).equals(arr)


def test_corrupt_block_payload_raises_not_hangs():
    """Bit-flips / truncations of a block payload must raise a loud,
    catchable error (the quarantine contract), never crash or loop."""
    import pytest

    from pyppmd_ray.codecs.base import CodecError
    from pyppmd_ray.stages.blocks import decode_block, encode_block

    from decimal import Decimal

    t = pa.table(
        {
            "id": pa.array(range(200), type=pa.int64()),
            "txt": pa.array([f"line {i} " * 8 for i in range(200)]),
            "dec": pa.array([Decimal(i) / 10 for i in range(200)], type=pa.decimal128(12, 1)),
        }
    )
    payload = bytearray(encode_block(t)["payload"])
    rng = np.random.default_rng(0)
    for trial in range(40):
        bad = bytearray(payload)
        mode = trial % 3
        if mode == 0:
            bad = bad[: rng.integers(1, len(bad))]
        elif mode == 1:
            bad[int(rng.integers(0, len(bad)))] ^= 0xFF
        else:
            for _ in range(8):
                bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        try:
            out = decode_block(bytes(bad))
            # silently "succeeding" is acceptable only if the content is
            # actually intact (flip landed in slack) or parse stayed sane
            assert out.num_rows <= 200 * 4
        except (CodecError, ValueError, KeyError, IndexError, OverflowError):
            pass  # the contract: a catchable error, not a crash/hang


def test_corrupt_wtok_blob_raises_not_hangs():
    """Corruption fuzz aimed at the wtok dictionary path (m=1): bit-flips
    in the code planes, vocab offsets, or vocab data must surface as a
    catchable error or an intact decode — never an Arrow OOB read."""
    from pyppmd_ray.codecs.base import CodecError, decode_blob
    from pyppmd_ray.codecs.wtok import encode_wtok

    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "and", "runs"]
    rng = np.random.default_rng(7)
    text = " ".join(words[i] for i in rng.integers(0, len(words), 4000)).encode()
    blob = bytearray(encode_wtok(text))
    assert decode_blob(bytes(blob)) == text
    for trial in range(60):
        bad = bytearray(blob)
        mode = trial % 3
        if mode == 0:
            bad = bad[: rng.integers(1, len(bad))]
        elif mode == 1:
            bad[int(rng.integers(0, len(bad)))] ^= 0xFF
        else:
            for _ in range(8):
                bad[int(rng.integers(0, len(bad)))] ^= int(rng.integers(1, 256))
        try:
            out = decode_blob(bytes(bad))
            assert len(out) <= 4 * len(text)
        except (CodecError, ValueError, KeyError, IndexError, OverflowError):
            pass


@settings(max_examples=30, deadline=5000)
@given(
    st.lists(
        st.text(alphabet="abcdefgh-xyz0123456789", min_size=1, max_size=24),
        min_size=1,
        max_size=64,
    ),
    st.integers(min_value=200, max_value=3000),
)
def test_wtok_wide_roundtrip_property(vocab, n_tokens):
    """m=2 direct-path fuzz: arbitrary small vocabs at arbitrary mix
    ratios must round-trip bit-exactly (wide rANS + front-coded vocab)."""
    from pyppmd_ray.codecs.wtok import encode_wtok

    rng = np.random.default_rng(len(vocab) * 1000 + n_tokens)
    words = [vocab[i].encode() for i in rng.integers(0, len(vocab), n_tokens)]
    data = b" ".join(words) + b" "
    assert decode_blob(encode_wtok(data)) == data


def test_wtok_front_code_inverts():
    """_front_code on a sorted vocab must reconstruct every word via
    word[i] = word[i-1][:lcp[i]] + suffix[i] — including >256-byte
    shared prefixes (capped LCP keeps correctness, not optimality)."""
    from pyppmd_ray.codecs.wtok import _front_code

    long = b"p" * 300
    words = sorted(
        [b"", b"a", b"ab", b"abc", b"abd", b"b", long + b"q", long + b"r", long + b"rr"]
    )
    voff = np.concatenate(([0], np.cumsum([len(w) for w in words]))).astype(np.int64)
    vdata = b"".join(words)
    lcp, suf_len, sufb = _front_code(voff, vdata)
    pos = 0
    prev = b""
    for i, w in enumerate(words):
        got = prev[: lcp[i]] + sufb[pos : pos + suf_len[i]]
        assert got == w
        pos += suf_len[i]
        prev = got


@settings(max_examples=40, deadline=DEADLINE)
@given(
    st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=1_000_000),
)
def test_gcd_codec_roundtrip_property(base, g):
    """gcd codec fuzz: any int64 array scaled by any stride must
    round-trip exactly through the auto cascade."""
    from pyppmd_ray.codecs.numeric import encode_int_auto

    v = (np.array(base, dtype=np.int64) * np.int64(g))
    out = decode_blob(encode_int_auto(v))
    np.testing.assert_array_equal(np.asarray(out), v)


@settings(max_examples=40, deadline=DEADLINE)
@given(
    st.lists(
        st.integers(min_value=-(10**7), max_value=10**7), min_size=1, max_size=200
    ),
    st.integers(min_value=0, max_value=4),
)
def test_fdec_codec_roundtrip_property(cents, k):
    """fdec fuzz: any k-decimal fixed-point values stored as float64
    must round-trip BIT-exactly through encode_column (and any array
    the scaling cannot represent exactly must fall back, also
    bit-exact — the self-validation makes both paths safe)."""
    import pyarrow as pa

    from pyppmd_ray.codecs import encode_column

    v = np.array(cents, dtype=np.float64) / (10.0**k)
    out = decode_blob(encode_column(pa.array(v))).to_numpy(zero_copy_only=False)
    np.testing.assert_array_equal(out.view(np.uint64), v.view(np.uint64))
