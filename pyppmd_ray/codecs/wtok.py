"""Word-token dictionary codec ("wtok") for prose-like text.

The engine's prose-ratio stage — the role PPMd's high-order context
model plays on natural text in the reference (`/root/reference/src/lib/
ppmd/Ppmd7Enc.c:77-185`: per-byte suffix-context prediction). Prose is a
WORD stream: almost all of its predictability is "which word comes
next", and a byte-context model spends most of its modeling capacity
re-learning the lexicon. This codec factors that out directly:

- split the byte stream at spaces (each token keeps its trailing
  space, so reconstruction is pure concatenation — same discipline as
  the newline-based ``lined`` codec);
- dictionary-encode whole tokens (Arrow's C kernel), FREQUENCY-SORT the
  dictionary so common words get small ids;
- entropy-code the id stream: single rANS byte plane when the vocab
  fits a byte, else split ids into lo/hi byte planes and rANS each
  (the hi plane is ~all zeros after frequency sorting, so a 16-bit
  vocab costs ~0.1 bits/token over the 8-bit case);
- compress the distinct-token text with the general byte codecs.

The id stream lands at the word-unigram entropy — on word-stream text
this beats PPMd var.H (measured: 8.4x vs 8.5x reference on the
documents fixture — see BASELINE.md) at vectorized-numpy speed, and the
selector only picks it where the trial encode wins (code/CSV stays on
lz/lined/fieldt).
"""

from __future__ import annotations

import numpy as np

from .base import CodecError, pack_blob, read_uvarint, register, write_uvarint

SEP = 32  # space

# vocab caps: ids must fit u16 planes; a bigger lexicon means the
# dictionary itself dominates and the general codecs do better anyway
MAX_VOCAB = 1 << 16


def encode_wtok(data: bytes | memoryview | np.ndarray) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    n = int(arr.size)
    raw = arr.tobytes()
    from .lined import _best_inner

    if n < 4096:
        return pack_blob("wtok", {"n": n, "m": 0}, _best_inner(raw))
    sp = np.flatnonzero(arr == SEP)
    # need real token structure: one token every ~4..64 bytes
    if sp.size < n // 64 or sp.size > n // 3:
        return pack_blob("wtok", {"n": n, "m": 0}, _best_inner(raw))

    import pyarrow as pa

    offs = np.unique(np.concatenate(([0], sp + 1, [n]))).astype(np.int64)
    T = int(offs.size) - 1
    tokens = pa.Array.from_buffers(
        pa.large_binary(), T, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(raw)]
    )
    d = tokens.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    D = len(d.dictionary)
    if D > MAX_VOCAB or D > T * 3 // 4:
        # mostly-unique tokens → the dictionary is pure overhead
        return pack_blob("wtok", {"n": n, "m": 0}, _best_inner(raw))

    # frequency sort: common words → small ids → near-empty hi plane
    counts = np.bincount(codes, minlength=D)
    order = np.argsort(-counts, kind="stable")
    rank = np.empty(D, dtype=np.int64)
    rank[order] = np.arange(D)
    codes = rank[codes]
    import pyarrow.compute as pc

    vocab = pc.take(d.dictionary, pa.array(order, type=pa.int64()))

    from .numeric import encode_int_auto
    from .rans import best_entropy_blob
    from .strings import strcol_from_arrow

    if D <= 256:
        cb = best_entropy_blob(codes.astype(np.uint8).tobytes())
        planes = 1
    else:
        lo = best_entropy_blob((codes & 0xFF).astype(np.uint8).tobytes())
        hi = best_entropy_blob((codes >> 8).astype(np.uint8).tobytes())
        cb = write_uvarint(len(lo)) + lo + hi
        planes = 2

    voff, vdata = strcol_from_arrow(vocab)
    ob = encode_int_auto(voff)
    vb = _best_inner(vdata)
    payload = b"".join(
        (write_uvarint(len(cb)), cb, write_uvarint(len(ob)), ob, vb)
    )
    meta = {"n": n, "m": 1, "T": T, "D": D, "p": planes}
    blob = pack_blob("wtok", meta, payload)
    if len(blob) >= n:  # pathological: never worse than raw + header
        return pack_blob("wtok", {"n": n, "m": 0}, _best_inner(raw))
    return blob


def _decode_wtok(meta: dict, payload: memoryview) -> bytes:
    from .base import decode_blob

    if meta["m"] == 0:
        return decode_blob(payload)
    n, T, D = meta["n"], meta["T"], meta["D"]
    clen, pos = read_uvarint(payload, 0)
    cpart = payload[pos : pos + clen]
    pos += clen
    if meta["p"] == 1:
        codes = np.frombuffer(decode_blob(cpart), dtype=np.uint8).astype(np.int64)
    else:
        llen, p2 = read_uvarint(cpart, 0)
        lo = np.frombuffer(decode_blob(cpart[p2 : p2 + llen]), dtype=np.uint8)
        hi = np.frombuffer(decode_blob(cpart[p2 + llen :]), dtype=np.uint8)
        if lo.size != hi.size:
            raise CodecError("wtok plane size mismatch")
        codes = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
    if codes.size != T:
        raise CodecError("wtok token count mismatch")
    olen, pos2 = read_uvarint(payload, pos)
    voff = np.asarray(decode_blob(payload[pos2 : pos2 + olen]), dtype=np.int64)
    vdata = decode_blob(payload[pos2 + olen :])
    if int(voff.size) - 1 != D:
        raise CodecError("wtok vocab size mismatch")
    if codes.size and (codes.max() >= D or codes.min() < 0):
        raise CodecError("wtok code out of range")
    import pyarrow as pa
    import pyarrow.compute as pc

    from .strings import checked_binary_values

    values = checked_binary_values(voff, vdata, "wtok")
    taken = pc.take(values, pa.array(codes, type=pa.int64()))
    from .strings import strcol_from_arrow

    _, out = strcol_from_arrow(taken)
    if len(out) != n:
        raise CodecError("wtok length mismatch")
    return out


register(25, "wtok", _decode_wtok)
