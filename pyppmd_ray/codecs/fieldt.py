"""Field-transpose codec ("fieldt") for delimiter-structured text (CSV/TSV).

A columnar engine's answer to tabular text embedded in a byte column: when
most lines share a delimiter count, transpose — field j of every regular
line becomes its own stream, and each stream picks its best encoding:

- typed numeric paths (EXACT string round-trip required): integers →
  frame-of-reference/delta bit-pack; fixed-2-decimal numbers → scaled
  cents the same way;
- one level of recursive transposition (dates like ``3/14/2015`` split
  again on ``/``);
- otherwise line-dictionary / rANS / LZ via the shared byte-stream picker.

Irregular lines (headers, different field counts, embedded delimiters) are
carried verbatim with their indices. Round-trip exactness: the typed paths
only engage when re-formatting reproduces the value byte-for-byte, and
``data == b"\\n".join(segments)`` always.
"""

from __future__ import annotations

import re

import numpy as np

from .base import CodecError, pack_blob, read_uvarint, register, write_uvarint

DELIMS = (b",", b"\t", b";", b"|", b"/", b":")
MIN_REGULAR_FRAC = 0.9
MAX_DEPTH = 1

_INT_RE = re.compile(rb"^(0|-?[1-9]\d{0,17})$")
_DEC_RE = re.compile(rb"^(-?)(0|[1-9]\d{0,14})\.(\d\d)$")

MODE_BYTES = 0
MODE_INT = 1
MODE_DEC2 = 2


def _best_inner(data: bytes) -> bytes:
    from .lined import _best_inner as lined_best
    from .lined import encode_lined

    cands = [lined_best(data)]
    if len(data) >= 4096:
        cands.append(encode_lined(data))
    return min(cands, key=len)


def _detect(segs: list[bytes]) -> tuple[bytes | None, int]:
    probe = segs[: min(len(segs), 512)]
    best = (None, 0, 0.0)
    for d in DELIMS:
        counts = np.array([s.count(d) for s in probe])
        if counts.max(initial=0) == 0:
            continue
        vals, freq = np.unique(counts, return_counts=True)
        k = int(vals[np.argmax(freq)])
        if k < 1:
            continue
        frac = float(freq.max()) / len(probe)
        if frac > best[2] + 1e-9:
            best = (d, k, frac)
    if best[2] >= MIN_REGULAR_FRAC and best[0] is not None:
        return best[0], best[1]
    return None, 0


# a typed path may carry up to 1% odd values (e.g. the CSV header row,
# which has the regular delimiter count and lands in every field stream)
# as verbatim exceptions; without this, one header string knocks a whole
# numeric column off the typed path
_MAX_EXC_FRAC = 0.01


def _typed_blob(vals: list[bytes], mode: int, to_int, matches) -> bytes | None:
    """varint-framed typed field: mode + n_exc + [exc_idx + exc_bytes] +
    int stream (exception slots carry 0)."""
    from .numeric import encode_int_auto
    from .rans import best_entropy_blob

    exc_idx = [i for i, m in enumerate(matches) if m is None]
    ints = np.zeros(len(vals), dtype=np.int64)
    for i, m in enumerate(matches):
        if m is not None:
            ints[i] = to_int(m)
    out = bytearray([mode])
    out += write_uvarint(len(exc_idx))
    if exc_idx:
        ib = encode_int_auto(np.array(exc_idx, dtype=np.int64))
        vb = best_entropy_blob(b"\n".join(vals[i] for i in exc_idx))
        out += write_uvarint(len(ib)) + ib + write_uvarint(len(vb)) + vb
    out += encode_int_auto(ints)
    return bytes(out)


def _encode_field(vals: list[bytes], depth: int) -> bytes:
    """One field stream → mode byte + blob, smallest exact encoding.

    Typed paths short-circuit (they dominate when they apply) and allow a
    small fraction of non-conforming values as verbatim exceptions;
    recursive sub-fields and small streams use entropy-only coding so the
    trial tree stays linear in the data size."""
    from .rans import best_entropy_blob

    joined = b"\n".join(vals)
    n = len(vals)
    max_exc = max(1, int(n * _MAX_EXC_FRAC))
    if n >= 8:
        im = [_INT_RE.match(v) for v in vals]
        n_bad = sum(1 for m in im if m is None)
        if n_bad <= max_exc:
            blob = _typed_blob(vals, MODE_INT, lambda m: int(m.group(0)), im)
            # exactness check: re-formatting must reproduce every value
            # byte-for-byte (the regex pre-filters, this is the guarantee)
            if blob and len(blob) < len(joined) and _decode_field(memoryview(blob), n) == vals:
                return blob
        dm = [_DEC_RE.match(v) for v in vals]
        n_bad = sum(1 for m in dm if m is None)
        if n_bad <= max_exc:
            blob = _typed_blob(
                vals,
                MODE_DEC2,
                lambda m: (-1 if m.group(1) else 1) * (int(m.group(2)) * 100 + int(m.group(3))),
                dm,
            )
            # decode check catches e.g. b"-0.00" (sign lost through cents == 0)
            if blob and len(blob) < len(joined) and _decode_field(memoryview(blob), n) == vals:
                return blob
    if depth >= MAX_DEPTH or len(joined) < 8192:
        return bytes([MODE_BYTES]) + best_entropy_blob(joined)
    inner = _best_inner(joined)
    if _detect(vals)[0] is not None:  # only recurse on detected structure
        sub = _encode_fieldt_impl(joined, depth + 1)
        if len(sub) < len(inner):
            inner = sub
    return bytes([MODE_BYTES]) + inner


def _decode_field(blob: memoryview, n_vals: int) -> list[bytes]:
    from .base import decode_blob

    mode = blob[0]
    body = blob[1:]
    if mode == MODE_BYTES:
        data = decode_blob(body)
        return data.split(b"\n") if n_vals else []
    n_exc, pos = read_uvarint(body, 0)
    exc: dict[int, bytes] = {}
    if n_exc:
        ilen, pos = read_uvarint(body, pos)
        idx = np.asarray(decode_blob(body[pos : pos + ilen]), dtype=np.int64)
        pos += ilen
        vlen, pos = read_uvarint(body, pos)
        ev = decode_blob(body[pos : pos + vlen]).split(b"\n")
        pos += vlen
        if len(ev) != n_exc:
            raise CodecError("fieldt exception count mismatch")
        exc = dict(zip(idx.tolist(), ev))
    vals = np.asarray(decode_blob(body[pos:]), dtype=np.int64)
    if mode == MODE_INT:
        return [
            exc[i] if i in exc else b"%d" % int(v) for i, v in enumerate(vals.tolist())
        ]
    if mode == MODE_DEC2:
        out = []
        for i, v in enumerate(vals.tolist()):
            if i in exc:
                out.append(exc[i])
                continue
            sign = b"-" if v < 0 else b""
            a = abs(v)
            out.append(b"%s%d.%02d" % (sign, a // 100, a % 100))
        return out
    raise CodecError(f"unknown fieldt field mode {mode}")


def _encode_fieldt_impl(raw: bytes, depth: int) -> bytes:
    n = len(raw)
    if n < 4096 or b"\n" not in raw:
        return pack_blob("fieldt", {"n": n, "m": 0}, _best_inner(raw))
    segs = raw.split(b"\n")
    delim, k = _detect(segs)
    if delim is None:
        return pack_blob("fieldt", {"n": n, "m": 0}, _best_inner(raw))

    fields: list[list[bytes]] = [[] for _ in range(k + 1)]
    irr_idx: list[int] = []
    irr_vals: list[bytes] = []
    for i, s in enumerate(segs):
        if s.count(delim) == k:
            parts = s.split(delim)
            for j in range(k + 1):
                fields[j].append(parts[j])
        else:
            irr_idx.append(i)
            irr_vals.append(s)

    from .numeric import encode_int_auto

    blobs = [_encode_field(f, depth) for f in fields]
    ib = encode_int_auto(np.array(irr_idx, dtype=np.int64))
    iv = _best_inner(b"\n".join(irr_vals))
    payload = bytearray()
    for b in blobs:
        payload += write_uvarint(len(b)) + b
    payload += write_uvarint(len(ib)) + ib + write_uvarint(len(iv)) + iv
    meta = {
        "n": n,
        "m": 1,
        "d": delim.decode("latin1"),
        "k": k,
        "S": len(segs),
        "I": len(irr_idx),
    }
    return pack_blob("fieldt", meta, bytes(payload))


def encode_fieldt(data: bytes | memoryview | np.ndarray) -> bytes:
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    return _encode_fieldt_impl(bytes(data), 0)


def _decode_fieldt(meta: dict, payload: memoryview) -> bytes:
    from .base import decode_blob

    if meta["m"] == 0:
        return decode_blob(payload)
    k = meta["k"]
    delim = meta["d"].encode("latin1")
    n_segs = meta["S"]
    n_irr = meta["I"]
    n_reg = n_segs - n_irr
    pos = 0
    field_vals: list[list[bytes]] = []
    for _ in range(k + 1):
        blen, pos = read_uvarint(payload, pos)
        field_vals.append(_decode_field(payload[pos : pos + blen], n_reg))
        pos += blen
    ilen, pos = read_uvarint(payload, pos)
    irr_idx = np.asarray(decode_blob(payload[pos : pos + ilen]), dtype=np.int64)
    pos += ilen
    vlen, pos = read_uvarint(payload, pos)
    iv = decode_blob(payload[pos : pos + vlen])
    irr_vals = iv.split(b"\n") if n_irr else []
    if n_irr and len(irr_vals) != n_irr:
        raise CodecError("fieldt irregular count mismatch")

    irr_set = set(irr_idx.tolist())
    segs: list[bytes] = []
    ri = 0
    ii = 0
    for i in range(n_segs):
        if i in irr_set:
            segs.append(irr_vals[ii])
            ii += 1
        else:
            segs.append(delim.join(f[ri] for f in field_vals))
            ri += 1
    out = b"\n".join(segs)
    if len(out) != meta["n"]:
        raise CodecError("fieldt length mismatch")
    return out


register(19, "fieldt", _decode_fieldt)
