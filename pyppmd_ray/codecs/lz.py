"""From-scratch LZ77 + rANS block codec ("lz").

This is the engine's high-ratio general-purpose codec — the role PPMd's
adaptive context model plays in the reference. Where the reference predicts
one byte at a time from suffix contexts (`/root/reference/src/lib/ppmd/
Ppmd7Enc.c:77-185`, inherently sequential), this codec factors the block
into (literal-run, match) sequences against the full block window and
entropy-codes the token streams with the vectorized static rANS stage —
so both passes are numpy-vectorized except a per-TOKEN (not per-byte)
greedy scan.

Design (public knowledge: LZ77; zstd's sequence/stream architecture as
described in RFC 8878 — format here is the engine's own):
- match finding: exact 5-gram and 8-gram tables; candidate = nearest
  previous position with the same gram (via stable argsort — no hash
  collisions, no verification needed);
- greedy parse with next-match skipping (iterations ≈ #matches);
- sequences = (lit_len, match_len, offset) with log2-bucket codes + raw
  extra bits; codes and literals rANS-coded when smaller than raw.
"""

from __future__ import annotations

import numpy as np

from .base import CodecError, pack_blob, register, read_uvarint, write_uvarint
from .rans import encode_rans0

MIN_MATCH = 5
_U64 = np.uint64
_I64 = np.int64


def _best_bytes_blob(data: bytes) -> bytes:
    from .numeric import encode_raw

    if len(data) < 64:
        return encode_raw(data)
    return min(encode_raw(data), encode_rans0(data), key=len)


# ------------------------------------------------------------ bit packing

def pack_varbits(vals: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack vals[i] (LSB-first) into widths[i] bits, concatenated."""
    total = int(widths.sum())
    if total == 0:
        return b""
    starts = np.concatenate(([0], np.cumsum(widths)))[:-1]
    bits = np.zeros(total, dtype=np.uint8)
    vu = vals.astype(_U64)
    mw = int(widths.max())
    for j in range(mw):
        m = widths > j
        bits[starts[m] + j] = ((vu[m] >> _U64(j)) & _U64(1)).astype(np.uint8)
    return np.packbits(bits, bitorder="little").tobytes()


def unpack_varbits(buf: memoryview | bytes, widths: np.ndarray) -> np.ndarray:
    total = int(widths.sum())
    out = np.zeros(widths.size, dtype=_U64)
    if total == 0:
        return out
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little", count=total)
    starts = np.concatenate(([0], np.cumsum(widths)))[:-1]
    mw = int(widths.max())
    for j in range(mw):
        m = widths > j
        out[m] |= bits[starts[m] + j].astype(_U64) << _U64(j)
    return out


# ------------------------------------------------------- length/offset codes

def _bitlen(v: np.ndarray) -> np.ndarray:
    """Exact bit length for int64 values >= 1 (v < 2**53)."""
    return np.frexp(v.astype(np.float64))[1].astype(_I64)


def _val_codes(v: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """v >= 0 → (code, extra, width): direct 0..15, else 12+bitlen bucket."""
    code = v.astype(_I64).copy()
    extra = np.zeros(v.size, dtype=_I64)
    width = np.zeros(v.size, dtype=_I64)
    big = v >= 16
    if big.any():
        bl = _bitlen(v[big])
        code[big] = 12 + bl
        width[big] = bl - 1
        extra[big] = v[big] - (np.int64(1) << (bl - 1))
    return code, extra, width


def _val_widths(code: np.ndarray) -> np.ndarray:
    w = np.zeros(code.size, dtype=_I64)
    big = code >= 16
    w[big] = code[big] - 13
    return w


def _val_decode(code: np.ndarray, extra: np.ndarray) -> np.ndarray:
    v = code.astype(_I64).copy()
    big = code >= 16
    v[big] = (np.int64(1) << (code[big] - 13)) + extra[big]
    return v


def _off_codes(v: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """v >= 1 → (code=bitlen, extra=v-2^(code-1), width=code-1)."""
    bl = _bitlen(v)
    return bl, v - (np.int64(1) << (bl - 1)), bl - 1


def _off_widths(code: np.ndarray) -> np.ndarray:
    return (code - 1).astype(_I64)


def _off_decode(code: np.ndarray, extra: np.ndarray) -> np.ndarray:
    return (np.int64(1) << (code - 1)) + extra


# ------------------------------------------------------------ match finding

def _grams_u64(data: np.ndarray, k: int) -> np.ndarray:
    n = data.size - k + 1
    if n <= 0:
        return np.zeros(0, dtype=_U64)
    g = np.zeros(n, dtype=_U64)
    for j in range(k):
        g |= data[j : j + n].astype(_U64) << _U64(8 * j)
    return g


def _prev_occurrence(g: np.ndarray) -> np.ndarray:
    """cand[i] = nearest j < i with g[j] == g[i], else -1."""
    cand = np.full(g.size, -1, dtype=_I64)
    if g.size < 2:
        return cand
    order = np.argsort(g, kind="stable")
    same = g[order[1:]] == g[order[:-1]]
    cand[order[1:][same]] = order[:-1][same]
    return cand


def _match_lengths(data: np.ndarray, cand: np.ndarray, k: int, cap: int) -> np.ndarray:
    """mlen[i] = match length (>= k where cand >= 0), extended up to k+cap."""
    m = cand.size
    ml = np.zeros(m, dtype=_I64)
    valid = cand >= 0
    ml[valid] = k
    active = valid.copy()
    c = np.where(valid, cand, 0)
    n = data.size
    for j in range(k, k + cap):
        if j >= n:
            break
        limit = n - j  # position i can extend to i+j only if i+j < n
        if limit < m:
            active[limit:] = False
        ip = np.flatnonzero(active)
        if ip.size == 0:
            break
        eq = data[ip + j] == data[c[ip] + j]
        ml[ip[eq]] += 1
        bad = ip[~eq]
        active[bad] = False
    return ml


def _extend_match(data: np.ndarray, c: int, j: int, L: int) -> int:
    n = data.size
    m = n - j - L
    if m <= 0:
        return L
    a = data[j + L : n]
    b = data[c + L : c + L + m]
    eq = a == b
    if eq.all():
        return L + m
    return L + int(np.argmin(eq))


# ------------------------------------------------------------------ codec

def lz_parse(data: np.ndarray) -> tuple[list[int], list[int], list[int], np.ndarray]:
    """Greedy parse → (lit_lens, match_lens, offsets, literal bytes)."""
    n = int(data.size)
    g5 = _grams_u64(data, 5)
    c5 = _prev_occurrence(g5)
    ml5 = _match_lengths(data, c5, 5, 11)       # lengths 5..16
    g8 = _grams_u64(data, 8)
    c8 = _prev_occurrence(g8)
    ml8 = _match_lengths(data, c8, 8, 56)       # lengths 8..64

    m5 = c5.size
    mlen = ml5.copy()
    cand = c5.copy()
    if ml8.size:
        upg = ml8 > mlen[: ml8.size]
        mlen[: ml8.size][upg] = ml8[upg]
        cand[: ml8.size][upg] = c8[upg]

    mpos = np.flatnonzero(mlen >= MIN_MATCH)
    candl = cand.tolist()
    mlenl = mlen.tolist()
    lls: list[int] = []
    mls: list[int] = []
    ofs: list[int] = []
    lit_slices: list[np.ndarray] = []
    anchor = 0
    i = 0
    search = np.searchsorted
    while True:
        p = search(mpos, i, "left")
        if p >= mpos.size:
            break
        j = int(mpos[p])
        c = candl[j]
        L = mlenl[j]
        if L >= 16:
            L = _extend_match(data, c, j, L)
        lls.append(j - anchor)
        mls.append(L)
        ofs.append(j - c)
        if j > anchor:
            lit_slices.append(data[anchor:j])
        anchor = j + L
        i = anchor
    if anchor < n:
        lit_slices.append(data[anchor:])
    lits = np.concatenate(lit_slices) if lit_slices else np.zeros(0, dtype=np.uint8)
    return lls, mls, ofs, lits


def encode_lz(data: bytes | memoryview | np.ndarray) -> bytes:
    arr = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    n = int(arr.size)
    if n < 32:
        from .numeric import encode_raw

        return pack_blob("lz", {"n": n, "S": -1}, encode_raw(bytes(arr.tobytes())))

    lls, mls, ofs, lits = lz_parse(arr)
    S = len(lls)
    ll = np.array(lls, dtype=_I64)
    ml = np.array(mls, dtype=_I64) - MIN_MATCH
    of = np.array(ofs, dtype=_I64)
    llc, lle, llw = _val_codes(ll)
    mlc, mle, mlw = _val_codes(ml)
    ofc, ofe, ofw = _off_codes(of) if S else (np.zeros(0, _I64),) * 3

    parts = [
        _best_bytes_blob(llc.astype(np.uint8).tobytes()),
        _best_bytes_blob(mlc.astype(np.uint8).tobytes()),
        _best_bytes_blob(ofc.astype(np.uint8).tobytes()),
        pack_varbits(lle, llw) + pack_varbits(mle, mlw) + pack_varbits(ofe, ofw),
        _best_bytes_blob(lits.tobytes()),
    ]
    payload = b"".join(write_uvarint(len(p)) + p for p in parts)
    return pack_blob("lz", {"n": n, "S": S, "L": int(lits.size)}, payload)


def _decode_lz(meta: dict, payload: memoryview) -> bytes:
    from .base import decode_blob

    n, S = meta["n"], meta["S"]
    if S == -1:
        return decode_blob(payload)
    parts: list[memoryview] = []
    pos = 0
    for _ in range(5):
        plen, pos = read_uvarint(payload, pos)
        parts.append(payload[pos : pos + plen])
        pos += plen
    llc = np.frombuffer(decode_blob(parts[0]), dtype=np.uint8).astype(_I64)
    mlc = np.frombuffer(decode_blob(parts[1]), dtype=np.uint8).astype(_I64)
    ofc = np.frombuffer(decode_blob(parts[2]), dtype=np.uint8).astype(_I64)
    if not (llc.size == mlc.size == ofc.size == S):
        raise CodecError("lz stream count mismatch")
    extras = parts[3]
    llw, mlw, ofw = _val_widths(llc), _val_widths(mlc), _off_widths(ofc)
    nb_ll = (int(llw.sum()) + 7) // 8
    nb_ml = (int(mlw.sum()) + 7) // 8
    lle = unpack_varbits(extras[:nb_ll], llw).astype(_I64)
    mle = unpack_varbits(extras[nb_ll : nb_ll + nb_ml], mlw).astype(_I64)
    ofe = unpack_varbits(extras[nb_ll + nb_ml :], ofw).astype(_I64)
    ll = _val_decode(llc, lle)
    ml = _val_decode(mlc, mle) + MIN_MATCH
    of = _off_decode(ofc, ofe)
    lits = np.frombuffer(decode_blob(parts[4]), dtype=np.uint8)

    out = np.empty(n, dtype=np.uint8)
    o = 0
    lp = 0
    for s in range(S):
        llv = int(ll[s])
        mlv = int(ml[s])
        ofv = int(of[s])
        if llv:
            out[o : o + llv] = lits[lp : lp + llv]
            o += llv
            lp += llv
        src = o - ofv
        if ofv >= mlv:
            out[o : o + mlv] = out[src : src + mlv]
        else:
            pattern = out[src:o]
            reps = -(-mlv // ofv)
            out[o : o + mlv] = np.tile(pattern, reps)[:mlv]
        o += mlv
    tail = n - o
    if tail:
        out[o:] = lits[lp : lp + tail]
        lp += tail
    if lp != lits.size or o + tail != n:
        raise CodecError("lz decode length mismatch")
    return out.tobytes()


register(10, "lz", _decode_lz)
