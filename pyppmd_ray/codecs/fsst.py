"""FSST-style trained symbol-table codec for short strings.

From-scratch implementation of the idea in the public FSST paper
(Boncz, Neumann, Leis — "FSST: Fast Random Access String Compression",
PVLDB 13(9), 2020): a table of up to 255 symbols, each 1–8 bytes long,
replaces frequent substrings with 1-byte codes.

Engine-specific format choices (NOT the paper's wire format):
- code 255 = escape; escaped literal bytes go to a SEPARATE literal stream
  (keeps decode fully vectorizable — no in-band escape ambiguity);
- the code stream and literal stream are each entropy-coded with the
  engine's rANS stage when that wins over raw.

The trained table is the engine's analogue of the reference's per-stream
adaptive model state: it is built once per block/partition sample and
shipped IN the blob, so any worker can decode (unlike the reference, whose
model is unpicklable and rebuilt by replaying the stream,
`/root/reference/src/ext/_ppmdmodule.c:617-634`).
"""

from __future__ import annotations

import numpy as np

from .base import CodecError, pack_blob, register, read_uvarint, write_uvarint
from .rans import encode_rans0

ESCAPE = 255
MAX_SYMS = 255
_U64 = np.uint64


def _grams(data: np.ndarray, k: int) -> np.ndarray:
    """Pack every k-gram (k<=8) into a uint64, little-endian by position."""
    n = data.size - k + 1
    if n <= 0:
        return np.zeros(0, dtype=_U64)
    g = np.zeros(n, dtype=_U64)
    for j in range(k):
        g |= data[j : j + n].astype(_U64) << _U64(8 * j)
    return g


def train_table(sample: bytes | np.ndarray, max_syms: int = MAX_SYMS) -> list[bytes]:
    """Pick up to ``max_syms`` symbols (1–8 bytes) by compression gain.

    Two-round greedy: round 1 scores raw k-gram frequencies; round 2
    re-scores on a sample encoding with the round-1 table so composed /
    overlapping grams don't double-count.
    """
    data = np.frombuffer(sample, dtype=np.uint8) if not isinstance(sample, np.ndarray) else sample
    if data.size == 0:
        return []

    def top_grams(arr: np.ndarray) -> list[tuple[int, bytes]]:
        cands: list[tuple[int, bytes]] = []
        for k in range(2, 9):
            g = _grams(arr, k)
            if g.size == 0:
                continue
            vals, counts = np.unique(g, return_counts=True)
            # keep grams worth at least ~3 uses
            keep = counts >= 3
            vals, counts = vals[keep], counts[keep]
            if vals.size > 4 * MAX_SYMS:
                top = np.argsort(-counts)[: 4 * MAX_SYMS]
                vals, counts = vals[top], counts[top]
            for v, c in zip(vals.tolist(), counts.tolist()):
                sym = int(v).to_bytes(8, "little")[:k]
                cands.append((int(c) * (k - 1), sym))
        # frequent single bytes (gain: avoids 1-byte escape overhead)
        bc = np.bincount(arr, minlength=256)
        for b in np.argsort(-bc)[:128].tolist():
            if bc[b] >= 4:
                cands.append((int(bc[b]), bytes([b])))
        cands.sort(key=lambda t: -t[0])
        return cands

    chosen: list[bytes] = []
    seen: set[bytes] = set()
    for gain, sym in top_grams(data):
        if sym not in seen:
            seen.add(sym)
            chosen.append(sym)
            if len(chosen) >= max_syms:
                break
    if not chosen:
        return []

    # round 2: encode the sample, count actual symbol usage, re-pick
    codes, lits = fsst_encode_codes(data, chosen)
    used = np.bincount(codes[codes != ESCAPE], minlength=len(chosen))
    order = np.argsort(-(used * (np.array([len(s) for s in chosen]) )))
    table = [chosen[i] for i in order if used[i] > 0][:max_syms]
    return table


def _build_matchers(table: list[bytes]):
    """Per-length sorted (gram-value, code) arrays for vectorized lookup."""
    by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for length in sorted({len(s) for s in table}, reverse=True):
        vals, codes = [], []
        for code, sym in enumerate(table):
            if len(sym) == length:
                vals.append(int.from_bytes(sym.ljust(8, b"\0"), "little"))
                codes.append(code)
        v = np.array(vals, dtype=_U64)
        c = np.array(codes, dtype=np.int64)
        order = np.argsort(v)
        by_len[length] = (v[order], c[order])
    return by_len


def fsst_encode_codes(data: np.ndarray, table: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match encode → (code stream uint8, literal bytes uint8)."""
    n = int(data.size)
    if n == 0:
        return np.zeros(0, dtype=np.uint8), np.zeros(0, dtype=np.uint8)
    best_code = np.full(n, -1, dtype=np.int64)
    best_len = np.ones(n, dtype=np.int64)
    for length, (vals, codes) in _build_matchers(table).items():
        g = _grams(data, length)
        pos = np.searchsorted(vals, g)
        pos = np.minimum(pos, len(vals) - 1)
        hit = vals[pos] == g
        upd = hit & (best_code[: g.size] < 0)
        best_code[: g.size][upd] = codes[pos[upd]]
        best_len[: g.size][upd] = length
    # greedy scan with jumps; iterations ≈ emitted tokens (plain-int loop)
    bc = best_code.tolist()
    bl = best_len.tolist()
    dl = data.tolist()
    out = bytearray()
    lit = bytearray()
    i = 0
    while i < n:
        c = bc[i]
        if c >= 0:
            out.append(c)
            i += bl[i]
        else:
            out.append(ESCAPE)
            lit.append(dl[i])
            i += 1
    return np.frombuffer(bytes(out), dtype=np.uint8), np.frombuffer(bytes(lit), dtype=np.uint8)


def fsst_decode_codes(codes: np.ndarray, lits: np.ndarray, table: list[bytes]) -> bytes:
    """Vectorized decode: scatter symbol bytes by cumulative offsets."""
    ncodes = int(codes.size)
    if ncodes == 0:
        return b""
    sym_len = np.ones(256, dtype=np.int64)
    sym_bytes = np.zeros((256, 8), dtype=np.uint8)
    for code, sym in enumerate(table):
        sym_len[code] = len(sym)
        sym_bytes[code, : len(sym)] = np.frombuffer(sym, dtype=np.uint8)
    lens = sym_len[codes]
    is_esc = codes == ESCAPE
    offs = np.concatenate(([0], np.cumsum(lens)))
    total = int(offs[-1])
    out = np.empty(total, dtype=np.uint8)
    # escapes: one literal byte each, in stream order
    if is_esc.any():
        out[offs[:-1][is_esc]] = lits[: int(is_esc.sum())]
    reg = ~is_esc
    if reg.any():
        rcodes = codes[reg]
        roffs = offs[:-1][reg]
        rlens = lens[reg]
        for j in range(8):
            m = rlens > j
            if not m.any():
                break
            out[roffs[m] + j] = sym_bytes[rcodes[m], j]
    return out.tobytes()


def _best_bytes_blob(data: bytes) -> bytes:
    from .numeric import encode_raw

    if len(data) < 64:
        return encode_raw(data)
    return min(encode_raw(data), encode_rans0(data), key=len)


def encode_fsst(data: bytes | np.ndarray, table: list[bytes] | None = None) -> bytes:
    """Self-describing FSST blob over a byte sequence."""
    arr = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    n = int(arr.size)
    if table is None:
        sample = arr if n <= 1 << 16 else arr[: 1 << 16]
        table = train_table(sample)
    codes, lits = fsst_encode_codes(arr, table)
    cb = _best_bytes_blob(codes.tobytes())
    lb = _best_bytes_blob(lits.tobytes())
    tab = b"".join(write_uvarint(len(s)) + s for s in table)
    payload = b"".join(
        (write_uvarint(len(table)), tab, write_uvarint(len(cb)), cb, lb)
    )
    return pack_blob("fsst", {"n": n}, payload)


def _decode_fsst(meta: dict, payload: memoryview) -> bytes:
    from .base import decode_blob

    nsym, pos = read_uvarint(payload, 0)
    table: list[bytes] = []
    for _ in range(nsym):
        slen, pos = read_uvarint(payload, pos)
        table.append(bytes(payload[pos : pos + slen]))
        pos += slen
    cblen, pos = read_uvarint(payload, pos)
    codes = np.frombuffer(decode_blob(payload[pos : pos + cblen]), dtype=np.uint8)
    lits = np.frombuffer(decode_blob(payload[pos + cblen :]), dtype=np.uint8)
    out = fsst_decode_codes(codes, lits, table)
    if len(out) != meta["n"]:
        raise CodecError("fsst length mismatch")
    return out


register(9, "fsst", _decode_fsst)
