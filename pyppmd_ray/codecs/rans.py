"""Interleaved static rANS entropy coder (order-0), vectorized with numpy.

From-scratch design informed by the public rANS literature (Duda 2013,
"Asymmetric numeral systems"; the widely documented byte-oriented rANS
with interleaved lanes for SIMD decode). This replaces the reference's
per-byte adaptive range coder (`/root/reference/src/lib/ppmd/Ppmd7Enc.c:9-72`,
`Ppmd7Dec.c:9-64`) with a two-pass static model so both encode and decode
vectorize across N independent lanes — the symbol loop runs ``ceil(n/N)``
numpy steps instead of ``n`` Python steps.

Stream framing is explicit (lane count, length, freq table, final states in
the blob header) — the engine-wide answer to the reference's out-of-band
params + ``needs_input`` protocol (`/root/reference/README.rst:35-54`).

Layout: symbols are assigned round-robin to N lanes (symbol i → lane i%N,
step i//N). The decoder processes steps 0..T-1, lanes 0..N-1 within a step,
refilling from ONE shared byte stream; the encoder runs the exact time
reversal and assembles the stream so forward reads match.
"""

from __future__ import annotations

import numpy as np

from .base import CodecError, pack_blob, register

PROB_BITS = 12
M = 1 << PROB_BITS          # total of the quantized frequency table
RANS_L = 1 << 23            # lower bound of the state interval [L, 256*L)
_U32 = np.uint32
_U64 = np.uint64


def normalize_freqs(counts: np.ndarray) -> np.ndarray:
    """Quantize counts to sum exactly M, every present symbol >= 1."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        raise CodecError("empty frequency table")
    f = np.where(counts > 0, np.maximum(1, (counts * M) // total), 0).astype(np.int64)
    diff = M - int(f.sum())
    if diff != 0:
        # push the drift onto the largest symbols, keeping every freq >= 1
        order = np.argsort(-f, kind="stable")
        i = 0
        while diff != 0:
            j = order[i % len(order)]
            if f[j] > 0:
                step = 1 if diff > 0 else -1
                if f[j] + step >= 1:
                    f[j] += step
                    diff -= step
            i += 1
            if i > 10 * len(order) and diff != 0:
                raise CodecError("freq normalization failed")
    return f.astype(_U32)


def _lane_count(n: int) -> int:
    # states cost 4 bytes/lane; cap the header overhead at ~0.5%
    return max(1, min(2048, n // 800)) if n else 1


def rans_encode(symbols: np.ndarray, freqs: np.ndarray) -> tuple[bytes, np.ndarray, int]:
    """Encode uint8/uint16 symbols with quantized ``freqs`` (sum == M).

    Returns (stream_bytes, final_states_u32, n_lanes).
    """
    sym = np.ascontiguousarray(symbols)
    n = int(sym.size)
    N = _lane_count(n)
    f_tab = freqs.astype(_U32)
    start_tab = np.concatenate(([0], np.cumsum(f_tab)))[:-1].astype(_U32)

    states = np.full(N, RANS_L, dtype=_U32)
    T = -(-n // N) if n else 0
    chunks: list[np.ndarray] = []
    x_max_base = _U64((RANS_L >> PROB_BITS) << 8)

    for t in range(T - 1, -1, -1):
        idx = t * N + np.arange(N)
        active = idx < n
        s = sym[np.minimum(idx, n - 1)]
        f = f_tab[s].astype(_U64)
        st = start_tab[s].astype(_U64)
        x = states.astype(_U64)

        x_max = x_max_base * f
        c = np.zeros(N, dtype=np.int64)
        c[active & (x >= x_max)] = 1
        c[active & ((x >> _U64(8)) >= x_max)] = 2
        total = int(c.sum())
        if total:
            ofs = np.concatenate(([0], np.cumsum(c)))[:-1]
            chunk = np.empty(total, dtype=np.uint8)
            m1 = c >= 1
            m2 = c == 2
            # decode reads the last-emitted byte first → byte2 precedes byte1
            chunk[ofs[m2]] = ((x[m2] >> _U64(8)) & _U64(0xFF)).astype(np.uint8)
            chunk[ofs[m1] + (c[m1] - 1)] = (x[m1] & _U64(0xFF)).astype(np.uint8)
            x = x >> (_U64(8) * c.astype(_U64))
            chunks.append(chunk)
        else:
            chunks.append(np.empty(0, dtype=np.uint8))

        nx = ((x // f) << _U64(PROB_BITS)) + (x % f) + st
        states = np.where(active, nx, states.astype(_U64)).astype(_U32)

    chunks.reverse()
    stream = np.concatenate(chunks).tobytes() if chunks else b""
    return stream, states, N


def rans_decode(stream: memoryview | bytes, states: np.ndarray, N: int, n: int,
                freqs: np.ndarray) -> np.ndarray:
    """Inverse of :func:`rans_encode`; returns uint16 symbol array of length n."""
    f_tab = freqs.astype(_U32)
    start_tab = np.concatenate(([0], np.cumsum(f_tab)))[:-1].astype(_U32)
    slot2sym = np.repeat(
        np.arange(len(f_tab), dtype=np.uint16), f_tab.astype(np.int64)
    )
    if slot2sym.size != M:
        raise CodecError("corrupt frequency table")
    buf = np.frombuffer(stream, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint16)
    x = states.astype(_U64)
    ptr = 0
    T = -(-n // N) if n else 0
    mask = _U64(M - 1)

    for t in range(T):
        idx = t * N + np.arange(N)
        active = idx < n
        slot = (x & mask).astype(np.int64)
        s = slot2sym[slot]
        out[idx[active]] = s[active]
        f = f_tab[s].astype(_U64)
        st = start_tab[s].astype(_U64)
        nx = f * (x >> _U64(PROB_BITS)) + (x & mask) - st
        x = np.where(active, nx, x)

        c = np.zeros(N, dtype=np.int64)
        c[active & (x < _U64(RANS_L))] = 1
        c[active & (x < _U64(RANS_L >> 8))] = 2
        total = int(c.sum())
        if total:
            ofs = ptr + np.concatenate(([0], np.cumsum(c)))[:-1]
            m1 = c >= 1
            m2 = c == 2
            x1 = x.copy()
            b1 = buf[ofs[m1]].astype(_U64)
            x1[m1] = (x1[m1] << _U64(8)) | b1
            b2 = buf[ofs[m2] + 1].astype(_U64)
            x1[m2] = (x1[m2] << _U64(8)) | b2
            x = x1
            ptr += total
    return out


# ------------------------------------------------------------- blob codec

def encode_rans0(data: bytes | memoryview | np.ndarray) -> bytes:
    """Order-0 rANS over a byte sequence; self-describing blob."""
    arr = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    arr = arr.astype(np.uint8, copy=False)
    n = int(arr.size)
    if n == 0:
        return pack_blob("rans0", {"n": 0, "N": 1, "A": 0})
    counts = np.bincount(arr, minlength=1)
    A = int(counts.size)
    freqs = normalize_freqs(counts)
    stream, states, N = rans_encode(arr, freqs)
    from .numeric import pack_uints

    ftab = pack_uints(freqs.astype(_U64), 13)
    payload = ftab + states.astype("<u4").tobytes() + stream
    return pack_blob("rans0", {"n": n, "N": N, "A": A}, payload)


def _decode_rans0(meta: dict, payload: memoryview) -> bytes:
    n, N, A = meta["n"], meta["N"], meta["A"]
    if n == 0:
        return b""
    from .numeric import unpack_uints

    ftab_len = (A * 13 + 7) // 8
    freqs = unpack_uints(payload[:ftab_len], A, 13).astype(_U32)
    states = np.frombuffer(payload[ftab_len : ftab_len + 4 * N], dtype="<u4")
    stream = payload[ftab_len + 4 * N :]
    syms = rans_decode(stream, states, N, n, freqs)
    return syms.astype(np.uint8).tobytes()


register(8, "rans0", _decode_rans0)
