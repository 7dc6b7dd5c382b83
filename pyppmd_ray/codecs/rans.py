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
# u32 state, 16-bit renormalization: state in [L, 2^16*L); at most ONE
# u16 word emitted/consumed per symbol (vs up to two bytes in the classic
# byte-wise scheme) — halves the vector-op count per step. Requires every
# freq < M so that f << 20 fits in u32 (see cap_full_freq).
RANS_L = 1 << 16
_RENORM = 16
_U32 = np.uint32
_U64 = np.uint64


def normalize_freqs(counts: np.ndarray, m: int = M) -> np.ndarray:
    """Quantize counts to sum exactly ``m`` (default M), every present
    symbol >= 1."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        raise CodecError("empty frequency table")
    f = np.where(counts > 0, np.maximum(1, (counts * m) // total), 0).astype(np.int64)
    diff = m - int(f.sum())
    if diff > 0:
        # dump the whole surplus on the most frequent symbol
        f[int(np.argmax(f))] += diff
    elif diff < 0:
        # take from the largest symbols, each down to freq 1 at most
        for j in np.argsort(-f, kind="stable"):
            if diff == 0:
                break
            take = max(diff, 1 - int(f[j]))  # negative adjustment
            f[j] += take
            diff -= take
        if diff != 0:
            raise CodecError("freq normalization failed")
    return f.astype(_U32)


def cap_full_freq(f: np.ndarray, m: int = M) -> np.ndarray:
    """Ensure max freq <= m-1 (a single-symbol table would make the xmax
    shift overflow u32). Moves one count to a deterministic dummy slot — the
    decoder never sees its slots because the encoder never produces them."""
    j = int(np.argmax(f))
    if int(f[j]) == m:
        f = f.copy()
        f[j] = m - 1
        f[0 if j != 0 else 1] += 1
    return f


def _lane_count(n: int) -> int:
    # states cost 4 bytes/lane; bigger lanes = bigger numpy steps (the
    # per-step kernel overhead dominates below ~4k elements) at ~0.6%
    # header cost on large blocks
    return max(1, min(8192, n // 700)) if n else 1


def _division_magic(
    f_tab: np.ndarray, bound_log: int = 20
) -> tuple[np.ndarray, np.ndarray]:
    """Per-symbol (multiplier, shift) such that x // f == (x*m) >> s for
    every dividend the encoder can present (renorm keeps x < f·2^bound_log,
    where bound_log = 32 − prob_bits): s = bound_log + 2·ceil(log2 f),
    m = ceil(2^s / f). Exactness (Granlund & Montgomery, Thm 4.2):
    m·f − 2^s ≤ f−1 ≤ 2^s/B with B = f·2^bound_log ⇔
    f(f−1) ≤ 2^(2·ceil(log2 f)), true for all f; the u64 product is
    bounded by f·2^bound_log·2^s/f = 2^(bound_log+s) ≤ 2^(64−2(pb−L)) < 2^64
    since L = ceil(log2 f) ≤ prob_bits. Zero-freq slots (never encoded)
    get a dummy divisor of 1."""
    f = f_tab.astype(np.int64)
    safe = np.maximum(f, 1)
    l = np.zeros_like(safe)
    v = safe - 1
    while (v > 0).any():
        l[v > 0] += 1
        v >>= 1
    s = (bound_log + 2 * l).astype(_U64)
    m = ((np.int64(1) << (bound_log + 2 * l)).astype(np.uint64) + safe.astype(_U64) - _U64(1)) // safe.astype(_U64)
    return m, s


def rans_encode(
    symbols: np.ndarray,
    freqs: np.ndarray,
    prob_bits: int = PROB_BITS,
    n_lanes: int | None = None,
) -> tuple[bytes, np.ndarray, int]:
    """Encode uint8/uint16 symbols with quantized ``freqs`` (sum ==
    2^prob_bits, every freq <= 2^prob_bits - 1 — see :func:`cap_full_freq`).

    Round-robin lane layout (symbol i → lane i%N, step i//N) means only
    the FINAL decode step (= first encode step here) is partially active;
    every other step runs mask-free. Per-symbol (freq, start) arrays are
    gathered once up front. u32 states with 16-bit renorm: at most one
    u16 word per symbol, one compare per step.

    ``prob_bits`` may be raised (up to 16) for wide alphabets where the
    default 12-bit quantization is too coarse — e.g. the wtok token-id
    stream with thousands of symbols (see codecs/wtok.py).

    Returns (stream_bytes, final_states_u32, n_lanes).
    """
    sym = np.ascontiguousarray(symbols)
    n = int(sym.size)
    N = n_lanes if n_lanes is not None else _lane_count(n)
    f_tab = freqs.astype(_U32)
    start_tab = np.concatenate(([0], np.cumsum(f_tab)))[:-1].astype(_U32)
    fa = f_tab[sym]
    sa = start_tab[sym]
    m_tab, s_tab = _division_magic(f_tab, bound_log=32 - prob_bits)
    ma = m_tab[sym]
    sha = s_tab[sym]

    states = np.full(N, RANS_L, dtype=_U32)
    T = -(-n // N) if n else 0
    chunks: list[np.ndarray] = []
    shift = _U32(_RENORM)
    pbits = _U32(prob_bits)
    # f << (32-pb) == f * ((L >> prob_bits) << 16)
    xmax_shift = _U32(32 - prob_bits)
    w_mask = _U32(0xFFFF)

    for t in range(T - 1, -1, -1):
        lo = t * N
        f = fa[lo : lo + N]
        st = sa[lo : lo + N]
        x = states
        if f.size < N:  # only possible at t == T-1 (partial last step)
            x = states[: f.size]
        need = x >= (f << xmax_shift)
        if need.any():
            # decoder refills lanes in ascending order within the step
            chunks.append((x[need] & w_mask).astype(np.uint16))
            x = np.where(need, x >> shift, x)
        # exact division by magic multiply (numpy integer '//' is a scalar
        # loop; the renorm invariant x < f·2^20 bounds the dividend so the
        # u64 product cannot overflow — see _division_magic)
        q = ((x.astype(_U64) * ma[lo : lo + N]) >> sha[lo : lo + N]).astype(_U32)
        nx = (q << pbits) + (x - q * f) + st
        if nx.size < N:
            states = states.copy()
            states[: nx.size] = nx
        else:
            states = nx

    chunks.reverse()
    stream = np.concatenate(chunks).astype("<u2").tobytes() if chunks else b""
    return stream, states.astype(_U32), N


def rans_decode(stream: memoryview | bytes, states: np.ndarray, N: int, n: int,
                freqs: np.ndarray, prob_bits: int = PROB_BITS) -> np.ndarray:
    """Inverse of :func:`rans_encode`; returns uint16 symbol array of length n.

    Mask-free main loop: only the final step is partially active, and the
    output slice per step is contiguous (round-robin layout transposed)."""
    f_tab = freqs.astype(np.int64)
    start_tab = np.concatenate(([0], np.cumsum(f_tab)))[:-1].astype(np.int64)
    slot2sym = np.repeat(
        np.arange(len(f_tab), dtype=np.uint16), f_tab
    )
    if slot2sym.size != (1 << prob_bits):
        raise CodecError("corrupt frequency table")
    buf = np.frombuffer(stream, dtype="<u2")
    out = np.empty(n, dtype=np.uint16)
    x = states.astype(_U32).copy()
    ptr = 0
    T = -(-n // N) if n else 0
    mask = _U32((1 << prob_bits) - 1)
    shift = _U32(_RENORM)
    pbits = _U32(prob_bits)
    L = _U32(RANS_L)

    for t in range(T):
        lo = t * N
        if lo + N > n:  # partial final step
            x = x[: n - lo]
        slot = (x & mask).astype(np.int64)
        s = slot2sym[slot]
        out[lo : lo + s.size] = s
        f = f_tab[s].astype(_U32)
        st = start_tab[s].astype(_U32)
        x = f * (x >> pbits) + (x & mask) - st

        need = x < L
        total = int(need.sum())
        if total:
            w = buf[ptr : ptr + total].astype(_U32)
            x[need] = (x[need] << shift) | w
            ptr += total
    return out


# ---------------------------------------------------- size estimation

def estimate_rans_sizes(data: bytes | np.ndarray) -> tuple[int, int, int]:
    """(raw, ~rans0, ~rans1) encoded sizes from byte/bigram histograms —
    O(n) with two bincounts, no trial encodes. Estimates include header
    overheads; rans1 uses the ideal order-1 entropy × a small fudge for
    its 16-class context quantization."""
    arr = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    n = int(arr.size)
    if n == 0:
        return 0, 24, 42
    c0 = np.bincount(arr, minlength=256).astype(np.float64)
    p0 = c0[c0 > 0] / n
    h0 = float(-(p0 * np.log2(p0)).sum())
    A = int(arr.max()) + 1
    N = _lane_count(n)
    rans0 = int(n * h0 / 8) + (A * 13 + 7) // 8 + 4 * N + 24
    if n >= 4096:
        big = np.bincount(
            arr[:-1].astype(np.int64) * 256 + arr[1:], minlength=65536
        ).astype(np.float64)
        big = big[big > 0]
        pj = big / (n - 1)
        hj = float(-(pj * np.log2(pj)).sum())  # H(prev, cur)
        h1 = max(hj - h0, 0.1)
        rans1 = int(n * h1 * 1.06 / 8) + 16 * (A * 13 + 7) // 8 + 4 * N + 170
    else:
        rans1 = 1 << 60
    return n + 16, rans0, rans1


def best_entropy_blob(data: bytes) -> bytes:
    """Encode with raw/rans0/rans1, chosen by estimate — ONE encode total."""
    from .numeric import encode_raw

    raw_sz, r0_sz, r1_sz = estimate_rans_sizes(data)
    best = min((raw_sz, 0), (r0_sz, 1), (r1_sz, 2))[1]
    if best == 2:
        from .rans_ctx import encode_rans1

        return encode_rans1(data)
    if best == 1:
        blob = encode_rans0(data)
        if len(blob) < len(data) + 16:
            return blob
    return encode_raw(data)


# ------------------------------------------------------------- blob codec

def encode_rans0(data: bytes | memoryview | np.ndarray) -> bytes:
    """Order-0 rANS over a byte sequence; self-describing blob."""
    arr = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    arr = arr.astype(np.uint8, copy=False)
    n = int(arr.size)
    if n == 0:
        return pack_blob("rans0", {"n": 0, "N": 1, "A": 0})
    # minlength 2: single-symbol inputs need a dummy slot for cap_full_freq
    counts = np.bincount(arr, minlength=2)
    A = int(counts.size)
    freqs = cap_full_freq(normalize_freqs(counts))
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
