"""Rate-gated performance tests — the reference's own benchmark shape
(`/root/reference/tests/test_benchmark.py:12-14` computes
``rate = data_size / mean_seconds`` via a pytest hook,
`tests/conftest.py:2-7`) ported to the engine, so a committed perf
regression FAILS CI instead of only showing up as an artifact diff.

Floors are deliberately ~4× below the rates measured at the test
session's 4 cpus (flagship ~30 MB/s, fast path ~75 MB/s, decode
~50 MB/s on this hardware): this shared sandbox swings ±30-40% run to
run, and the gate must catch structural regressions (a kernel falling
off its vectorized path — the r3 fast-path artifact anomaly was 1.78×),
never co-tenancy noise. Each stage takes the best of 2 runs, like the
scaling protocol.

Also runnable alone: ``pytest -m bench``.
"""

from __future__ import annotations

import time

import pytest
import ray.data as rd

from pyppmd_ray.fixtures import source_table_path
from pyppmd_ray.pipelines import decode_dataset, encode_dataset

N_ROWS = 8000  # ≈22 MB — big enough to amortize pipeline latency at 4 cpus
REPS = 3

# MB/s floors. Sized to catch a kernel falling off its vectorized path
# (10×+, e.g. a per-row Python loop sneaking into encode) while NEVER
# tripping on sandbox noise: standalone this module measures
# ~30/75/50 MB/s, but inside the full 380-test suite co-tenant load has
# been observed to push the flagship as low as 6 MB/s (r5, twice) —
# a 5× swing that the old 4×-headroom floors (7/18/12) false-failed on.
FLOOR_ENCODE = 4.0
FLOOR_FAST = 10.0
FLOOR_DECODE = 7.0


def _best_rate(fn, bytes_in: int, reps: int = REPS) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return bytes_in / 1e6 / best


@pytest.fixture(scope="module")
def bench_input(ray_session):
    path = source_table_path(N_ROWS, seed=42)
    enc = encode_dataset(
        rd.read_parquet(path), target_block_bytes=4 << 20
    ).materialize()
    stats = enc.to_pandas()
    return path, enc, int(stats["uncompressed_bytes"].sum())


@pytest.mark.bench
def test_flagship_encode_rate(bench_input):
    path, _, bytes_in = bench_input
    rate = _best_rate(
        lambda: encode_dataset(
            rd.read_parquet(path), target_block_bytes=4 << 20
        ).materialize(),
        bytes_in,
    )
    assert rate >= FLOOR_ENCODE, f"flagship encode {rate:.1f} MB/s < {FLOOR_ENCODE}"


@pytest.mark.bench
def test_fast_path_encode_rate(bench_input):
    path, _, bytes_in = bench_input
    hints = {
        "content": {"layout": "strs", "data_codec": "rans0"},
        "path": {"layout": "strs", "data_codec": "rans0"},
        "repo": {"layout": "sdict", "data_codec": "raw"},
        "lang": {"layout": "sdict", "data_codec": "raw"},
        "commit": {"layout": "sdict", "data_codec": "raw"},
    }
    rate = _best_rate(
        lambda: encode_dataset(
            rd.read_parquet(path), target_block_bytes=4 << 20, hints=hints
        ).materialize(),
        bytes_in,
    )
    assert rate >= FLOOR_FAST, f"fast-path encode {rate:.1f} MB/s < {FLOOR_FAST}"


@pytest.mark.bench
def test_decode_rate(bench_input):
    _, enc, bytes_in = bench_input
    rate = _best_rate(lambda: decode_dataset(enc).count(), bytes_in)
    assert rate >= FLOOR_DECODE, f"decode {rate:.1f} MB/s < {FLOOR_DECODE}"
