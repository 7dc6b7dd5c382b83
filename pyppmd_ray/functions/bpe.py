"""Trained byte-pair-encoding tokenizer — the engine's batched-inference
archetype: TRAIN once on a driver-side sample (tokenizer training is a
small-memory, sequential algorithm by nature), APPLY distributed with the
merge table held once per actor/worker (the load-model-in-__init__
pattern; the table is broadcast via ray.put, never re-shipped per batch).

Deterministic GIVEN the sample: pair counts break ties
lexicographically, so the same texts always train the same merges.
Caveat: ``tokenize_bpe``'s default sample comes from Ray's streaming
``limit()``, which may return different leading rows at different
parallelism — pass ``sample_texts=`` (e.g. a direct pyarrow read) for
strict run-to-run determinism. Application is the classic greedy
lowest-rank merge loop. Not SQL-expressible (iterative merges) → the
query entry is rows-only by design, with unit tests pinning known
merges end-to-end.
"""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa

import ray
import ray.data as rd

from .broadcast import LazyBroadcast

_WORD_RE = re.compile(r"[^ \t\n\r]+")


def train_bpe(texts: list[str], n_merges: int = 256) -> list[tuple[str, str]]:
    """Classic BPE merge training over whitespace words (chars as base
    symbols, end-of-word marker '</w>'): repeatedly merge the most
    frequent adjacent symbol pair (ties → lexicographically smallest
    pair). Returns the ordered merge list."""
    word_freq: Counter = Counter()
    for t in texts:
        word_freq.update(_WORD_RE.findall(t or ""))
    # words as symbol tuples
    words = {w: (list(w) + ["</w>"], f) for w, f in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for sym, f in words.values():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_n)
        if best_n < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for w, (sym, f) in words.items():
            i = 0
            out = []
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = (out, f)
    return merges


def apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word → subword tokens."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


class BpeTokenizer(LazyBroadcast):
    """map_batches stage: the trained merge list is fetched from the
    object store ONCE per worker (LazyBroadcast); per-word results are
    cached per actor (hot words tokenize once). Emits
    (doc_id, n_bpe_tokens)."""

    _MAX_CACHE = 1 << 20

    def __init__(self, merges_ref):
        super().__init__(merges_ref)
        self._ranks: dict | None = None
        self._cache: dict[str, int] = {}

    def __getstate__(self):
        d = super().__getstate__()
        d["_ranks"] = None
        d["_cache"] = {}
        return d

    def _n_tokens(self, w: str) -> int:
        v = self._cache.get(w)
        if v is None:
            v = len(apply_bpe(w, self._ranks))
            if len(self._cache) < self._MAX_CACHE:
                self._cache[w] = v
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._ranks is None:
            merges = self.state
            self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        counts = []
        for t in batch["text"].to_pylist():
            counts.append(sum(self._n_tokens(w) for w in _WORD_RE.findall(t or "")))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )


def tokenize_bpe(
    ds: rd.Dataset, *, n_merges: int = 256, sample_rows: int = 512,
    sample_texts: list[str] | None = None, concurrency=None,
) -> rd.Dataset:
    """Train on a sample (driver-side — tokenizer training is inherently
    sequential and tiny), broadcast the merges once, apply distributed.
    Returns (doc_id, n_bpe_tokens). Pass ``sample_texts`` for a
    run-deterministic training set (Ray's limit() may sample different
    rows across runs/cluster sizes — see module docstring)."""
    if sample_texts is None:
        sample = ds.limit(sample_rows).take_batch(sample_rows, batch_format="pyarrow")
        sample_texts = sample["text"].to_pylist()
    merges = train_bpe(sample_texts, n_merges=n_merges)
    ref = ray.put(merges)
    if concurrency:
        return ds.map_batches(
            BpeTokenizer,
            fn_constructor_kwargs={"merges_ref": ref},
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    return ds.map_batches(BpeTokenizer(ref), batch_format="pyarrow")
