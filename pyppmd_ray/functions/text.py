"""Text-analysis stages for large-scale training-data pipelines.

All operate over the ``documents`` table shape (doc_id, text, lang, ...)
as vectorized ``map_batches`` callables. Stateful pieces (compiled
regexes, stopword tables) live in actor ``__init__`` — once per worker,
mirroring the reference's non-picklable-codec-state constraint
(`/root/reference/src/ext/_ppmdmodule.c:617-634`).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# whitespace class shared VERBATIM with the SQL oracle (regexp_split_to_array)
TOKEN_SPLIT_RE = r"[ \t\n\r]+"
# strip ONLY this char class (str.strip() would strip all Unicode whitespace,
# diverging from the oracle's trim(text, ' \t\n\r'))
TOKEN_STRIP_CHARS = " \t\n\r"

# tiny deterministic stopword profiles for the 5 testdata languages
_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "para", "que"},
    "zh": {"的", "是", "在", "了", "和", "有", "我", "不", "这", "个"},
}


class TokenCounter:
    """(doc_id, n_tokens) — token = maximal run of non-[ \\t\\n\\r]."""

    def __init__(self):
        self.splitter = re.compile(TOKEN_SPLIT_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized: n_tokens = (# of separator runs in trimmed text) + 1
        col = pc.fill_null(batch["text"], "")
        trimmed = pc.utf8_trim(col, characters=TOKEN_STRIP_CHARS)
        seps = pc.count_substring_regex(trimmed, TOKEN_SPLIT_RE)
        counts = pc.if_else(
            pc.equal(pc.utf8_length(trimmed), 0),
            pa.scalar(0, type=pa.int64()),
            pc.add(pc.cast(seps, pa.int64()), 1),
        )
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": counts})


# word char class for lang-id stopword matching — shared VERBATIM with the
# SQL oracle (regexp_extract_all(lower(...), LANG_WORD_RE)): ASCII letters
# plus the Latin-1/Latin-Extended lowercase block
LANG_WORD_RE = "[a-zà-öø-ÿ]+"
CJK_RANGE = ("一", "鿿")


class LangId:
    """n-gram/stopword heuristic language id → (doc_id, pred_lang, score).

    Deterministic and SQL-reproducible: CJK chars counted in the first 400
    codepoints (≥4 → zh); otherwise each language scores stopword hits over
    words of the first 2000 codepoints, argmax with ties broken by the
    fixed order de < en < es < fr."""

    LANG_ORDER = ("de", "en", "es", "fr")

    def __init__(self):
        self.word = re.compile(LANG_WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        lo, hi = CJK_RANGE
        for t in batch["text"].to_pylist():
            t = t or ""
            cjk = sum(1 for ch in t[:400] if lo <= ch <= hi)
            if cjk >= 4:
                preds.append("zh")
                scores.append(float(cjk))
                continue
            toks = self.word.findall(t[:2000].lower())
            best_lang, best = "", -1.0
            for lang in self.LANG_ORDER:
                sw = _STOPWORDS[lang]
                s = sum(1 for w in toks if w in sw)
                if s > best:
                    best_lang, best = lang, float(s)
            preds.append(best_lang)
            scores.append(best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds, type=pa.string()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )


# letter class for alpha_ratio — shared VERBATIM with the SQL oracle
# (Latin letters incl. accents + CJK; concrete so RE2 and Python agree)
ALPHA_RE = "[A-Za-zÀ-ÖØ-öø-ÿ一-鿿]"
PUNCT_RE = r"[.,;:!?'\"()\[\]{}]"


class QualityScorer:
    """Heuristic quality metrics per document: length, token count, mean
    token length, alpha ratio, punctuation ratio, stopword ratio. All
    ratios are raw IEEE doubles (no rounding — Python banker's rounding
    diverges from SQL round() at exact .5 ties) so the DuckDB oracle
    reproduces them bit-for-bit."""

    def __init__(self):
        self.splitter = re.compile(TOKEN_SPLIT_RE)
        self.alpha = re.compile(ALPHA_RE)
        self.punct = re.compile(PUNCT_RE)
        self.stop_all = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch["doc_id"].to_pylist(),
            "n_chars": [],
            "n_tokens": [],
            "mean_token_len": [],
            "alpha_ratio": [],
            "punct_ratio": [],
            "stopword_ratio": [],
        }
        for t in batch["text"].to_pylist():
            t = t or ""
            st = t.strip(TOKEN_STRIP_CHARS)
            toks = self.splitter.split(st) if st else []
            n = len(t)
            out["n_chars"].append(n)
            out["n_tokens"].append(len(toks))
            out["mean_token_len"].append(
                sum(len(w) for w in toks) / len(toks) if toks else 0.0
            )
            out["alpha_ratio"].append(len(self.alpha.findall(t)) / n if n else 0.0)
            out["punct_ratio"].append(len(self.punct.findall(t)) / n if n else 0.0)
            low = [w.lower() for w in toks]
            out["stopword_ratio"].append(
                sum(1 for w in low if w in self.stop_all) / len(low) if low else 0.0
            )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "n_chars": pa.array(out["n_chars"], type=pa.int64()),
                "n_tokens": pa.array(out["n_tokens"], type=pa.int64()),
                "mean_token_len": pa.array(out["mean_token_len"], type=pa.float64()),
                "alpha_ratio": pa.array(out["alpha_ratio"], type=pa.float64()),
                "punct_ratio": pa.array(out["punct_ratio"], type=pa.float64()),
                "stopword_ratio": pa.array(out["stopword_ratio"], type=pa.float64()),
            }
        )


# GPT-2-style pre-tokenizer, with CONCRETE character classes so Python's
# re and DuckDB's RE2 agree byte-for-byte (\p{L} is unsupported in Python
# re; both sides use this literal class instead)
_LETTER = "A-Za-zÀ-ÖØ-öø-ÿ一-鿿"
BPE_TOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    f"| ?[{_LETTER}]+"
    "| ?[0-9]+"
    f"| ?[^ \t\n\r{_LETTER}0-9]+"
    "|[ \t\n\r]+"
)


class BpeTokenCounter:
    """(doc_id, n_bpe_tokens) — GPT-2-style pre-tokenization count (the
    'BPE-ish regex' token estimate for training-data budgeting). Matches
    the DuckDB oracle's regexp_extract_all with the identical pattern."""

    def __init__(self):
        self.pat = re.compile(BPE_TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            len(self.pat.findall(t or "")) for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )


def sha256_hex_column(batch: pa.Table, column: str = "text") -> pa.Table:
    """(doc_id, fp) with fp = sha256 hex of the UTF-8 text — SQL-matched
    document fingerprint (DuckDB ``sha256(text)``)."""
    fps = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
        for t in batch[column].to_pylist()
    ]
    return pa.table({"doc_id": batch["doc_id"], "fp": pa.array(fps, type=pa.string())})


class WinnowFingerprinter:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    rolling k-gram hashes, minimum per window → compact doc sketch.
    Returns (doc_id, n_fp, fp_xor) — deterministic summary values."""

    def __init__(self, k: int = 8, window: int = 16):
        self.k = k
        self.window = window

    def _fingerprint(self, data: bytes) -> tuple[int, int]:
        a = np.frombuffer(data, dtype=np.uint8)
        k = self.k
        if a.size < k:
            return 0, 0
        n = a.size - k + 1
        g = np.zeros(n, dtype=np.uint64)
        prime = np.uint64(0x100000001B3)
        for j in range(k):
            g = g * prime + a[j : j + n].astype(np.uint64)
        w = min(self.window, n)
        from numpy.lib.stride_tricks import sliding_window_view

        mins = sliding_window_view(g, w).min(axis=1)
        sel = np.unique(mins)
        return int(sel.size), int(np.bitwise_xor.reduce(sel) & np.uint64(0x7FFFFFFFFFFFFFFF))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_fp, fp_xor = [], []
        for t in batch["text"].to_pylist():
            c, x = self._fingerprint((t or "").encode("utf-8"))
            n_fp.append(c)
            fp_xor.append(x)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fp": pa.array(n_fp, type=pa.int64()),
                "fp_xor": pa.array(fp_xor, type=pa.int64()),
            }
        )
