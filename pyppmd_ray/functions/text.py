"""Text-analysis stages for large-scale training-data pipelines.

All operate over the ``documents`` table shape (doc_id, text, lang, ...)
as vectorized ``map_batches`` callables. Stateful pieces (compiled
regexes, stopword tables) live in actor ``__init__`` — once per worker,
mirroring the reference's non-picklable-codec-state constraint
(`/root/reference/src/ext/_ppmdmodule.c:617-634`).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pyppmd_ray.functions.hashing import sha256_hex

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


def token_counts(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized whitespace token counts — THE engine's single token
    definition (token = maximal run of non-[ \\t\\n\\r]), shared by
    TokenCounter, QualityScorer and pack_sequences so the three can never
    drift from each other or from the SQL oracle expression."""
    col = pc.fill_null(col, "")
    trimmed = pc.utf8_trim(col, characters=TOKEN_STRIP_CHARS)
    seps = np.asarray(pc.count_substring_regex(trimmed, TOKEN_SPLIT_RE), dtype=np.int64)
    tlen = np.asarray(pc.utf8_length(trimmed), dtype=np.int64)
    return np.where(tlen == 0, 0, seps + 1)


class TokenCounter:
    """(doc_id, n_tokens) — token = maximal run of non-[ \\t\\n\\r]."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(token_counts(batch["text"]), type=pa.int64()),
            }
        )


# word char class for lang-id stopword matching — shared VERBATIM with the
# SQL oracle (regexp_extract_all(lower(...), LANG_WORD_RE)): ASCII letters
# plus the Latin-1/Latin-Extended lowercase block
LANG_WORD_RE = "[a-zà-öø-ÿ]+"
CJK_RANGE = ("一", "鿿")


def _token_match_counts(
    base: pa.Array, sep_class: str, words: set[str]
) -> np.ndarray:
    """Per-row count of tokens (maximal non-``sep_class`` runs of ``base``)
    that EXACTLY equal one of ``words`` — fully vectorized.

    Trick: separator runs become DOUBLE spaces and the string is padded,
    so the non-overlapping regex scan of ``" (?:w1|w2|...) "`` can claim a
    boundary space on each side of every token without starving its
    neighbor (RE2 has no lookahead, so boundary spaces must be consumed)."""
    norm = pc.replace_substring_regex(base, sep_class + "+", "  ")
    padded = pc.binary_join_element_wise(pa.scalar("  "), norm, pa.scalar("  "), "")
    alt = " (?:" + "|".join(sorted(words)) + ") "
    return np.asarray(pc.count_substring_regex(padded, alt), dtype=np.int64)


class LangId:
    """n-gram/stopword heuristic language id → (doc_id, pred_lang, score).

    Deterministic and SQL-reproducible: CJK chars counted in the first 400
    codepoints (≥4 → zh); otherwise each language scores stopword hits over
    words of the first 2000 codepoints, argmax with ties broken by the
    fixed order de < en < es < fr. Vectorized: one Arrow kernel pass per
    language (doubled-separator token matching) instead of a Python loop
    per row."""

    LANG_ORDER = ("de", "en", "es", "fr")

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch["text"], "")
        lo, hi = CJK_RANGE
        head = pc.utf8_slice_codeunits(col, 0, 400)
        cjk = np.asarray(
            pc.count_substring_regex(head, f"[{lo}-{hi}]"), dtype=np.int64
        )
        body = pc.utf8_lower(pc.utf8_slice_codeunits(col, 0, 2000))
        # word tokens = maximal runs of the word class; separators = the
        # complement class (same construction the per-row findall used)
        scores = np.stack(
            [
                _token_match_counts(body, "[^a-zà-öø-ÿ]", _STOPWORDS[lang])
                for lang in self.LANG_ORDER
            ]
        ).astype(np.float64)  # (4, n)
        best_idx = np.argmax(scores, axis=0)  # first max wins = fixed order
        n = len(col)
        best = scores[best_idx, np.arange(n)]
        langs = np.array(self.LANG_ORDER)
        preds = langs[best_idx].astype(object)
        is_zh = cjk >= 4
        preds[is_zh] = "zh"
        out_score = np.where(is_zh, cjk.astype(np.float64), best)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(preds.tolist(), type=pa.string()),
                "score": pa.array(out_score, type=pa.float64()),
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
    reproduces them bit-for-bit.

    Fully vectorized (Arrow kernels end-to-end): char/alpha/punct counts
    via ``count_substring_regex`` single-char classes; token count/length
    from separator-run counts; stopword hits via the doubled-separator
    exact-token match (:func:`_token_match_counts`). Same IEEE divisions
    as the former per-row loop, so values are bit-identical."""

    def __init__(self):
        self.stop_all = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch["text"], "")
        n = np.asarray(pc.utf8_length(col), dtype=np.int64)
        trimmed = pc.utf8_trim(col, characters=TOKEN_STRIP_CHARS)
        tlen = np.asarray(pc.utf8_length(trimmed), dtype=np.int64)
        sep_chars = np.asarray(
            pc.count_substring_regex(trimmed, "[ \t\n\r]"), dtype=np.int64
        )
        n_tokens = token_counts(col)  # the shared token definition
        sum_tok_len = tlen - sep_chars  # token chars = trimmed minus separators
        alpha = np.asarray(pc.count_substring_regex(col, ALPHA_RE), dtype=np.int64)
        punct = np.asarray(pc.count_substring_regex(col, PUNCT_RE), dtype=np.int64)
        stop_hits = _token_match_counts(
            pc.utf8_lower(trimmed), "[ \t\n\r]", self.stop_all
        )
        nt = n_tokens.astype(np.float64)
        nf = n.astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean_tok = np.where(n_tokens > 0, sum_tok_len / nt, 0.0)
            alpha_ratio = np.where(n > 0, alpha / nf, 0.0)
            punct_ratio = np.where(n > 0, punct / nf, 0.0)
            stop_ratio = np.where(n_tokens > 0, stop_hits / nt, 0.0)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "n_chars": pa.array(n, type=pa.int64()),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "mean_token_len": pa.array(mean_tok, type=pa.float64()),
                "alpha_ratio": pa.array(alpha_ratio, type=pa.float64()),
                "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
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
        self.pat = re.compile(BPE_TOKEN_RE)  # kept for count_one / debugging

    def count_one(self, text: str) -> int:
        return len(self.pat.findall(text or ""))

    def __call__(self, batch: pa.Table) -> pa.Table:
        # one RE2 C kernel per batch (non-overlapping match count ==
        # len(findall): the pattern's ordered alternation reads the same
        # under Python re and RE2 — the classes are concrete literals)
        counts = pc.count_substring_regex(
            pc.fill_null(batch["text"], ""), BPE_TOKEN_RE
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bpe_tokens": counts.cast(pa.int64()),
            }
        )


def sha256_hex_column(batch: pa.Table, column: str = "text") -> pa.Table:
    """(doc_id, fp) with fp = sha256 hex of the UTF-8 text — SQL-matched
    document fingerprint (DuckDB ``sha256(text)``)."""
    return pa.table({"doc_id": batch["doc_id"], "fp": sha256_hex(batch[column])})


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


# --------------------------------------------------------- PII curation

# Concrete RE2-safe patterns shared VERBATIM with the SQL oracle (no
# lookarounds — RE2/DuckDB compatible; boundaries are explicit classes)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = (
    r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
)
PII_PHONE_RE = r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}"


class PiiScanner:
    """(doc_id, n_emails, n_ipv4, n_phones) — per-document PII hit counts
    via vectorized Arrow regex kernels; the standard pre-training privacy
    screen (flag or route documents before redaction)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch["text"], "")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pc.cast(
                    pc.count_substring_regex(col, PII_EMAIL_RE), pa.int64()
                ),
                "n_ipv4": pc.cast(
                    pc.count_substring_regex(col, PII_IPV4_RE), pa.int64()
                ),
                "n_phones": pc.cast(
                    pc.count_substring_regex(col, PII_PHONE_RE), pa.int64()
                ),
            }
        )


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace PII spans with typed placeholder tokens — one vectorized
    replace_substring_regex pass per category, same non-overlapping scan
    DuckDB's regexp_replace(..., 'g') performs, so the redacted text is
    SQL-reproducible byte-for-byte."""
    col = pc.fill_null(batch[text_col], "")
    col = pc.replace_substring_regex(col, PII_EMAIL_RE, "<EMAIL>")
    col = pc.replace_substring_regex(col, PII_IPV4_RE, "<IP>")
    col = pc.replace_substring_regex(col, PII_PHONE_RE, "<PHONE>")
    i = batch.schema.get_field_index(text_col)
    return batch.set_column(i, text_col, col)


def _term_partials(batch: pa.Table) -> pa.Table:
    """Per-batch (term, df, tf) partials — fully Arrow/numpy vectorized.

    Tokenization is THE engine token definition (trim + split on
    [ \\t\\n\\r]+), shared verbatim with the SQL oracle's
    regexp_split_to_array. df partials sum correctly across batches
    because a document lives entirely inside one batch."""
    txt = pc.fill_null(batch["text"], "")
    trimmed = pc.utf8_trim(txt, characters=TOKEN_STRIP_CHARS)
    nonempty = pc.not_equal(trimmed, "")
    trimmed = trimmed.filter(nonempty) if isinstance(trimmed, pa.ChunkedArray) else trimmed.filter(nonempty)
    empty = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
            "tf": pa.array([], type=pa.int64()),
        }
    )
    if len(trimmed) == 0:
        return empty
    lists = pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    n_docs = len(lists)
    doc_idx = np.repeat(
        np.arange(n_docs, dtype=np.int64),
        np.asarray(pc.list_value_length(lists), dtype=np.int64),
    )
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = len(d.dictionary)
    if V == 0:
        return empty
    tf = np.bincount(codes, minlength=V)
    pair_codes = np.unique(codes * np.int64(n_docs) + doc_idx) // np.int64(n_docs)
    df = np.bincount(pair_codes, minlength=V)
    return pa.table(
        {
            "term": d.dictionary,
            "df": pa.array(df, type=pa.int64()),
            "tf": pa.array(tf, type=pa.int64()),
        }
    )


def term_doc_freq(ds: rd.Dataset) -> rd.Dataset:
    """Corpus term statistics → Dataset(term, df, tf): document frequency
    and total term frequency per distinct whitespace token — the
    IDF-table builder for TF-IDF-style quality scoring at corpus scale.

    Pre-aggregate discipline: each batch reduces its tokens to distinct
    (term, df, tf) partials BEFORE the shuffle, so all-to-all volume is
    per-batch-distinct terms (Zipf: ≪ token count), then one
    ``groupby(term).sum`` — the driver never sees the token stream."""
    from ray.data.aggregate import Sum

    parts = ds.map_batches(_term_partials, batch_format="pyarrow")
    return parts.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("tf", alias_name="tf")
    )


def doc_rare_terms(ds, max_df: int = 10, k: int = 3, *, max_df_frac: float | None = None):
    """Per-document distinctive terms: the top-``k`` most frequent terms
    in each document among terms whose corpus document-frequency is
    <= ``max_df`` (ties broken by term ascending). The rare-term
    profiling step of a TF-IDF-style curation pass — "what is this
    document about" — emitted as Dataset(doc_id, term, tf).

    Scale shape: filtering needs only MEMBERSHIP in the rare set, and
    its complement (df > max_df) is the Zipf HEAD — bounded by
    total_(doc,term)_pairs / max_df distinct terms. So the common-term
    set is computed by :func:`term_doc_freq` (pre-aggregated shuffle over
    per-batch partials), collected once, and broadcast via the object
    store; the per-document term counts and the top-k selection then run
    entirely map-side (a document lives inside one row), with NO
    per-document shuffle. Per-batch work is Arrow dictionary_encode +
    one lexsort.

    **At 100-TB scale use ``max_df_frac``, not an absolute ``max_df``:**
    with a FIXED max_df the head bound pairs/max_df grows linearly with
    the corpus and eventually exceeds broadcastable size, while
    ``max_df_frac=f`` sets max_df = ceil(f × n_docs) so the head is at
    most avg_terms_per_doc / f terms — a constant independent of corpus
    size (e.g. f=0.001, 500 terms/doc → ≤ 500k head terms).
    """
    import ray

    from pyppmd_ray.functions.broadcast import LazyBroadcast

    if max_df_frac is not None:
        if not 0.0 < max_df_frac <= 1.0:
            raise ValueError(f"max_df_frac must be in (0, 1], got {max_df_frac}")
        n_docs = ds.count()
        max_df = max(1, int(np.ceil(max_df_frac * n_docs)))
    common = term_doc_freq(ds.select_columns(["doc_id", "text"]))
    common = common.filter(expr=f"df > {int(max_df)}")
    # the Zipf head is small by construction (df > max_df ⇒ at most
    # total_tokens/max_df distinct terms) — safe to assemble and
    # broadcast once; everything per-document stays map-side
    from pyppmd_ray.functions.collect import collect_table

    head = collect_table(
        common.select_columns(["term"]),
        empty=pa.table({"term": pa.array([], type=pa.string())}),
    )
    bcast = LazyBroadcast(ray.put(head["term"].combine_chunks()))

    def per_doc(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=batch["doc_id"].type),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
            }
        )
        txt = pc.fill_null(batch["text"], "")
        trimmed = pc.utf8_trim(txt, characters=TOKEN_STRIP_CHARS)
        nonempty = np.asarray(pc.not_equal(trimmed, ""))
        if not nonempty.any():
            return empty
        doc_ids = batch["doc_id"].combine_chunks().filter(pa.array(nonempty))
        trimmed = trimmed.filter(pa.array(nonempty))
        lists = pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        doc_idx = np.repeat(
            np.arange(len(lists), dtype=np.int64),
            np.asarray(pc.list_value_length(lists), dtype=np.int64),
        )
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = len(d.dictionary)
        if V == 0:
            return empty
        # (doc, term) counts via one bincount over packed pair codes
        pair = doc_idx * np.int64(V) + codes
        upair, tf = np.unique(pair, return_counts=True)
        pdoc = upair // np.int64(V)
        pterm = (upair % np.int64(V)).astype(np.int64)
        # drop common (Zipf-head) terms — membership against the broadcast set
        keep = ~np.asarray(
            pc.is_in(pc.take(d.dictionary, pa.array(pterm)), value_set=bcast.state)
        )
        if not keep.any():
            return empty
        pdoc, pterm, tf = pdoc[keep], pterm[keep], tf[keep]
        terms = pc.take(d.dictionary, pa.array(pterm)).cast(pa.string())
        # top-k per doc by (tf desc, term asc): tie-break on the term's
        # LEXICOGRAPHIC rank (computed once over the D-sized dictionary,
        # not the pair stream) so the lexsort stays all-integer
        lex_rank = np.empty(V, dtype=np.int64)
        lex_rank[np.asarray(pc.sort_indices(d.dictionary), dtype=np.int64)] = np.arange(
            V, dtype=np.int64
        )
        order = np.lexsort((lex_rank[pterm], -tf, pdoc))
        sdoc = pdoc[order]
        starts = np.flatnonzero(np.r_[True, sdoc[1:] != sdoc[:-1]])
        rank = np.arange(sdoc.size, dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, sdoc.size))
        )
        sel = order[rank < k]
        return pa.table(
            {
                "doc_id": pc.take(doc_ids, pa.array(pdoc[sel])),
                "term": pc.take(terms, pa.array(sel)),
                "tf": pa.array(tf[sel], type=pa.int64()),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        per_doc, batch_format="pyarrow"
    )


def _flat_tokens(texts):
    """Tokenize a text column ONCE: trim + whitespace split (THE engine
    token definition), returning ``(flat, row_idx)`` — the flat token
    array and each token's LOCAL row index. All-whitespace rows
    contribute no tokens. The n-gram views of a batch derive from this
    single pass via :func:`_ngrams_from_tokens`."""
    trimmed = pc.utf8_trim(pc.fill_null(texts, ""), characters=TOKEN_STRIP_CHARS)
    lists = pc.split_pattern_regex(trimmed, TOKEN_SPLIT_RE)
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = pc.list_flatten(lists)
    lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
    # an all-whitespace row still splits to [""] — drop those tokens'
    # rows by treating them as length 0 via the empty-trimmed mask
    empty_rows = np.asarray(pc.equal(trimmed, ""), dtype=bool)
    row_idx = np.repeat(np.arange(len(lists), dtype=np.int64), lens)
    keep_tok = ~empty_rows[row_idx]
    if not keep_tok.all():
        flat = flat.filter(pa.array(keep_tok))
        row_idx = row_idx[keep_tok]
    return flat, row_idx


def _ngrams_from_tokens(flat, row_idx: np.ndarray, n: int):
    """Word n-gram windows over an already-tokenized batch: n shifted
    zero-copy slices of the flat token array joined by one Arrow
    ``binary_join_element_wise`` kernel call, with windows that would
    cross a row boundary masked out. Returns ``(grams, window_row_idx)``.
    No per-row Python loop."""
    m = len(flat)
    if m < n:
        return pa.array([], type=pa.string()), np.empty(0, dtype=np.int64)
    w = m - n + 1
    valid = row_idx[:w] == row_idx[n - 1 :]
    parts = [flat.slice(j, w) for j in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    if not valid.all():
        grams = grams.filter(pa.array(valid))
    return grams, row_idx[:w][valid]


def _word_ngrams(texts, n: int):
    """Vectorized word n-gram extraction over a column of texts —
    :func:`_flat_tokens` + :func:`_ngrams_from_tokens` in one call for
    operators that need a single n."""
    flat, row_idx = _flat_tokens(texts)
    return _ngrams_from_tokens(flat, row_idx, n)


def _dup_stats(keys: pa.Array, row_idx: np.ndarray, n_rows: int):
    """Per-row (total, distinct, max_count) over a flat key stream —
    one dictionary_encode + one np.unique over packed (row, code) pairs;
    no per-row loop. Rows with no keys get zeros."""
    if len(keys) == 0:
        z = np.zeros(n_rows, dtype=np.int64)
        return z, z.copy(), z.copy()
    d = keys.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    V = max(len(d.dictionary), 1)
    total = np.bincount(row_idx, minlength=n_rows)
    pair, cnt = np.unique(row_idx * np.int64(V) + codes, return_counts=True)
    pdoc = pair // np.int64(V)  # sorted ascending -> grouped by row
    distinct = np.bincount(pdoc, minlength=n_rows)
    mx = np.zeros(n_rows, dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, pdoc[1:] != pdoc[:-1]])
    mx[pdoc[starts]] = np.maximum.reduceat(cnt, starts)
    return total, distinct, mx


def repetition_scores(ds: rd.Dataset) -> rd.Dataset:
    """Gopher-style repetition quality signals per document —
    Dataset(doc_id, n_tokens, dup_token_frac, top_token_frac,
    dup_2gram_frac, dup_5gram_frac). High duplicate-n-gram fractions
    mark boilerplate/spam for the quality-filter stage (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition filters).

    dup_k_frac = 1 - distinct_kgrams/total_kgrams (0 when no windows);
    top_token_frac = max token count / n_tokens. Entirely map-side
    (a document lives in one row; zero shuffle), one dictionary_encode
    + packed-pair np.unique per signal — no per-row Python loop.
    """

    def scores(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        # tokenize ONCE; the 1/2/5-gram views all derive from the same
        # flat token array (the regex split is the dominant kernel here)
        flat, row_idx = _flat_tokens(batch["text"])
        t_total, t_distinct, t_mx = _dup_stats(flat, row_idx, n_rows)
        g2, g2_row = _ngrams_from_tokens(flat, row_idx, 2)
        g2_total, g2_distinct, _ = _dup_stats(g2, g2_row, n_rows)
        g5, g5_row = _ngrams_from_tokens(flat, row_idx, 5)
        g5_total, g5_distinct, _ = _dup_stats(g5, g5_row, n_rows)

        def dup_frac(total, distinct):
            out = np.zeros(len(total), dtype=np.float64)
            nz = total > 0
            # mirror the SQL oracle expression exactly:
            # 1.0 - CAST(distinct AS DOUBLE) / CAST(total AS DOUBLE)
            out[nz] = 1.0 - distinct[nz].astype(np.float64) / total[nz].astype(
                np.float64
            )
            return out

        top_frac = np.zeros(n_rows, dtype=np.float64)
        nz = t_total > 0
        top_frac[nz] = t_mx[nz].astype(np.float64) / t_total[nz].astype(np.float64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(t_total, type=pa.int64()),
                "dup_token_frac": pa.array(dup_frac(t_total, t_distinct)),
                "top_token_frac": pa.array(top_frac),
                "dup_2gram_frac": pa.array(dup_frac(g2_total, g2_distinct)),
                "dup_5gram_frac": pa.array(dup_frac(g5_total, g5_distinct)),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        scores, batch_format="pyarrow"
    )


def ngram_counts(ds: rd.Dataset, n: int = 2) -> rd.Dataset:
    """Corpus word n-gram statistics → Dataset(gram, df, tf): document
    frequency and total occurrence count per distinct n-gram — the
    n-gram generalization of :func:`term_doc_freq` (LM count tables,
    collocation mining, contamination-threshold calibration).

    Same pre-aggregate discipline: each batch reduces its windows to
    distinct (gram, df, tf) partials BEFORE the shuffle (windows from
    the shifted-slice ``binary_join_element_wise`` kernel, counts from
    one packed-pair ``np.unique``), then one ``groupby(gram).sum`` —
    all-to-all volume is per-batch-distinct grams, never the window
    stream."""
    from ray.data.aggregate import Sum

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    empty = pa.table(
        {
            "gram": pa.array([], type=pa.string()),
            "df": pa.array([], type=pa.int64()),
            "tf": pa.array([], type=pa.int64()),
        }
    )

    def partials(batch: pa.Table) -> pa.Table:
        grams, widx = _word_ngrams(batch["text"], n)
        if len(grams) == 0:
            return empty
        d = grams.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = len(d.dictionary)
        tf = np.bincount(codes, minlength=V)
        n_rows = int(widx.max()) + 1
        pair_codes = np.unique(codes * np.int64(n_rows) + widx) // np.int64(n_rows)
        df = np.bincount(pair_codes, minlength=V)
        return pa.table(
            {
                "gram": d.dictionary.cast(pa.string()),
                "df": pa.array(df, type=pa.int64()),
                "tf": pa.array(tf, type=pa.int64()),
            }
        )

    parts = ds.select_columns(["doc_id", "text"]).map_batches(
        partials, batch_format="pyarrow"
    )
    return parts.groupby("gram").aggregate(
        Sum("df", alias_name="df"), Sum("tf", alias_name="tf")
    )


def chunk_documents(ds: rd.Dataset, max_tokens: int = 512) -> rd.Dataset:
    """Split every document into consecutive chunks of at most
    ``max_tokens`` whitespace tokens — Dataset(doc_id, chunk_id, text,
    n_tokens), the 1→N explode that precedes sequence packing in a
    training-data pipeline (long docs must be cut to the context budget
    before :func:`~pyppmd_ray.functions.sequence.pack_sequences`).

    Chunk text is the token window re-joined with single spaces (the
    same normalization as the SQL oracle's ``array_to_string``).
    Entirely map-side: chunk windows are zero-copy
    ``ListArray.from_arrays`` offsets into the batch's flat token
    array (chunks tile the token stream, so window ends ARE the next
    window's starts), joined by one Arrow ``binary_join`` kernel — no
    per-row loop, no shuffle, output fans out within the batch.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")

    def chunks(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=batch["doc_id"].type),
                "chunk_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
        trimmed = pc.utf8_trim(
            pc.fill_null(batch["text"], ""), characters=TOKEN_STRIP_CHARS
        )
        nonempty = np.asarray(pc.not_equal(trimmed, ""), dtype=bool)
        if not nonempty.any():
            return empty
        mask = pa.array(nonempty)
        doc_ids = batch["doc_id"].combine_chunks().filter(mask)
        lists = pc.split_pattern_regex(trimmed.filter(mask), TOKEN_SPLIT_RE)
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        lens = np.asarray(pc.list_value_length(lists), dtype=np.int64)
        tok_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        n_chunks = -(-lens // max_tokens)  # ceil; lens >= 1 here
        doc_of_chunk = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
        first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        chunk_id = np.arange(doc_of_chunk.size, dtype=np.int64) - first[doc_of_chunk]
        starts = tok_start[doc_of_chunk] + chunk_id * max_tokens
        ends = np.minimum(starts + max_tokens, tok_start[doc_of_chunk] + lens[doc_of_chunk])
        # chunks tile the flat token array: ends[i] == starts[i+1]
        offsets = pa.array(
            np.append(starts, len(flat)).astype(np.int32), type=pa.int32()
        )
        windows = pa.ListArray.from_arrays(offsets, flat)
        return pa.table(
            {
                "doc_id": pc.take(doc_ids, pa.array(doc_of_chunk)),
                "chunk_id": pa.array(chunk_id, type=pa.int64()),
                "text": pc.binary_join(windows, " "),
                "n_tokens": pa.array(ends - starts, type=pa.int64()),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow"
    )


def reassemble_chunks(
    ds: rd.Dataset,
    key: str = "doc_id",
    order_col: str = "chunk_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Inverse of :func:`chunk_documents`: stitch each document's chunks
    back together in ``order_col`` order — Dataset(doc_id, text,
    n_chunks). The ordered-reassembly step after chunk-level processing
    (per-chunk scoring/filtering/inference) when the downstream stage
    needs whole documents again.

    Shape: one hash-partitioned ``groupby(key)`` (the only shuffle);
    per-group work is a sort_indices + take + one ``binary_join`` —
    chunk order is made explicit by ``order_col``, so reassembly is
    deterministic regardless of block arrival order. Partitioning
    assumption (same as :func:`~pyppmd_ray.functions.relational.asof_join`):
    one document's chunks fit in a worker.
    """
    from pyppmd_ray.functions.relational import _streaming_map_groups

    sch = ds.schema()
    if sch is None or key not in sch.names:
        raise ValueError(
            f"reassemble_chunks requires a known schema containing {key!r}"
        )
    key_type = sch.types[sch.names.index(key)]

    def merge(group: pa.Table):
        idx = pc.sort_indices(group[order_col])
        txt = pc.take(
            pc.fill_null(group[text_col].combine_chunks(), ""), idx
        )
        windows = pa.ListArray.from_arrays(
            pa.array([0, len(txt)], type=pa.int32()), txt
        )
        yield pa.table(
            {
                key: pa.array([group[key][0].as_py()], type=group[key].type),
                "text": pc.binary_join(windows, " "),
                "n_chunks": pa.array([group.num_rows], type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            key: pa.array([], type=key_type),
            "text": pa.array([], type=pa.string()),
            "n_chunks": pa.array([], type=pa.int64()),
        }
    )
    return _streaming_map_groups(
        ds.select_columns([key, order_col, text_col]), [key], merge, empty_table=empty
    )


def benchmark_gram_broadcast(benchmark: rd.Dataset, n: int):
    """Reduce a benchmark corpus to its distinct word n-gram set
    (per-batch ``unique`` partials → one driver collect → one
    ``ray.put``) and return a :class:`LazyBroadcast` over it — the
    shared setup for :func:`contamination` and the composed
    curation pipeline's decontamination gate."""
    import ray

    from pyppmd_ray.functions.broadcast import LazyBroadcast
    from pyppmd_ray.functions.collect import collect_table

    def bench_grams(batch: pa.Table) -> pa.Table:
        g, _ = _word_ngrams(batch["text"], n)
        return pa.table({"gram": pc.unique(g)})

    tbl = collect_table(
        benchmark.select_columns(["text"]).map_batches(
            bench_grams, batch_format="pyarrow"
        ),
        empty=pa.table({"gram": pa.array([], type=pa.string())}),
    )
    gram_set = pc.unique(tbl["gram"].combine_chunks())
    return LazyBroadcast(ray.put(gram_set))


def contamination(
    ds: rd.Dataset, benchmark: rd.Dataset, n: int = 5
) -> rd.Dataset:
    """Benchmark decontamination scan: for every document, how many of
    its word ``n``-grams appear in the ``benchmark`` corpus —
    Dataset(doc_id, n_grams, n_hits, contaminated). The
    eval-set-leakage gate every LLM training pipeline runs before
    training (flag/drop docs overlapping test sets).

    Scale shape — ZERO shuffle: the benchmark (eval suites: MBs, the
    small side by definition) is reduced to its distinct n-gram set
    with per-batch ``unique`` partials, collected once, and broadcast
    via ``ray.put``; the 100-TB documents side is then a pure map-side
    pass (n-gram windows from shifted token slices + one ``is_in``
    membership kernel + a per-doc bincount). No groupby anywhere — a
    document's count completes inside its own batch.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bcast = benchmark_gram_broadcast(benchmark, n)

    def flag(batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        n_grams = np.zeros(n_rows, dtype=np.int64)
        n_hits = np.zeros(n_rows, dtype=np.int64)
        grams, widx = _word_ngrams(batch["text"], n)
        if len(grams):
            n_grams = np.bincount(widx, minlength=n_rows)
            if len(bcast.state):
                hit = np.asarray(
                    pc.is_in(grams, value_set=bcast.state), dtype=bool
                )
                n_hits = np.bincount(widx[hit], minlength=n_rows)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(n_grams, type=pa.int64()),
                "n_hits": pa.array(n_hits, type=pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(
        flag, batch_format="pyarrow"
    )


def heavy_hitters(ds: rd.Dataset, phi: float = 0.001) -> rd.Dataset:
    """EXACT φ-heavy-hitters: every term whose corpus frequency is
    ≥ ceil(φ·N) tokens, with its exact count — Dataset(term, tf).

    This is the candidate+verify pattern that :func:`term_doc_freq`
    cannot give at extreme cardinality: a plain groupby(term) shuffles
    EVERY distinct term (10⁹+ at web scale), while the heavy-hitter
    shuffle is bounded by blocks/φ CANDIDATES regardless of vocabulary.

    Pass 1 (candidates): each batch counts its own tokens (Arrow
    dictionary_encode + bincount) and emits only terms with
    local_tf ≥ φ·local_n − 1 (the −1 slack keeps the guarantee free of
    float rounding), plus one sentinel row carrying local_n.
    Pigeonhole guarantee: if tf(t) ≥ φ·N globally, then some batch has
    local_tf(t) ≥ φ·local_n — the union of per-batch candidates is a
    SUPERSET of the true answer, and each batch emits ≤ ~2/φ terms, so
    the collected candidate table is ≤ 2·batches/φ rows (φ=0.001, 10⁵
    blocks → ≤ ~2×10⁸ bytes of terms; tune φ to the cluster).

    Pass 2 (verify): the candidate set is broadcast once
    (``ray.put``); each batch counts ONLY candidate tokens
    (``pc.is_in`` membership filter) and the final
    ``groupby(term).sum`` + threshold filter runs over candidates
    alone. Both passes stream; nothing driver-side scales with N or
    with vocabulary size.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from pyppmd_ray.functions.broadcast import LazyBroadcast

    if not 0.0 < phi <= 1.0:
        raise ValueError(f"phi must be in (0, 1], got {phi}")

    def candidates(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch["text"])
        n = len(flat)
        sentinel = pa.table(
            {
                "term": pa.array([None], type=pa.string()),
                "tf": pa.array([n], type=pa.int64()),
            }
        )
        if n == 0:
            return sentinel
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = np.bincount(codes, minlength=len(d.dictionary))
        # slack of 1 absorbs float rounding of phi*n at exact-boundary
        # ties — the superset guarantee must not hinge on an ulp; the
        # candidate bound relaxes from 1/phi to ~2/phi per batch
        keep = np.flatnonzero(tf >= phi * n - 1.0)
        if keep.size == 0:
            return sentinel
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "term": pc.take(d.dictionary, pa.array(keep)).cast(
                            pa.string()
                        ),
                        "tf": pa.array(tf[keep], type=pa.int64()),
                    }
                ),
                sentinel,
            ]
        )

    from pyppmd_ray.functions.collect import collect_table

    # bounded collect: ≤ batches×(2/φ + 1) rows by construction
    cand_tbl = collect_table(
        ds.select_columns(["text"]).map_batches(
            candidates, batch_format="pyarrow"
        ),
        empty=pa.table(
            {
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
            }
        ),
    )
    null_mask = pc.is_null(cand_tbl["term"])
    n_total = int(
        pc.sum(cand_tbl["tf"].filter(null_mask)).as_py() or 0
    )
    cand = pc.unique(cand_tbl["term"].filter(pc.invert(null_mask)).combine_chunks())
    empty = pa.table(
        {
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
        }
    )
    if n_total == 0 or len(cand) == 0:
        return rd.from_arrow(empty)
    threshold = int(np.ceil(phi * n_total))
    bcast = LazyBroadcast(ray.put(cand))

    def verify(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens(batch["text"])
        if len(flat) == 0:
            return empty
        flat = flat.filter(pc.is_in(flat, value_set=bcast.state))
        if len(flat) == 0:
            return empty
        d = flat.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tf = np.bincount(codes, minlength=len(d.dictionary))
        return pa.table(
            {
                "term": d.dictionary.cast(pa.string()),
                "tf": pa.array(tf, type=pa.int64()),
            }
        )

    exact = (
        ds.select_columns(["text"])
        .map_batches(verify, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
    )
    return exact.filter(expr=f"tf >= {threshold}")
