"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in pyppmd_ray) calls ray.init()/ray.shutdown().

- ``entry()`` — flagship pipeline on sf0.001: per-column compression
  round-trip over the documents table (encode → decode → per-row sha256
  equality, the reference contract of
  /root/reference/tests/test_ppmd7.py:56-92), returns the decoded Dataset.
- ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data ops).
- ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset;
  column names match the Ray results exactly.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


def _ds(sf_dir: str, table: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _conc():
    return (1, 4)


def _roundtrip(sf_dir: str, table: str):
    """encode → decode through the streaming pipeline (actor pools)."""
    from pyppmd_ray.pipelines import decode_dataset, encode_dataset

    enc = encode_dataset(_ds(sf_dir, table), concurrency=_conc())
    return decode_dataset(enc, concurrency=_conc())


def entry() -> Any:
    sf_dir = "/root/testdata/sf0.001"
    from pyppmd_ray.pipelines import row_sha256

    src = pa.concat_tables(
        _ds(sf_dir, "documents").iter_batches(batch_size=None, batch_format="pyarrow")
    )
    dec = _roundtrip(sf_dir, "documents")
    out = pa.concat_tables(dec.iter_batches(batch_size=None, batch_format="pyarrow"))
    # the reference round-trip contract: per-row sha256 equality
    assert sorted(row_sha256(src, "text")) == sorted(row_sha256(out, "text"))
    import ray.data as rd

    return rd.from_arrow(out)


# --------------------------------------------------------------- queries


def _q_roundtrip(table: str):
    def run(sf_dir: str):
        return _roundtrip(sf_dir, table)

    return run


def _q_dedup_exact(sf_dir: str):
    from pyppmd_ray.functions.dedup import dedup_exact

    ds = dedup_exact(_ds(sf_dir, "documents"))
    return ds.select_columns(["doc_id", "text"])


def _q_token_count(sf_dir: str):
    from pyppmd_ray.functions.text import TokenCounter

    return _ds(sf_dir, "documents").map_batches(
        TokenCounter, batch_format="pyarrow", concurrency=_conc()
    )


def _q_doc_sha(sf_dir: str):
    from pyppmd_ray.functions.text import sha256_hex_column

    return _ds(sf_dir, "documents").map_batches(sha256_hex_column, batch_format="pyarrow")


def _q_doc_stats_by_lang(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    return (
        _ds(sf_dir, "documents")
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="total_chars"),
            Max("n_chars", alias_name="max_chars"),
            Min("n_chars", alias_name="min_chars"),
        )
    )


def _q_events_by_type(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def add_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["value"], 100.0)), pa.int64())
        return batch.append_column("value_cents", cents)

    return (
        _ds(sf_dir, "events")
        .map_batches(add_cents, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n_events"), Sum("value_cents", alias_name="total_value_cents"))
    )


def _q_lineitem_agg(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(batch["l_extendedprice"], 100.0)), pa.int64())
        return batch.append_column("price_cents", cents)

    return (
        _ds(sf_dir, "lineitem")
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Count(alias_name="n"),
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
        )
    )


def _q_ann_topk(sf_dir: str):
    from pyppmd_ray.functions.ann import brute_force_topk

    tbl = pa.concat_tables(
        _ds(sf_dir, "embeddings").iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids = np.asarray(tbl["vec_id"].to_pylist())
    order = np.argsort(ids)[:4]
    qids = ids[order]  # q column = the query's own vec_id (matches oracle)
    queries = np.array([tbl["embedding"][int(i)].as_py() for i in order], dtype=np.float64)
    import ray.data as rd

    out = brute_force_topk(rd.from_arrow(tbl), queries, k=10, concurrency=_conc())
    qcol = pa.array(qids[np.asarray(out["q"].to_pylist())], type=pa.int64())
    return pa.table(
        {
            "q": qcol,
            "rank": out["rank"].cast(pa.int64()),
            "vec_id": out["vec_id"],
        }
    )


def _q_embedding_neardup(sf_dir: str):
    from pyppmd_ray.functions.dedup import embedding_neardup_pairs

    tbl = pa.concat_tables(
        _ds(sf_dir, "embeddings").iter_batches(batch_size=None, batch_format="pyarrow")
    )
    return embedding_neardup_pairs(tbl, threshold=0.35)


def _q_minhash_pairs(sf_dir: str):
    from pyppmd_ray.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_ds(sf_dir, "documents"), threshold=0.3)


def _q_simhash(sf_dir: str):
    from pyppmd_ray.functions.dedup import SimHasher

    return _ds(sf_dir, "documents").map_batches(
        SimHasher, batch_format="pyarrow", concurrency=_conc()
    )


def _q_lang_id(sf_dir: str):
    from pyppmd_ray.functions.text import LangId

    return _ds(sf_dir, "documents").map_batches(
        LangId, batch_format="pyarrow", concurrency=_conc()
    )


def _q_quality(sf_dir: str):
    from pyppmd_ray.functions.text import QualityScorer

    return _ds(sf_dir, "documents").map_batches(
        QualityScorer, batch_format="pyarrow", concurrency=_conc()
    )


def _q_winnow(sf_dir: str):
    from pyppmd_ray.functions.text import WinnowFingerprinter

    return _ds(sf_dir, "documents").map_batches(
        WinnowFingerprinter, batch_format="pyarrow", concurrency=_conc()
    )


def _q_lsh_ann(sf_dir: str):
    from pyppmd_ray.functions.ann import lsh_topk

    tbl = pa.concat_tables(
        _ds(sf_dir, "embeddings").iter_batches(batch_size=None, batch_format="pyarrow")
    )
    ids = np.asarray(tbl["vec_id"].to_pylist())
    order = np.argsort(ids)[:4]
    queries = np.array([tbl["embedding"][int(i)].as_py() for i in order], dtype=np.float64)
    import ray.data as rd

    return lsh_topk(rd.from_arrow(tbl), queries, k=10, concurrency=_conc())


def _q_multimodal(sf_dir: str):
    from pyppmd_ray.functions.multimodal import MediaDecoder, to_payload_table

    return (
        _ds(sf_dir, "documents")
        .map_batches(to_payload_table, batch_format="pyarrow")
        .map_batches(
            MediaDecoder,
            fn_constructor_kwargs={"decode_stub": True},
            batch_format="pyarrow",
            batch_size=256,  # small batches: binary payloads are byte-heavy
            concurrency=_conc(),
        )
    )


def _q_compression_by_lang(sf_dir: str):
    """Per-lang compression metrics (rows-only: compressed sizes are not
    SQL-expressible). Demonstrates the lang-partitioned encode path."""
    from pyppmd_ray.stages.blocks import encode_block

    tbl = pa.concat_tables(
        _ds(sf_dir, "documents").iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rows = []
    for lang in sorted(set(tbl["lang"].to_pylist())):
        sub = tbl.filter(pa.compute.equal(tbl["lang"], lang))
        blk = encode_block(sub.select(["text"]))
        rows.append(
            {
                "lang": lang,
                "n_docs": sub.num_rows,
                "bytes_in": blk["uncompressed_bytes"],
                "bytes_out": blk["encoded_bytes"],
                "ratio": round(blk["uncompressed_bytes"] / max(1, blk["encoded_bytes"]), 4),
            }
        )
    return pa.Table.from_pylist(rows)


def _q_chunking_invariance(sf_dir: str):
    """Encode at two block budgets; decoded rows must be identical — the
    reference's split-point invariance (tests/test_ppmd7.py:23-53).
    Returns the decoded table from the small-budget run (oracle = the
    original table, which also proves the invariance)."""
    from pyppmd_ray.stages.blocks import decode_block, encode_block, split_by_bytes

    tbl = pa.concat_tables(
        _ds(sf_dir, "documents").iter_batches(batch_size=None, batch_format="pyarrow")
    )
    small = pa.concat_tables(
        decode_block(encode_block(p)["payload"]) for p in split_by_bytes(tbl, 256 << 10)
    )
    big = pa.concat_tables(
        decode_block(encode_block(p)["payload"]) for p in split_by_bytes(tbl, 64 << 20)
    )
    assert small.equals(big), "chunking invariance violated"
    return small


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # compression engine round-trips (per-column codecs over every type)
        "roundtrip_documents": _q_roundtrip("documents"),
        "roundtrip_lineitem": _q_roundtrip("lineitem"),
        "roundtrip_orders": _q_roundtrip("orders"),
        "roundtrip_events": _q_roundtrip("events"),
        "roundtrip_customer": _q_roundtrip("customer"),
        "roundtrip_part": _q_roundtrip("part"),
        "roundtrip_embeddings": _q_roundtrip("embeddings"),
        "roundtrip_nation": _q_roundtrip("nation"),
        "roundtrip_region": _q_roundtrip("region"),
        "roundtrip_supplier": _q_roundtrip("supplier"),
        "chunking_invariance": _q_chunking_invariance,
        "compression_by_lang": _q_compression_by_lang,
        # dedup family
        "dedup_exact": _q_dedup_exact,
        "dedup_minhash_lsh": _q_minhash_pairs,
        "simhash_fingerprints": _q_simhash,
        "embedding_neardup": _q_embedding_neardup,
        # text analysis
        "token_count": _q_token_count,
        "doc_fingerprint_sha": _q_doc_sha,
        "doc_stats_by_lang": _q_doc_stats_by_lang,
        "lang_id": _q_lang_id,
        "quality_scores": _q_quality,
        "winnow_fingerprints": _q_winnow,
        # similarity search
        "ann_topk": _q_ann_topk,
        "ann_lsh_topk": _q_lsh_ann,
        # aggregates / pipeline ops
        "events_by_type": _q_events_by_type,
        "lineitem_agg": _q_lineitem_agg,
        # multimodal plumbing
        "multimodal_meta": _q_multimodal,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "roundtrip_documents": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "roundtrip_lineitem": "SELECT * FROM lineitem",
        "roundtrip_orders": "SELECT * FROM orders",
        "roundtrip_events": "SELECT * FROM events",
        "roundtrip_customer": "SELECT * FROM customer",
        "roundtrip_part": "SELECT * FROM part",
        "roundtrip_embeddings": "SELECT * FROM embeddings",
        "roundtrip_nation": "SELECT * FROM nation",
        "roundtrip_region": "SELECT * FROM region",
        "roundtrip_supplier": "SELECT * FROM supplier",
        "chunking_invariance": "SELECT doc_id, text, lang, source, n_chars FROM documents",
        "dedup_exact": "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
        "token_count": (
            "SELECT doc_id, CASE WHEN trim(text, ' \t\n\r') = '' THEN 0 "
            "ELSE len(regexp_split_to_array(trim(text, ' \t\n\r'), '[ \t\n\r]+')) "
            "END AS n_tokens FROM documents"
        ),
        "doc_fingerprint_sha": "SELECT doc_id, sha256(text) AS fp FROM documents",
        "doc_stats_by_lang": (
            # CAST: DuckDB sum(BIGINT) yields HUGEINT; the Ray result is int64
            "SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "max(n_chars) AS max_chars, min(n_chars) AS min_chars "
            "FROM documents GROUP BY lang"
        ),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_value_cents "
            "FROM events GROUP BY event_type"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, count(*) AS n, "
            "sum(l_quantity) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS qi, embedding AS qe FROM embeddings "
            "           WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)), "
            "s AS (SELECT CAST(q.qi AS BIGINT) AS q, e.vec_id, "
            "      list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS c "
            "      FROM embeddings e, q), "
            "r AS (SELECT q, vec_id, "
            "      CAST(row_number() OVER (PARTITION BY q ORDER BY c DESC, vec_id) - 1 AS BIGINT) AS rank "
            "      FROM s) "
            "SELECT q, rank, vec_id FROM r WHERE rank < 10"
        ),
        "embedding_neardup": (
            "SELECT e1.vec_id AS vec_id_a, e2.vec_id AS vec_id_b "
            "FROM embeddings e1, embeddings e2 WHERE e1.vec_id < e2.vec_id AND "
            "list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]) > 0.35"
        ),
        # rows-only (non-SQL-expressible): dedup_minhash_lsh, simhash_fingerprints,
        # lang_id, quality_scores, winnow_fingerprints, ann_lsh_topk,
        # multimodal_meta, compression_by_lang
    }
