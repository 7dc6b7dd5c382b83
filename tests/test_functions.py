"""Tests for the training-data pipeline operators (functions/)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from pyppmd_ray.functions.dedup import (
    MinHasher,
    SimHasher,
    band_bucket_pairs,
    embedding_neardup_pairs,
    minhash_bands,
    ngram_jaccard,
)
from pyppmd_ray.functions.multimodal import MediaDecoder, frame_sample_plan, to_payload_table
from pyppmd_ray.functions.text import (
    LangId,
    QualityScorer,
    TokenCounter,
    WinnowFingerprinter,
    sha256_hex_column,
)


def docs_table():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs away fast",
        "the quick brown fox jumps over the lazy dog and runs away quickly",
        "der hund ist nicht auf der wiese und das ist gut so",
        "le chat est dans la maison et il est pour que",
        "el perro es un animal y la casa es para que",
        "这 是 一个 中文 文档 的 例子 有 很多 词",
        "",
        "completely different text about compression engines and ray data",
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                     "text": pa.array(texts)})


class TestText:
    def test_token_counter(self):
        out = TokenCounter()(docs_table())
        assert out["n_tokens"].to_pylist()[6] == 0
        assert out["n_tokens"].to_pylist()[0] == 13

    def test_lang_id_hits_expected_languages(self):
        out = LangId()(docs_table())
        preds = out["pred_lang"].to_pylist()
        assert preds[0] == "en" and preds[2] == "de" and preds[5] == "zh"
        assert preds[3] == "fr" and preds[4] == "es"

    def test_quality_scorer_fields(self):
        out = QualityScorer()(docs_table())
        assert out.num_rows == 8
        assert out["n_tokens"].to_pylist()[6] == 0
        assert 0 <= out["stopword_ratio"].to_pylist()[0] <= 1

    def test_sha_column_matches_hashlib(self):
        import hashlib

        out = sha256_hex_column(docs_table())
        t = docs_table()["text"].to_pylist()
        assert out["fp"].to_pylist()[0] == hashlib.sha256(t[0].encode()).hexdigest()

    def test_winnow_deterministic(self):
        a = WinnowFingerprinter()(docs_table())
        b = WinnowFingerprinter()(docs_table())
        assert a.equals(b)
        # near-identical docs share most fingerprints → equal xor unlikely;
        # just require non-trivial output for non-empty docs
        assert a["n_fp"].to_pylist()[0] > 0


class TestDedup:
    def test_minhash_near_dup_pair_found(self):
        mh = MinHasher(num_hashes=64)
        sigs = mh(docs_table())
        bands = minhash_bands(sigs, bands=16, rows=4)
        # docs 0/1 differ by one word → they must share at least one band key
        df = bands.to_pandas()
        shared = df.groupby(["band_id", "band_key"])["doc_id"].apply(set)
        assert any({0, 1} <= s for s in shared)
        # the in-bucket verify emits the pair with high signature agreement
        pairs = pa.concat_tables(
            band_bucket_pairs(g_tbl, threshold=0.4)
            for _, g in df.groupby(["band_id", "band_key"])
            if len(g) > 1
            for g_tbl in [pa.Table.from_pandas(g, preserve_index=False)]
        )
        got = set(zip(pairs["doc_id_a"].to_pylist(), pairs["doc_id_b"].to_pylist()))
        assert (0, 1) in got
        s0 = np.asarray(sigs["sig"][0].as_py())
        s1 = np.asarray(sigs["sig"][1].as_py())
        est = float(np.mean(s0 == s1))
        true_j = ngram_jaccard(
            docs_table()["text"][0].as_py(), docs_table()["text"][1].as_py(), n=3
        )
        assert est > 0.4 and true_j > 0.5

    def test_minhash_empty_doc_emits_no_bands(self):
        mh = MinHasher(num_hashes=16)
        sigs = mh(docs_table())
        assert sigs["sig"][6].as_py() is None  # doc 6 is empty
        bands = minhash_bands(sigs, bands=4, rows=4)
        assert 6 not in set(bands["doc_id"].to_pylist())

    def test_simhash_similar_docs_close(self):
        out = SimHasher()(docs_table())
        h = out["simhash"].to_pylist()
        d01 = bin(h[0] ^ h[1]).count("1")
        d07 = bin(h[0] ^ h[7]).count("1")
        assert d01 < d07  # near-dups closer in hamming space

    def test_embedding_neardup(self):
        rng = np.random.default_rng(0)
        base = rng.normal(size=8)
        tbl = pa.table(
            {
                "vec_id": pa.array([0, 1, 2], type=pa.int64()),
                "embedding": pa.array(
                    [base.tolist(), (base + 1e-6).tolist(), rng.normal(size=8).tolist()],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        pairs = embedding_neardup_pairs(tbl, threshold=0.99)
        assert pairs.num_rows == 1
        assert pairs["vec_id_a"][0].as_py() == 0 and pairs["vec_id_b"][0].as_py() == 1

    def test_ngram_jaccard_bounds(self):
        assert ngram_jaccard("a b c d", "a b c d") == 1.0
        assert ngram_jaccard("a b c", "x y z") == 0.0
        assert ngram_jaccard("", "") == 1.0


class TestMultimodal:
    def test_payload_is_real_png_and_parser_reads_it(self):
        from pyppmd_ray.functions.multimodal import PNG_OVERHEAD, PNG_SIG, parse_png_header

        p = to_payload_table(docs_table())
        texts = docs_table()["text"].to_pylist()
        for i, payload in enumerate(p["payload"].to_pylist()):
            assert payload.startswith(PNG_SIG)
            assert len(payload) == PNG_OVERHEAD + len(texts[i].encode("utf-8"))
        out = MediaDecoder()(p)
        assert out.num_rows == 8
        n0 = len(texts[0])
        assert out["width"][0].as_py() == 16 + n0 % 1024
        assert out["height"][0].as_py() == 16 + (7 * n0) % 1024
        assert out["bit_depth"][0].as_py() == 8 and out["color_type"][0].as_py() == 0
        # parser is a real validator: corrupting the IHDR CRC must raise
        bad = bytearray(p["payload"][0].as_py())
        bad[30] ^= 0xFF
        with pytest.raises(ValueError):
            parse_png_header(bytes(bad))

    def test_pixel_decode_roundtrip(self):
        """Real pixel path: deterministic pixels → filtered+zlib IDAT →
        inflate + unfilter reproduces them exactly."""
        import numpy as np

        from pyppmd_ray.functions.multimodal import (
            deterministic_pixels,
            filter_scanlines,
            make_png,
            unfilter_scanlines,
        )

        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (4, 9), (23, 23)]:
            px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            assert (unfilter_scanlines(filter_scanlines(px), w, h) == px).all()
        p = to_payload_table(docs_table(), pixels=True)
        md = MediaDecoder(decode_pixels=True)
        out = md(p)
        texts = docs_table()["text"].to_pylist()
        for i in range(out.num_rows):
            n = len(texts[i])
            w, h = 8 + n % 16, 8 + (3 * n) % 16
            assert out["width"][i].as_py() == w and out["height"][i].as_py() == h
            exp = deterministic_pixels(w, h, n)
            assert out["px_sum"][i].as_py() == int(exp.astype(np.int64).sum())
        # individual image decode: bit-exact pixels
        px = deterministic_pixels(10, 12, 5)
        img = make_png(10, 12, b"x", px)
        assert (md.decode_image(img) == px).all()

    def test_pixel_decode_rejects_no_idat(self):
        p = to_payload_table(docs_table())  # header-only containers
        with pytest.raises(ValueError):
            MediaDecoder(decode_pixels=True)(p)

    def test_frame_sample_plan(self):
        p = to_payload_table(docs_table())
        frames = frame_sample_plan(p, every_n=5)
        assert frames.num_rows >= p.num_rows  # at least frame 0 per doc
        assert set(frames.column_names) == {"doc_id", "frame_idx"}


@pytest.mark.usefixtures("ray_session")
class TestDistributed:
    def test_dedup_exact_keeps_min_id(self):
        import ray.data as rd

        from pyppmd_ray.functions.dedup import dedup_exact

        tbl = pa.table(
            {
                "doc_id": pa.array([5, 1, 2, 3], type=pa.int64()),
                "text": pa.array(["dup", "dup", "uniq", "dup"]),
            }
        )
        out = pa.concat_tables(
            dedup_exact(rd.from_arrow(tbl)).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        kept = dict(zip(out["text"].to_pylist(), out["doc_id"].to_pylist()))
        assert kept == {"dup": 1, "uniq": 2}

    def test_brute_force_topk_self_hit(self):
        import ray.data as rd

        from pyppmd_ray.functions.ann import brute_force_topk, lsh_topk

        rng = np.random.default_rng(1)
        emb = rng.normal(size=(50, 16))
        tbl = pa.table(
            {
                "vec_id": pa.array(range(50), type=pa.int64()),
                "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
            }
        )
        q = emb[:3]
        out = brute_force_topk(rd.from_arrow(tbl), q, k=5, concurrency=2)
        for qi in range(3):
            rows = out.filter(pa.compute.equal(out["q"], qi))
            assert rows["vec_id"][0].as_py() == qi  # self is rank 0
        lsh = lsh_topk(rd.from_arrow(tbl), q, k=5, n_bits=4, concurrency=2)
        assert lsh.num_rows == 15


class TestTokenWhitespaceSemantics:
    def test_oracle_char_class_only(self):
        # \x0b, \xa0 etc. are NOT separators/trim chars (oracle parity:
        # trim(text, ' \t\n\r') + regexp_split [ \t\n\r]+)
        from pyppmd_ray.functions.text import TokenCounter

        tc = TokenCounter()
        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                "text": ["\x0bhello\x0b", "\xa0a b\xa0", "  x\ty \n", "", "   \t\n"],
            }
        )
        out = tc(batch)
        # "\x0bhello\x0b" is ONE token; "\xa0a b\xa0" splits only on the space
        assert out["n_tokens"].to_pylist() == [1, 2, 2, 0, 0]

    def test_quality_matches_token_counter(self):
        from pyppmd_ray.functions.text import QualityScorer, TokenCounter

        batch = pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["\x85one\x85 two", " plain text here "],
            }
        )
        assert (
            QualityScorer()(batch)["n_tokens"].to_pylist()
            == TokenCounter()(batch)["n_tokens"].to_pylist()
        )


@pytest.mark.usefixtures("ray_session")
def test_ingest_non_utf8_file(tmp_path):
    # round-2 ADVICE: surrogateescape decode crashed pa.array on non-UTF-8
    from pyppmd_ray.sources import content_bytes, read_source_files

    raw = b"\xff\xfe\x00binary-ish\x80"
    (tmp_path / "weird.txt").write_bytes(raw)
    (tmp_path / "ok.py").write_text("print('hi')\n")
    tbl = pa.concat_tables(
        read_source_files(str(tmp_path)).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rows = {r["path"]: r for r in tbl.to_pylist()}
    assert rows["weird.txt"]["encoding"] == "latin-1"
    assert content_bytes(rows["weird.txt"]["content"], rows["weird.txt"]["encoding"]) == raw
    assert rows["ok.py"]["encoding"] == "utf-8"
    assert content_bytes(rows["ok.py"]["content"]) == b"print('hi')\n"


class TestNewOps:
    def test_bpe_token_counter(self):
        from pyppmd_ray.functions.text import BpeTokenCounter

        out = BpeTokenCounter()(docs_table())
        counts = out["n_bpe_tokens"].to_pylist()
        assert counts[6] == 0  # empty doc
        assert all(c >= 0 for c in counts)
        # contractions count as separate tokens: "it's" -> "it", "'s"
        one = BpeTokenCounter()(
            pa.table({"doc_id": pa.array([0], type=pa.int64()), "text": ["it's fine"]})
        )
        assert one["n_bpe_tokens"][0].as_py() == 3

    def test_embedding_quantizer_roundtrip_bounds(self):
        from pyppmd_ray.functions.embeddings import EmbeddingQuantizer

        rng = np.random.default_rng(3)
        emb = rng.normal(size=(10, 8)).astype(np.float32)
        emb[0] = 0  # zero vector
        tbl = pa.table(
            {
                "vec_id": pa.array(range(10), type=pa.int64()),
                "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
            }
        )
        out = EmbeddingQuantizer()(tbl)
        q = np.array(out["qvec"].to_pylist())
        assert (np.abs(q) <= 127).all()
        assert (q[0] == 0).all() and out["amax"][0].as_py() == 0.0
        # dequantization error bounded by half a quantization step
        amax = np.array(out["amax"].to_pylist())[1:, None]
        deq = q[1:] * amax / 127.0
        assert np.abs(deq - emb[1:].astype(np.float64)).max() <= (amax / 127.0 / 2 + 1e-12).max()


@pytest.mark.usefixtures("ray_session")
class TestRelational:
    def test_windowed_agg_counts(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import windowed_agg

        ts = pa.array(
            [1_700_000_000_000_000 + i * 1_800_000_000 for i in range(8)],  # every 30 min
            type=pa.timestamp("us"),
        )
        tbl = pa.table(
            {
                "event_type": pa.array(["a"] * 8),
                "ts": ts,
                "value": pa.array([1.0] * 8),
            }
        )
        out = pa.concat_tables(
            windowed_agg(rd.from_arrow(tbl)).iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by("window_start")
        # 8 half-hourly events over 4 hours → every hour window has 2
        assert out["n_events"].to_pylist() == [2, 2, 2, 2]
        assert out["total_value_cents"].to_pylist() == [200] * 4
        assert out["window_start"].type == pa.timestamp("us")

    def test_windowed_agg_sliding_and_watermark(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import windowed_agg

        # events at t = 0..7 half-hours over 4 hours, value 1.0 each
        ts = [i * 1800 * 1_000_000 for i in range(8)]
        t = pa.table(
            {
                "event_type": pa.array(["a"] * 8),
                "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array([1.0] * 8),
            }
        )
        # hop = width/2: every event lands in 2 windows
        out = (
            windowed_agg(rd.from_arrow(t), width_s=3600, hop_s=1800)
            .to_pandas().sort_values("window_start").reset_index(drop=True)
        )
        assert int(out["n_events"].sum()) == 16  # 8 events × 2 windows
        # watermark: drop events older than max_ts - 1.5h → keeps t in
        # {2.0h, 2.5h, 3.0h, 3.5h} (4 events)
        out_wm = windowed_agg(
            rd.from_arrow(t), width_s=3600, watermark_s=5400
        ).to_pandas()
        assert int(out_wm["n_events"].sum()) == 4

    def test_asof_join_semantics(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import asof_join

        left = pa.table(
            {
                "k": pa.array([1, 1, 2, 3], type=pa.int64()),
                "t": pa.array([100, 5, 50, 9], type=pa.int64()),
                "lid": pa.array([10, 11, 12, 13], type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1, 1, 2], type=pa.int64()),
                "t": pa.array([10, 100, 100, 60], type=pa.int64()),
                "rid": pa.array([7, 8, 9, 5], type=pa.int64()),
            }
        )
        out = pa.concat_tables(
            asof_join(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="k", left_ts="t", right_ts="t",
                left_id="lid", right_id="rid",
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        got = dict(zip(out["left_id"].to_pylist(), out["right_id"].to_pylist()))
        # lid 10 @t=100: ties at t=100 → max rid (9); lid 11 @t=5: nothing ≤ 5;
        # lid 12 @t=50: only t=10? no — k=2 has t=60 > 50 → null; lid 13: no k=3 rows
        assert got == {10: 9, 11: None, 12: None, 13: None}

    def test_asof_join_salted_matches_unsalted_hot_key(self):
        """One key holds 50% of rows; time-range salting must produce
        identical results to the unsalted path (boundary-row replication
        preserves the as-of semantics exactly)."""
        import ray.data as rd

        from pyppmd_ray.functions.relational import asof_join

        rng = np.random.default_rng(11)
        n, m = 2000, 800
        lkeys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 20, n))
        left = pa.table(
            {
                "k": pa.array(lkeys, type=pa.int64()),
                "t": pa.array(rng.integers(0, 10**6, n), type=pa.int64()),
                "lid": pa.array(np.arange(n), type=pa.int64()),
            }
        )
        rkeys = np.where(rng.random(m) < 0.5, 7, rng.integers(0, 20, m))
        right = pa.table(
            {
                "k": pa.array(rkeys, type=pa.int64()),
                "t": pa.array(rng.integers(0, 10**6, m), type=pa.int64()),
                "rid": pa.array(np.arange(m), type=pa.int64()),
            }
        )
        kw = dict(
            left_key="k", right_key="k", left_ts="t", right_ts="t",
            left_id="lid", right_id="rid",
        )
        base = (
            asof_join(rd.from_arrow(left), rd.from_arrow(right), **kw)
            .to_pandas().sort_values("left_id").reset_index(drop=True)
        )
        for shards in (2, 8, 64):
            salted = (
                asof_join(
                    rd.from_arrow(left), rd.from_arrow(right), **kw,
                    salt_shards=shards,
                )
                .to_pandas().sort_values("left_id").reset_index(drop=True)
            )
            assert salted.equals(base), f"salt_shards={shards} diverged"


@pytest.mark.usefixtures("ray_session")
class TestIvfTraining:
    def _corpus(self, n=600, d=16, n_clusters=6, seed=5):
        rng = np.random.default_rng(seed)
        centers = rng.normal(size=(n_clusters, d)) * 4
        assign = rng.integers(0, n_clusters, n)
        m = centers[assign] + rng.normal(size=(n, d)) * 0.4
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.array(m.tolist(), type=pa.list_(pa.float64())),
            }
        ), m

    def test_no_global_sort_in_seeding(self):
        """Seeding must come from per-block bottom-k, not sort().limit()."""
        import inspect

        from pyppmd_ray.functions import ann

        src = inspect.getsource(ann.ivf_topk) + inspect.getsource(
            ann._seed_centroid_table
        )
        assert ".sort(" not in src

    def test_trained_centroids_beat_seeded_recall(self):
        import ray.data as rd

        from pyppmd_ray.functions.ann import brute_force_topk, ivf_topk

        tbl, m = self._corpus()
        ds = rd.from_arrow(tbl)
        queries = m[:8]
        k = 10
        truth = brute_force_topk(ds, queries, k=k)

        def recall(res):
            tot, hit = 0, 0
            for qi in range(8):
                want = {
                    v for q, v in zip(truth["q"].to_pylist(), truth["vec_id"].to_pylist())
                    if q == qi
                }
                got = {
                    v for q, v in zip(res["q"].to_pylist(), res["vec_id"].to_pylist())
                    if q == qi
                }
                tot += len(want)
                hit += len(want & got)
            return hit / tot

        seeded = ivf_topk(ds, queries, k=k, n_centroids=6, nprobe=2)
        trained = ivf_topk(ds, queries, k=k, n_centroids=6, nprobe=2, train=True)
        r_seed, r_train = recall(seeded), recall(trained)
        # k-means centroids must not hurt, and on this clustered corpus
        # should improve recall over the arbitrary lowest-id seeds
        assert r_train >= r_seed, (r_train, r_seed)
        assert r_train >= 0.9, r_train


@pytest.mark.usefixtures("ray_session")
class TestHashJoin:
    def _sides(self):
        import ray.data as rd

        left = pa.table(
            {
                "k": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
                "v": pa.array(["a", "b", "c", "d", "e"]),
            }
        )
        right = pa.table(
            {
                "k2": pa.array([1, 2, 2, 9], type=pa.int64()),
                "v": pa.array([10.0, 20.0, 30.0, 40.0]),  # name collision
            }
        )
        return rd.from_arrow(left), rd.from_arrow(right)

    def _rows(self, ds):
        import pandas as pd

        df = ds.to_pandas()
        return sorted(
            df.to_dict("records"),
            key=lambda r: (r["k"], str(r["v"]), str(r.get("v_r"))),
        )

    def test_inner_and_collision_suffix(self):
        from pyppmd_ray.functions.relational import hash_join

        l, r = self._sides()
        out = hash_join(l, r, on="k", right_on="k2", how="inner")
        rows = self._rows(out)
        assert [set(x.items()) for x in rows] == [
            {("k", 1), ("v", "a"), ("v_r", 10.0)},
            {("k", 1), ("v", "b"), ("v_r", 10.0)},
            {("k", 2), ("v", "c"), ("v_r", 20.0)},
            {("k", 2), ("v", "c"), ("v_r", 30.0)},
        ]

    def test_left_join_nulls(self):
        import numpy as np

        from pyppmd_ray.functions.relational import hash_join

        l, r = self._sides()
        out = hash_join(l, r, on="k", right_on="k2", how="left")
        df = out.to_pandas()
        assert len(df) == 6  # 4 matches + keys 3, 4 unmatched
        unmatched = df[df["v_r"].isna()]
        assert sorted(unmatched["k"].tolist()) == [3, 4]

    def test_salted_matches_unsalted_hot_key(self):
        import numpy as np
        import ray.data as rd

        from pyppmd_ray.functions.relational import hash_join

        rng = np.random.default_rng(4)
        n = 3000
        keys = np.where(rng.random(n) < 0.6, 42, rng.integers(0, 30, n))
        left = pa.table(
            {
                "k": pa.array(keys, type=pa.int64()),
                "lid": pa.array(np.arange(n), type=pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([42, 42, 5, 7], type=pa.int64()),
                "rid": pa.array([100, 101, 102, 103], type=pa.int64()),
            }
        )
        for how in ("inner", "left"):
            base = (
                hash_join(rd.from_arrow(left), rd.from_arrow(right), on="k", how=how)
                .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
            )
            for s in (2, 7):
                salted = (
                    hash_join(
                        rd.from_arrow(left), rd.from_arrow(right), on="k",
                        how=how, salt=s,
                    )
                    .to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
                )
                assert salted.equals(base), (how, s)

    def test_broadcast_matches_shuffle(self):
        from pyppmd_ray.functions.relational import hash_join

        l, r = self._sides()
        sh = self._rows(hash_join(l, r, on="k", right_on="k2", how="inner"))
        bc = self._rows(
            hash_join(l, r, on="k", right_on="k2", how="inner", broadcast=True)
        )
        assert sh == bc

    def test_semi_anti(self):
        from pyppmd_ray.functions.relational import hash_join

        l, r = self._sides()
        semi = hash_join(l, r, on="k", right_on="k2", how="semi").to_pandas()
        anti = hash_join(l, r, on="k", right_on="k2", how="anti").to_pandas()
        assert sorted(semi["k"].tolist()) == [1, 1, 2]
        assert sorted(anti["k"].tolist()) == [3, 4]
        assert list(semi.columns) == ["k", "v"]  # no right columns
        # broadcast path agrees
        semi_bc = hash_join(
            l, r, on="k", right_on="k2", how="semi", broadcast=True
        ).to_pandas()
        anti_bc = hash_join(
            l, r, on="k", right_on="k2", how="anti", broadcast=True
        ).to_pandas()
        assert sorted(semi_bc["k"].tolist()) == [1, 1, 2]
        assert sorted(anti_bc["k"].tolist()) == [3, 4]


@pytest.mark.usefixtures("ray_session")
class TestSampleTopk:
    def test_hash_sample_deterministic_and_keyed(self):
        import ray.data as rd

        from pyppmd_ray.functions.sample import hash_sample

        t = pa.table(
            {
                "doc_id": pa.array(list(range(1000)) * 2, type=pa.int64()),
                "x": pa.array(range(2000), type=pa.int64()),
            }
        )
        a = hash_sample(rd.from_arrow(t), 0.3, "doc_id").to_pandas()
        b = hash_sample(rd.from_arrow(t), 0.3, "doc_id").to_pandas()
        assert sorted(a["x"]) == sorted(b["x"])  # rerun-stable
        # keyed: both copies of a doc_id kept or dropped together
        kept = set(a["doc_id"])
        assert len(a) == 2 * len(kept)
        # rate lands in a loose band
        assert 0.2 < len(kept) / 1000 < 0.4

    def test_topk_matches_full_sort(self):
        import numpy as np
        import ray.data as rd

        from pyppmd_ray.functions.sample import topk

        rng = np.random.default_rng(9)
        vals = rng.integers(0, 100, 5000)  # heavy ties
        t = pa.table(
            {
                "id": pa.array(np.arange(5000), type=pa.int64()),
                "v": pa.array(vals, type=pa.int64()),
            }
        )
        got = topk(rd.from_arrow(t), "v", 25, tie_by="id")
        order = np.lexsort((np.arange(5000), -vals))[:25]
        assert got["id"].to_pylist() == [int(i) for i in order]
        asc = topk(rd.from_arrow(t), "v", 5, ascending=True, tie_by="id")
        order2 = np.lexsort((np.arange(5000), vals))[:5]
        assert asc["id"].to_pylist() == [int(i) for i in order2]


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_clusters_and_chain(self):
        import ray.data as rd

        from pyppmd_ray.functions.graph import connected_components

        pairs = pa.table(
            {
                "doc_id_a": pa.array([1, 2, 3, 10, 20, 21], type=pa.int64()),
                "doc_id_b": pa.array([2, 3, 4, 11, 21, 22], type=pa.int64()),
            }
        )
        cc = connected_components(rd.from_arrow(pairs)).to_pandas()
        got = dict(zip(cc["node"], cc["lbl"]))
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_long_chain_converges_in_log_rounds(self):
        import numpy as np
        import ray.data as rd

        from pyppmd_ray.functions.graph import connected_components

        n = 13  # diameter 12; path compression needs ~log2 rounds
        ch = pa.table(
            {
                "doc_id_a": pa.array(np.arange(100, 100 + n - 1), type=pa.int64()),
                "doc_id_b": pa.array(np.arange(101, 100 + n), type=pa.int64()),
            }
        )
        cc = connected_components(rd.from_arrow(ch), max_iters=8).to_pandas()
        assert set(cc["lbl"]) == {100}

    def test_null_join_keys_match_nothing(self):
        """SQL null semantics on the shuffle path (code-review regression):
        null keys never match; left/anti keep null-key left rows."""
        import ray.data as rd

        from pyppmd_ray.functions.relational import hash_join

        l = rd.from_arrow(
            pa.table({"k": pa.array([1, None, None], type=pa.int64()), "v": ["a", "b", "c"]})
        )
        r = rd.from_arrow(
            pa.table({"k2": pa.array([1, None], type=pa.int64()), "w": [10, 20]})
        )
        inner = hash_join(l, r, on="k", right_on="k2", how="inner").to_pandas()
        assert len(inner) == 1 and inner.iloc[0]["v"] == "a"
        left = hash_join(l, r, on="k", right_on="k2", how="left").to_pandas()
        assert len(left) == 3 and left["w"].isna().sum() == 2
        anti = hash_join(l, r, on="k", right_on="k2", how="anti").to_pandas()
        assert sorted(anti["v"]) == ["b", "c"]
        semi = hash_join(l, r, on="k", right_on="k2", how="semi").to_pandas()
        assert sorted(semi["v"]) == ["a"]


@pytest.mark.usefixtures("ray_session")
class TestReviewRegressions:
    def test_windowed_agg_hop_gt_width_drops_gap_events(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import windowed_agg

        t = pa.table(
            {
                "event_type": ["a"] * 2,
                "ts": pa.array(
                    [30 * 10**6, 1800 * 10**6], type=pa.int64()
                ).cast(pa.timestamp("us")),
                "value": [1.0, 1.0],
            }
        )
        out = windowed_agg(rd.from_arrow(t), width_s=60, hop_s=3600).to_pandas()
        assert int(out["n_events"].sum()) == 1  # t=1800s falls in no window

    def test_connected_components_empty_pairs(self):
        import ray.data as rd

        from pyppmd_ray.functions.graph import connected_components

        empty = rd.from_arrow(
            pa.table(
                {
                    "doc_id_a": pa.array([], type=pa.int64()),
                    "doc_id_b": pa.array([], type=pa.int64()),
                }
            )
        )
        assert len(connected_components(empty).to_pandas()) == 0

    def test_int64_column_rejects_nulls(self):
        from pyppmd_ray.functions.embeddings import int64_column

        with pytest.raises(ValueError):
            int64_column(pa.array([1, None], type=pa.int64()))


class TestAudio:
    def test_wav_roundtrip_and_validation(self):
        import numpy as np

        from pyppmd_ray.functions.multimodal import (
            deterministic_samples,
            make_wav,
            parse_wav,
        )

        rng = np.random.default_rng(3)
        s = rng.integers(-32768, 32768, 500).astype(np.int16)
        meta, out = parse_wav(make_wav(s, sample_rate=8000))
        assert (out == s).all() and meta == {"sample_rate": 8000, "n_samples": 500}
        w = make_wav(deterministic_samples(77))
        for bad in (b"", b"RIFFxxxxWAVE", w[:50], b"RIFX" + w[4:]):
            with pytest.raises(ValueError):
                parse_wav(bad)

    def test_audio_decoder_features(self):
        import numpy as np

        from pyppmd_ray.functions.multimodal import (
            AudioDecoder,
            deterministic_samples,
            to_audio_table,
        )

        t = docs_table()
        feats = AudioDecoder()(to_audio_table(t))
        texts = t["text"].to_pylist()
        for i in range(feats.num_rows):
            s = deterministic_samples(len(texts[i]))
            a = np.abs(s.astype(np.int64))
            assert feats["n_samples"][i].as_py() == s.size
            assert feats["peak"][i].as_py() == int(a.max())
            assert feats["sum_abs"][i].as_py() == int(a.sum())


class TestVideo:
    def test_y4m_roundtrip_and_validation(self):
        import numpy as np

        from pyppmd_ray.functions.multimodal import (
            deterministic_frames,
            make_y4m,
            parse_y4m,
        )

        fr = deterministic_frames(100)
        meta, out = parse_y4m(make_y4m(fr))
        assert (out == fr).all()
        assert meta == {"width": 8, "height": 8, "n_frames": len(fr)}
        good = make_y4m(fr)
        for bad in (b"", b"YUV4MPEG2 W8\n", good[:30], b"XUV" + good[3:]):
            with pytest.raises(ValueError):
                parse_y4m(bad)

    def test_frame_sampler(self):
        import numpy as np

        from pyppmd_ray.functions.multimodal import (
            VideoFrameSampler,
            deterministic_frames,
            to_video_table,
        )

        t = docs_table()
        rows = VideoFrameSampler(every_n=2)(to_video_table(t))
        texts = t["text"].to_pylist()
        # check one doc end-to-end
        d0 = t["doc_id"][0].as_py()
        fr = deterministic_frames(len(texts[0]))
        want = {
            f: int(fr[f].astype(np.int64).sum()) for f in range(0, len(fr), 2)
        }
        got = {
            fi: ls
            for di, fi, ls in zip(
                rows["doc_id"].to_pylist(),
                rows["frame_idx"].to_pylist(),
                rows["luma_sum"].to_pylist(),
            )
            if di == d0
        }
        assert got == want


class TestTrainedBpe:
    def test_train_and_apply_known_merges(self):
        from pyppmd_ray.functions.bpe import apply_bpe, train_bpe

        texts = ["low low low low low", "lower lower", "newest newest newest"]
        merges = train_bpe(texts, n_merges=8)
        assert merges, "no merges learned"
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        # 'low' appears 7 times (5 + 2 as prefix of lower... prefix words
        # differ); the most frequent pair must come from 'low'
        a, b = merges[0]
        assert (a + b) in ("lo", "ow", "w</w>", "ow</w>")
        toks = apply_bpe("low", ranks)
        assert "".join(toks).replace("</w>", "") == "low"  # lossless
        # fully-merged frequent word collapses to few tokens
        assert len(toks) <= 3

    @pytest.mark.usefixtures("ray_session")
    def test_tokenize_bpe_distributed(self):
        import ray.data as rd

        from pyppmd_ray.functions.bpe import apply_bpe, tokenize_bpe, train_bpe, _WORD_RE

        t = docs_table()
        out = tokenize_bpe(rd.from_arrow(t), n_merges=64, sample_rows=8).to_pandas()
        assert len(out) == t.num_rows
        # distributed result == local recompute with the same training set
        sample = t["text"].to_pylist()[:8]
        ranks = {tuple(p): i for i, p in enumerate(train_bpe(sample, n_merges=64))}
        texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
        for _, row in out.iterrows():
            want = sum(
                len(apply_bpe(w, ranks)) for w in _WORD_RE.findall(texts[row["doc_id"]] or "")
            )
            assert row["n_bpe_tokens"] == want

    def test_clusters_empty_pairs_end_to_end(self):
        """Review regression: zero near-dup pairs must yield every doc as
        its own singleton cluster, not crash on a schema-less dataset."""
        import pyarrow.compute as pc
        import ray.data as rd

        from pyppmd_ray.functions.dedup import minhash_lsh_pairs
        from pyppmd_ray.functions.graph import connected_components
        from pyppmd_ray.functions.relational import hash_join

        docs = pa.table(
            {
                "doc_id": pa.array(range(10), type=pa.int64()),
                "text": [
                    f"unique doc {i} " + " ".join(f"w{i}{j}" for j in range(30))
                    for i in range(10)
                ],
            }
        )
        ds = rd.from_arrow(docs)
        cc = connected_components(minhash_lsh_pairs(ds, threshold=0.9))
        joined = hash_join(
            ds.select_columns(["doc_id"]), cc, on="doc_id", right_on="node",
            how="left", broadcast=True,
        )
        out = joined.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"],
                    "cluster_id": pc.cast(pc.coalesce(b["lbl"], b["doc_id"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        assert len(out) == 10 and (out["doc_id"] == out["cluster_id"]).all()


@pytest.mark.usefixtures("ray_session")
class TestQuantilesNulls:
    def test_quantiles_exclude_nulls(self):
        import ray.data as rd

        from pyppmd_ray.functions.stats import quantiles

        t = pa.table({"v": pa.array([1.0] * 5 + [2.0] * 5 + [None] * 30)})
        out = quantiles(rd.from_arrow(t), "v", [0.5, 1.0]).to_pylist()
        assert out == [
            {"q": 0.5, "value": 1.0, "exact": True},
            {"q": 1.0, "value": 2.0, "exact": True},
        ]

    def test_quantiles_high_cardinality_fallback_bounded(self):
        """Above distinct_budget the exact path would pull the whole
        distinct-value histogram onto the driver; the automatic binned
        fallback must keep driver state O(bins) and stay within the
        documented (max-min)/bins error of the true rank quantile."""
        import numpy as np
        import ray.data as rd

        from pyppmd_ray.functions.stats import quantiles

        rng = np.random.default_rng(7)
        vals = rng.uniform(-100.0, 100.0, size=200_000)  # all distinct
        ds = rd.from_arrow(pa.table({"v": pa.array(vals)}))
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        out = quantiles(ds, "v", qs, distinct_budget=10_000, bins=4096)
        assert out["exact"].to_pylist() == [False] * len(qs)  # marked approximate
        got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
        sv = np.sort(vals)
        tol = (sv[-1] - sv[0]) / 4096
        for q in qs:
            true = sv[max(1, int(np.ceil(q * len(sv)))) - 1]
            assert true - tol <= got[q] <= true, (q, got[q], true)
        # identical inputs under budget: exact path, bit-exact ranks
        exact = quantiles(ds, "v", qs).to_pylist()
        for row, q in zip(exact, qs):
            assert row["value"] == sv[max(1, int(np.ceil(q * len(sv)))) - 1]
            assert row["exact"] is True


class TestPii:
    def test_scan_and_redact(self):
        from pyppmd_ray.functions.text import PiiScanner, redact_pii

        t = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": [
                    "mail me at jo.doe+x@test-site.org or 10.0.0.1, "
                    "call +1 555 123 4567 please",
                    "no pii here",
                ],
            }
        )
        scan = PiiScanner()(t)
        assert scan["n_emails"].to_pylist() == [1, 0]
        assert scan["n_ipv4"].to_pylist() == [1, 0]
        assert scan["n_phones"].to_pylist() == [1, 0]
        red = redact_pii(t)
        assert red["text"][0].as_py() == (
            "mail me at <EMAIL> or <IP>, call <PHONE> please"
        )
        assert red["text"][1].as_py() == "no pii here"


@pytest.mark.usefixtures("ray_session")
class TestRound4Regressions:
    """Regression tests for the round-3 ADVICE findings and the round-4
    skew/typed-empty hardening."""

    def _docs(self):
        return pa.table(
            {
                "doc_id": pa.array(range(8), type=pa.int64()),
                "text": [
                    f"completely distinct document number {i} with words "
                    f"{i * 7} {i * 13} unique token{i}"
                    for i in range(8)
                ],
            }
        )

    def test_minhash_pairs_typed_on_clean_corpus(self):
        """A corpus with zero near-dup pairs must still yield a TYPED
        (doc_id_a, doc_id_b, jaccard_est) dataset — downstream joins and
        connected_components crash on schema-less empties."""
        import ray.data as rd

        from pyppmd_ray.functions.dedup import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(rd.from_arrow(self._docs()))
        s = pairs.schema()
        assert s is not None
        assert s.names == ["doc_id_a", "doc_id_b", "jaccard_est"]
        assert pairs.count() == 0

    def test_verified_pipeline_on_clean_corpus(self):
        """The dedup_minhash_verified shape (pairs ⋈ texts) must survive a
        clean corpus on BOTH join paths."""
        import ray.data as rd

        from pyppmd_ray.functions.dedup import minhash_lsh_pairs
        from pyppmd_ray.functions.relational import hash_join

        docs = rd.from_arrow(self._docs())
        pairs = minhash_lsh_pairs(rd.from_arrow(self._docs()))
        for bc in (True, False):
            j = hash_join(
                pairs, docs, on="doc_id_a", right_on="doc_id", how="inner",
                broadcast=bc,
            )
            assert j.count() == 0
            s = j.schema()
            assert s is not None and "text" in s.names, (bc, s)

    def test_hash_join_untyped_empty_sides(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import hash_join

        docs = rd.from_arrow(self._docs())
        untyped = rd.from_arrow(pa.table({"a": [1]})).map_batches(
            lambda b: pa.table({}), batch_format="pyarrow"
        )
        assert untyped.schema() is None
        # untyped LEFT: empty result typed from the right side
        j = hash_join(untyped, docs, on="doc_id_a", right_on="doc_id", how="inner")
        assert j.count() == 0
        assert j.schema().names == ["doc_id_a", "text"]
        # untyped RIGHT: anti keeps every left row, inner is typed empty
        j2 = hash_join(docs, untyped, on="doc_id", right_on="k", how="anti")
        assert j2.count() == 8
        j3 = hash_join(docs, untyped, on="doc_id", right_on="k", how="inner")
        assert j3.count() == 0
        assert j3.schema().names == ["doc_id", "text"]
        # untyped BOTH: loud error
        with pytest.raises(ValueError, match="schema-less"):
            hash_join(untyped, untyped, on="a", how="inner")

    def test_skewed_join_without_salt_is_chunked_and_exact(self, monkeypatch):
        """One key owning 50% of both sides must pass WITHOUT opt-in
        salting, with the per-group cross product emitted in bounded
        chunks (JOIN_CHUNK_ROWS) rather than one giant table."""
        import ray.data as rd

        from pyppmd_ray.functions import relational

        monkeypatch.setattr(relational, "JOIN_CHUNK_ROWS", 257)  # force chunking
        n = 400
        left_tbl = pa.table(
            {
                "k": pa.array([7] * (n // 2) + list(range(n // 2)), type=pa.int64()),
                "lv": pa.array(range(n), type=pa.int64()),
            }
        )
        right_tbl = pa.table(
            {
                "k": pa.array([7] * 20 + [1, 2, 3], type=pa.int64()),
                "rv": pa.array(range(23), type=pa.int64()),
            }
        )
        out = relational.hash_join(
            rd.from_arrow(left_tbl), rd.from_arrow(right_tbl), on="k", how="inner"
        )
        got = pa.concat_tables(
            out.iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("k", "ascending"), ("lv", "ascending"), ("rv", "ascending")])
        import duckdb

        want = duckdb.sql(
            "SELECT l.k, lv, rv FROM left_tbl l JOIN right_tbl r USING (k) "
            "ORDER BY k, lv, rv"
        ).arrow().cast(got.schema)
        assert got.equals(want)

    def test_degenerate_lsh_bucket_is_bounded(self):
        """5k near-identical template docs land in one (band_id, band_key)
        bucket; sorted-neighborhood sub-banding must keep per-bucket work
        O(n·window), keep the cluster connected, and leave small buckets'
        exact all-pairs output unchanged."""
        import ray.data as rd

        from pyppmd_ray.functions import dedup as dd
        from pyppmd_ray.functions.graph import connected_components

        n = 2000
        docs = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": [
                    "the standard template paragraph repeated across the "
                    f"whole mirror corpus with only the page id {i} varying"
                    for i in range(n)
                ],
            }
        )
        pairs = dd.minhash_lsh_pairs(
            rd.from_arrow(docs), threshold=0.3, bucket_cap=256, bucket_window=8
        )
        tbl = pa.concat_tables(
            pairs.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        assert 0 < tbl.num_rows <= n * 8 * 16  # bounded: ≤ n·window·bands
        # the near-identical cluster must stay CONNECTED through the
        # pruned candidate set
        comp = connected_components(pairs, "doc_id_a", "doc_id_b")
        ct = pa.concat_tables(
            comp.iter_batches(batch_size=None, batch_format="pyarrow")
        )
        labels = set(ct["lbl"].to_pylist())
        covered = set(ct["node"].to_pylist())
        assert len(covered) >= n * 0.9
        assert len(labels) <= max(1, len(covered) // 50)

        # small buckets: capped path inactive → pairs identical to exact
        small = pa.table(
            {
                "doc_id": pa.array(range(40), type=pa.int64()),
                "text": [
                    ("shared boilerplate text " * 5 + f"tail {i % 4}")
                    for i in range(40)
                ],
            }
        )
        a = pa.concat_tables(
            dd.minhash_lsh_pairs(rd.from_arrow(small), threshold=0.3)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("doc_id_a", "ascending"), ("doc_id_b", "ascending")])
        b = pa.concat_tables(
            dd.minhash_lsh_pairs(
                rd.from_arrow(small), threshold=0.3, bucket_cap=2, bucket_window=64
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("doc_id_a", "ascending"), ("doc_id_b", "ascending")])
        assert a.num_rows > 0
        # full-window sub-banding on tiny buckets must cover every pair
        # that the exact path finds (window >= bucket size ⇒ identical)
        assert a.equals(b)

    def test_topk_descending_unsigned_and_int64min(self):
        import ray.data as rd

        from pyppmd_ray.functions.sample import topk

        tu = pa.table(
            {
                "v": pa.array([1, (1 << 64) - 1, 5, 0], type=pa.uint64()),
                "id": pa.array([0, 1, 2, 3], type=pa.int64()),
            }
        )
        got = topk(rd.from_arrow(tu), "v", 2, ascending=False, tie_by="id")
        assert got["id"].to_pylist() == [1, 2]
        imin = -(1 << 63)
        ti = pa.table(
            {
                "v": pa.array([imin, 3, -7], type=pa.int64()),
                "id": pa.array([0, 1, 2], type=pa.int64()),
            }
        )
        got = topk(rd.from_arrow(ti), "v", 2, ascending=False, tie_by="id")
        assert got["v"].to_pylist() == [3, -7]

    def test_decode_actor_pool_quarantines(self, tmp_path):
        """decode_dataset(concurrency=N, on_error='quarantine') must honor
        the quarantine contract, not raise on the first corrupt block."""
        import os

        import ray.data as rd

        from pyppmd_ray.fixtures import generate_source_table
        from pyppmd_ray.pipelines.compress import decode_dataset, encode_dataset

        t = generate_source_table(200, seed=11)
        enc = pa.concat_tables(
            encode_dataset(rd.from_arrow(t), target_block_bytes=32 << 10)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
        assert enc.num_rows >= 2
        payloads = enc["payload"].to_pylist()
        bad = bytearray(payloads[0])
        bad[5:25] = b"\x00" * 20
        payloads[0] = bytes(bad)
        enc = enc.set_column(
            enc.schema.get_field_index("payload"), "payload",
            pa.array(payloads, type=pa.large_binary()),
        )
        qdir = str(tmp_path / "q")
        dec = pa.concat_tables(
            decode_dataset(
                rd.from_arrow(enc), concurrency=2, on_error="quarantine",
                quarantine_dir=qdir,
            ).iter_batches(batch_size=None, batch_format="pyarrow")
        )
        assert 0 < dec.num_rows < 200
        assert len([f for f in os.listdir(qdir) if f.endswith(".bin")]) == 1


@pytest.mark.usefixtures("ray_session")
class TestGroupedTopkTermFreq:
    def test_grouped_topk_matches_pandas(self):
        import numpy as np
        import ray.data as rd

        from pyppmd_ray.functions.sample import grouped_topk

        rng = np.random.default_rng(11)
        n = 5000
        t = pa.table(
            {
                "g": pa.array(rng.integers(0, 7, n).astype("str")),
                "v": pa.array(rng.integers(-100, 100, n), type=pa.int64()),
                "id": pa.array(np.arange(n), type=pa.int64()),
            }
        )
        got = (
            grouped_topk(rd.from_arrow(t), "g", "v", 4, tie_by="id")
            .to_pandas()
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        import pandas as pd

        df = t.to_pandas()
        want = (
            df.sort_values(["v", "id"], ascending=[False, True])
            .groupby("g", sort=True)
            .head(4)
            .sort_values(["g", "v", "id"], ascending=[True, False, True])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["g", "v", "id"]], want[["g", "v", "id"]])

    def test_grouped_topk_unsigned_and_int64min(self):
        import numpy as np
        import ray.data as rd

        from pyppmd_ray.functions.sample import grouped_topk

        t = pa.table(
            {
                "g": pa.array(["a"] * 4 + ["b"] * 4),
                "v": pa.array(
                    [0, 2**64 - 1, 5, 1, 2**63, 7, 0, 2**64 - 2], type=pa.uint64()
                ),
                "id": pa.array(list(range(8)), type=pa.int64()),
            }
        )
        out = (
            grouped_topk(rd.from_arrow(t), "g", "v", 2, tie_by="id")
            .to_pandas()
            .sort_values(["g", "v"], ascending=[True, False])
        )
        assert out[out.g == "a"]["v"].tolist() == [2**64 - 1, 5]
        assert out[out.g == "b"]["v"].tolist() == [2**64 - 2, 2**63]

    def test_term_doc_freq_counts(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import term_doc_freq

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": ["a b a", "b\tc", "  ", None],
            }
        )
        out = (
            term_doc_freq(rd.from_arrow(t))
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        assert out.term.tolist() == ["a", "b", "c"]
        assert out.df.tolist() == [1, 2, 1]
        assert out.tf.tolist() == [2, 2, 1]


class TestNgramCounts:
    def test_bigram_df_tf(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import ngram_counts

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": ["a b a b", "a b", "  "],
            }
        )
        out = (
            ngram_counts(rd.from_arrow(t), n=2)
            .to_pandas()
            .sort_values("gram")
            .reset_index(drop=True)
        )
        assert out.gram.tolist() == ["a b", "b a"]
        assert out.df.tolist() == [2, 1]
        assert out.tf.tolist() == [3, 1]

    def test_n_validation(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import ngram_counts

        t = pa.table({"doc_id": pa.array([1], type=pa.int64()), "text": ["x"]})
        with pytest.raises(ValueError):
            ngram_counts(rd.from_arrow(t), n=0)


class TestHeavyHitters:
    def _corpus(self):
        # 4000 singleton terms (the long tail a full groupby would
        # shuffle) + 3 hot terms; one doc per row, spread over 8 blocks
        rng = np.random.default_rng(7)
        docs = []
        hot = ["alpha"] * 900 + ["beta"] * 500 + ["gamma"] * 120
        tail = [f"t{i:05d}" for i in range(4000)]
        words = hot + tail
        rng.shuffle(words)
        for i in range(0, len(words), 20):
            docs.append(" ".join(words[i : i + 20]))
        return pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": docs,
            }
        )

    def test_exact_counts_high_cardinality(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import heavy_hitters

        tbl = self._corpus()
        # N = 5520 tokens; phi=0.02 -> threshold ceil(110.4)=111:
        # alpha/beta/gamma qualify, all 4000 singletons must not
        out = (
            heavy_hitters(rd.from_arrow(tbl).repartition(8), phi=0.02)
            .to_pandas()
            .sort_values("term")
            .reset_index(drop=True)
        )
        assert out.term.tolist() == ["alpha", "beta", "gamma"]
        assert out.tf.tolist() == [900, 500, 120]

    def test_threshold_excludes_below_phi(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import heavy_hitters

        tbl = self._corpus()
        # phi=0.1 -> threshold 552: only alpha survives
        out = heavy_hitters(rd.from_arrow(tbl).repartition(4), phi=0.1).to_pandas()
        assert out.term.tolist() == ["alpha"]
        assert out.tf.tolist() == [900]

    def test_empty_and_null_text(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import heavy_hitters

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array([None, "   "], type=pa.string()),
            }
        )
        out = heavy_hitters(rd.from_arrow(tbl), phi=0.5)
        # Dataset keeps the (term, tf) schema even when empty (Ray's
        # to_pandas drops columns of a 0-row dataset, so check schema())
        assert out.count() == 0
        assert out.schema().names == ["term", "tf"]

    def test_phi_validation(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import heavy_hitters

        with pytest.raises(ValueError):
            heavy_hitters(rd.from_arrow(self._corpus()), phi=0.0)


class TestGroupedQuantiles:
    def test_exact_per_group(self):
        import ray.data as rd

        from pyppmd_ray.functions.stats import grouped_quantiles

        tbl = pa.table(
            {
                "g": ["a"] * 10 + ["b"] * 4,
                "v": pa.array(
                    list(range(1, 11)) + [100, 200, 200, 300], type=pa.int64()
                ),
            }
        )
        out = (
            grouped_quantiles(rd.from_arrow(tbl), "g", "v", [0.5, 0.9])
            .to_pandas()
            .sort_values(["g", "q"])
            .reset_index(drop=True)
        )
        # a: n=10 -> ranks 5, 9 -> values 5, 9; b: n=4 -> ranks 2, 4
        assert out.g.tolist() == ["a", "a", "b", "b"]
        assert out.value.tolist() == [5.0, 9.0, 200.0, 300.0]
        assert out.exact.all()

    def test_nulls_excluded(self):
        import ray.data as rd

        from pyppmd_ray.functions.stats import grouped_quantiles

        tbl = pa.table(
            {
                "g": ["a", "a", "a"],
                "v": pa.array([None, 7, None], type=pa.int64()),
            }
        )
        out = grouped_quantiles(rd.from_arrow(tbl), "g", "v", [0.5]).to_pandas()
        assert out.value.tolist() == [7.0]


class TestGroupedOutliers:
    def test_tukey_fences(self):
        import ray.data as rd

        from pyppmd_ray.functions.stats import grouped_outliers

        # group a: q1=2, q3=4 (n=8), IQR=2 -> fences [-1, 7]; 100 flagged
        # group b: all equal -> IQR=0 -> only exact-unequal values flag
        tbl = pa.table(
            {
                "doc_id": pa.array(range(12), type=pa.int64()),
                "g": ["a"] * 9 + ["b"] * 3,
                "v": pa.array(
                    [1, 2, 2, 3, 3, 4, 4, 5, 100, 7, 7, 7], type=pa.int64()
                ),
            }
        )
        out = (
            grouped_outliers(rd.from_arrow(tbl), "g", "v", id_col="doc_id")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.doc_id.tolist() == [8]
        assert out.v.tolist() == [100]

    def test_nulls_never_flagged(self):
        import ray.data as rd

        from pyppmd_ray.functions.stats import grouped_outliers

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "g": ["a"] * 5,
                "v": pa.array([10, 10, 10, None, 99], type=pa.int64()),
            }
        )
        out = grouped_outliers(rd.from_arrow(tbl), "g", "v", id_col="doc_id").to_pandas()
        assert out.doc_id.tolist() == [5]

    def test_null_group_rows_never_flagged(self):
        import ray.data as rd

        from pyppmd_ray.functions.stats import grouped_outliers

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
                "g": pa.array(["a", "a", "a", "a", None, None], type=pa.string()),
                "v": pa.array([10, 10, 10, 99, 10**6, 10**6], type=pa.int64()),
            }
        )
        out = grouped_outliers(rd.from_arrow(tbl), "g", "v", id_col="doc_id").to_pandas()
        # null-group rows are never flagged (SQL join semantics), and
        # must not crash the dictionary fence lookup
        assert out.doc_id.tolist() == [4]


class TestEmptyInputCollects:
    def test_driver_merge_operators_on_empty_dataset(self):
        # empty Datasets yield ZERO batches from iter_batches; every
        # driver-merge operator must tolerate that, not ArrowInvalid
        import ray.data as rd

        from pyppmd_ray.functions.ann import brute_force_topk, train_centroids
        from pyppmd_ray.functions.sample import topk
        from pyppmd_ray.functions.stats import (
            kmv_distinct,
            profile_numeric,
            quantiles,
        )

        empty = rd.from_arrow(
            pa.table(
                {
                    "v": pa.array([], type=pa.float64()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )
        assert topk(empty, "v", 3).num_rows == 0
        assert kmv_distinct(empty, "text", k=8).num_rows == 1
        assert quantiles(empty, "v", [0.5]).num_rows == 0
        prof = profile_numeric(empty, ["v"])
        assert prof.num_rows == 1 and prof["n_rows"][0].as_py() == 0
        emb = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float32())),
                }
            )
        )
        assert brute_force_topk(
            emb, np.eye(2, 4, dtype=np.float32), k=2
        ).num_rows == 0
        with pytest.raises(ValueError):
            train_centroids(emb, n_centroids=2, n_iters=1)


class TestPrepareTrainingCorpus:
    def test_all_stages_compose(self):
        import ray.data as rd

        from pyppmd_ray.functions.pipeline import prepare_training_corpus

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": [
                    "one two three four five six seven",  # kept: 7 toks -> chunks 3+3+1
                    "one two three four five six seven",  # exact dup of 1 -> dropped
                    "spam spam spam spam spam",           # dup_frac 0.8 -> dropped
                    "eval set secret answer here",        # contaminated -> dropped
                    "clean short doc",                    # kept: 1 chunk of 3
                ],
            }
        )
        bench = pa.table({"text": ["the eval set secret answer here today"]})
        out = (
            prepare_training_corpus(
                rd.from_arrow(docs),
                rd.from_arrow(bench),
                contam_ngram=5,
                max_dup_token_frac=0.6,
                chunk_tokens=3,
                pack_budget=4,
            )
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        assert out.doc_id.tolist() == [1, 1, 1, 5]
        assert out.chunk_id.tolist() == [0, 1, 2, 0]
        assert out.n_tokens.tolist() == [3, 3, 1, 3]
        # packs over uid order: before = 0,3,6,7 -> //4 = 0,0,1,1
        assert out.pack_id.tolist() == [0, 0, 1, 1]


class TestImageResizer:
    def test_nearest_neighbor_resample(self):
        from pyppmd_ray.functions.multimodal import ImageResizer

        rz = ImageResizer(target_w=2, target_h=2)
        px = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = rz.resize(px)
        # ri = [0, 2], ci = [0, 2]
        assert out.tolist() == [[0, 2], [8, 10]]

    def test_decode_resize_roundtrip(self):
        from pyppmd_ray.functions.multimodal import (
            ImageResizer,
            deterministic_pixels,
            make_png,
        )

        w, h, n = 11, 17, 42
        px = deterministic_pixels(w, h, n)
        payload = make_png(w, h, b"x", px)
        rz = ImageResizer(target_w=8, target_h=8)
        tbl = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "payload": pa.array([payload], type=pa.large_binary()),
            }
        )
        out = rz(tbl)
        expect = px[(np.arange(8) * h) // 8][:, (np.arange(8) * w) // 8]
        assert out["px_sum"][0].as_py() == int(expect.astype(np.int64).sum())
        with pytest.raises(ValueError):
            ImageResizer(target_w=0)


class TestWinnowDuplicateFingerprints:
    def test_shared_span_detected(self):
        import ray.data as rd

        from pyppmd_ray.functions.dedup import winnow_duplicate_fingerprints

        shared = "the quick brown fox jumps over the lazy dog tonight"
        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": [
                    "AAA " + shared + " BBB",
                    "CCCCC " + shared + " DDDDD",
                    "completely unrelated content that matches nothing else here",
                ],
            }
        )
        out = winnow_duplicate_fingerprints(
            rd.from_arrow(docs).repartition(3), k=8, window=16
        ).to_pandas()
        # the shared 52-byte span must contribute >= 1 shared fingerprint
        assert len(out) >= 1
        assert (out.n_docs == 2).all()

    def test_matches_reference_kernel_per_doc(self):
        # the vectorized batch kernel must produce the same per-doc
        # fingerprint sets as WinnowFingerprinter's per-doc rolling hash
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        import ray.data as rd

        from pyppmd_ray.functions.dedup import winnow_duplicate_fingerprints

        rng = np.random.default_rng(12)
        texts = [
            "".join(chr(97 + c) for c in rng.integers(0, 6, int(n)))
            for n in rng.integers(1, 120, 40)
        ]
        # make overlaps likely: small alphabet + duplicate a few docs
        texts += texts[:5]
        docs = pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": texts,
            }
        )
        k, window = 8, 16
        mask = (1 << 63) - 1

        def ref_fps(t: str) -> set:
            a = np.frombuffer(t.encode(), dtype=np.uint8)
            if a.size < k:
                return set()
            n = a.size - k + 1
            g = np.zeros(n, dtype=np.uint64)
            prime = np.uint64(0x100000001B3)
            for j in range(k):
                g = g * prime + a[j : j + n].astype(np.uint64)
            w = min(window, n)
            mins = sliding_window_view(g, w).min(axis=1)
            return {int(v) & mask for v in np.unique(mins)}

        from collections import Counter

        cnt = Counter()
        for t in texts:
            for fp in ref_fps(t):
                cnt[fp] += 1
        expect = sorted((fp, c) for fp, c in cnt.items() if c >= 2)
        out = (
            winnow_duplicate_fingerprints(
                rd.from_arrow(docs).repartition(4), k=k, window=window
            )
            .to_pandas()
            .sort_values("fp")
            .reset_index(drop=True)
        )
        assert list(map(tuple, out.itertuples(index=False))) == expect


class TestContamination:
    def test_flags_and_counts(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import contamination

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                "text": [
                    "the quick brown fox jumps over",  # grams: 4 (n=3)
                    "lazy dog sleeps",                 # 1 gram, clean
                    "quick brown fox jumps high now",  # shares 2 grams w/ bench
                    "xx",                              # < n tokens: 0 grams
                    None,
                ],
            }
        )
        bench = pa.table(
            {"text": ["a the quick brown fox jumps b", "unrelated words here"]}
        )
        out = (
            contamination(
                rd.from_arrow(docs), rd.from_arrow(bench).repartition(2), n=3
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.n_grams.tolist() == [4, 1, 4, 0, 0]
        # doc1: "the quick brown","quick brown fox","brown fox jumps" hit
        assert out.n_hits.tolist() == [3, 0, 2, 0, 0]
        assert out.contaminated.tolist() == [True, False, True, False, False]

    def test_empty_benchmark(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import contamination

        docs = pa.table(
            {"doc_id": pa.array([1], type=pa.int64()), "text": ["a b c d"]}
        )
        bench = pa.table({"text": pa.array([None, "  "], type=pa.string())})
        out = contamination(rd.from_arrow(docs), rd.from_arrow(bench), n=3).to_pandas()
        assert out.n_grams.tolist() == [2]
        assert out.n_hits.tolist() == [0]
        assert out.contaminated.tolist() == [False]

    def test_ngrams_do_not_cross_rows(self):
        from pyppmd_ray.functions.text import _word_ngrams

        grams, widx = _word_ngrams(pa.array(["a b", "c d"]), 2)
        assert grams.to_pylist() == ["a b", "c d"]
        assert widx.tolist() == [0, 1]


class TestChunkDocuments:
    def test_splitting_and_normalization(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import chunk_documents

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": [
                    "a b c d e f g",     # 7 toks @3 -> 3,3,1
                    "  x\t\ty  ",        # whitespace normalized to "x y"
                    None,                # no chunks
                ],
            }
        )
        out = (
            chunk_documents(rd.from_arrow(docs), max_tokens=3)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        assert out.doc_id.tolist() == [1, 1, 1, 2]
        assert out.chunk_id.tolist() == [0, 1, 2, 0]
        assert out.text.tolist() == ["a b c", "d e f", "g", "x y"]
        assert out.n_tokens.tolist() == [3, 3, 1, 2]

    def test_budget_boundary(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import chunk_documents

        docs = pa.table(
            {"doc_id": pa.array([1], type=pa.int64()), "text": ["a b c d"]}
        )
        out = chunk_documents(rd.from_arrow(docs), max_tokens=4).to_pandas()
        assert out.text.tolist() == ["a b c d"]
        with pytest.raises(ValueError):
            chunk_documents(rd.from_arrow(docs), max_tokens=0)


class TestStratifiedExactK:
    def test_exact_k_per_group_deterministic(self):
        import hashlib

        import ray.data as rd

        from pyppmd_ray.functions.sample import stratified_exact_k

        n = 60
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "lang": [["en", "de"][i % 2] for i in range(n)],
            }
        )
        out = (
            stratified_exact_k(rd.from_arrow(tbl).repartition(4), "lang", 5)
            .to_pandas()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        assert out.groupby("lang").size().tolist() == [5, 5]
        # brute force: 5 smallest sha256(doc_id) per lang
        def h(i):
            return int.from_bytes(hashlib.sha256(str(i).encode()).digest()[:8], "big")

        for lang, off in (("en", 0), ("de", 1)):
            ids = sorted(range(off, n, 2), key=lambda i: (h(i), i))[:5]
            assert sorted(out[out.lang == lang].doc_id.tolist()) == sorted(ids)
        # no helper column leaks into the output
        assert list(out.columns) == ["doc_id", "lang"]


class TestTokenBudgetSample:
    def test_empty_dataset(self):
        # an empty Dataset yields ZERO batches from iter_batches — the
        # prefix-sum partials collect must not assume one empty batch
        import ray.data as rd

        from pyppmd_ray.functions.sequence import pack_sequences, token_budget_sample

        empty = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "lang": pa.array([], type=pa.string()),
                    "text": pa.array([], type=pa.string()),
                }
            )
        )
        assert token_budget_sample(empty, budget=10).count() == 0
        assert pack_sequences(empty, budget=10).count() == 0


    def test_greedy_fill_matches_bruteforce(self):
        import hashlib

        import ray.data as rd

        from pyppmd_ray.functions.sequence import token_budget_sample

        rng = np.random.default_rng(3)
        n = 200
        langs = [["en", "de", "fr"][i % 3] for i in range(n)]
        texts = [" ".join("w" + str(j) for j in range(rng.integers(1, 30))) for _ in range(n)]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "lang": langs,
                "text": texts,
            }
        )
        budget = 150
        out = (
            token_budget_sample(
                rd.from_arrow(tbl).repartition(6), budget=budget
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        # brute-force reference: per-lang sha256(doc_id) order, greedy fill
        def h(i):
            return int.from_bytes(hashlib.sha256(str(i).encode()).digest()[:8], "big")

        expect = []
        for lang in sorted(set(langs)):
            docs = sorted(
                (i for i in range(n) if langs[i] == lang), key=lambda i: (h(i), i)
            )
            cum = 0
            for i in docs:
                nt = len(texts[i].split())
                if cum < budget:
                    expect.append((i, lang, nt, cum))
                cum += nt
        expect.sort()
        assert list(map(tuple, out.itertuples(index=False))) == expect

    def test_budget_validation(self):
        import ray.data as rd

        from pyppmd_ray.functions.sequence import token_budget_sample

        tbl = pa.table(
            {"doc_id": pa.array([1], type=pa.int64()), "lang": ["en"], "text": ["x"]}
        )
        with pytest.raises(ValueError):
            token_budget_sample(rd.from_arrow(tbl), budget=0)


class TestReassembleChunks:
    def test_order_restored(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import reassemble_chunks

        # chunks deliberately out of order across docs
        chunks = pa.table(
            {
                "doc_id": pa.array([2, 1, 1, 2, 1], type=pa.int64()),
                "chunk_id": pa.array([1, 2, 0, 0, 1], type=pa.int64()),
                "text": ["dog", "c", "a b", "lazy", None],
            }
        )
        out = (
            reassemble_chunks(rd.from_arrow(chunks))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.doc_id.tolist() == [1, 2]
        assert out.text.tolist() == ["a b  c", "lazy dog"]  # null -> ""
        assert out.n_chunks.tolist() == [3, 2]

    def test_roundtrip_with_chunking(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import chunk_documents, reassemble_chunks

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": ["one two three four five", "just  spaced\ttokens"],
            }
        )
        out = (
            reassemble_chunks(chunk_documents(rd.from_arrow(docs), max_tokens=2))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.text.tolist() == [
            "one two three four five",
            "just spaced tokens",
        ]
        assert out.n_chunks.tolist() == [3, 2]


class TestRepetitionScores:
    def test_crafted_fractions(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import repetition_scores

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": [
                    "a b a b a b a b",   # 8 toks, 2 distinct; 7 2grams 2 distinct; 4 5grams 2 distinct
                    "w x y z",           # all unique
                    "",                  # empty -> zeros
                    None,
                ],
            }
        )
        out = (
            repetition_scores(rd.from_arrow(docs))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.n_tokens.tolist() == [8, 4, 0, 0]
        assert out.dup_token_frac.tolist() == [1 - 2 / 8, 0.0, 0.0, 0.0]
        assert out.top_token_frac.tolist() == [4 / 8, 1 / 4, 0.0, 0.0]
        assert out.dup_2gram_frac.tolist() == [1 - 2 / 7, 0.0, 0.0, 0.0]
        assert out.dup_5gram_frac.tolist() == [1 - 2 / 4, 0.0, 0.0, 0.0]

    def test_short_doc_no_windows(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import repetition_scores

        docs = pa.table(
            {"doc_id": pa.array([1], type=pa.int64()), "text": ["only three words"]}
        )
        out = repetition_scores(rd.from_arrow(docs)).to_pandas()
        assert out.n_tokens.tolist() == [3]
        assert out.dup_5gram_frac.tolist() == [0.0]


class TestSessionize:
    def test_gap_splitting_and_summary(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import sessionize

        base = 1_700_000_000_000_000
        gap = 1_800_000_000  # 30 min in us
        # user 1: events at 0, 10min, 20min | 2h, 2h+5min  -> 2 sessions
        # user 2: single event              -> 1 session of 1
        rows = [
            (1, base, 1), (1, base + 600_000_000, 2), (1, base + 1_200_000_000, 3),
            (1, base + 7_200_000_000, 4), (1, base + 7_500_000_000, 5),
            (2, base + 42, 6),
        ]
        tbl = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        out = pa.concat_tables(
            sessionize(rd.from_arrow(tbl), gap_us=gap)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("user_id", "ascending"), ("session_id", "ascending")])
        assert out["user_id"].to_pylist() == [1, 1, 2]
        assert out["session_id"].to_pylist() == [1, 2, 1]
        assert out["n_events"].to_pylist() == [3, 2, 1]
        assert out["duration_us"].to_pylist() == [1_200_000_000, 300_000_000, 0]
        assert out["first_ts"].type == pa.timestamp("us")
        assert out["first_ts"].to_pylist()[2] == out["last_ts"].to_pylist()[2]

    def test_exact_gap_boundary_stays_in_session(self):
        """A gap of EXACTLY gap_us does not split (strictly-greater rule —
        matches the oracle SQL's `> gap` comparison)."""
        import ray.data as rd

        from pyppmd_ray.functions.relational import sessionize

        base = 1_700_000_000_000_000
        tbl = pa.table(
            {
                "user_id": pa.array([7, 7], type=pa.int64()),
                "ts": pa.array([base, base + 1_800_000_000], type=pa.timestamp("us")),
                "event_id": pa.array([1, 2], type=pa.int64()),
            }
        )
        out = pa.concat_tables(
            sessionize(rd.from_arrow(tbl), gap_us=1_800_000_000)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
        assert out.num_rows == 1 and out["n_events"].to_pylist() == [2]


class TestDocRareTerms:
    def test_topk_rare_terms_with_ties(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import doc_rare_terms

        # corpus of 4 docs; "common" appears in all; the rest are rare
        docs = [
            (1, "common rare1 rare1 rare2 zeta zeta zeta"),
            (2, "common common rare3"),
            (3, "common alpha beta"),
            (4, "common"),
        ]
        tbl = pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
                "text": pa.array([d[1] for d in docs]),
            }
        )
        out = pa.concat_tables(
            doc_rare_terms(rd.from_arrow(tbl), max_df=3, k=2)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        ).sort_by([("doc_id", "ascending"), ("tf", "descending")])
        rows = list(
            zip(out["doc_id"].to_pylist(), out["term"].to_pylist(), out["tf"].to_pylist())
        )
        # doc 1: zeta(3), rare1(2) — rare2 cut by k=2; doc 4: nothing rare
        assert rows == [
            (1, "zeta", 3), (1, "rare1", 2),
            (2, "rare3", 1),
            (3, "alpha", 1), (3, "beta", 1),
        ]

    def test_tie_break_is_term_ascending(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import doc_rare_terms

        tbl = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "text": pa.array(["bb aa cc bb aa cc"]),
            }
        )
        out = pa.concat_tables(
            doc_rare_terms(rd.from_arrow(tbl), max_df=5, k=2)
            .iter_batches(batch_size=None, batch_format="pyarrow")
        )
        assert sorted(out["term"].to_pylist()) == ["aa", "bb"]


class TestRayInternalsPin:
    """_streaming_map_groups (relational.py) mirrors Ray 2.49's private
    map_groups plumbing. These pins make a Ray upgrade fail LOUDLY here
    instead of silently changing group semantics."""

    def test_group_boundary_helper_exists_and_is_contiguous(self):
        from ray.data.block import BlockAccessor

        t = pa.table(
            {
                "k": pa.array([1, 1, 2, 2, 2, 5], type=pa.int64()),
                "v": pa.array(range(6), type=pa.int64()),
            }
        )
        acc = BlockAccessor.for_block(t)
        assert hasattr(acc, "_get_group_boundaries_sorted"), (
            "Ray upgrade removed BlockAccessor._get_group_boundaries_sorted — "
            "port _streaming_map_groups to the new plumbing"
        )
        bounds = list(acc._get_group_boundaries_sorted(["k"]))
        # contiguous cover of the sorted block: [0, 2, 5, 6]
        assert bounds[0] == 0 and bounds[-1] == t.num_rows
        assert bounds == sorted(bounds)
        groups = [
            set(t.slice(s, e - s)["k"].to_pylist())
            for s, e in zip(bounds[:-1], bounds[1:])
        ]
        assert all(len(g) == 1 for g in groups), "boundaries split a key group"
        assert [g.pop() for g in groups] == [1, 2, 5]

    def test_shuffle_strategy_surface(self):
        from ray.data.context import DataContext, ShuffleStrategy

        assert hasattr(ShuffleStrategy, "HASH_SHUFFLE")
        ctx = DataContext.get_current()
        assert hasattr(ctx, "shuffle_strategy")
        assert isinstance(ctx.default_hash_shuffle_parallelism, int)


class TestSaltKeys:
    def test_selective_salt_matches_unsalted(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import hash_join

        rng = np.random.default_rng(3)
        keys = np.concatenate([np.zeros(300, dtype=np.int64),
                               rng.integers(1, 40, size=300).astype(np.int64)])
        left = pa.table({"k": keys, "lv": np.arange(keys.size, dtype=np.int64)})
        rk = np.repeat(np.arange(40, dtype=np.int64), 2)
        right = pa.table({"k": rk, "rv": np.arange(rk.size, dtype=np.int64)})

        def rows(**kw):
            out = hash_join(
                rd.from_arrow(left), rd.from_arrow(right), on="k", how="inner", **kw
            ).to_pandas()
            return sorted(map(tuple, out[["k", "lv", "rv"]].itertuples(index=False)))

        base = rows()
        assert rows(salt=4, salt_keys=[0]) == base
        assert rows(salt=4) == base
        # hot set that matches nothing: degenerates to unsalted grouping
        assert rows(salt=4, salt_keys=[999]) == base

    def test_salt_keys_validation(self):
        import ray.data as rd

        from pyppmd_ray.functions.relational import hash_join

        t = pa.table({"k": pa.array([1], type=pa.int64()),
                      "v": pa.array([1], type=pa.int64())})
        with pytest.raises(ValueError, match="salt_keys requires salt"):
            hash_join(rd.from_arrow(t), rd.from_arrow(t), on="k", salt_keys=[1])


class TestDocRareTermsFrac:
    def test_max_df_frac_matches_equivalent_absolute(self):
        import ray.data as rd

        from pyppmd_ray.functions.text import doc_rare_terms

        docs = [(i, "common filler word%d" % (i % 2)) for i in range(10)]
        tbl = pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], type=pa.int64()),
                "text": pa.array([d[1] for d in docs]),
            }
        )

        def rows(**kw):
            out = pa.concat_tables(
                doc_rare_terms(rd.from_arrow(tbl), k=2, **kw)
                .iter_batches(batch_size=None, batch_format="pyarrow")
            )
            return sorted(
                zip(out["doc_id"].to_pylist(), out["term"].to_pylist(),
                    out["tf"].to_pylist())
            )

        # frac 0.5 of 10 docs -> max_df 5: word0/word1 (df=5) stay rare,
        # common/filler (df=10) are head — identical to absolute max_df=5
        assert rows(max_df_frac=0.5) == rows(max_df=5)
        with pytest.raises(ValueError, match="max_df_frac"):
            rows(max_df_frac=1.5)
