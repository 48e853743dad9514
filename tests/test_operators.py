"""Extension-operator unit tests: dedup, similarity, text, multimodal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from high_throughput_etl_pipeline_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    jaccard_pairs,
    minhash_near_duplicates,
    norm_words,
    simhash64,
    simhash_near_duplicates,
    word_shingles,
)
from high_throughput_etl_pipeline_spark.operators.multimodal import (
    extract_features,
    make_media_table,
    resize_plan,
)
from high_throughput_etl_pipeline_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
)
from high_throughput_etl_pipeline_spark.operators.text import (
    detect_language,
    quality_features,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 0
        (2, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup of 0
        (3, "completely different text about spark engines", "en"),
        (4, "der hund und die katze sind nicht ein tier", "de"),
        (5, "xyzzy plugh", "zz"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_exact_dedup(spark, docs):
    groups = exact_duplicates(docs).filter(F.col("dup_count") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 0
    assert groups[0]["member_ids"] == [0, 2]
    kept = dedup_exact(docs)
    assert kept.count() == 5
    assert 2 not in {r["doc_id"] for r in kept.collect()}


def test_span_dedup_canonical_and_reassembly(spark):
    from high_throughput_etl_pipeline_spark.operators.dedup import span_dedup

    # 3-word spans; doc 0/1 share their first span ("a b c"), doc 2 is
    # unique, doc 3 repeats doc 0's span INTERNALLY too (pos 0 and 1)
    rows = [
        (0, "a b c x y z"),
        (1, "a b c p q r"),
        (2, "u v w"),
        (3, "a b c a b c tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: r
        for r in span_dedup(df, span_words=3).collect()
    }
    # canonical occurrence = smallest (doc_id, pos): doc 0 keeps "a b c",
    # every other occurrence (doc 1 pos 0, doc 3 pos 0 and 1) is removed
    assert out[0]["text_deduped"] == "a b c x y z"
    assert out[1]["text_deduped"] == "p q r"
    assert out[1]["n_spans"] == 2 and out[1]["n_spans_kept"] == 1
    assert out[2]["text_deduped"] == "u v w"
    assert out[3]["text_deduped"] == "tail"  # trailing remainder survives
    assert out[3]["n_spans"] == 3 and out[3]["n_spans_kept"] == 1
    # conservation: kept spans never exceed total spans
    assert all(r["n_spans_kept"] <= r["n_spans"] for r in out.values())
    # document scope: doc 3's INTERNAL repeat is removed, but cross-doc
    # repeats (doc 0 vs doc 1) are untouched
    within = {
        r["doc_id"]: r
        for r in span_dedup(df, span_words=3, scope="document").collect()
    }
    assert within[0]["text_deduped"] == "a b c x y z"
    assert within[1]["text_deduped"] == "a b c p q r"
    assert within[3]["text_deduped"] == "a b c tail"


def test_bloom_contamination_equals_exact(spark, docs):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        benchmark_contamination,
        bloom_contamination,
    )

    bench = docs.filter(F.col("doc_id").isin(0, 4))
    corpus = docs.filter(~F.col("doc_id").isin(0, 4))
    exact = {
        (r["doc_id"], r["shared_ngrams"])
        for r in benchmark_contamination(corpus, bench, ngram_n=3).collect()
    }
    assert exact, "fixture must produce real contamination"
    got = {
        (r["doc_id"], r["shared_ngrams"])
        for r in bloom_contamination(corpus, bench, ngram_n=3).collect()
    }
    assert got == exact
    # a deliberately saturated filter (64 bits for dozens of grams → heavy
    # false-positive rate) must still confirm-join to the identical result
    saturated = {
        (r["doc_id"], r["shared_ngrams"])
        for r in bloom_contamination(
            corpus, bench, ngram_n=3, m_bits=64, k=2
        ).collect()
    }
    assert saturated == exact


def test_bigram_lm_scores_hand_computed(spark):
    import math

    from high_throughput_etl_pipeline_spark.operators.text import (
        bigram_lm_scores,
    )

    train = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a c")], "doc_id BIGINT, text STRING"
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "z q")], "doc_id BIGINT, text STRING"
    )
    out = {
        r["doc_id"]: r for r in bigram_lm_scores(train, score, k=0.5).collect()
    }
    # train bigrams: (<s>,a)x3, (a,b)x2, (a,c)x1; V = |{a,b,c}| = 3
    # doc 10: p(a|<s>) = 3.5/(3+0.5*4) = 0.7, p(b|a) = 2.5/(3+2) = 0.5
    # per-token log-probs land on the 1e-9 lattice BEFORE the average,
    # and the average itself is half-away-from-zero integer nanos
    # (libm-portability + decimal-tie discipline — mirror it here)
    def lat(p):
        return round(math.log(p) * 1e9)

    def avg_nanos(*lats):
        s, n = sum(lats), len(lats)
        m = (2 * abs(s) + n) // (2 * n)
        return m if s >= 0 else -m

    exp_avg = avg_nanos(lat(0.7), lat(0.5))
    assert out[10]["n_tokens"] == 2
    assert out[10]["avg_lp_nanos"] == exp_avg
    assert out[10]["perplexity"] == round(math.exp(-exp_avg / 1e9), 4)
    # doc 11 is fully unseen: p(z|<s>) = 0.5/(3+2) = 0.1 (seen context),
    # p(q|z) = 0.5/(0+2) = 0.25 (unseen context) — finite either way
    exp_avg11 = avg_nanos(lat(0.1), lat(0.25))
    assert out[11]["avg_lp_nanos"] == exp_avg11
    # unseen text scores strictly worse than in-distribution text
    assert out[11]["perplexity"] > out[10]["perplexity"]


def test_minhash_finds_near_dup(spark, docs):
    pairs = minhash_near_duplicates(
        docs, num_hashes=16, bands=8, shingle_n=2, jaccard_threshold=0.3
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 2) in found  # exact dup always collides
    assert (0, 1) in found or (1, 2) in found  # near-dup caught by a band
    assert all(p[0] < p[1] for p in found)


def test_minhash_portable_finds_near_dup(spark, docs):
    """The Kirsch-Mitzenmacher md5 lane family (portable=True) keeps the
    same banding behavior as the xxhash64 default: exact dups always
    collide, near-dups are caught by some band, ids stay ordered."""
    pairs = minhash_near_duplicates(
        docs,
        num_hashes=16,
        bands=8,
        shingle_n=2,
        jaccard_threshold=0.3,
        portable=True,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 2) in found
    assert (0, 1) in found or (1, 2) in found
    assert all(p[0] < p[1] for p in found)


def test_kmeans_lattice_recall_vs_exact(spark):
    """The deterministic lattice-Lloyd quantizer trains centers good
    enough for high IVF recall against exact cosine top-5 — and twice
    in a row gives IDENTICAL centers (the determinism the oracle
    replay depends on)."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centers_lattice,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = kmeans_centers_lattice(e, nlist=8, rounds=3)
    c2 = kmeans_centers_lattice(e, nlist=8, rounds=3)
    assert sorted(map(tuple, c1.collect())) == sorted(
        map(tuple, c2.collect())
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(e, q, k=5, nprobe=4, centers=c1).collect()
    }
    hits = len(exact & approx)
    assert hits >= 10, f"lattice-IVF recall too low: {hits}/15"


def test_kmeans_lattice_sparse_ids_fail_loudly(spark):
    """A sparse / non-zero-based id space must raise at training time,
    not silently seed fewer (or zero) centers and make downstream
    ivf_topk/semdedup return empty results (r9 ADVICE)."""
    import pytest as _pytest

    from high_throughput_etl_pipeline_spark.operators.similarity import (
        kmeans_centers_lattice,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    shifted = e.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    with _pytest.raises(ValueError, match="dense 0-based"):
        kmeans_centers_lattice(shifted, nlist=8, rounds=1)


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([("one two",), ("",)], "text STRING")
    out = df.select(
        word_shingles(norm_words(F.col("text")), 3).alias("s")
    ).collect()
    assert out[0]["s"] == []  # fewer words than n → empty, not garbage


def test_simhash_hamming_zero_for_identical(spark, docs):
    sh = docs.select("doc_id", simhash64("text", 32).alias("sh"))
    vals = {r["doc_id"]: r["sh"] for r in sh.collect()}
    assert vals[0] == vals[2]
    pairs = simhash_near_duplicates(
        docs, n_bits=32, max_hamming=8, prefix_bits=4
    ).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 2) and r["hamming"] == 0 for r in pairs)


def test_jaccard_pairs_blocked(spark, docs):
    pairs = jaccard_pairs(
        docs.withColumn("b", F.lit(1)),
        block_cols=["b"],
        shingle_n=2,
        threshold=0.5,
    ).collect()
    d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert d[(0, 2)] == 1.0
    assert 0.5 <= d[(0, 1)] < 1.0


def _hot_block_docs(spark):
    """One pathological hot block (60 docs, same block key) with a planted
    near-dup pair, plus a small block."""
    rows = [(i, "hot", f"alpha beta gamma delta token{i} unique{i} end{i}")
            for i in range(60)]
    rows.append((100, "hot", "alpha beta gamma delta token0 unique0 end0"))
    rows.append((200, "cold", "zeta eta theta iota"))
    rows.append((201, "cold", "zeta eta theta iota"))
    return spark.createDataFrame(rows, "doc_id BIGINT, b STRING, text STRING")


def test_jaccard_pairs_salt_path_is_exact(spark):
    """Oversized blocks take the salted-grid path; results must be
    IDENTICAL to the direct join (exact all-pairs semantics preserved)."""
    docs = _hot_block_docs(spark)
    direct = jaccard_pairs(
        docs, block_cols=["b"], threshold=0.2, max_block_rows=4096
    ).collect()
    salted = jaccard_pairs(
        docs, block_cols=["b"], threshold=0.2,
        max_block_rows=10, oversize="salt", salt_groups=4,
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"], r["jaccard"])
    assert sorted(map(key, salted)) == sorted(map(key, direct))
    assert any((r["id_a"], r["id_b"]) == (0, 100) for r in salted)


def test_jaccard_pairs_minhash_path_bounds_candidates(spark):
    """The minhash oversize path must not go quadratic: the planted
    near-dup survives while the candidate count stays far below the
    n*(n-1)/2 of the hot block."""
    docs = _hot_block_docs(spark)
    out = jaccard_pairs(
        docs, block_cols=["b"], threshold=0.5,
        max_block_rows=10, oversize="minhash",
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in out}
    assert (0, 100) in got          # identical docs always collide
    assert (200, 201) in got        # small block still direct/exact
    # 61 hot docs all-pairs = 1830; near-dup-density-bounded output must
    # be orders of magnitude smaller
    assert len(got) < 100


def test_jaccard_pairs_error_path(spark):
    import pytest as _pytest

    docs = _hot_block_docs(spark)
    with _pytest.raises(ValueError, match="max_block_rows"):
        jaccard_pairs(
            docs, block_cols=["b"], threshold=0.2,
            max_block_rows=10, oversize="error",
        ).collect()


def test_cosine_topk_self_is_rank1(spark):
    rows = [(i, [float(i == j) for j in range(8)]) for i in range(8)]
    vecs = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    qs = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk(vecs, qs, k=3).collect()
    rank1 = {r["query_id"]: r["vec_id"] for r in top if r["rank"] == 1}
    assert rank1 == {0: 0, 1: 1}


def test_lsh_topk_self_found(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(50)]
    vecs = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    qs = vecs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = lsh_topk(vecs, qs, k=3, n_planes=6, dim=64)
    rank1 = {r["query_id"]: r["vec_id"] for r in top.collect() if r["rank"] == 1}
    # the query vector itself shares its own bucket → always rank 1
    assert rank1 == {0: 0, 1: 1, 2: 2}


def test_text_features(spark, docs):
    tc = docs.select(token_count(F.col("text")).alias("n")).collect()
    assert tc[0]["n"] == 9
    feats = quality_features(docs).collect()
    by_id = {r["doc_id"]: r for r in feats}
    assert 0.0 <= by_id[0]["quality_score"] <= 1.0
    assert by_id[0]["stopword_ratio"] > by_id[5]["stopword_ratio"]
    langs = docs.select(
        "doc_id", detect_language(F.col("text")).alias("l")
    ).collect()
    by = {r["doc_id"]: r["l"] for r in langs}
    assert by[0] == "en"
    assert by[4] == "de"
    assert by[5] == "und"  # no stopword signal


def test_multimodal_plumbing(spark, docs):
    media = make_media_table(
        docs.withColumn("source", F.lit("src")).withColumn(
            "n_chars", F.length("text")
        )
    )
    feats = extract_features(media, feat_dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == 6
    assert all(len(r["features"]) == 8 and r["decode_ok"] for r in rows)
    # deterministic fake: same payload → same features
    by_id = {r["media_id"]: r["features"] for r in rows}
    assert by_id[0] == by_id[2]
    resized = resize_plan(media, 224, 224).select("meta.width").first()
    assert resized["width"] == 224
    with pytest.raises(NotImplementedError):
        extract_features(media, fake=False)


def test_wav_decoder_golden_bytes():
    """The REAL stdlib WAV path, pinned byte-for-byte: synth_wav_pcm16
    must emit exactly this 52-byte RIFF/WAVE payload (44-byte canonical
    header + 4 PCM16 LE frames) for (seed=12345, n=4, 8000 Hz), and
    decode_wav must recover the exact integer samples.  A drift in
    either direction (header layout, endianness, sample formula) breaks
    the hex, not just a statistic."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        decode_wav,
        synth_sample,
        synth_wav_pcm16,
    )

    golden_hex = (
        "524946462c00000057415645666d7420100000000100010040"
        "1f0000803e000002001000646174610800000039b0235a6ff71d88"
    )
    payload = synth_wav_pcm16(12345, 4, 8000)
    assert payload.hex() == golden_hex
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, samples = decode_wav(payload)
    assert rate == 8000
    assert samples == [-20423, 23075, -2193, -30691]
    assert samples == [synth_sample(12345, k) for k in range(4)]
    # encode→decode round-trip is lossless for other shapes too
    for seed, n in [(0, 16), (65535, 64), (31337, 33)]:
        r2, s2 = decode_wav(synth_wav_pcm16(seed, n, 16000))
        assert r2 == 16000
        assert s2 == [synth_sample(seed, k) for k in range(n)]


def test_ppm_decoder_golden_bytes():
    """The REAL stdlib PPM path, pinned byte-for-byte: synth_ppm must
    emit exactly this 23-byte P6 payload (11-byte header + 12 RGB
    bytes) for (seed=123, 2x2), decode_ppm must recover the exact
    pixels, comments in the header must be tolerated, and malformed
    payloads must raise."""
    import pytest as _pytest

    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        decode_ppm,
        synth_pixel,
        synth_ppm,
    )

    golden_hex = "50360a3220320a3235350a5d473189735d14fee8b19b85"
    payload = synth_ppm(123, 2, 2)
    assert payload.hex() == golden_hex
    assert payload.startswith(b"P6\n2 2\n255\n")
    w, h, px = decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert px == [
        synth_pixel(123, x, y, c)
        for y in range(2)
        for x in range(2)
        for c in range(3)
    ]
    # header comments are legal PPM — decoder must skip them
    commented = b"P6\n# synthetic\n2 2\n# maxval next\n255\n" + payload[11:]
    assert decode_ppm(commented) == (2, 2, px)
    # round-trip for other shapes
    for seed, ww, hh in [(0, 1, 1), (255, 8, 6), (42, 5, 3)]:
        w2, h2, px2 = decode_ppm(synth_ppm(seed, ww, hh))
        assert (w2, h2) == (ww, hh)
        assert px2 == [
            synth_pixel(seed, x, y, c)
            for y in range(hh)
            for x in range(ww)
            for c in range(3)
        ]
    with _pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P3\n2 2\n255\n...")
    with _pytest.raises(ValueError, match="short PPM raster"):
        decode_ppm(payload[:-3])
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00")


def test_bmp_decoder_golden_bytes():
    """The REAL stdlib BMP path, pinned byte-for-byte: synth_bmp must
    emit exactly this 70-byte payload (14-byte file header + 40-byte
    BITMAPINFOHEADER + two 8-byte padded bottom-up BGR rows) for
    (seed=123, 2x2); decode_bmp must undo the row flip, the BGR order,
    and the padding; a top-down (negative biHeight) payload decodes to
    the same pixels; malformed payloads must raise."""
    import struct as _struct

    import pytest as _pytest

    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        decode_bmp,
        synth_bmp,
        synth_pixel,
    )

    golden_hex = (
        "424d460000000000000036000000280000000200000002000000010018000000"
        "000010000000130b0000130b00000000000000000000e8fe14859bb100003147"
        "5d5d73890000"
    )
    payload = synth_bmp(123, 2, 2)
    assert payload.hex() == golden_hex
    expected = [
        synth_pixel(123, x, y, c)
        for y in range(2)
        for x in range(2)
        for c in range(3)
    ]
    assert decode_bmp(payload) == (2, 2, expected)
    # top-down storage (biHeight < 0): same pixels, rows pre-flipped
    raster = payload[54:]
    flipped = raster[8:16] + raster[0:8]
    top_down = (
        payload[:14]
        + _struct.pack("<Iii", 40, 2, -2)
        + payload[26:54]
        + flipped
    )
    assert decode_bmp(top_down) == (2, 2, expected)
    # padding is per-row: odd widths pad 3·w up to the 4-byte stride
    for seed, ww, hh in [(0, 1, 1), (255, 10, 7), (42, 5, 3)]:
        w2, h2, px2 = decode_bmp(synth_bmp(seed, ww, hh))
        assert (w2, h2) == (ww, hh)
        assert px2 == [
            synth_pixel(seed, x, y, c)
            for y in range(hh)
            for x in range(ww)
            for c in range(3)
        ]
    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + payload[2:])
    with _pytest.raises(ValueError, match="short BMP raster"):
        decode_bmp(payload[:-3])
    bad_depth = payload[:28] + _struct.pack("<H", 8) + payload[30:]
    with _pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp(bad_depth)


def test_wav_extract_features_real_decode(spark):
    """extract_wav_features drives the real decoder through the Arrow
    boundary: stats must equal the pure-Python DSP on the formula
    waveform, and a malformed payload lands as decode_ok=false with
    zeroed stats (quarantine discipline) instead of killing the stage."""
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        extract_wav_features,
        synth_sample,
        synth_wav_pcm16,
    )

    good = synth_wav_pcm16(777, 20, 8000)
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a wav at all"))],
        "media_id BIGINT, payload BINARY",
    )
    rows = {r["media_id"]: r for r in extract_wav_features(media).collect()}
    xs = [synth_sample(777, k) for k in range(20)]
    assert rows[1]["decode_ok"]
    assert rows[1]["sample_rate"] == 8000
    assert rows[1]["n_samples"] == 20
    assert rows[1]["sum_sq"] == sum(x * x for x in xs)
    assert rows[1]["zero_crossings"] == sum(
        1 for a, b in zip(xs, xs[1:]) if a * b < 0
    )
    assert rows[1]["peak"] == max(abs(x) for x in xs)
    assert not rows[2]["decode_ok"]
    assert rows[2]["n_samples"] == 0 and rows[2]["sum_sq"] == 0


def test_lsh_multiprobe_improves_recall(spark):
    import numpy as np

    from high_throughput_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
        lsh_topk,
    )

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(64)]) for i in range(200)]
    vecs = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    qs = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(vecs, qs, k=5).collect()
    }

    def recall(n_probes):
        got = {
            (r["query_id"], r["vec_id"])
            for r in lsh_topk(
                vecs, qs, k=5, n_planes=8, dim=64, n_probes=n_probes
            ).collect()
        }
        return len(got & exact) / len(exact)

    r1, r5 = recall(1), recall(5)
    assert r5 >= r1  # more probes never lose candidates
    assert r5 > 0.2  # and find a nontrivial share of the exact top-k


def test_simhash_rotation_tables_superset(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    one = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(
            docs, n_bits=32, max_hamming=6, prefix_bits=10, n_tables=1
        ).collect()
    }
    four = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(
            docs, n_bits=32, max_hamming=6, prefix_bits=10, n_tables=4
        ).collect()
    }
    # more rotation tables only ADD candidate blocks — never lose pairs
    assert one <= four


def test_frame_sampling_plumbing(spark, docs):
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        make_media_table,
        sample_frames,
    )

    media = make_media_table(
        docs.withColumn("source", F.lit("src")).withColumn(
            "n_chars", F.length("text")
        )
    ).withColumn("meta", F.col("meta").withField("duration_ms", F.lit(5500)))
    frames = sample_frames(media, fps=1.0, max_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    # 5.5s at 1 fps capped at 4 frames → 4 frames per item
    assert all(len(v) == 4 for v in by_media.values())
    ts = sorted(r["frame_ts_ms"] for r in by_media[0])
    assert ts == [0, 1000, 2000, 3000]
    # per-frame features differ (frame index is part of the decode input)
    f0 = [r["features"] for r in by_media[0]]
    assert f0[0] != f0[1]


def test_hash_split_deterministic_and_stable(spark):
    """Same id → same split across calls; weights roughly honored; and
    re-weighting val/test never moves rows OUT of train (cumulative
    ranges)."""
    from high_throughput_etl_pipeline_spark.operators.corpus import hash_split

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert a == b
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.85 < frac_train < 0.95
    # cumulative-range property: train members stay train when the tail
    # weights change
    c = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            df, weights={"train": 0.9, "val": 0.08, "test": 0.02}
        ).collect()
    }
    for k, v in a.items():
        if v == "train":
            assert c[k] == "train"


def test_benchmark_contamination_detects_planted_overlap(spark):
    """A corpus doc embedding a benchmark doc's text must be flagged with
    at least the benchmark doc's n-gram count; clean docs must not."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        benchmark_contamination,
    )

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        "doc_id BIGINT, text STRING",
    )
    corpus = spark.createDataFrame(
        [
            (10, "intro words alpha beta gamma delta epsilon zeta outro"),
            (11, "totally unrelated content with no shared phrases at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    hits = {
        r["doc_id"]: r["shared_ngrams"]
        for r in benchmark_contamination(corpus, bench, ngram_n=4).collect()
    }
    assert 10 in hits and hits[10] >= 3  # 3 shared 4-grams
    assert 11 not in hits


def test_pack_token_budget_overflow_bound(spark):
    """Every pack holds ≥1 doc and exceeds the budget by at most one
    document's tokens; packs are contiguous in id order per partition."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        pack_token_budget,
    )

    rows = [
        ("s1", i, "w " * (10 * (i % 7 + 1))) for i in range(40)
    ] + [("s2", i, "w " * 25) for i in range(40, 60)]
    df = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, text STRING")
    packed = pack_token_budget(df, budget=100, part_col="source").collect()
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault((r["source"], r["pack_id"]), []).append(r)
    for (_, _), members in by_pack.items():
        total = sum(r["_tokens"] for r in members)
        biggest = max(r["_tokens"] for r in members)
        assert len(members) >= 1
        assert total - biggest < 100  # minus any one doc → under budget
    # contiguity: ids within a partition sorted by pack then id == sorted by id
    for src in ("s1", "s2"):
        seq = sorted(
            (r["pack_id"], r["doc_id"]) for r in packed if r["source"] == src
        )
        ids = [d for _, d in seq]
        assert ids == sorted(ids)


def test_pq_and_ivfpq_empty_query_set(spark):
    """Zero queries must yield a typed empty frame, not an
    AttributeError on the never-initialized union accumulator."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        pq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(e, m=8, ksub=16, dim=64)
    empty_q = e.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(e, empty_q, books, k=5)
    assert got.columns == ["query_id", "vec_id", "approx_d2", "rank"]
    assert got.count() == 0
    got2 = ivfpq_topk(e, empty_q, books, k=5, nlist=4, nprobe=2)
    assert got2.columns == ["query_id", "vec_id", "approx_d2", "rank"]
    assert got2.count() == 0


def test_ivf_kmeans_recall_vs_exact(spark):
    """k-means IVF (the rows-only production variant) keeps high recall
    against exact cosine top-5 — the value check lives in the
    ann_ivf_topk fixed-quantizer oracle; this pins training quality."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r["query_id"], r["vec_id"]) for r in cosine_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(e, q, k=5, nlist=8, nprobe=4).collect()
    }
    hits = len(exact & approx)
    assert hits >= 10, f"IVF recall too low: {hits}/15"


def test_pq_topk_beats_random_recall(spark):
    """PQ/ADC sanity: codes are deterministic, and approximate top-5
    overlaps exact euclidean top-5 well above random chance."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(e, m=8, ksub=16, dim=64)
    codes = pq_encode(e, books).collect()
    assert all(len(r["pq_codes"]) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["pq_codes"])
    again = {r["vec_id"]: r["pq_codes"] for r in pq_encode(e, books).collect()}
    assert all(again[r["vec_id"]] == r["pq_codes"] for r in codes)

    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_topk(e, q, books, k=5)
    got = {
        (r["query_id"], r["vec_id"]) for r in approx.collect()
    }
    # exact euclidean top-5 via numpy
    import numpy as np

    rows = e.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    hits = 0
    for qid in range(3):
        qv = V[ids == qid][0]
        d2 = ((V - qv) ** 2).sum(axis=1)
        top = set(ids[np.argsort(d2, kind="stable")[:5]].tolist())
        hits += sum(1 for (g_q, g_v) in got if g_q == qid and g_v in top)
    # 15 slots total; random chance would be ~5*5/|table| ≈ 0.4 hits
    assert hits >= 6, f"PQ recall too low: {hits}/15"


def test_connected_components_chain_and_islands(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    # chain 1-2-3-4 (diameter 3), triangle 10-11-12 with a dup + reversed
    # edge, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (11, 10),
         (20, 21)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    # a 12-hop path exercises multi-round propagation + lineage cutting
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    got = connected_components(edges, max_iter=15).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == 13


def test_global_rank_matches_window_rank(spark):
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )
    from pyspark.sql import Window as W

    rows = [(i, float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "id BIGINT, score DOUBLE").repartition(8)
    order = [F.col("score").desc(), F.col("id")]
    _cm = spark._jsparkSession.sharedState().cacheManager()
    cached_before = _cm.cachedData().size()
    ranked, n = global_rank(df, order, rank_col="r")
    assert n == 500
    got = {r["id"]: r["r"] for r in ranked.collect()}
    want = {
        r["id"]: r["r"]
        for r in df.withColumn(
            "r", F.row_number().over(W.orderBy(*order)).cast("long")
        ).collect()
    }
    assert got == want
    # the pinning is a localCheckpoint, NOT persist: global_rank may not add
    # a CacheManager entry (a session-lifetime leak at one rank per query);
    # compare entry COUNTS against the pre-call state — other tests own caches
    assert _cm.cachedData().size() == cached_before


def test_global_rank_empty_input(spark):
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_rank,
    )

    df = spark.createDataFrame([], "id BIGINT, score DOUBLE")
    ranked, n = global_rank(df, [F.col("score"), F.col("id")])
    assert n == 0 and ranked.count() == 0


def test_connected_components_max_iter_boundary(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    # 7-node path: labels stop changing after round 6 (the diameter); the
    # no-change detection fires on round 7.  max_iter=7 is exactly enough;
    # max_iter=6 must raise rather than return a non-fixpoint labeling.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    got = connected_components(edges, max_iter=7).collect()
    assert all(r["component"] == 0 for r in got) and len(got) == 7
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=6, algorithm="minlabel")


def test_connected_components_auto_switches_to_star(spark):
    """max_iter too small for the diameter: auto must NOT raise — it
    falls through to large-star/small-star and still returns the exact
    labeling (this chain used to RuntimeError)."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    got = connected_components(edges, max_iter=3).collect()
    assert all(r["component"] == 0 for r in got) and len(got) == 41


def test_connected_components_star_algorithm_exact(spark):
    """algorithm='star' on mixed topology (chain, triangle with dup +
    reversed edges, pair, self-loop-only node) matches min-label."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (11, 10),
         (20, 21), (30, 30)],
        "src long, dst long",
    )
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 30: 30}
    for algo in ("star", "minlabel"):
        got = {
            r["node"]: r["component"]
            for r in connected_components(edges, algorithm=algo).collect()
        }
        assert got == want, algo


def test_connected_components_star_long_chain(spark):
    """A 200-hop path — adversarial for O(diameter) propagation — must
    converge for 'star' in O(log² n) rounds."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "src long, dst long"
    )
    got = connected_components(edges, algorithm="star").collect()
    assert all(r["component"] == 0 for r in got) and len(got) == 201


def test_connected_components_huge_ids_no_sum_overflow(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        connected_components,
    )

    # ids near 2^62: a raw BIGINT sum of these labels exceeds Long.MAX
    # (8 * 2^62 = 2^65) and would wrap in non-ANSI mode — the decimal(38,0)
    # convergence sum must stay exact and the labeling correct.
    base = 1 << 62
    edges = spark.createDataFrame(
        [(base + i, base + i + 1) for i in range(7)], "src long, dst long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {base + i: base for i in range(8)}


def test_dedup_clusters_keep_policy(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (2, 3)], "id_a long, id_b long"
    )
    cc = dedup_clusters(pairs)
    keep = {r["node"] for r in cc.filter("node = cluster_id").collect()}
    drop = {r["node"] for r in cc.filter("node != cluster_id").collect()}
    assert keep == {5, 2}
    assert drop == {9, 7, 3}


def test_chunk_documents_coverage_and_overlap(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        chunk_documents,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(95))),  # 95 tokens → 3 chunks
        (2, "a b c"),  # short → 1 chunk
        (3, ""),  # empty → no chunks
        (4, "   "),  # whitespace-only → no chunks
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = chunk_documents(df, chunk_tokens=40, stride=30).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    assert len(by_doc[1]) == 3 and len(by_doc[2]) == 1
    # chunk k starts at token k*stride; spans overlap by chunk-stride
    chunks = {r["chunk_id"]: r["chunk_text"].split(" ") for r in by_doc[1]}
    assert chunks[0] == [f"w{i}" for i in range(40)]
    assert chunks[1] == [f"w{i}" for i in range(30, 70)]
    assert chunks[2] == [f"w{i}" for i in range(60, 95)]  # short tail
    # every token appears in at least one chunk
    seen = {t for c in chunks.values() for t in c}
    assert seen == {f"w{i}" for i in range(95)}
    assert by_doc[2][0]["chunk_text"] == "a b c"
    assert by_doc[2][0]["n_tokens"] == 3


def test_stratified_sample_monotone_nested(spark):
    """Raising any stratum's rate must strictly grow (never reshuffle)
    its kept set — cutoffs are nested by construction."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        stratified_sample,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    low = stratified_sample(d, "lang", {"en": 0.2}, default_rate=0.1)
    high = stratified_sample(d, "lang", {"en": 0.5}, default_rate=0.3)
    low_ids = {r["doc_id"] for r in low.select("doc_id").collect()}
    high_ids = {r["doc_id"] for r in high.select("doc_id").collect()}
    assert low_ids and low_ids < high_ids


def test_ivfpq_topk_prunes_and_recalls(spark):
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        ivfpq_topk,
        train_pq_codebooks,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(e, m=8, ksub=16, dim=64)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivfpq_topk(e, q, books, k=5, nlist=8, nprobe=3).collect()
    assert len(got) == 15
    # determinism
    again = ivfpq_topk(e, q, books, k=5, nlist=8, nprobe=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))

    import numpy as np

    rows = e.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    hits = 0
    for qid in range(3):
        qv = V[ids == qid][0]
        d2 = ((V - qv) ** 2).sum(axis=1)
        top = set(ids[np.argsort(d2, kind="stable")[:5]].tolist())
        hits += sum(
            1 for r in got if r["query_id"] == qid and r["vec_id"] in top
        )
    # double-approximate (IVF pruning + PQ distances); still far above
    # the ~0.4 expected hits of random selection
    assert hits >= 5, f"IVFPQ recall too low: {hits}/15"


def test_training_batch_chunk_key_no_collision_long_docs(spark):
    """A >=100-chunk document must pack correctly: the struct
    (doc_id, chunk_id) ordering key cannot collide, whereas the old
    scalar doc_id*100+chunk_id encoding aliased long documents' chunks
    onto later doc_ids, corrupting pack order.  Expected packing is
    replayed in pure Python over the same (doc, chunk) order."""
    import math

    from high_throughput_etl_pipeline_spark.operators.corpus import (
        chunk_documents,
        pack_token_budget,
    )

    # doc 1: 3310 tokens -> 1 + ceil((3310-40)/30) = 110 chunks (>= 100);
    # doc 2 collides with old keys 1*100+k for k in [0,110) vs 2*100+k
    docs = [
        (1, "s", " ".join(f"a{i}" for i in range(3310))),
        (2, "s", " ".join(f"b{i}" for i in range(95))),
        (3, "s", " ".join(f"c{i}" for i in range(10))),
    ]
    df = spark.createDataFrame(docs, "doc_id BIGINT, source STRING, text STRING")
    kept = df.select("doc_id", "source", "text")
    chunks = chunk_documents(kept, chunk_tokens=40, stride=30).join(
        kept.select("doc_id", "source"), on="doc_id"
    )
    packed = pack_token_budget(
        chunks.withColumn(
            "chunk_key", F.struct(F.col("doc_id"), F.col("chunk_id"))
        ),
        budget=256,
        part_col="source",
        id_col="chunk_key",
        text_col="chunk_text",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["pack_id"], r["_tokens"])
        for r in packed.collect()
    }

    # pure-python replay in (doc_id, chunk_id) order
    def n_chunks(n):
        return 1 + math.ceil(max(n - 40, 0) / 30)

    expected, cum, buckets = {}, 0, []
    for doc_id, _, text in docs:
        n = len(text.split())
        for k in range(n_chunks(n)):
            tok = len(text.split()[k * 30 : min(k * 30 + 40, n)])
            buckets.append(((doc_id, k), cum // 256, tok))
            cum += tok
    dense, seen = {}, 0
    for (key, bucket, tok) in buckets:
        if bucket not in dense:
            dense[bucket] = seen
            seen += 1
        expected[key] = (dense[bucket], tok)

    assert len(got) == 110 + n_chunks(95) + 1
    assert got == expected


# -- BPE vocabulary induction ---------------------------------------------


def _ref_bpe_train(word_freqs, n_merges, min_pair_freq=2):
    """Reference BPE (Sennrich et al. 2016), plain Python: the semantic
    spec the Spark operator must match (freq-desc, then lexicographic
    (left, right) tie-break; greedy left-to-right merge)."""
    import collections

    syms = {w: list(w) + ["</w>"] for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        counts = collections.Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (l, r), f = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if f < min_pair_freq:
            break
        merges.append((rank, l, r, l + r, f))
        for w, s in syms.items():
            out = []
            for tok in s:
                if out and out[-1] == l and tok == r:
                    out[-1] = l + r
                else:
                    out.append(tok)
            syms[w] = out
    return merges, syms


def test_bpe_train_matches_reference(spark):
    from high_throughput_etl_pipeline_spark.operators.bpe import bpe_train

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(" ".join([w] * f) for w, f in freqs.items())
    df = spark.createDataFrame([(0, text)], "doc_id BIGINT, text STRING")
    got = bpe_train(df, n_merges=8)
    want, _ = _ref_bpe_train(freqs, 8)
    assert [
        (m["rank"], m["left"], m["right"], m["merged"], m["freq"])
        for m in got
    ] == want


def test_bpe_encode_applies_merges_in_order(spark):
    from high_throughput_etl_pipeline_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    train_text = " ".join(" ".join([w] * f) for w, f in freqs.items())
    train = spark.createDataFrame(
        [(0, train_text)], "doc_id BIGINT, text STRING"
    )
    merges = bpe_train(train, n_merges=8)
    assert merges, "training must learn merges on this corpus"

    score = spark.createDataFrame(
        [(1, "low lowest")], "doc_id BIGINT, text STRING"
    )
    row = bpe_encode(score, merges).collect()[0]
    # reference-encode the same words with the same merge list
    exp_tokens = []
    for w in ["low", "lowest"]:
        s = list(w) + ["</w>"]
        for m in merges:
            out = []
            for tok in s:
                if out and out[-1] == m["left"] and tok == m["right"]:
                    out[-1] = m["merged"]
                else:
                    out.append(tok)
            s = out
        exp_tokens.extend(s)
    assert row["n_words"] == 2
    assert row["tokens"] == exp_tokens
    assert row["n_tokens"] == len(exp_tokens)


def test_bpe_merge_handles_overlapping_runs(spark):
    from pyspark.sql import functions as F

    from high_throughput_etl_pipeline_spark.operators.bpe import _merge_pair

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms ARRAY<STRING>")
    out = df.select(_merge_pair(F.col("syms"), "a", "a").alias("m")).collect()
    # greedy left-to-right: 'aaa' -> ['aa', 'a'], never ['a', 'aa']
    assert out[0]["m"] == ["aa", "a"]


def test_auto_lsh_bits_sizing(spark):
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        auto_lsh_bits,
        embedding_near_duplicates,
    )

    # floor of 4 bits at small n; grows with log2(n / target_bucket)
    assert auto_lsh_bits(10) == 4
    assert auto_lsh_bits(200) == 4
    assert auto_lsh_bits(20_000) == 9
    assert auto_lsh_bits(20_000_000) == 19
    # the registered embedding_near_dup/_dedup_clusters queries auto-size
    # bits but their oracles pin _ND_BITS=4 planes; parity at the driver's
    # correctness SF (0.01) requires auto == 4 there.  Pin the count so a
    # testdata resize fails HERE, not as a driver red row.
    n_sf001 = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").count()
    )
    assert auto_lsh_bits(n_sf001) == 4, (
        f"sf0.01 embeddings grew to {n_sf001}: auto_lsh_bits no longer "
        "matches the _ND_BITS=4 oracle planes — re-pin queries.py"
    )
    # the auto default equals the explicit parameterization at small n,
    # so results coincide with the oracle-pinned setting
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    auto = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(e).collect()
    }
    fixed = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(e, bits_per_table=4).collect()
    }
    assert auto == fixed


def test_fuzzy_decontamination_cross_corpus_only(spark, docs):
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        fuzzy_decontamination,
    )

    # benchmark = doc 1 ("...lazy cat"); corpus contains its near-dups
    # (0, 2) and unrelated docs; corpus-internal duplicates (0 vs 2)
    # must NOT be reported — only corpus-vs-benchmark hits
    bench = docs.filter(F.col("doc_id") == 1)
    corpus = docs.filter(F.col("doc_id") != 1)
    hits = fuzzy_decontamination(
        corpus, bench, shingle_n=2, threshold=0.3
    ).collect()
    got = {(r["doc_id"], r["bench_id"]) for r in hits}
    assert (0, 1) in got and (2, 1) in got
    assert all(b == 1 for _, b in got)
    assert all(r["jaccard"] >= 0.3 for r in hits)
    # unrelated docs stay clean
    assert not any(d in (3, 4, 5) for d, _ in got)


def test_mixture_sample_tracks_targets(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        mixture_sample,
    )

    # 4 sources x 100 docs x 10 tokens each (1000 tokens/source); at a
    # 20% budget (800 tokens) with 40/30/20/10 targets, keep rates are
    # budget*share/source_tokens = 0.32/0.24/0.16/0.08
    rows = [
        (s * 1000 + i, f"s{s}", "tok " * 10)
        for s in range(4)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")
    targets = {"s0": 0.4, "s1": 0.3, "s2": 0.2, "s3": 0.1}
    kept = mixture_sample(df, targets, budget_frac=0.2)
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, expect in (("s0", 32), ("s1", 24), ("s2", 16), ("s3", 8)):
        assert abs(counts[s] - expect) <= 12, (s, counts)
    # raising the budget keeps a SUPERSET (cutoffs are monotone in budget)
    small = {r["doc_id"] for r in kept.collect()}
    big = {
        r["doc_id"]
        for r in mixture_sample(df, targets, budget_frac=0.4).collect()
    }
    assert small <= big
    # an unlisted source is dropped entirely
    extra = spark.createDataFrame(
        [(9999, "s_unlisted", "tok tok")], "doc_id BIGINT, source STRING, text STRING"
    )
    out = mixture_sample(df.union(extra), targets, budget_frac=0.2)
    assert out.filter(F.col("source") == "s_unlisted").count() == 0


def test_scd2_merge_branches(spark):
    from high_throughput_etl_pipeline_spark.operators.merge import scd2_merge

    dim = spark.createDataFrame(
        [
            # k=1: one history row + an open row that WILL change
            (1, "A", 10.0, "2020-01-01", "2021-01-01", False),
            (1, "B", 10.0, "2021-01-01", "9999-12-31", True),
            # k=2: open row with an identical update (no-op branch)
            (2, "B", 20.0, "2020-01-01", "9999-12-31", True),
            # k=3: open row with no update at all (carry branch)
            (3, "C", 30.0, "2020-01-01", "9999-12-31", True),
        ],
        "k BIGINT, seg STRING, bal DOUBLE, effective_from STRING, "
        "effective_to STRING, is_current BOOLEAN",
    ).withColumns(
        {
            "effective_from": F.col("effective_from").cast("date"),
            "effective_to": F.col("effective_to").cast("date"),
        }
    )
    updates = spark.createDataFrame(
        [
            (1, "Z", 10.0),      # changed attr -> close + open
            (2, "B", 20.0),      # identical -> no-op
            (4, "N", 40.0),      # brand-new key -> open
        ],
        "k BIGINT, seg STRING, bal DOUBLE",
    )
    out = scd2_merge(dim, updates, "k", ["seg", "bal"], as_of="2022-06-01")
    got = {
        (r["k"], r["seg"], str(r["effective_from"]), str(r["effective_to"]),
         r["is_current"])
        for r in out.collect()
    }
    assert got == {
        (1, "A", "2020-01-01", "2021-01-01", False),   # history untouched
        (1, "B", "2021-01-01", "2022-06-01", False),   # closed
        (1, "Z", "2022-06-01", "9999-12-31", True),    # re-opened
        (2, "B", "2020-01-01", "9999-12-31", True),    # no-op carry
        (3, "C", "2020-01-01", "9999-12-31", True),    # no-update carry
        (4, "N", "2022-06-01", "9999-12-31", True),    # new key
    }
    # idempotency: re-applying the same snapshot is a no-op
    again = scd2_merge(out, updates, "k", ["seg", "bal"], as_of="2022-07-01")
    assert again.count() == out.count()
    got2 = {
        (r["k"], r["seg"], str(r["effective_from"]), str(r["effective_to"]),
         r["is_current"])
        for r in again.collect()
    }
    assert got2 == got
    # null-safe compare: NULL -> value counts as a change
    dim_n = spark.createDataFrame(
        [(7, None, 1.0, "2020-01-01", "9999-12-31", True)],
        "k BIGINT, seg STRING, bal DOUBLE, effective_from STRING, "
        "effective_to STRING, is_current BOOLEAN",
    ).withColumns(
        {
            "effective_from": F.col("effective_from").cast("date"),
            "effective_to": F.col("effective_to").cast("date"),
        }
    )
    upd_n = spark.createDataFrame([(7, "X", 1.0)], "k BIGINT, seg STRING, bal DOUBLE")
    out_n = scd2_merge(dim_n, upd_n, "k", ["seg", "bal"], as_of="2022-06-01")
    assert out_n.count() == 2
    assert out_n.filter(F.col("is_current")).collect()[0]["seg"] == "X"


def test_shuffle_shards_epoch_permutation(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        shuffle_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(400)], "doc_id BIGINT, text STRING"
    )
    e1 = shuffle_shards(df, epoch=1, n_shards=4)
    e1b = shuffle_shards(df.repartition(7), epoch=1, n_shards=4)
    place = lambda d: {
        r["doc_id"]: (r["shard"], r["pos"]) for r in d.collect()
    }
    p1, p1b = place(e1), place(e1b)
    # deterministic across partitionings
    assert p1 == p1b
    # every doc placed exactly once; positions are 1..n contiguous per shard
    assert len(p1) == 400
    by_shard: dict[int, list[int]] = {}
    for s, pos in p1.values():
        by_shard.setdefault(s, []).append(pos)
    for s, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), s
    # shards near-balanced (expected 100 each)
    assert all(60 <= len(v) <= 140 for v in by_shard.values()), {
        k: len(v) for k, v in by_shard.items()
    }
    # a different epoch is a genuinely different permutation
    p2 = place(shuffle_shards(df, epoch=2, n_shards=4))
    moved = sum(1 for d in p1 if p1[d] != p2[d])
    assert moved > 300


def test_linear_quality_score_matches_manual(spark):
    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_feature_weights,
        linear_quality_score,
    )

    w = hashed_feature_weights(spark, n_features=64, salt="t")
    wmap = {r["feature_id"]: r["weight"] for r in w.collect()}
    assert len(wmap) == 64
    assert all(-1.0 <= v <= 1.0 for v in wmap.values())

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "   ")],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["doc_id"]: r["score"]
        for r in linear_quality_score(docs, w, n_features=64).collect()
    }

    import hashlib

    def fid(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[17:32], 16) % 64

    for doc_id, text in [(1, "alpha beta gamma"), (2, "alpha alpha")]:
        toks = text.split()
        expect = sum(wmap[fid(t)] for t in toks) / len(toks)
        assert abs(got[doc_id] - expect) < 1e-12, doc_id
    # repeated tokens weigh by multiplicity: doc2 == w[alpha]
    assert abs(got[2] - wmap[fid("alpha")]) < 1e-12
    # empty text -> NULL score
    assert got[3] is None


def test_cms_guarantees_and_merge_identity(spark):
    from high_throughput_etl_pipeline_spark.operators.sketches import (
        cms_estimate,
        cms_merge,
        cms_sketches,
    )
    import math

    # zipf-ish: key k appears ~1000/k times, split over 3 groups
    rows = [
        (k, f"g{i % 3}")
        for k in range(1, 51)
        for i in range(1000 // k)
    ]
    df = spark.createDataFrame(rows, "key BIGINT, g STRING")
    n_total = len(rows)
    depth, width = 4, 64

    grouped = cms_sketches(df, "key", "g", depth=depth, width=width)
    assert grouped.count() == 3
    # n_rows conservation per group
    got_n = {r["group"]: r["n_rows"] for r in grouped.collect()}
    true_n = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.count("*").alias("n")).collect()
    }
    assert got_n == true_n

    merged = cms_merge(grouped, depth=depth, width=width)
    probes = df.select(F.col("key")).distinct()
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_estimate(
            probes, merged, "key", depth=depth, width=width
        ).collect()
    }
    true = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count("*").alias("n")).collect()
    }
    eps_n = math.e / width * n_total
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)          # never undercounts
        assert est[k] <= t + eps_n, (k, est[k], t)  # classic CMS bound
    # merge identity: merged-from-groups == built-in-one-shot, exactly
    single = cms_sketches(df, "key", None, depth=depth, width=width)
    m1 = merged.collect()[0]["cms"]
    m2 = single.collect()[0]["cms"]
    assert m1 == m2


def test_pack_sequences_boundaries(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        pack_sequences,
    )

    rows = [(i, "s", "tok " * (10 + i)) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, text STRING")
    out = pack_sequences(df, budget=50, part_col="source").collect()
    lens = {i: 10 + i for i in range(12)}
    seen = []
    for r in out:
        b, ids = r["boundaries"], r["doc_ids"]
        assert b[0] == 0
        # boundary diffs reproduce member token counts, in pack order
        for j in range(len(ids) - 1):
            assert b[j + 1] - b[j] == lens[ids[j]], r
        assert r["seq_len"] - b[-1] == lens[ids[-1]], r
        assert r["n_docs"] == len(ids) == len(b)
        seen.extend(ids)
    # every doc packed exactly once, ids ascending within source packs
    assert sorted(seen) == list(range(12))


def test_winsorize_bounds_and_conservation(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import winsorize

    rows = [(float(v), "a") for v in range(100)] + [
        (1e6, "a"),   # high outlier
        (-1e6, "a"),  # low outlier
        (5.0, "b"),
    ]
    df = spark.createDataFrame(rows, "value DOUBLE, event_type STRING")
    out = winsorize(df, "value", "event_type", 0.05, 0.95)
    assert out.count() == len(rows)  # row conservation
    a = out.filter(F.col("event_type") == "a")
    lo, hi = a.select("_lo", "_hi").first()
    # outliers clipped to the group's quantile bounds
    got = a.agg(
        F.max("value_w").alias("mx"),
        F.min("value_w").alias("mn"),
        F.sum("clipped_lo").alias("cl"),
        F.sum("clipped_hi").alias("ch"),
    ).first()
    assert got["mx"] == hi and got["mn"] == lo
    assert got["cl"] >= 1 and got["ch"] >= 1
    # values inside the bounds pass through untouched
    mid = a.filter((F.col("value") >= lo) & (F.col("value") <= hi))
    assert mid.filter(F.col("value_w") != F.col("value")).count() == 0
    # single-member group: bounds collapse to the value, nothing clips
    b = out.filter(F.col("event_type") == "b").first()
    assert b["value_w"] == 5.0 and b["clipped_lo"] == 0


def test_center_embeddings_zero_mean(spark):
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        center_embeddings,
    )

    rows = [(i, [float(i), 10.0 * i, 5.0]) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = center_embeddings(df, "embedding", dim=3)
    got = {r["vec_id"]: r["centered"] for r in out.collect()}
    # mean = [4, 40, 5]; centered = v - mean, elementwise
    for i in range(9):
        assert got[i] == [
            pytest.approx(i - 4.0),
            pytest.approx(10.0 * i - 40.0),
            pytest.approx(0.0),
        ], i
    # per-dim mean of the centered corpus is ~0
    mu = out.agg(
        *[
            F.avg(F.element_at("centered", d + 1)).alias(f"m{d}")
            for d in range(3)
        ]
    ).first()
    assert all(abs(mu[f"m{d}"]) < 1e-9 for d in range(3))


# -- retrieval: BM25 / RRF ------------------------------------------------


def test_bm25_scores_closed_form(spark, docs):
    import math

    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        bm25_scores,
    )

    # query = ["the", "fox"]: docs 0-2 contain both, 3-5 neither term
    out = {
        r["doc_id"]: r
        for r in bm25_scores(docs, ["the", "fox"]).collect()
    }
    assert set(out) == {0, 1, 2}
    # hand-computed: N=6, avgdl=(9+9+9+6+9+2)/6, df(the)=3, df(fox)=3
    n, avgdl = 6.0, 44 / 6
    k1, b = 1.2, 0.75

    def idf(df_):
        return math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))

    def term(tf, dl):
        return idf(3.0) * (tf * (k1 + 1.0)) / (
            tf + k1 * (1 - b + b * dl / avgdl)
        )

    expect = round(term(2.0, 9) + term(1.0, 9), 6)  # tf(the)=2, tf(fox)=1
    assert out[0]["score"] == pytest.approx(expect, abs=2e-6)
    assert out[0]["dl"] == 9
    # identical docs score identically; all three tie (same tf vector, dl)
    assert out[0]["score"] == out[2]["score"] == out[1]["score"]


def test_bm25_rare_term_outranks_common(spark):
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        bm25_scores,
    )

    rows = [(i, "common filler words here") for i in range(9)] + [
        (9, "common filler words here plus needle")
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(df, ["common", "needle"]).collect()
    }
    # the needle doc must dominate: rare term carries ~ln(10.5/1.5) idf
    assert out[9] == max(out.values())
    assert out[9] > 2 * out[0]


def test_rrf_fuse_identities(spark):
    from high_throughput_etl_pipeline_spark.operators.retrieval import (
        math_rrf,
        rrf_fuse,
    )

    l1 = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id BIGINT, rank INT"
    )
    l2 = spark.createDataFrame(
        [(2, 1), (1, 2)], "doc_id BIGINT, rank INT"
    )
    out = {r["doc_id"]: r for r in rrf_fuse([l1, l2], k=60).collect()}
    assert out[1]["rrf_score"] == pytest.approx(
        round(math_rrf(60, 1) + math_rrf(60, 2), 6)
    )
    assert out[2]["rrf_score"] == out[1]["rrf_score"]  # symmetric ranks
    assert out[3]["n_lists"] == 1  # missing from l2 contributes nothing
    assert out[3]["rrf_score"] == pytest.approx(round(math_rrf(60, 3), 6))


# -- entity resolution ----------------------------------------------------


def test_fuzzy_matches_blocked(spark):
    from high_throughput_etl_pipeline_spark.operators.entity import (
        canonicalize_matches,
        fuzzy_matches,
    )

    rows = [
        (1, "acme corp", "us"),
        (2, "acme corp.", "us"),   # 1 edit from 1
        (3, "acme corp", "de"),    # identical name, other block: no pair
        (4, "zenith ltd", "us"),
        (5, "acme corp.", "us"),   # exact dup of 2, 1 edit from 1
    ]
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, country STRING")
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_matches(
            df, ["country"], "id", "name", max_edit=1
        ).collect()
    }
    assert got == {(1, 2): 1, (1, 5): 1, (2, 5): 0}
    canon = {
        r["entity_id"]: r["canonical_id"]
        for r in canonicalize_matches(
            fuzzy_matches(df, ["country"], "id", "name", max_edit=1)
        ).collect()
    }
    assert canon == {1: 1, 2: 1, 5: 1}


def test_fuzzy_matches_length_band_guarantee(spark):
    from high_throughput_etl_pipeline_spark.operators.entity import (
        fuzzy_matches,
    )

    import pytest

    # adjacent-bucket probing keeps recall EXACT even for pairs whose
    # lengths straddle a bucket boundary: "abcd" (len 4, bucket 0) and
    # "abcde" (len 5, bucket 1) with band=5 land in different buckets
    # but must still pair (edit distance 1)
    rows = [(1, "abcd", "x"), (2, "abcde", "x"), (3, "abcdx", "x")]
    df = spark.createDataFrame(rows, "id BIGINT, name STRING, country STRING")
    unbanded = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_matches(
            df, ["country"], "id", "name", max_edit=1
        ).collect()
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_matches(
            df, ["country"], "id", "name", max_edit=1, length_band=5
        ).collect()
    }
    assert (1, 2) in banded  # cross-boundary pair restored
    assert (2, 3) in banded  # same length -> same bucket, kept
    assert banded == unbanded  # banding is now a pure prefilter
    # band < max_edit can skip past the adjacent bucket -> loud failure
    with pytest.raises(ValueError, match="length_band"):
        fuzzy_matches(
            df, ["country"], "id", "name", max_edit=2, length_band=1
        )


# -- privacy audits -------------------------------------------------------


def test_k_anonymity_audit_and_report(spark):
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        anonymity_report,
        k_anonymity_audit,
    )

    rows = (
        [("a", 1, f"u{i}") for i in range(5)]      # safe group, 5 users
        + [("a", 2, "u0"), ("a", 2, "u0")]          # at-risk, 1 user
        + [("b", 1, "u1")]                           # at-risk singleton
    )
    df = spark.createDataFrame(rows, "qa STRING, qb INT, user STRING")
    audit = {
        (r["qa"], r["qb"]): r
        for r in k_anonymity_audit(
            df, ["qa", "qb"], k=5, sensitive_col="user"
        ).collect()
    }
    assert not audit[("a", 1)]["at_risk"]
    assert audit[("a", 2)]["at_risk"] and audit[("a", 2)]["n_sensitive"] == 1
    rep = anonymity_report(
        df, ["qa", "qb"], k=5, sensitive_col="user", l=2
    ).first()
    assert rep["n_groups"] == 3
    assert rep["k_min"] == 1
    assert rep["groups_below_k"] == 2
    assert rep["rows_below_k"] == 3
    assert rep["groups_below_l"] == 2


def test_fuzzy_neighborhood_equals_blocked(spark):
    from high_throughput_etl_pipeline_spark.operators.entity import (
        deletion_variants,
        fuzzy_matches,
        fuzzy_matches_neighborhood,
    )

    # variants: the string itself + every single deletion, distinct
    df1 = spark.createDataFrame([("aab",)], "name STRING")
    vs = df1.select(deletion_variants(F.col("name")).alias("v")).first()["v"]
    # deletions of 'aab': pos1/pos2 both give 'ab' (deduped), pos3 'aa'
    assert sorted(vs) == ["aa", "aab", "ab"]

    # neighborhood candidates reproduce the quadratic join exactly on
    # real data (substitution, insertion/deletion, and non-match cases)
    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    rows = lambda d: sorted(
        (r["id_a"], r["id_b"], r["edit_distance"]) for r in d.collect()
    )
    blocked = fuzzy_matches(
        c, ["c_nationkey"], "c_custkey", "c_name", max_edit=1
    )
    neigh = fuzzy_matches_neighborhood(
        c, ["c_nationkey"], "c_custkey", "c_name"
    )
    assert rows(neigh) == rows(blocked)
    # insertion/deletion shape (unequal lengths) is also caught
    df2 = spark.createDataFrame(
        [(1, "acme corp", "x"), (2, "acme corp.", "x"), (3, "acme", "x")],
        "id BIGINT, name STRING, country STRING",
    )
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in fuzzy_matches_neighborhood(
            df2, ["country"], "id", "name"
        ).collect()
    }
    assert got == {(1, 2): 1}


def test_hard_negatives_and_knn_vote(spark):
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        hard_negatives,
        knn_label_vote,
    )

    # 2D-ish geometry in 4 dims: two tight clusters with labels 0/1, one
    # cross-label vector sitting next to cluster 0
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0, 0.0], 0),
        (2, [0.98, 0.05, 0.1, 0.0], 0),
        (3, [0.97, 0.0, 0.0, 0.2], 1),   # hard negative for label 0
        (4, [0.0, 1.0, 0.0, 0.0], 1),
        (5, [0.0, 0.99, 0.1, 0.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"
    )
    neg = hard_negatives(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert [r["negative_id"] for r in neg] == [3, 4]  # 3 is the hardest
    assert all(r["negative_label"] != 0 for r in neg)
    assert neg[0]["cosine"] > neg[1]["cosine"]

    pred = {
        r["query_id"]: r
        for r in knn_label_vote(df, df, k=3).collect()
    }
    # query 0's 3-NN = {1, 2, 3} -> votes 0:2, 1:1 -> predicted 0
    assert pred[0]["predicted_label"] == 0 and pred[0]["votes"] == 2
    # query 4's 3-NN = {5, ...}: 5 is the only near one; ties in the
    # remaining votes resolve deterministically toward the smaller label
    assert pred[4]["true_label"] == 1
    # self is never its own neighbor: every query got exactly one row
    assert set(pred) == {0, 1, 2, 3, 4, 5}


def test_weighted_sample_proportional_and_deterministic(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        weighted_sample,
    )

    # one group, extreme weights: the heavy item must essentially always
    # be drawn first; two runs agree exactly (no RNG state)
    rows = [(i, "g", 1.0 if i else 10_000.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id BIGINT, grp STRING, w DOUBLE")
    s1 = [
        (r["id"], r["sample_rank"])
        for r in weighted_sample(df, ["grp"], "id", "w", n=3)
        .orderBy("sample_rank")
        .collect()
    ]
    s2 = [
        (r["id"], r["sample_rank"])
        for r in weighted_sample(df, ["grp"], "id", "w", n=3)
        .orderBy("sample_rank")
        .collect()
    ]
    assert s1 == s2
    assert s1[0][0] == 0  # weight 10000 vs 1: P(not first) < 0.02
    # sampling without replacement: distinct ids, ranks 1..3
    assert len({i for i, _ in s1}) == 3
    assert [rk for _, rk in s1] == [1, 2, 3]

    # aggregate proportionality: with w=9 vs w=1 split evenly over 400
    # ids, the heavy class should win the first draw ~90% of the time
    # across many independent groups
    many = [
        (g * 1000 + i, f"g{g}", 9.0 if i < 5 else 1.0)
        for g in range(100)
        for i in range(10)
    ]
    df2 = spark.createDataFrame(many, "id BIGINT, grp STRING, w DOUBLE")
    first = weighted_sample(df2, ["grp"], "id", "w", n=1).collect()
    heavy_wins = sum(1 for r in first if r["id"] % 1000 < 5)
    # E[wins] = 100 * 45/50 = 90; binomial sd ~3 — accept a wide band
    assert 75 <= heavy_wins <= 99


def test_quality_checks_single_pass_and_verdicts(spark):
    from high_throughput_etl_pipeline_spark.operators.quality import (
        accepted_values,
        check_ref_integrity,
        in_range,
        not_null,
        positive,
        run_checks,
        unique,
    )

    rows = [
        (1, 10.0, "A"),
        (2, -5.0, "B"),    # violates positive
        (2, 3.0, "A"),     # duplicate id
        (None, 2.0, "Z"),  # null id, bad enum
    ]
    df = spark.createDataFrame(rows, "id BIGINT, amt DOUBLE, status STRING")
    out = {
        r["check"]: r
        for r in run_checks(
            df,
            [
                unique("id"),
                not_null("id"),
                positive("amt"),
                accepted_values("status", ["A", "B"]),
                in_range("amt", -10, 100),
            ],
        ).collect()
    }
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["unique(id)"]["n_violations"] == 1  # 3 non-null, 2 distinct
    assert not out["unique(id)"]["passed"]
    assert out["not_null(id)"]["n_violations"] == 1
    assert out["positive(amt)"]["n_violations"] == 1
    assert out["accepted_values(status)"]["n_violations"] == 1
    assert out["in_range(amt,-10,100)"]["passed"]
    # ONE aggregation pass: no joins/windows/exchanges beyond the agg
    plan = run_checks(df, [unique("id"), positive("amt")])._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "Join" not in plan

    parent = spark.createDataFrame([(1,), (2,)], "pk BIGINT")
    child = spark.createDataFrame(
        [(1,), (2,), (9,), (None,)], "fk BIGINT"
    )
    ref = check_ref_integrity(child, parent, "fk", "pk").first()
    assert ref["n_rows"] == 4
    assert ref["n_violations"] == 1  # 9 is an orphan; NULL is not
    assert not ref["passed"]

    # empty table: content checks pass vacuously, no NULL leakage
    empty = spark.createDataFrame([], "id BIGINT, amt DOUBLE, status STRING")
    for r in run_checks(empty, [unique("id"), positive("amt")]).collect():
        assert r["n_violations"] == 0 and r["passed"]


def test_snapshot_diff_statuses(spark):
    from high_throughput_etl_pipeline_spark.operators.merge import (
        diff_summary,
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, "y"), (3, None, "z")],
        "id BIGINT, v DOUBLE, s STRING",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "x"),      # unchanged
         (2, 21.0, "y"),      # changed v
         (3, 5.0, "q"),       # NULL->value counts as change, s changed
         (4, 1.0, "w")],      # added
        "id BIGINT, v DOUBLE, s STRING",
    )
    d = {
        r["id"]: r
        for r in snapshot_diff(old, new, ["id"], ["v", "s"]).collect()
    }
    assert d[1]["status"] == "unchanged" and d[1]["n_cols_changed"] == 0
    assert d[2]["status"] == "changed" and d[2]["chg_v"] and not d[2]["chg_s"]
    assert d[3]["status"] == "changed" and d[3]["n_cols_changed"] == 2
    assert d[4]["status"] == "added"
    # removal: drop id 2 from new
    d2 = {
        r["id"]: r["status"]
        for r in snapshot_diff(
            old, new.filter("id <> 2"), ["id"], ["v"]
        ).collect()
    }
    assert d2[2] == "removed"
    summ = {
        r["metric"]: r["n_rows"]
        for r in diff_summary(
            snapshot_diff(old, new, ["id"], ["v", "s"]), ["v", "s"]
        ).collect()
    }
    assert summ == {
        "added": 1, "removed": 0, "changed": 2, "unchanged": 1,
        "changed:v": 2, "changed:s": 1,
    }


def test_audio_windows_grid(spark):
    from high_throughput_etl_pipeline_spark.operators.multimodal import (
        audio_windows,
    )

    rows = [
        (1, b"", ("audio", "audio/wav", 16000, 1000, "s")),  # 1000 ms
        (2, b"", ("audio", "audio/wav", 16000, 30, "s")),    # < one window
        (3, b"", ("audio", "audio/wav", 8000, 100, "s")),    # cap-free
    ]
    schema = (
        "media_id BIGINT, payload BINARY, meta STRUCT<kind: STRING, "
        "mime: STRING, sample_rate: INT, duration_ms: INT, source: STRING>"
    )
    df = spark.createDataFrame(rows, schema)
    out = audio_windows(df, win_ms=40, hop_ms=20, max_windows=8)
    g = {}
    for r in out.collect():
        g.setdefault(r["media_id"], []).append(r)
    # clip 1: (1000-40)/20+1 = 49 full windows -> capped at 8
    assert len(g[1]) == 8 and g[1][0]["n_windows"] == 8
    assert [r["start_ms"] for r in sorted(g[1], key=lambda r: r["window_index"])] == [
        0, 20, 40, 60, 80, 100, 120, 140
    ]
    assert all(r["end_ms"] - r["start_ms"] == 40 for r in g[1])
    # 16 kHz: 40 ms = 640 samples
    w0 = min(g[1], key=lambda r: r["window_index"])
    assert w0["start_sample"] == 0 and w0["end_sample"] == 640
    # clip 2 shorter than a window: one truncated window [0, 30)
    assert len(g[2]) == 1
    assert g[2][0]["start_ms"] == 0 and g[2][0]["end_ms"] == 30
    # clip 3: (100-40)/20+1 = 4 windows at 8 kHz (40 ms = 320 samples)
    assert len(g[3]) == 4
    assert min(g[3], key=lambda r: r["window_index"])["end_sample"] == 320


def test_maxsim_late_interaction(spark):
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        maxsim_topk,
    )

    # 4-d embeddings as 2 x 2-d tokens.  Query tokens: (1,0) and (0,1).
    # doc 1 has both tokens (maxsim 2.0); doc 2 matches token 1 only in
    # its best position (maxsim 1 + cos45 = 1.7071); doc 3 is orthogonal
    # to token 0 but matches token 1
    rows = [
        (1, [1.0, 0.0, 0.0, 1.0]),
        (2, [1.0, 0.0, 1.0, 1.0]),
        (3, [0.0, 1.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    q = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 1.0])],
        "query_id BIGINT, embedding ARRAY<FLOAT>",
    )
    out = {
        r["vec_id"]: r
        for r in maxsim_topk(df, q, k=3, n_sub=2, dim=4).collect()
    }
    assert out[1]["maxsim"] == 2.0 and out[1]["rank"] == 1
    assert out[2]["maxsim"] == pytest.approx(1 + 2 ** -0.5, abs=1e-6)
    # doc 3: token0 best cos = max(0, cos((1,0),(0,1)))=0... token0 vs
    # (0,1)=0 and vs (0,1)=0 -> 0; token1 vs both = 1 -> total 1.0
    assert out[3]["maxsim"] == pytest.approx(1.0, abs=1e-6)
    # single-vector cosine would rank doc 2 ABOVE doc 3 equally well —
    # late interaction separates per-token matches
    assert out[2]["rank"] == 2 and out[3]["rank"] == 3


# -- CDC apply ------------------------------------------------------------


def test_apply_cdc_latest_op_wins(spark):
    from high_throughput_etl_pipeline_spark.operators.cdc import (
        apply_cdc,
        cdc_latest,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id BIGINT, name STRING, val DOUBLE",
    )
    log = spark.createDataFrame(
        [
            (2, "b2", 21.0, 1, "U"),   # update existing
            (3, None, 0.0, 1, "D"),    # delete existing
            (4, "d", 40.0, 1, "I"),    # insert new
            (4, "d2", 41.0, 2, "U"),   # ...then update it: U wins
            (5, "e", 50.0, 1, "I"),    # insert...
            (5, None, 0.0, 2, "D"),    # ...then delete: never lands
            (6, "f2", 60.0, 1, "U"),   # update of a MISSING key inserts
            (7, None, 0.0, 1, "D"),    # delete of a missing key no-ops
        ],
        "id BIGINT, name STRING, val DOUBLE, seq BIGINT, op STRING",
    )
    got = {
        r["id"]: (r["name"], r["val"])
        for r in apply_cdc(base, log, ["id"]).collect()
    }
    assert got == {
        1: ("a", 10.0),
        2: ("b2", 21.0),
        4: ("d2", 41.0),
        6: ("f2", 60.0),
    }
    # flip-flop chains collapse to ONE surviving change per key
    latest = cdc_latest(log, ["id"]).collect()
    assert len(latest) == len({r["id"] for r in latest})


# -- DP noisy release -----------------------------------------------------


def test_dp_noisy_counts_deterministic_and_calibrated(spark):
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        dp_noisy_counts,
    )

    rows = [(f"g{i % 20}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp STRING, x BIGINT")
    a = {r["grp"]: r["noisy_count"] for r in dp_noisy_counts(df, ["grp"]).collect()}
    b = {r["grp"]: r["noisy_count"] for r in dp_noisy_counts(df, ["grp"]).collect()}
    assert a == b  # keyed PRF: re-running re-derives the release
    errs = [abs(v - 100.0) for v in a.values()]
    assert all(e > 0 for e in errs)  # exact counts never published
    assert all(e < 50 for e in errs)  # Laplace(b=1) tail sanity
    assert sum(errs) / len(errs) < 5  # mean |noise| ~= b = 1
    # epsilon scales the noise: smaller epsilon -> strictly wider draws
    wide = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["grp"], epsilon=0.1).collect()
    }
    assert all(
        abs(abs(wide[g] - 100.0) - 10 * abs(a[g] - 100.0)) < 1e-4 for g in a
    )  # same uniform, b scaled 10x (up to the 6 dp output round)


# -- distribution-matched resampling --------------------------------------


def test_distribution_matched_sample_matches_ref_shape(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        distribution_matched_sample,
    )
    from pyspark.sql import functions as F

    # src is 90/10 over buckets 0/1 (plus a bucket ref lacks);
    # ref is 50/50 -> bucket 0 must downsample ~9x, bucket 2 must drop
    src_rows = (
        [(i, 0) for i in range(9000)]
        + [(10_000 + i, 1) for i in range(1000)]
        + [(30_000 + i, 2) for i in range(500)]
    )
    ref_rows = [(i, 0) for i in range(500)] + [(i, 1) for i in range(500)]
    src = spark.createDataFrame(src_rows, "doc_id BIGINT, b INT")
    ref = spark.createDataFrame(ref_rows, "doc_id BIGINT, b INT")
    kept = distribution_matched_sample(src, ref, "b", id_col="doc_id")
    by_b = {
        r["b"]: r["n"]
        for r in kept.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 2 not in by_b  # bucket missing from ref drops entirely
    # binding bucket (1: src 1000 vs ref 500) keeps everything, bucket 0
    # downsamples to match: kept shares within hash-sampling noise of 50/50
    assert by_b[1] == 1000
    total = sum(by_b.values())
    assert abs(by_b[0] / total - 0.5) < 0.03
    # deterministic: same kept set on re-run
    ids = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in distribution_matched_sample(
            src, ref, "b", id_col="doc_id"
        ).collect()
    )
    assert ids == ids2


# -- key-skew diagnostics -------------------------------------------------


def test_key_skew_profile_exact(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        key_skew_profile,
    )

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("k1",)] * 5 + [("k2",)] * 5
    df = spark.createDataFrame(rows, "k STRING")
    got = key_skew_profile(df, "k", top_n=2).orderBy("rank").collect()
    assert [(r["key"], r["n_rows"]) for r in got] == [("hot", 60), ("warm", 30)]
    assert got[0]["share"] == 0.6 and got[0]["n_keys"] == 4
    # herfindahl from exact integer sums: (60^2+30^2+25+25)/100^2
    assert got[0]["herfindahl"] == (3600 + 900 + 25 + 25) / 10_000


def test_join_size_estimate_and_guardrail(spark):
    from pyspark.sql import functions as F

    from high_throughput_etl_pipeline_spark.plans.metrics import (
        assert_join_bounded,
        join_size_estimate,
    )

    a = spark.createDataFrame(
        [(k,) for k in [1] * 100 + [2] * 10 + [3]], "k BIGINT"
    )
    b = spark.createDataFrame(
        [(k,) for k in [1] * 50 + [2] * 2 + [4]], "k BIGINT"
    )
    est = join_size_estimate(a, b, ["k"]).first()
    # exact: 100*50 + 10*2 = 5020, worst key 5000, key 3/4 unmatched
    assert est["join_rows"] == 5020
    assert est["max_key_pairs"] == 5000
    assert est["matched_keys"] == 2
    assert est["a_rows"] == 111 and est["b_rows"] == 53
    # the estimate IS the real join size
    assert a.join(b, on="k").count() == 5020

    ok = assert_join_bounded(a, b, ["k"], max_rows=10_000).first()
    assert ok["join_rows"] == 5020
    import pytest

    with pytest.raises(ValueError, match="salt"):
        assert_join_bounded(a, b, ["k"], max_rows=1000)
    with pytest.raises(ValueError, match="straggler"):
        assert_join_bounded(
            a, b, ["k"], max_rows=10_000, max_key_pairs=100
        )
    # empty intersection: zero, not null
    c = spark.createDataFrame([(9,)], "k BIGINT")
    assert join_size_estimate(a, c, ["k"]).first()["join_rows"] == 0


def test_weighted_quantiles_exact(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        weighted_quantiles,
    )

    # group g: values 1..4 with weights 1,1,1,7 (total 10) — the
    # token-mass median sits at value 4 (cum 3 < 5 at value 3), while
    # the PLAIN median of values is 2.x — the whole point of weighting
    rows = [
        ("g", 1, 1, 1),
        ("g", 2, 2, 1),
        ("g", 3, 3, 1),
        ("g", 4, 4, 7),
        ("h", 1, 10, 5),
        ("h", 2, 20, 5),
    ]
    df = spark.createDataFrame(rows, "grp STRING, id INT, v INT, w INT")
    got = {
        r["grp"]: (r["total_weight"], r["wq50"], r["wq90"])
        for r in weighted_quantiles(
            df, "v", "w", ["grp"], quantiles=(0.5, 0.9), id_col="id"
        ).collect()
    }
    assert got["g"] == (10, 4, 4)
    # h: cum at v=10 is 5 = 0.5*10 -> inclusive lower quantile picks 10
    assert got["h"] == (10, 10, 20)


def test_bloom_semi_join_exact_semantics(spark):
    from pyspark.sql import functions as F

    from high_throughput_etl_pipeline_spark.operators.runtime_filter import (
        bloom_build,
        bloom_semi_join,
        might_contain,
    )

    probe = spark.createDataFrame(
        [(i, f"p{i}") for i in range(500)], "k BIGINT, payload STRING"
    )
    build = spark.createDataFrame(
        [(i * 7,) for i in range(40)], "k BIGINT"
    )  # keys 0,7,...,273 — 40 of them, some beyond probe range
    got = sorted(
        r["k"] for r in bloom_semi_join(probe, build, "k").collect()
    )
    ref = sorted(
        r["k"]
        for r in probe.join(build.distinct(), on="k", how="left_semi").collect()
    )
    assert got == ref  # bit-identical to the plain semi-join
    # no false negatives at the bloom layer: every true key passes
    bloom_df = bloom_build(build, "k")
    passed = (
        build.crossJoin(F.broadcast(bloom_df))
        .filter(might_contain(F.col("k")))
        .count()
    )
    assert passed == build.count()
    # a tiny filter (64 bits, k=1) must STILL be exact — the confirm
    # join removes the flood of false positives
    got_small = sorted(
        r["k"]
        for r in bloom_semi_join(probe, build, "k", m_bits=64, k=1).collect()
    )
    assert got_small == ref


def test_ancestor_closure_pointer_doubling(spark):
    import pytest

    from high_throughput_etl_pipeline_spark.operators.graph import (
        ancestor_closure,
    )

    # two trees + a deep chain (depth 9 needs 4 doubling rounds, not 9)
    rows = (
        [(1, None), (2, 1), (3, 1), (4, 2)]          # tree rooted at 1
        + [(10, None), (11, 10)]                      # tree rooted at 10
        + [(100 + i, 100 + i - 1) for i in range(1, 10)]
        + [(100, None)]                               # chain 100..109
    )
    df = spark.createDataFrame(rows, "id BIGINT, parent BIGINT")
    got = {
        r["id"]: (r["root"], r["depth"])
        for r in ancestor_closure(df, "id", "parent").collect()
    }
    assert got[1] == (1, 0) and got[4] == (1, 2) and got[3] == (1, 1)
    assert got[11] == (10, 1)
    assert got[109] == (100, 9)
    assert len(got) == len(rows)
    # a depth-9 chain must converge within ceil(log2(9)) = 4 hops
    assert {
        r["id"]: (r["root"], r["depth"])
        for r in ancestor_closure(df, "id", "parent", max_rounds=4).collect()
    } == got
    # cycles fail loudly, never silently mislabel
    bad = spark.createDataFrame(
        [(1, 2), (2, 1), (3, None)], "id BIGINT, parent BIGINT"
    )
    with pytest.raises(ValueError, match="converge"):
        ancestor_closure(bad, "id", "parent", max_rounds=6)
    # dangling parent references fail loudly too — an inner hop join
    # would otherwise silently drop the subtree
    dangling = spark.createDataFrame(
        [(1, None), (2, 99)], "id BIGINT, parent BIGINT"
    )
    with pytest.raises(ValueError, match="not nodes"):
        ancestor_closure(dangling, "id", "parent")


def test_hashed_tfidf_vectors(spark):
    import math

    from pyspark.sql import functions as F

    from high_throughput_etl_pipeline_spark.operators.text import (
        hashed_tfidf,
    )

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "apple banana"),
            (2, "cherry cherry cherry"),
            (3, "   "),  # token-less: no features, drops
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {r["doc_id"]: r for r in hashed_tfidf(docs, dim=32).collect()}
    assert set(rows) == {0, 1, 2}  # empty doc dropped
    v = {k: r["tfidf"] for k, r in rows.items()}
    for k, vec in v.items():
        assert len(vec) == 32
        # l2_norm column matches the vector's actual norm
        assert abs(
            math.sqrt(sum(x * x for x in vec)) - rows[k]["l2_norm"]
        ) < 1e-9
    # docs sharing all terms are more similar than disjoint ones
    cos = lambda a, b: sum(
        x * y for x, y in zip(v[a], v[b])
    ) / (rows[a]["l2_norm"] * rows[b]["l2_norm"])
    assert cos(0, 1) > 0.9
    assert cos(0, 2) == 0.0  # disjoint vocab -> orthogonal
    # tf matters: doc 0 has apple twice, so apple's bucket dominates
    assert max(v[0]) > max(v[1])
    # deterministic across runs
    again = {
        r["doc_id"]: r["tfidf"] for r in hashed_tfidf(docs, dim=32).collect()
    }
    assert again == v


def test_leakage_safe_split_clusters_never_straddle(spark):
    from pyspark.sql import functions as F

    from high_throughput_etl_pipeline_spark.operators.corpus import (
        leakage_safe_split,
    )

    # 60 docs; pairs chain 0-1-2, 10-11, and a larger ring 20..24
    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id BIGINT")
    pair_rows = [(0, 1), (1, 2), (10, 11)] + [
        (20 + i, 20 + (i + 1) % 5) for i in range(5)
    ]
    pairs = spark.createDataFrame(pair_rows, "id_a BIGINT, id_b BIGINT")
    out = leakage_safe_split(docs, pairs, "doc_id").collect()
    assert len(out) == 60  # every doc assigned, singletons included
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # the contract: no cluster straddles splits
    assert all(len(s) == 1 for s in by_cluster.values())
    assert by_cluster.keys() >= {0, 10, 20}  # min-label canonical ids
    # chained docs share their component even without a direct pair
    row = {r["doc_id"]: r for r in out}
    assert row[2]["cluster_id"] == 0 and row[24]["cluster_id"] == 20
    # all three splits realized over 50+ singletons (sanity, det. hash)
    assert {r["split"] for r in out} == {"train", "val", "test"}
    # non-vacuity at corpus scale: the naive per-doc split DOES tear
    # real near-dup clusters apart where the cluster split cannot
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    from high_throughput_etl_pipeline_spark.operators.dedup import (
        jaccard_pairs_via_minhash,
        md5_64,
    )

    real_pairs = jaccard_pairs_via_minhash(
        d, num_hashes=8, bands=4, shingle_n=2, threshold=0.05
    )
    assigned = leakage_safe_split(d, real_pairs, "doc_id")
    naive_bucket = F.pmod(
        md5_64(F.concat(F.lit("split-v1:"), F.col("doc_id").cast("string"))),
        F.lit(10_000),
    )
    j = assigned.withColumn(
        "naive",
        F.when(naive_bucket < 8000, "train")
        .when(naive_bucket < 9000, "val")
        .otherwise("test"),
    )
    per = j.groupBy("cluster_id").agg(
        F.count_distinct("split").alias("ss"),
        F.count_distinct("naive").alias("ns"),
    )
    agg = per.agg(
        F.sum((F.col("ss") > 1).cast("int")).alias("safe_leaks"),
        F.sum((F.col("ns") > 1).cast("int")).alias("naive_leaks"),
    ).first()
    assert agg["safe_leaks"] == 0
    assert agg["naive_leaks"] > 0  # the failure mode is real in-data


def test_funnel_walk_chained_semantics(spark):
    """Step i binds to the FIRST event of its type strictly after step
    i-1 — not first-touch.  Covers: out-of-order stage (click before
    any view doesn't bind), rebind-after (later click binds), broken
    chain, and the within_seconds span gate."""
    from high_throughput_etl_pipeline_spark.operators.sequence import (
        funnel_walk,
    )

    rows = [
        # u1: click@09 precedes the first view@10 -> that click must NOT
        # bind; click@11 binds; purchase@12 converts (span 2h)
        (1, "2026-08-12 09:00:00", "click"),
        (1, "2026-08-12 10:00:00", "view"),
        (1, "2026-08-12 11:00:00", "click"),
        (1, "2026-08-12 12:00:00", "purchase"),
        # u2: full chain but span > window (3 days) -> completed, not
        # converted under within
        (2, "2026-08-12 10:00:00", "view"),
        (2, "2026-08-12 11:00:00", "click"),
        (2, "2026-08-15 11:00:00", "purchase"),
        # u3: purchase BEFORE the bound click -> chain stops at click
        (3, "2026-08-12 10:00:00", "view"),
        (3, "2026-08-12 10:30:00", "purchase"),
        (3, "2026-08-12 11:00:00", "click"),
        # u4: no funnel event types at all
        (4, "2026-08-12 10:00:00", "error"),
    ]
    df = spark.createDataFrame(
        rows, "user_id BIGINT, ts STRING, event_type STRING"
    ).selectExpr("user_id", "to_timestamp(ts) AS ts", "event_type")
    got = {
        r["user_id"]: r
        for r in funnel_walk(
            df, ["view", "click", "purchase"], within_seconds=86400
        ).collect()
    }
    assert got[1]["converted"] and got[1]["seconds_to_convert"] == 7200
    assert str(got[1]["t_1"]).startswith("2026-08-12 11:00")
    assert got[2]["steps_completed"] == 3 and not got[2]["converted"]
    assert got[2]["seconds_to_convert"] is None
    assert got[3]["steps_completed"] == 2 and not got[3]["converted"]
    assert got[4]["steps_completed"] == 0 and got[4]["t_0"] is None


def test_event_type_patterns_counts_and_ties(spark):
    from high_throughput_etl_pipeline_spark.operators.sequence import (
        event_type_patterns,
    )

    # u1 sequence 'veevp': one direct 'vp', one 'ee' burst; the two
    # equal-ts events order by the tie column (event_id) -> 've' not 'ev'
    rows = [
        (1, 10, "2026-08-12 10:00:00", "view"),
        (1, 11, "2026-08-12 10:00:00", "error"),
        (1, 12, "2026-08-12 10:01:00", "error"),
        (1, 13, "2026-08-12 10:02:00", "view"),
        (1, 14, "2026-08-12 10:03:00", "purchase"),
        # u2: unmapped type drops; 'vvc' counts one v-run->click
        (2, 20, "2026-08-12 10:00:00", "view"),
        (2, 21, "2026-08-12 10:01:00", "other_type"),
        (2, 22, "2026-08-12 10:02:00", "view"),
        (2, 23, "2026-08-12 10:03:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id BIGINT, event_id BIGINT, ts STRING, event_type STRING"
    ).selectExpr(
        "user_id", "event_id", "to_timestamp(ts) AS ts", "event_type"
    )
    got = {
        r["user_id"]: r
        for r in event_type_patterns(
            df,
            alphabet={"view": "v", "click": "c", "purchase": "p",
                      "error": "e"},
            patterns={"direct_convert": "vp", "error_bursts": "ee+",
                      "view_runs_clicked": "v+c"},
            tie_col="event_id",
        ).collect()
    }
    assert got[1]["seq_len"] == 5
    assert got[1]["n_direct_convert"] == 1
    assert got[1]["n_error_bursts"] == 1
    assert got[2]["seq_len"] == 3  # unmapped type dropped
    assert got[2]["n_view_runs_clicked"] == 1


def test_pagerank_int_structure_and_determinism(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        pagerank_int,
    )
    import pytest as _pytest

    # undirected star 0-1, 0-2, 0-3: the hub must outrank the leaves,
    # leaves are symmetric -> identical ranks
    star = [(0, i) for i in (1, 2, 3)] + [(i, 0) for i in (1, 2, 3)]
    e = spark.createDataFrame(star, "src BIGINT, dst BIGINT")
    r = {row["id"]: row["rank"] for row in pagerank_int(e).collect()}
    assert r[0] > r[1]
    assert r[1] == r[2] == r[3]
    # exact integer arithmetic: a second run is bit-identical
    r2 = {row["id"]: row["rank"] for row in pagerank_int(e).collect()}
    assert r == r2
    # mass approximately conserved (floor division leaks ulps only)
    assert 0.99 * 10**12 < sum(r.values()) <= 10**12

    # a sink (directed edge with no return) fails loud, not silently
    sink = spark.createDataFrame([(0, 1)], "src BIGINT, dst BIGINT")
    with _pytest.raises(ValueError, match="sink"):
        pagerank_int(sink)


def test_binary_signatures_and_hamming(spark):
    """Known bit patterns: +/- alternation packs to 0x55555555 per
    word; Hamming to the all-positive vector = number of negative
    dims; self-distance is 0 and identity ranks first."""
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        binary_signatures,
        hamming_topk,
    )

    alt = [1.0 if i % 2 == 0 else -1.0 for i in range(64)]
    pos = [1.0] * 64
    df = spark.createDataFrame(
        [(1, alt), (2, pos)], "vec_id BIGINT, embedding array<float>"
    )
    sig = {
        r["vec_id"]: (r["_w0"], r["_w1"])
        for r in binary_signatures(df).collect()
    }
    assert sig[1] == (0x55555555, 0x55555555)
    assert sig[2] == (0xFFFFFFFF, 0xFFFFFFFF)

    q = spark.createDataFrame(
        [(0, pos)], "query_id BIGINT, embedding array<float>"
    )
    got = hamming_topk(df, q, k=2).orderBy("rank").collect()
    assert [(r["vec_id"], r["hamming"]) for r in got] == [(2, 0), (1, 32)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 32"):
        binary_signatures(df, dim=48)


def test_grouped_trend_known_line_and_degenerates(spark):
    """y = 2x + 5 exactly -> slope 2 (per x-unit scale), intercept 5,
    r = 1; constant-y group -> r NULL but slope 0; constant-x group ->
    slope/intercept/r all NULL (zero x-variance)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        grouped_trend,
    )

    rows = (
        [("line", x, 2 * x + 5) for x in range(1, 11)]
        + [("flat_y", x, 7) for x in range(1, 6)]
        + [("flat_x", 3, y) for y in (1, 2, 3)]
    )
    df = spark.createDataFrame(rows, "g STRING, x BIGINT, y BIGINT")
    got = {
        r["g"]: r
        for r in grouped_trend(
            df, "x", "y", ["g"], x_per_unit=1, y_per_unit=1
        ).collect()
    }
    assert got["line"]["slope_per_xunit"] == 2.0
    assert got["line"]["intercept"] == 5.0
    assert got["line"]["corr_r"] == 1.0
    assert got["flat_y"]["slope_per_xunit"] == 0.0
    assert got["flat_y"]["corr_r"] is None
    assert got["flat_x"]["slope_per_xunit"] is None
    assert got["flat_x"]["corr_r"] is None


def test_robust_outliers_breakdown_resistance(spark):
    """An injected contamination cluster must be flagged and must NOT
    drag the median/MAD fences (the mean/stddev failure mode)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        robust_outlier_profile,
    )

    base = [("g", float(v)) for v in range(100)]          # 0..99
    spikes = [("g", 1e6)] * 5                              # 5% contamination
    df = spark.createDataFrame(base + spikes, "g STRING, value DOUBLE")
    r = robust_outlier_profile(df, "value", "g").first()
    assert r["n_outliers"] == 5            # exactly the spikes
    assert r["median"] < 110               # fences un-dragged
    # zero-MAD group: >50% of mass on one value; the product form must
    # still count the far point without dividing by zero
    degen = spark.createDataFrame(
        [("d", 5.0)] * 10 + [("d", 500.0)], "g STRING, value DOUBLE"
    )
    r2 = robust_outlier_profile(degen, "value", "g").first()
    assert r2["mad"] == 0.0 and r2["n_outliers"] == 1


def test_reservoir_per_group_window_group_limit(spark):
    """Scale pin: the pos <= k filter must push into the shuffle as a
    WindowGroupLimit (per-task k-row heaps), not sort whole groups;
    and the sample is rerun-deterministic."""
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        reservoir_per_group,
    )

    df = spark.range(1000).selectExpr(
        "id AS doc_id", "CAST(id % 7 AS STRING) AS src"
    )
    out = reservoir_per_group(df, ["src"], k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    a = sorted((r["src"], r["pos"], r["doc_id"]) for r in out.collect())
    b = sorted(
        (r["src"], r["pos"], r["doc_id"])
        for r in reservoir_per_group(df, ["src"], k=3).collect()
    )
    assert a == b and len(a) == 21


def test_time_weighted_avg_step_function(spark):
    """v=10 held 10s then v=40 held 30s -> TWAP (100+1200)/40 = 32.5
    units with unit_scale=1; equal-second ties use tie order; a
    single-reading group covers no time -> NULL."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        time_weighted_avg,
    )

    rows = [
        ("a", 0, 1, 10),
        ("a", 10, 2, 40),
        ("a", 40, 3, 99),       # final reading spans no time
        # b: two readings in the same second -> tie order decides which
        # value bridges the 100s to the next reading
        ("b", 0, 1, 100),
        ("b", 0, 2, 200),
        ("b", 100, 3, 0),
    ]
    df = spark.createDataFrame(
        rows, "g STRING, t BIGINT, eid BIGINT, v BIGINT"
    )
    got = {
        r["g"]: r
        for r in time_weighted_avg(
            df, "t", "v", ["g"], unit_scale=1, tie_cols=["eid"]
        ).collect()
    }
    assert got["a"]["time_weighted"] == 32.5
    assert got["a"]["covered_seconds"] == 40
    # the LAST tied reading (eid 2, v=200) holds for the 100 s
    assert got["b"]["time_weighted"] == 200.0
    single = spark.createDataFrame(
        [("s", 5, 1, 7)], "g STRING, t BIGINT, eid BIGINT, v BIGINT"
    )
    r = time_weighted_avg(single, "t", "v", ["g"], unit_scale=1).first()
    assert r["time_weighted"] is None and r["covered_seconds"] == 0


def test_daily_peak_concurrency_sweep(spark):
    """Three overlapping 5-min intervals peak at 3; a back-to-back
    interval starting exactly at another's close must NOT overlap
    (half-open); midnight-crossing intervals clip to their day."""
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        daily_peak_concurrency,
    )

    rows = [
        ("2026-08-12 10:00:00",),
        ("2026-08-12 10:01:00",),
        ("2026-08-12 10:02:00",),   # all three live at 10:02
        ("2026-08-12 10:05:00",),   # opens exactly at first close
        ("2026-08-12 23:59:00",),   # clips at midnight
    ]
    df = spark.createDataFrame(rows, "ts STRING").selectExpr(
        "to_timestamp(ts) AS ts"
    )
    out = {
        str(r["date"]): r
        for r in daily_peak_concurrency(df, "ts", 300).collect()
    }
    d = out["2026-08-12"]
    assert d["peak_concurrency"] == 3
    assert d["n_intervals"] == 5
    assert str(d["peak_at"]).startswith("2026-08-12 10:02:00")
    # back-to-back: at 10:05 the 10:00 interval is already closed ->
    # concurrency at 10:05 is 3 (10:01,10:02,10:05), not 4; peak time
    # stays the earliest 3-way overlap
    assert "2026-08-13" not in out  # clipped, no spill into next day


def test_triangle_stats_known_graphs(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        triangle_stats,
    )
    import pytest as _pytest

    # K4: 4 triangles, 12 wedges, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = triangle_stats(
        spark.createDataFrame(k4, "a BIGINT, b BIGINT")
    ).first()
    assert r["n_triangles"] == 4 and r["n_wedges"] == 12
    assert r["global_clustering"] == 1.0
    # path graph 0-1-2: one wedge, no triangle
    path = spark.createDataFrame([(0, 1), (1, 2)], "a BIGINT, b BIGINT")
    r2 = triangle_stats(path).first()
    assert r2["n_triangles"] == 0 and r2["n_wedges"] == 1
    assert r2["global_clustering"] == 0.0
    # non-canonical edges fail loud
    with _pytest.raises(ValueError, match="canonical"):
        triangle_stats(
            spark.createDataFrame([(2, 1)], "a BIGINT, b BIGINT")
        )


def test_population_stability_detects_shift(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        population_stability,
    )

    ref = spark.range(1000).selectExpr("CAST(id % 100 AS DOUBLE) AS value")
    same = spark.range(1000).selectExpr(
        "CAST((id + 7) % 100 AS DOUBLE) AS value"
    )
    r = population_stability(ref, same, "value").first()
    assert abs(r["psi"]) < 0.01  # same distribution -> stable
    assert r["n_shifted_buckets"] == 0

    shifted = spark.range(1000).selectExpr(
        "CAST(50 + id % 100 AS DOUBLE) AS value"
    )
    r2 = population_stability(ref, shifted, "value").first()
    assert r2["psi"] > 0.25      # half the mass left its buckets
    assert r2["n_shifted_buckets"] >= 4
    # empty current buckets took the min_prop clamp, not a NaN/inf
    assert r2["psi"] == r2["psi"] and r2["psi"] < float("inf")


def test_conversion_rates_wilson_known_bounds(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        conversion_rates_wilson,
    )

    rows = [("A", i < 5) for i in range(10)] + [("B", i < 99) for i in range(100)]
    df = spark.createDataFrame(rows, "variant STRING, converted BOOLEAN")
    got = {
        r["variant"]: r
        for r in conversion_rates_wilson(df, "variant", "converted").collect()
    }
    a = got["A"]
    assert a["rate"] == 0.5
    # Wilson 95% for 5/10 (z=1.96): [0.236593, 0.763407]
    assert abs(a["wilson_lo"] - 0.236593) < 1e-5
    assert abs(a["wilson_hi"] - 0.763407) < 1e-5
    b = got["B"]
    # near-1 rate: interval stays inside [0, 1] (the normal
    # approximation would overflow past 1.0 here)
    assert b["rate"] == 0.99 and b["wilson_hi"] < 1.0
    assert b["wilson_lo"] > 0.9


def test_fs_link_scores_three_way_decision(spark):
    from high_throughput_etl_pipeline_spark.operators.entity import (
        fs_link_scores,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, 2, True, True), (1, 3, True, False), (1, 4, False, False)],
        "id_a BIGINT, id_b BIGINT, f1 BOOLEAN, f2 BOOLEAN",
    )
    # f1: log2(.9/.1)=3.169925 / log2(.1/.9)=-3.169925
    # f2: log2(.8/.2)=2 / log2(.2/.8)=-2
    fields = [
        ("f1", __import__("pyspark.sql.functions", fromlist=["col"]).col("f1"), 0.9, 0.1),
        ("f2", __import__("pyspark.sql.functions", fromlist=["col"]).col("f2"), 0.8, 0.2),
    ]
    got = {
        r["id_b"]: r
        for r in fs_link_scores(df, fields, upper=4.0, lower=0.0).collect()
    }
    assert got[2]["decision"] == "match"      # 5.169925
    assert got[2]["fs_score"] == 5.169925
    assert got[3]["decision"] == "review"     # 1.169925
    assert got[4]["decision"] == "nonmatch"   # -5.169925
    with _pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_link_scores(df, [("bad", df["f1"], 0.2, 0.9)])


def test_take_top_k_matches_sort_and_plans_distributed(spark):
    from pyspark.sql import functions as F

    from high_throughput_etl_pipeline_spark.operators.ranking import (
        take_top_k,
    )

    df = spark.range(10_000).selectExpr(
        "id", "CAST(id % 97 AS DOUBLE) AS score"
    )
    got = take_top_k(df, [F.desc("score"), F.col("id")], 5)
    rows = [(r["id"], r["score"], r["rank"]) for r in got.collect()]
    exp = [(r["id"], r["score"]) for r in
           df.orderBy(F.desc("score"), "id").limit(5).collect()]
    assert [(i, s) for i, s, _ in rows] == exp
    assert [r for _, _, r in rows] == [1, 2, 3, 4, 5]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # no SinglePartition exchange of the full input feeds a sort
    assert "Exchange SinglePartition" not in plan.split(
        "== Initial Plan =="
    )[0]


def test_label_propagation_sticky_mode_semantics(spark):
    """Chain seed(0,lbl 7)-1-2-3: labels spread one hop per round and
    STICK (round-2 arrival at node 2 cannot flip later); mode ties take
    the smallest label; unreached nodes stay NULL; seeds never change."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        label_propagation,
    )

    seeds = spark.createDataFrame(
        [(0, 7), (10, 3), (11, 5), (1, None), (2, None), (3, None),
         (4, None), (99, None)],
        "id BIGINT, label INT",
    )
    und = [(0, 1), (1, 2), (2, 3),      # chain from seed 7
           (10, 4), (11, 4)]            # node 4 hears 3 and 5 equally
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src BIGINT, dst BIGINT"
    )
    got = {
        r["id"]: r["label"]
        for r in label_propagation(seeds, edges, rounds=3).collect()
    }
    assert got[0] == 7 and got[1] == 7 and got[2] == 7 and got[3] == 7
    assert got[4] == 3          # tie (one vote each) -> smallest label
    assert got[99] is None      # isolated: never reached
    # two rounds only: the chain end is NOT reached yet (3 hops)
    got2 = {
        r["id"]: r["label"]
        for r in label_propagation(seeds, edges, rounds=2).collect()
    }
    assert got2[2] == 7 and got2[3] is None


def test_nb_confusion_disjoint_vocab_is_diagonal(spark):
    from high_throughput_etl_pipeline_spark.operators.text import nb_confusion

    rows = []
    for i in range(6):
        rows.append((i, "aaa bbb ccc aaa", "A"))
    for i in range(6, 12):
        rows.append((i, "xxx yyy zzz xxx", "B"))
    rows.append((12, "   ", "A"))  # blank text drops, never predicted
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = nb_confusion(df, label_col="lang", dim=64).collect()
    cells = {(r.true_label, r.pred_label): r.n_docs for r in out}
    assert cells == {("A", "A"): 6, ("B", "B"): 6}


def test_nb_confusion_majority_vocab_wins_and_total_conserved(spark):
    from high_throughput_etl_pipeline_spark.operators.text import nb_confusion

    rows = [
        (1, "cat cat cat dog", "pets"),
        (2, "cat dog dog cat", "pets"),
        (3, "stock bond bond stock", "fin"),
        (4, "bond stock stock bond", "fin"),
        # mostly fin vocabulary, labelled pets -> predicted fin
        (5, "stock bond bond stock cat", "pets"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = nb_confusion(df, label_col="lang", dim=64).collect()
    cells = {(r.true_label, r.pred_label): r.n_docs for r in out}
    assert cells[("pets", "fin")] == 1
    assert cells[("pets", "pets")] == 2
    assert cells[("fin", "fin")] == 2
    assert sum(cells.values()) == 5


def test_autocorrelation_alternating_and_constant(spark):
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        autocorrelation,
    )
    from datetime import date

    rows = []
    for i in range(12):
        rows.append(("alt", date(2026, 1, i + 1), 10 if i % 2 else 20))
        rows.append(("flat", date(2026, 1, i + 1), 7))
    df = spark.createDataFrame(rows, "event_type STRING, d DATE, x BIGINT")
    out = {
        (r.event_type, r.lag): r.acf
        for r in autocorrelation(df, max_lag=3).collect()
    }
    # alternating series: strong negative lag-1, positive lag-2
    assert out[("alt", 1)] < -0.8
    assert out[("alt", 2)] > 0.7
    # constant series has zero variance -> NULL acf, not a crash
    assert out[("flat", 1)] is None


def test_cusum_alarm_fires_on_level_shift_and_resets(spark):
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        cusum_alarms,
    )
    from datetime import date

    # 10 days at 100, then 10 days at 160: upward alarm must fire in
    # the shifted regime and never in the stable prefix
    rows = [("a", date(2026, 1, i + 1), 100) for i in range(10)]
    rows += [("a", date(2026, 1, i + 11), 160) for i in range(10)]
    df = spark.createDataFrame(rows, "event_type STRING, d DATE, x BIGINT")
    out = cusum_alarms(df, slack_div=20, h_mult=4).collect()
    by_day = {r.d.day: r for r in out}
    assert all(not by_day[i + 1].alarm_up for i in range(10))
    fired = [d for d, r in by_day.items() if r.alarm_up]
    assert fired and min(fired) >= 11
    # reset: the statistic drops back after each alarm day
    first = min(fired)
    if first + 1 in by_day and not by_day[first + 1].alarm_up:
        assert by_day[first + 1].cusum_pos < by_day[first].cusum_pos


def test_seasonal_backtest_periodic_series_has_zero_seasonal_mae(spark):
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        seasonal_backtest,
    )
    from datetime import date, timedelta

    base = [10, 50, 30, 70, 20, 60, 40]  # period-7 pattern, 4 cycles
    rows = [
        ("a", date(2026, 1, 1) + timedelta(days=i), base[i % 7])
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, "event_type STRING, d DATE, x BIGINT")
    r = seasonal_backtest(df, period=7).collect()[0]
    assert r.n_eval == 21
    assert r.mae_seasonal == 0.0
    assert r.mae_naive > 0
    assert r.skill_ratio == 0.0
    assert r.bias_seasonal == 0.0


def test_hits_known_bipartite_structure(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import hits_int

    # hub 1 covers all three authorities; hub 2 covers one.
    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10)], "src BIGINT, dst BIGINT"
    )
    out = hits_int(edges, iterations=4, scale=10**6).collect()
    hubs = {r.id: r.score for r in out if r.kind == "hub"}
    auths = {r.id: r.score for r in out if r.kind == "authority"}
    assert hubs[1] == 10**6  # argmax hub renormalizes to exactly scale
    assert hubs[1] > hubs[2]
    assert auths[10] == 10**6  # double-covered authority dominates
    assert auths[10] > auths[11] == auths[12]  # symmetric pair ties


def test_degree_assortativity_star_is_minus_one_cycle_is_null(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        degree_assortativity,
    )

    # star K_{1,4}: every edge joins deg-4 to deg-1 -> r = -1 exactly
    star_pairs = [(0, i) for i in range(1, 5)]
    star = spark.createDataFrame(
        star_pairs + [(b, a) for a, b in star_pairs],
        "src BIGINT, dst BIGINT",
    )
    r = degree_assortativity(star).collect()[0]
    assert r.m_edges == 8
    assert r.assortativity == -1.0
    # 4-cycle: all degrees equal -> zero variance -> NULL, not a crash
    cyc_pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    cyc = spark.createDataFrame(
        cyc_pairs + [(b, a) for a, b in cyc_pairs], "src BIGINT, dst BIGINT"
    )
    r2 = degree_assortativity(cyc).collect()[0]
    assert r2.assortativity is None


def test_k_core_peels_chain_keeps_clique_with_cascade(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import k_core

    # triangle {1,2,3} + pendant path 3-4-5-6: the path must peel
    # away over multiple cascading rounds; the triangle survives with
    # in-core degree 2 everywhere
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)],
        "a BIGINT, b BIGINT",
    )
    out = {r.id: r.core_degree for r in k_core(edges, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k=3 empties it (triangle nodes have degree 2)
    assert k_core(edges, k=3).count() == 0


def test_association_rules_known_counts(spark):
    from high_throughput_etl_pipeline_spark.operators.basket import (
        association_rules,
    )

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "o BIGINT, i STRING")
    out = {
        (r.antecedent, r.consequent): r
    for r in association_rules(df, "o", "i", min_support_count=2).collect()}
    # only (a,b) reaches support 2; both directions emitted
    assert set(out) == {("a", "b"), ("b", "a")}
    r = out[("a", "b")]
    assert (r.n_both, r.n_ant, r.n_cons, r.n_baskets) == (2, 3, 3, 4)
    assert r.support == 0.5
    assert r.confidence == round(2 / 3, 6)
    assert r.lift == round(2 * 4 / (3 * 3), 6)


def test_pmi_collocations_finds_repeated_phrase(spark):
    from high_throughput_etl_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    docs = spark.createDataFrame(
        [(i, "new york is big and new york is old") for i in range(3)],
        "doc_id BIGINT, text STRING",
    )
    out = {(r.w1, r.w2): r for r in pmi_collocations(
        docs, min_pair_count=5).collect()}
    assert ("new", "york") in out
    r = out[("new", "york")]
    assert r.c_xy == 6 and r.pmi > 0


def test_zipf_fit_decreasing_distribution(spark):
    from high_throughput_etl_pipeline_spark.operators.text import zipf_fit

    text = " ".join(["alpha"] * 8 + ["beta"] * 4 + ["gamma"] * 2 + ["delta"])
    docs = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    r = zipf_fit(docs).collect()[0]
    assert r.vocab_size == 4
    assert r.total_tokens == 15
    assert r.zipf_slope < 0
    assert 0 < r.r2 <= 1


def test_ngram_novelty_shared_vs_unique(spark):
    from high_throughput_etl_pipeline_spark.operators.text import (
        ngram_novelty,
    )

    shared = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha beta"),
            (2, shared + " gamma delta"),
            (3, "totally different words here entirely unique"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.doc_id: r for r in ngram_novelty(docs, n=5).collect()}
    # docs 1 and 2 share exactly the one 5-gram "one two three four five"
    assert out[1].n_shared == 1 and out[2].n_shared == 1
    assert out[3].n_shared == 0 and out[3].novelty == 1.0
    assert out[1].n_shingles == 3  # 7 words -> 3 shingles


def test_theil_sen_resists_outlier(spark):
    from high_throughput_etl_pipeline_spark.operators.timeseries import (
        theil_sen,
    )
    from datetime import date, timedelta

    # perfect slope-3 line with one wild spike: OLS would bend, the
    # pairwise-median slope stays exactly 3
    rows = []
    for i in range(11):
        x = 10 + 3 * i if i != 5 else 500
        rows.append(("a", date(2026, 1, 1) + timedelta(days=i), x))
    df = spark.createDataFrame(rows, "event_type STRING, d DATE, x BIGINT")
    r = theil_sen(df).collect()[0]
    assert r.n_pairs == 55
    assert r.theil_sen_slope == 3.0


def test_quantile_calibrate_equalizes_marginals(spark):
    from high_throughput_etl_pipeline_spark.operators.corpus import (
        quantile_calibrate,
    )

    # group A has values 10x group B's; after calibration both groups
    # must span the SAME global value range with matching endpoints
    rows = [(i, "A", 100 + 10 * i) for i in range(5)]
    rows += [(10 + i, "B", 1 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, source STRING, v BIGINT")
    out = quantile_calibrate(df, "v", "source", "doc_id").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.source, []).append(r)
    for g in ("A", "B"):
        vals = sorted(r.calibrated_value for r in by_grp[g])
        # both marginals hit the global min and max, monotone in rank
        assert vals[0] == 1 and vals[-1] == 140
        ordered = sorted(by_grp[g], key=lambda r: r.src_rank)
        assert [r.calibrated_value for r in ordered] == sorted(
            r.calibrated_value for r in ordered
        )
    # calibration preserves within-group order of the raw value
    for g in ("A", "B"):
        ordered = sorted(by_grp[g], key=lambda r: r.v)
        ranks = [r.src_rank for r in ordered]
        assert ranks == sorted(ranks)


def test_global_cumsum_matches_local_prefix_and_total(spark):
    from high_throughput_etl_pipeline_spark.operators.ranking import (
        global_cumsum,
    )

    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id BIGINT, v BIGINT").repartition(8)
    out, total = global_cumsum(df, [F.col("id")], "v", cum_col="cum")
    got = sorted(
        ((r.id, int(r.cum)) for r in out.collect()), key=lambda t: t[0]
    )
    acc, exp = 0, []
    for i, v in sorted(rows):
        acc += v
        exp.append((i, acc))
    assert got == exp
    assert total == acc
    # plan: no single-partition exchange feeding the running-sum window
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan.split("== Initial Plan ==")[0]


def test_mutual_best_match_breaks_chains(spark):
    from high_throughput_etl_pipeline_spark.operators.entity import (
        mutual_best_matches,
    )

    # chain 1-2-3: (1,2) score 1, (2,3) score 2 -> 2's best is 1, so
    # (2,3) dies; isolated tie pair (10,11)+(10,12) both score 1 ->
    # 10's best tie-breaks to 11, (10,12) dies, (10,11) survives only
    # if 11's best is 10 (it is — its only candidate)
    pairs = spark.createDataFrame(
        [
            (1, 2, 1),
            (2, 3, 2),
            (10, 11, 1),
            (10, 12, 1),
        ],
        "id_a BIGINT, id_b BIGINT, edit_distance BIGINT",
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in mutual_best_matches(pairs).collect()
    )
    assert got == [(1, 2), (10, 11)]


def test_rake_phrase_segmentation_and_scores(spark):
    from high_throughput_etl_pipeline_spark.operators.text import (
        rake_keywords,
    )

    # "deep learning" appears twice as a run; stopword "the" splits
    # phrases; "deep learning systems" extends the degree of both words
    docs = spark.createDataFrame(
        [
            (1, "deep learning beats the baseline"),
            (2, "deep learning systems"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r.phrase: r for r in rake_keywords(docs).collect()}
    assert "deep learning beats" in out
    assert "deep learning systems" in out
    assert "baseline" in out
    # deg(deep)=deg(learning)=3+3=6, freq=2 -> wscore 3.0 each;
    # deg(systems)=3, freq=1 -> 3.0; phrase score 9.0
    assert out["deep learning systems"].rake_score == 9.0
    assert out["baseline"].rake_score == 1.0
    assert out["deep learning beats"].n_occurrences == 1


def test_poisson_bootstrap_ci_statistics(spark):
    """The Poisson bootstrap's interval must bracket the true mean of a
    well-behaved sample, its weights must be a real Poisson(1) draw
    (mean weight ~ 1), and the whole release must be deterministic
    (keyed PRF, not RNG)."""
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        poisson_bootstrap_ci,
    )

    rows = [("g", i, 10_000 + (i * 7919) % 2_000) for i in range(400)]
    df = spark.createDataFrame(rows, "grp string, id bigint, cents bigint")

    def run():
        return poisson_bootstrap_ci(
            df, "cents", "id", ["grp"], n_boot=40
        ).collect()

    (r,) = run()
    true_mean = sum(v for *_, v in rows) / 400 / 100
    assert r["n_rows"] == 400
    assert abs(r["point_mean"] - true_mean) < 1e-6
    # the CI brackets the point estimate and is a few SEs wide
    assert r["boot_lo"] <= r["point_mean"] <= r["boot_hi"]
    assert r["boot_se"] > 0
    width = r["boot_hi"] - r["boot_lo"]
    assert width < 10 * r["boot_se"] + 1e-9
    # deterministic: a rerun reproduces the identical draw
    (r2,) = run()
    assert r2 == r


def test_poisson_bootstrap_weights_mean_one(spark):
    """Mean Poisson(1) weight across (row, replicate) cells ~ 1: the
    resample neither inflates nor shrinks the effective sample."""
    import pyspark.sql.functions as F

    from high_throughput_etl_pipeline_spark.operators.dedup import md5_64
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        POISSON1_CDF_1E9,
    )

    df = spark.range(2_000).select(
        F.explode(F.sequence(F.lit(0), F.lit(19))).alias("b"), "id"
    )
    u = F.pmod(
        md5_64(
            F.concat(
                F.col("id").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
                F.lit(":pboot-v1"),
            )
        ),
        F.lit(1_000_000_000),
    )
    th = F.array(*[F.lit(t) for t in POISSON1_CDF_1E9])
    w = F.size(F.filter(th, lambda t: t <= u))
    (row,) = df.select(
        F.avg(w).alias("mean_w"), F.max(w).alias("max_w")
    ).collect()
    assert abs(row["mean_w"] - 1.0) < 0.02
    assert row["max_w"] <= 7


def test_sprt_decisions_known_streams(spark):
    import math

    from high_throughput_etl_pipeline_spark.plans.metrics import (
        sprt_decisions,
    )

    # u1: all successes -> accept_h1 at the first n where n*inc1 >= A
    # u2: all failures  -> accept_h0 at the first n where n*inc0 <= B
    # u3: 3 observations -> continue
    rows = (
        [("u1", i, 1) for i in range(30)]
        + [("u2", i, 0) for i in range(60)]
        + [("u3", i, 1 if i == 0 else 0) for i in range(3)]
    )
    df = spark.createDataFrame(rows, "k string, seq int, x int")
    got = {
        r["k"]: r
        for r in sprt_decisions(
            df, "x", ["k"], ["seq"], p0=0.2, p1=0.35, alpha=0.1, beta=0.1
        ).collect()
    }
    inc1 = round(math.log(0.35 / 0.2) * 1e9)
    inc0 = round(math.log(0.65 / 0.8) * 1e9)
    a9 = round(math.log(0.9 / 0.1) * 1e9)
    b9 = round(math.log(0.1 / 0.9) * 1e9)
    stop_h1 = next(n for n in range(1, 31) if n * inc1 >= a9)
    stop_h0 = next(n for n in range(1, 61) if n * inc0 <= b9)
    assert got["u1"]["decision"] == "accept_h1"
    assert got["u1"]["stop_n"] == stop_h1
    assert got["u2"]["decision"] == "accept_h0"
    assert got["u2"]["stop_n"] == stop_h0
    assert got["u3"]["decision"] == "continue"
    assert got["u3"]["stop_n"] == 3 and got["u3"]["n_obs"] == 3


def test_sssp_bounded_tiny_graph(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        sssp_bounded,
    )

    # s1 -2- p1 -1- s2 -5- p2 ; s1 -9- p2 (direct but heavier)
    edges = spark.createDataFrame(
        [(1, 1, 2), (2, 1, 1), (2, 2, 5), (1, 2, 9)],
        "s bigint, p bigint, w bigint",
    )
    src = spark.createDataFrame(
        [("s", 1, 0)], "kind string, id bigint, dist bigint"
    )
    got = {
        (r["kind"], r["id"]): r["dist"]
        for r in sssp_bounded(edges, src, rounds=4).collect()
    }
    assert got[("s", 1)] == 0
    assert got[("p", 1)] == 2
    assert got[("s", 2)] == 3
    # via p1-s2 (2+1+5=8) beats the direct 9-weight edge
    assert got[("p", 2)] == 8


def test_t_closeness_uniform_vs_skewed(spark):
    from high_throughput_etl_pipeline_spark.operators.privacy import (
        t_closeness_audit,
    )

    # group a mirrors the global 50/50 split -> t = 0
    # group b is 100% 'x' vs global 50/50 -> t = 0.5
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 10 + [("b", "x")] * 20
    )
    df = spark.createDataFrame(rows, "g string, s string")
    got = {
        r["g"]: r
        for r in t_closeness_audit(df, ["g"], "s", t=0.2).collect()
    }
    # global: x=30/40=0.75, y=10/40=0.25
    # a: x=0.5 y=0.5 -> 0.5*(0.25+0.25)=0.25 ; b: x=1 y=0 -> 0.25
    assert abs(got["a"]["t_value"] - 0.25) < 1e-9
    assert abs(got["b"]["t_value"] - 0.25) < 1e-9
    assert got["a"]["violates"] and got["b"]["violates"]
    assert got["a"]["n_rows"] == 20 and got["b"]["n_rows"] == 20


def test_kcenter_greedy_known_traversal(spark):
    from high_throughput_etl_pipeline_spark.operators.similarity import (
        kcenter_greedy,
    )

    # seed at id 0 = (0,0); farthest-point order is then (10,0),
    # (0,8), (5,4) with radii 100, 64, 41, 0
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [10.0, 0.0]),
            (2, [0.0, 8.0]),
            (3, [5.0, 4.0]),
        ],
        "vec_id bigint, embedding array<float>",
    )
    got = kcenter_greedy(df, "vec_id", "embedding", k=4, scale=1)
    assert got == [(1, 0, 100), (2, 1, 64), (3, 2, 41), (4, 3, 0)]


def test_jl_projections_match_python_prf(spark):
    import hashlib

    from high_throughput_etl_pipeline_spark.operators.linalg import (
        jl_projections_int,
        quantized_coords,
    )

    vecs = {
        0: [0.5, -1.25, 2.0, 0.001],
        1: [1.0, 1.0, -1.0, 0.25],
        2: [-0.333, 0.0, 0.125, 3.5],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id bigint, embedding array<float>",
    )
    coords = quantized_coords(df, "vec_id", "embedding", scale=1000)
    got = {
        (r["vec_id"], r["r"]): r["p"]
        for r in jl_projections_int(
            coords, "vec_id", k=2, dim=4, salt="jl-v1"
        ).collect()
    }

    def sign(r, pos):
        h = int(
            hashlib.md5(f"jl-v1:{r}:{pos}".encode()).hexdigest()[17:32],
            16,
        )
        return 1 if h % 2 == 0 else -1

    import math

    def q(x):
        # float32 storage round-trips through double before quantizing
        import struct

        x32 = struct.unpack("f", struct.pack("f", x))[0]
        s = 1 if x32 >= 0 else -1
        return s * int(math.floor(abs(x32) * 1000 + 0.5))

    for vid, v in vecs.items():
        xi = [q(x) for x in v]
        for r in range(2):
            want = sum(sign(r, p) * xi[p] for p in range(4))
            assert got[(vid, r)] == want, (vid, r)


def test_zonemap_pruning_clustered_vs_scattered(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        zonemap_pruning,
    )

    # group 0 covers January only, group 1 covers February only ->
    # a January predicate prunes group 1 entirely
    rows = [(0, f"2024-01-{d:02d} 00:00:00") for d in range(1, 11)] + [
        (1, f"2024-02-{d:02d} 00:00:00") for d in range(1, 11)
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame(rows, "g int, raw string").select(
        "g", F.col("raw").cast("timestamp").alias("ts")
    )
    out = {
        r["pred_label"]: r
        for r in zonemap_pruning(
            df,
            F.col("g"),
            "ts",
            [
                ("jan", "2024-01-01", "2024-02-01"),
                ("both", "2024-01-05", "2024-02-05"),
            ],
        ).collect()
    }
    jan = out["jan"]
    assert jan["n_groups"] == 2 and jan["n_pruned"] == 1
    assert jan["rows_scanned"] == 10 and jan["rows_matching"] == 10
    assert abs(jan["scan_fraction"] - 0.5) < 1e-9
    both = out["both"]
    assert both["n_pruned"] == 0 and both["rows_scanned"] == 20
    assert both["rows_matching"] == 10  # jan 5-10 + feb 1-4
    assert abs(both["match_fraction"] - 0.5) < 1e-9


def test_binseg_detects_planted_shift(spark):
    import datetime

    from high_throughput_etl_pipeline_spark.plans.metrics import (
        binseg_mean_shift,
    )

    base = datetime.date(2024, 3, 1)
    rows = [
        (base + datetime.timedelta(days=i), 100 if i < 10 else 200)
        for i in range(20)
    ]
    daily = spark.createDataFrame(rows, "day date, m bigint")
    got = {
        r["segment"]: r
        for r in binseg_mean_shift(
            daily, "day", "m", y_per_unit=100
        ).collect()
    }
    root = got["root"]
    assert root["split_day"] == base + datetime.timedelta(days=9)
    assert root["n_left"] == 10 and root["n_right"] == 10
    assert abs(root["mean_left"] - 1.0) < 1e-9
    assert abs(root["mean_right"] - 2.0) < 1e-9
    # S_L²/n_L + S_R²/n_R − S²/n = 1e5 + 4e5 − 4.5e5
    assert abs(root["gain"] - 50000.0) < 1e-6
    # flat sides -> zero-gain sub-splits at the earliest day
    assert got["left"]["gain"] == 0.0 and got["right"]["gain"] == 0.0


def test_poisson_bootstrap_uplift_detects_planted_shift(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        poisson_bootstrap_uplift,
    )

    rows = [("A", i, 10_000 + (i * 31) % 400) for i in range(300)] + [
        ("B", 1_000 + i, 13_000 + (i * 37) % 400) for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "arm string, id bigint, cents bigint"
    )
    (r,) = poisson_bootstrap_uplift(
        df, "cents", "id", "arm", n_boot=40
    ).collect()
    assert r["n_a"] == 300 and r["n_b"] == 300
    # true uplift ~ 30 units; the CI must bracket it and exclude zero
    assert abs(r["uplift"] - (r["mean_b"] - r["mean_a"])) < 1e-6
    assert r["boot_lo"] <= r["uplift"] <= r["boot_hi"]
    assert r["boot_lo"] > 0 and r["significant"] is True
    assert 25 < r["uplift"] < 35


def test_isotonic_fit_matches_pav(spark):
    from high_throughput_etl_pipeline_spark.plans.metrics import (
        isotonic_fit_bins,
    )

    # rates [0.1, 0.5, 0.3, 0.7] with equal weights: PAV pools the
    # middle violator pair to 0.4
    bins = spark.createDataFrame(
        [(0, 10, 1), (1, 10, 5), (2, 10, 3), (3, 10, 7)],
        "bin bigint, w bigint, y bigint",
    )
    got = {
        r["bin"]: r for r in isotonic_fit_bins(bins).collect()
    }
    assert abs(got[0]["isotonic"] - 0.1) < 1e-9
    assert abs(got[1]["isotonic"] - 0.4) < 1e-9
    assert abs(got[2]["isotonic"] - 0.4) < 1e-9
    assert abs(got[3]["isotonic"] - 0.7) < 1e-9
    # monotone nondecreasing by construction
    fits = [got[k]["isotonic"] for k in sorted(got)]
    assert fits == sorted(fits)
    # weighted version: heavy low-rate bin drags the pool down
    bins2 = spark.createDataFrame(
        [(0, 30, 3), (1, 10, 9)],
        "bin bigint, w bigint, y bigint",
    )
    got2 = {
        r["bin"]: r["isotonic"]
        for r in isotonic_fit_bins(bins2).collect()
    }
    # no violation (0.1 < 0.9): fit equals the raw rates
    assert abs(got2[0] - 0.1) < 1e-9 and abs(got2[1] - 0.9) < 1e-9


def test_sssp_bounded_multi_source_carry(spark):
    from high_throughput_etl_pipeline_spark.operators.graph import (
        sssp_bounded,
    )

    edges = spark.createDataFrame(
        [(1, 1, 1), (2, 1, 1), (2, 2, 1)],
        "s bigint, p bigint, w bigint",
    )
    src = spark.createDataFrame(
        [(1, "s", 1, 0), (2, "s", 2, 0)],
        "src bigint, kind string, id bigint, dist bigint",
    )
    got = {
        (r["src"], r["kind"], r["id"]): r["dist"]
        for r in sssp_bounded(
            edges, src, rounds=3, carry_cols=("src",)
        ).collect()
    }
    # from s1: p1 at 1, s2 at 2, p2 at 3 ; from s2: p1 and p2 at 1
    assert got[(1, "p", 1)] == 1 and got[(1, "s", 2)] == 2
    assert got[(1, "p", 2)] == 3
    assert got[(2, "p", 1)] == 1 and got[(2, "p", 2)] == 1


def test_prefix_filter_pairs_equals_bruteforce(spark):
    """The AllPairs lemma in practice: prefix-filtered pairs must be
    EXACTLY the brute-force Jaccard >= 0.6 pairs — 100% recall, no
    false positives."""
    import itertools

    from high_throughput_etl_pipeline_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    sets = {
        1: {"a", "b", "c", "d", "e"},
        2: {"a", "b", "c", "d", "f"},      # j(1,2)=4/6=0.667
        3: {"a", "b", "c", "d", "e"},      # j(1,3)=1.0
        4: {"x", "y", "z"},                # unrelated
        5: {"x", "y", "w"},                # j(4,5)=0.5 < 0.6
        6: {"p"},                          # singleton
    }
    rows = [(i, t) for i, s in sets.items() for t in sorted(s)]
    df = spark.createDataFrame(rows, "doc_id bigint, tok string")
    got = {
        (r["id_a"], r["id_b"]): r["intersection"]
        for r in prefix_filter_pairs(
            df, "doc_id", "tok", t_num=3, t_den=5
        ).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if 5 * inter >= 3 * (len(sets[a]) + len(sets[b]) - inter):
            want[(a, b)] = inter
    assert got == want
    assert (1, 2) in got and (1, 3) in got and (4, 5) not in got


def test_betweenness_bounded_diamond_graph(spark):
    """Diamond a-{b,c}-d: two shortest a→d paths, so Brandes gives the
    middle nodes δ = (1/2)(1+0) = 0.5 each and the sink 0 — exact
    expected lattice values, single source."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        betweenness_bounded,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")],
        "u STRING, v STRING",
    )
    srcs = spark.createDataFrame([("a",)], "src STRING")
    got = {
        r["node"]: r["bc_int"]
        for r in betweenness_bounded(edges, srcs, rounds=4).collect()
    }
    assert got == {"b": 500000000, "c": 500000000, "d": 0}


def test_betweenness_rounds_guard(spark):
    """rounds < 2 leaves the backward pass nothing to accumulate — the
    operator must fail loudly (ValueError), not crash with IndexError
    or return a frame with different semantics."""
    import pytest

    from high_throughput_etl_pipeline_spark.operators.graph import (
        betweenness_bounded,
    )

    edges = spark.createDataFrame([("a", "b")], "u STRING, v STRING")
    srcs = spark.createDataFrame([("a",)], "src STRING")
    with pytest.raises(ValueError, match="rounds >= 2"):
        betweenness_bounded(edges, srcs, rounds=1)


def test_betweenness_bounded_path_graph_two_sources(spark):
    """Path a-b-c-d from both ends: from a, δ(b)=2 (b sits on a→c and
    a→d), δ(c)=1; from d symmetric — so b and c each accumulate 3.0;
    endpoints collect only what the OTHER source routes through them
    (sources themselves are excluded from output)."""
    from high_throughput_etl_pipeline_spark.operators.graph import (
        betweenness_bounded,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "u STRING, v STRING"
    )
    srcs = spark.createDataFrame([("a",), ("d",)], "src STRING")
    got = {
        r["node"]: r["bc_int"]
        for r in betweenness_bounded(edges, srcs, rounds=4).collect()
    }
    # from a: delta(b) = (1/1)(1+delta(c)) = 2, delta(c) = 1, delta(d)=0
    # from d: delta(c) = 2, delta(b) = 1, delta(a) = 0
    assert got == {
        "b": 3000000000,
        "c": 3000000000,
        "a": 0,
        "d": 0,
    }
