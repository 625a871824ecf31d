"""Text-analysis, dedup, similarity, multimodal, streaming operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikipath_spark.functions.multimodal import (
    documents_as_media,
    extract_media_features,
    frame_sample,
)
from wikipath_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    whitespace_token_count,
)
from wikipath_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from wikipath_spark.operators.similarity import cosine_topk, cosine_topk_lsh

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
    (2, "the quick brown fox jumped over the lazy dog today"),   # near dup of 0
    (3, "der hund und die katze sind nicht der gleiche tier"),
    (4, "le chat est une creature et la souris est petite"),
    (5, "completely unrelated text about spark dataframes and shuffles"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts(docs):
    rows = {
        r.doc_id: (r.wc, r.tc)
        for r in docs.select(
            "doc_id",
            whitespace_token_count(F.col("text")).alias("wc"),
            token_count(F.col("text")).alias("tc"),
        ).collect()
    }
    assert rows[0] == (9, 9)
    assert rows[6] == (0, 0)


def test_lang_id(docs):
    got = {r.doc_id: r.lang for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[0] == "en"
    assert got[3] == "de"
    assert got[4] == "fr"
    assert got[6] == "und"


def test_quality_and_fingerprint(docs):
    rows = docs.select(
        "doc_id", quality_score(F.col("text")).alias("q"), fingerprint(F.col("text")).alias("fp")
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert 0.0 <= by_id[0].q <= 1.0
    assert by_id[0].fp == by_id[1].fp            # identical text, identical fp
    assert by_id[0].fp != by_id[5].fp


def test_exact_dedup(docs):
    got = {r.keeper_id: r.dup_count for r in exact_dedup(docs).collect()}
    assert got[0] == 2          # docs 0 and 1 collapse, min id kept
    assert 1 not in got
    assert got[2] == 1


def _jaccard(a: str, b: str, n=4):
    sa = {a.lower()[i : i + n] for i in range(max(len(a) - n + 1, 0))}
    sb = {b.lower()[i : i + n] for i in range(max(len(b) - n + 1, 0))}
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_ngram_jaccard_pairs(docs):
    got = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got
    assert got[(0, 2)] == pytest.approx(_jaccard(DOCS[0][1], DOCS[2][1]), abs=1e-6)
    assert all(a < b for a, b in got)
    assert (0, 5) not in got


def test_minhash_lsh_finds_dups(docs):
    got = {(r.id_a, r.id_b): r.jaccard for r in minhash_lsh_pairs(docs, jaccard_threshold=0.4).collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0
    # verification is exact: any reported jaccard matches the brute-force value
    for (a, b), j in got.items():
        assert j == pytest.approx(_jaccard(DOCS[a][1], DOCS[b][1]), abs=1e-6)


def test_simhash(docs):
    fps = {r.id: r.simhash for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[1]
    ham_near = bin(fps[0] ^ fps[2]).count("1")
    ham_far = bin(fps[0] ^ fps[5]).count("1")
    assert ham_near < ham_far
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0


def _np_cosine_topk(vecs: dict, qid, k):
    q = vecs[qid]
    scored = []
    for nid, v in vecs.items():
        if nid == qid:
            continue
        c = float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
        scored.append((round(c, 6), nid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [(nid, c) for c, nid in scored[:k]]


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(10, 8))
    vecs = {i: base[i] for i in range(10)}
    vecs[10] = base[0] + rng.normal(scale=1e-3, size=8)  # near-dup of 0
    rows = [(int(i), [float(x) for x in v]) for i, v in vecs.items()]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_cosine_topk_exact(emb):
    df, vecs = emb
    got = cosine_topk(df, df.filter("vec_id = 0"), k=3).collect()
    got_ids = [(r.neighbor_id, r.cosine) for r in sorted(got, key=lambda r: r.rank)]
    # float32 storage: compare against float32-rounded numpy oracle
    vecs32 = {i: np.asarray(v, dtype=np.float32).astype(np.float64) for i, v in vecs.items()}
    exp = _np_cosine_topk(vecs32, 0, 3)
    assert [i for i, _ in got_ids] == [i for i, _ in exp]
    for (_, gc), (_, ec) in zip(got_ids, exp):
        assert gc == pytest.approx(ec, abs=1e-5)


def test_cosine_topk_lsh_recalls_near_dup(emb):
    df, _ = emb
    got = cosine_topk_lsh(df, df.filter("vec_id = 0"), k=3, planes=4).collect()
    ids = [r.neighbor_id for r in got]
    assert 10 in ids  # the 1e-3-perturbed copy lands in the same bucket


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(DOCS[:6], "doc_id long, text string")
    media = documents_as_media(docs)
    feats = extract_media_features(media).collect()
    assert len(feats) == 6
    by_id = {r.media_id: r for r in feats}
    assert by_id[0].n_bytes == len(DOCS[0][1].encode())
    import hashlib

    assert by_id[0].content_sha256 == hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    frames = frame_sample(media).collect()
    assert len(frames) >= 6


def test_multimodal_real_decoder_tolerates_foreign_bytes(spark):
    """decoder='real' on non-WAV/BMP/Y4M payloads must not fail the scan:
    rows come back decode_ok=False with null media fields (P5 tolerance)."""
    docs = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    rows = extract_media_features(documents_as_media(docs), decoder="real").collect()
    assert len(rows) == 3
    assert all(not r.decode_ok and r.width is None and r.sample_rate is None for r in rows)
    assert all(r.n_bytes > 0 and r.content_sha256 for r in rows)


def test_streaming_matches_batch(spark, tmp_path):
    from wikipath_spark.streaming.events import run_stream_to_memory, windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "events_stream")
    events.write.parquet(src)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    run_stream_to_memory(spark, src, schema, table_name="wct")
    stream_rows = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("wct").collect()
    }
    batch_rows = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_counts(events).collect()
    }
    assert stream_rows == batch_rows


def test_fingerprint_arrow_matches_jvm_on_edge_cases(spark):
    """The Arrow fingerprint twin must agree with the portable JVM
    definition bit-for-bit, including null / empty / shorter-than-n /
    exactly-n / mixed-case / accented / multibyte inputs (the gate corpus
    agreement is separately pinned by the green text_stats oracle row)."""
    from pyspark.sql import functions as F

    from wikipath_spark.functions.text import fingerprint, fingerprint_arrow

    rows = [
        (1, None),
        (2, ""),
        (3, "abcd"),            # shorter than n=5
        (4, "abcde"),           # exactly one gram
        (5, "The QUICK brown Fox jumps over the lazy dog"),
        (6, "aaaaaaaaaaaa"),    # degenerate repetition
        (7, "naïve façade — déjà vu œuvre"),
        (8, "日本語のテキストとmixed ASCII 123"),
        (9, "tab\tand\nnewline  spacing"),
        (10, "ß STRASSE straße"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.a, r.b)
        for r in df.select(
            "doc_id",
            fingerprint(F.col("text")).alias("a"),
            fingerprint_arrow(F.col("text")).alias("b"),
        ).collect()
    }
    for doc_id, (a, b) in sorted(got.items()):
        assert a == b, f"doc {doc_id}: jvm={a!r} arrow={b!r}"
    assert got[1] == (None, None) and got[3] == (None, None)
    assert got[4][0] is not None
