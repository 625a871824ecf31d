"""Extraction-layer tests: the pandas-UDF and pure-JVM extractors must agree
with each other and with hand-written expectations (≈ the row-regex fixture
family, parse.rs:614-740), and malformed rows must never fail the scan
(P5, parse.rs:489-493)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikipath_spark.functions.extract import extract_refs_sql, extract_refs_udf, sha256_col
from wikipath_spark.plans.build import build_graph
from wikipath_spark.sources.synthetic import synthetic_repos

CASES = [
    # (lang, content, expected refs, expected alias)
    ("py", "from src.a.b import *\nx = 1\n", ["src/a/b.py"], None),
    ("py", "from src.a.b import *  # reexport\n", ["src/a/b.py"], "src/a/b.py"),
    ("rs", 'include!("src/a/b.rs");\n', ["src/a/b.rs"], None),
    ("rs", 'pub use a::b; // reexport "src/a/b.rs"\n', [], "src/a/b.rs"),
    ("ts", 'import { x } from "./src/a/b";\n', ["src/a/b.ts"], None),
    # ts/rs alias lines match only the alias pattern (py's alias syntax is a
    # superset of its import syntax, so py alias lines are also refs — the
    # resulting self-edge resolves away, parse.rs:363-365)
    ("ts", 'export * from "./src/a/b";\n', [], "src/a/b.ts"),
    # multiple refs, preserved order
    ("py", "from a.b import *\nfrom c.d import *\n", ["a/b.py", "c/d.py"], None),
    # malformed / no matches → empty, never error
    ("py", "def f():\n    return 1\n", [], None),
    ("rs", "fn main() {}\n", [], None),
    ("zig", "const x = @import('y');\n", [], None),  # unknown language
    ("py", "", [], None),
]


def _run(spark, extractor):
    df = spark.createDataFrame(
        [(lang, content) for lang, content, _, _ in CASES], "lang string, content string"
    )
    rows = df.select(extractor(F.col("content"), F.col("lang")).alias("x")).collect()
    return [(list(r.x.refs or []), r.x.alias) for r in rows]


def test_pandas_extractor(spark):
    got = _run(spark, extract_refs_udf)
    for (lang, content, refs, alias), (g_refs, g_alias) in zip(CASES, got):
        assert g_refs == refs, (lang, content)
        assert g_alias == alias, (lang, content)


def test_sql_extractor_agrees(spark):
    assert _run(spark, extract_refs_sql) == _run(spark, extract_refs_udf)


def test_sha256_invariant(spark):
    """Per-row sha256 equality (BASELINE.json input_hint) vs Python hashlib."""
    import hashlib

    texts = ["hello\n", "", "μυστήριο"]
    df = spark.createDataFrame([(t,) for t in texts], "content string")
    got = [r.h for r in df.select(sha256_col(F.col("content")).alias("h")).collect()]
    exp = [hashlib.sha256(t.encode()).hexdigest() for t in texts]
    assert got == exp


def test_build_graph_extractors_identical(spark):
    """The mandated Arrow path and the JVM path must produce identical graphs."""
    repos = synthetic_repos(spark, classes_per_repo=100, repos=1)
    g_pandas = build_graph(spark, repos, extractor="pandas")
    g_sql = build_graph(spark, repos, extractor="sql")
    e1 = {(r.src, r.dst) for r in g_pandas.edges.collect()}
    e2 = {(r.src, r.dst) for r in g_sql.edges.collect()}
    assert e1 == e2 and len(e1) > 0
    r1 = {(r.src, r.dst) for r in g_pandas.redirects.collect()}
    r2 = {(r.src, r.dst) for r in g_sql.redirects.collect()}
    assert r1 == r2
