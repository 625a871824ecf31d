"""Deterministic synthetic source-code repository table.

Produces the engine's only input (BASELINE.json ``input_hint``): an
Iceberg-shaped table ``(repo, path, commit, lang, content)`` whose ``content``
embeds references to other paths.  Mirrors, in known proportions, every
structural case the reference's parser and redirect compressor handle
(FIXTURES.md §1; reference fixtures parse.rs:743-850):

- plain references (→ edges) with power-law hub targets (skew),
- alias files re-exporting exactly one path (→ redirects),
- alias chains 90→91→92→95, self-aliases (89), 3-cycles (96→97→98→96) and
  tails into cycles (99→96) per 100-file class group,
- self-references (dropped), duplicate references (deduped), and dangling
  references (dropped).

Everything is pure index arithmetic — no RNG — so any slice of the table is
reproducible independently of partitioning, and the generator scales to any
row count via ``spark.range(...).mapInPandas`` (never a driver-side list).

Files are grouped in residue classes mod 3 (one per language) so that every
reference resolves to a same-language file: class index ``q = k // 3``,
language ``r = k % 3`` → ("py", "rs", "ts").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ("py", "rs", "ts")
N_PKGS = 16

# q % 100 roles (q = within-repo class index)
_ALIAS_SELF = 89          # alias to itself            → removed (parse.rs:756-764)
_ALIAS_CHAIN = (90, 91, 92)  # 90→91→92→95 chain       → all flatten to 95 (parse.rs:743-753)
_ALIAS_CYCLE = (96, 97, 98)  # 3-cycle                 → removed (parse.rs:782-790)
_ALIAS_TAIL = 99          # tail into the 3-cycle      → removed (parse.rs:793-804)
_ALIAS_QS = {_ALIAS_SELF, *_ALIAS_CHAIN, *_ALIAS_CYCLE, _ALIAS_TAIL}


def _path_for(q: int, r: int) -> str:
    return f"src/pkg{q % N_PKGS}/mod{q * 3 + r}.{LANGS[r]}"


def _ref_line(lang: str, path: str) -> str:
    """Language-specific reference syntax for a target path."""
    if lang == "py":
        dotted = path[: path.rfind(".")].replace("/", ".")
        return f"from {dotted} import *"
    if lang == "rs":
        return f'include!("{path}");'
    return f'import {{ x }} from "./{path[: path.rfind(".")]}";'


def _alias_line(lang: str, path: str) -> str:
    """Language-specific re-export (alias) syntax — one per alias file."""
    if lang == "py":
        dotted = path[: path.rfind(".")].replace("/", ".")
        return f"from {dotted} import *  # reexport"
    if lang == "rs":
        return f'pub use path::to::mod; // reexport "{path}"'
    return f'export * from "./{path[: path.rfind(".")]}";'


def _alias_target_q(q: int) -> int | None:
    """Within-class alias target for alias-role classes, else None."""
    role = q % 100
    if role == _ALIAS_SELF:
        return q
    if role in (90, 91):
        return q + 1
    if role == 92:
        return q + 3  # → 95, a plain file (chain terminal)
    if role in (96, 97):
        return q + 1
    if role == 98:
        return q - 2  # close the 3-cycle back to 96
    if role == _ALIAS_TAIL:
        return q - 3  # tail into the cycle at 96
    return None


def _gen_rows(classes_per_repo: int, ks: np.ndarray) -> pd.DataFrame:
    rows: list[tuple[str, str, str, str, str]] = []
    m = classes_per_repo
    for k in ks:
        k = int(k)
        repo_i, local = divmod(k, m * 3)
        q, r = divmod(local, 3)
        lang = LANGS[r]
        repo = f"repo{repo_i:02d}"
        commit = f"{(repo_i * 2654435761) % (1 << 32):08x}"
        path = _path_for(q, r)
        tq = _alias_target_q(q)
        if tq is not None:
            # alias file: one re-export line (+ noise comment)
            target = _path_for(tq % m, r)
            content = f"// alias file\n{_alias_line(lang, target)}\n"
        else:
            lines = [f"// module {path} of {repo}"]
            # hub reference: every plain file references class-0 of its language
            lines.append(_ref_line(lang, _path_for(0, r)))
            # regular references, deterministic pseudo-spread
            d = 3 + (q % 5)
            for j in range(d):
                tq2 = (q * 7 + j * 13 + 1) % m
                lines.append(_ref_line(lang, _path_for(tq2, r)))
                if j == 0 and q % 4 == 0:  # duplicate reference (deduped, A2)
                    lines.append(_ref_line(lang, _path_for(tq2, r)))
            if q % 6 == 0:  # self reference (dropped, P3 / parse.rs:363-365)
                lines.append(_ref_line(lang, path))
            if q % 10 == 0:  # dangling reference (dropped, P4 / parse.rs:354-358)
                lines.append(_ref_line(lang, f"src/void/none.{lang}"))
            lines.append(f"// end {q}")
            content = "\n".join(lines) + "\n"
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def synthetic_repos(
    spark: SparkSession,
    classes_per_repo: int = 400,
    repos: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Build the synthetic ``(repo, path, commit, lang, content)`` table.

    Total rows = ``classes_per_repo * 3 * repos``.  Distributed generation:
    ``spark.range`` over the global file index, expanded per-batch in pandas.
    """
    if classes_per_repo % 100 != 0:
        raise ValueError("classes_per_repo must be a multiple of 100 (alias-role groups)")
    n = classes_per_repo * 3 * repos
    # default partitioning tracks the cluster: generation + downstream regex
    # extraction are the CPU-heavy stages of a build, and the old n//50_000
    # sizing left a 72k-row bench build on 4 tasks of a 32-core machine
    # (guide §2.6 idle capacity; measured in OPTIMIZATION_r06.md).  Rows are
    # pure index arithmetic, so the split count never changes content.
    parts = partitions or max(
        4, min(n // 2_000 + 1, spark.sparkContext.defaultParallelism), n // 50_000
    )
    schema = "repo string, path string, commit string, lang string, content string"
    m = classes_per_repo

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_rows(m, b["id"].to_numpy())

    return spark.range(0, n, numPartitions=parts).mapInPandas(gen, schema=schema)


def synthetic_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    hub_fraction_mod: int = 10,
    n_hubs: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic ``(src, dst)`` edge table at any scale.

    Pure ``spark.range`` + column arithmetic (no Python, no RNG): edge i has
    src = i mod V and a Knuth-hash spread dst; every ``hub_fraction_mod``-th
    edge instead targets one of ``n_hubs`` hub vertices — the power-law skew
    fixture at benchmark scale.  Self-loops are shifted away, duplicates are
    possible (as in real link data) and left in; PageRank treats multi-edges
    as weighted links, matching the dedup-before-use contract of the build
    pipeline (callers wanting simple graphs apply ``dropDuplicates``).
    """
    from pyspark.sql import functions as FF

    parts = partitions or max(8, n_edges // 2_000_000)
    df = spark.range(0, n_edges, numPartitions=parts)
    src = (FF.col("id") % n_vertices).alias("src")
    spread = ((FF.col("id") * 2654435761) + (FF.col("id") / n_vertices).cast("long")) % n_vertices
    hub = (FF.col("id") % n_hubs) * 7 % n_vertices
    dst = FF.when(FF.col("id") % hub_fraction_mod == 0, hub).otherwise(spread)
    out = df.select(src, dst.alias("dst"))
    return out.select(
        "src",
        FF.when(FF.col("dst") == FF.col("src"), (FF.col("dst") + 1) % n_vertices)
        .otherwise(FF.col("dst"))
        .alias("dst"),
    )


def expected_alias_resolution(classes_per_repo: int) -> dict[int, int | None]:
    """Oracle for the compressed alias map at class level (per repo, per lang):

    Returns {q: terminal_q} for alias classes that survive compression,
    and {q: None} for classes removed (self, cycle members, tails into cycles).
    Mirrors parse.rs:541-608 semantics.
    """
    out: dict[int, int | None] = {}
    m = classes_per_repo
    for q in range(m):
        role = q % 100
        if role not in _ALIAS_QS:
            continue
        if role in (90, 91, 92):
            out[q] = (q - role + 95) % m
        else:  # self-alias, cycle members, tail into cycle
            out[q] = None
    return out
