"""Reference extraction from source-file content.

The Spark re-expression of the reference's regex tuple extractors
(parse.rs:59-128 patterns; drivers parse.rs:174-387).  The reference scans
gzip streams with a 1 MiB sliding window to catch matches across chunk
boundaries (parse.rs:434-498); columnar input obviates that — each file's
content is one cell, and extraction is an Arrow-batched pandas UDF
(Series→DataFrame), never per-row Python (BASELINE.json input_hint).

Two implementations with identical semantics:

- ``extract_refs_udf`` — vectorized pandas UDF (the mandated default),
- ``extract_refs_sql`` — pure-JVM ``regexp_extract_all`` composition, kept
  for benchmarking the Arrow-crossing cost against whole-stage codegen.

Per-language syntax (mirrors namespace-partitioned title resolution,
parse.rs:186-190):

==== ============================================  =======================================
lang reference                                      alias (re-export ≈ wiki redirect)
==== ============================================  =======================================
py   ``from a.b.c import *``                        same line suffixed ``#reexport``
rs   ``include!("a/b/c.rs");``                      ``pub use …; // reexport "a/b/c.rs"``
ts   ``import { x } from "./a/b/c";``               ``export * from "./a/b/c";``
==== ============================================  =======================================

Malformed / unknown-language rows yield empty refs and null alias — the scan
never fails on bad rows (P5, parse.rs:489-493).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# (refs pattern, alias pattern, needs dotted→path mapping, implied extension)
_LANG_RULES: dict[str, tuple[str, str, bool, str | None]] = {
    "py": (r"(?m)^from ([\w.]+) import \*", r"(?m)^from ([\w.]+) import \*  # reexport$", True, "py"),
    "rs": (r'(?m)include!\("([^"]+)"\);', r'(?m)^pub use [\w:]+; // reexport "([^"]+)"$', False, None),
    "ts": (r'(?m)^import .+ from "\./([^"]+)";', r'(?m)^export \* from "\./([^"]+)";$', False, "ts"),
}

_STRUCT_SCHEMA = "refs array<string>, alias string, truncated boolean"

# Per-row scan budget (chars): regex extraction runs over at most this prefix
# of `content` — the analogue of the reference's per-extractor byte caps
# (parse.rs:21,31,41,50), which bound worst-case scan cost per row.  Without
# it a single pathological multi-GB cell stalls its whole Arrow batch (and
# can OOM the Python worker holding the findall match list).
DEFAULT_SCAN_BUDGET = 4_000_000


def _dotted_to_path(s: pd.Series, ext: str) -> pd.Series:
    return s.str.replace(".", "/", regex=False) + f".{ext}"


def _extract_batch(
    content: pd.Series, lang: pd.Series, budget: int = DEFAULT_SCAN_BUDGET
) -> pd.DataFrame:
    refs = pd.Series([[] for _ in range(len(content))], index=content.index, dtype=object)
    alias = pd.Series([None] * len(content), index=content.index, dtype=object)
    truncated = content.str.len() > budget
    truncated = truncated.fillna(False).astype(bool)
    if truncated.any():
        content = content.where(~truncated, content.str.slice(0, budget))
    for lg, (ref_pat, alias_pat, dotted, ext) in _LANG_RULES.items():
        mask = lang == lg
        if not mask.any():
            continue
        sub = content[mask]
        # vectorized findall: explode matches, transform, regroup
        found = sub.str.findall(ref_pat)
        exploded = found.explode().dropna()
        if len(exploded):
            if dotted:
                exploded = _dotted_to_path(exploded, ext)
            elif ext:
                exploded = exploded + f".{ext}"
            regrouped = exploded.groupby(level=0).agg(list)
            found = found.map(lambda _: []).astype(object)
            found.update(regrouped)
        refs[mask] = found
        al = sub.str.extract(alias_pat, expand=False)
        if dotted:
            al = _dotted_to_path(al.dropna(), ext).reindex(al.index)
        elif ext:
            al = (al.dropna() + f".{ext}").reindex(al.index)
        alias[mask] = al
    return pd.DataFrame({"refs": refs, "alias": alias, "truncated": truncated})


def extract_refs_udf(content: Column, lang: Column, budget: int = DEFAULT_SCAN_BUDGET) -> Column:
    """Arrow-batched extraction →
    ``struct<refs: array<string>, alias: string, truncated: boolean>``."""

    def batch(content: pd.Series, lang: pd.Series) -> pd.DataFrame:
        return _extract_batch(content, lang, budget)

    udf = F.pandas_udf(batch, returnType=_STRUCT_SCHEMA)
    return udf(content, lang)


def extract_refs_sql(content: Column, lang: Column, budget: int = DEFAULT_SCAN_BUDGET) -> Column:
    """Same semantics, pure JVM (`regexp_extract_all`) — zero Python crossing.

    Used by benchmarks to quantify the Arrow exchange cost; results must be
    identical to :func:`extract_refs_udf` (tested).
    """
    truncated = F.length(content) > budget
    content = F.when(truncated, F.substring(content, 1, budget)).otherwise(content)
    branches_refs = None
    branches_alias = None
    for lg, (ref_pat, alias_pat, dotted, ext) in _LANG_RULES.items():
        # Java regex: keep (?m) inline flags, identical patterns
        refs = F.regexp_extract_all(content, F.lit(ref_pat), 1)
        if dotted:
            refs = F.transform(refs, lambda x: F.concat(F.replace(x, F.lit("."), F.lit("/")), F.lit(f".{ext}")))
        elif ext:
            refs = F.transform(refs, lambda x: F.concat(x, F.lit(f".{ext}")))
        al = F.regexp_extract(content, alias_pat, 1)
        al = F.when(al == "", F.lit(None)).otherwise(al)
        if dotted:
            al = F.concat(F.replace(al, F.lit("."), F.lit("/")), F.lit(f".{ext}"))
        elif ext:
            al = F.concat(al, F.lit(f".{ext}"))
        cond = lang == lg
        branches_refs = F.when(cond, refs) if branches_refs is None else branches_refs.when(cond, refs)
        branches_alias = F.when(cond, al) if branches_alias is None else branches_alias.when(cond, al)
    return F.struct(
        F.coalesce(branches_refs, F.array().cast("array<string>")).alias("refs"),
        branches_alias.alias("alias"),
        F.coalesce(truncated, F.lit(False)).alias("truncated"),
    )


def sha256_col(content: Column) -> Column:
    """Per-row content integrity column — the engine's analogue of the
    reference's SHA1 dump verification (dump.rs:342-367), per-row sha256
    equality being the BASELINE.json invariant."""
    return F.sha2(content, 256)
