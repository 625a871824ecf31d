"""User-facing query API — the engine's analogue of the reference's HTTP
serve surface (serve.rs:194-209).

Endpoint parity:

- ``GET /api/list_databases``          → :meth:`LinkGraphService.list_datasets`
  (serve.rs:196-199; pre-computed sorted listing, serve.rs:68, 80-100)
- ``GET /api/shortest_paths?language-code=&date-code=&source=&target=``
  → :meth:`LinkGraphService.shortest_paths` (serve.rs:200-209), returning the
  reference's ``Paths`` JSON shape (search.rs:6-18) with ``repo``/``commit``
  in place of ``language_code``/``date_code``, plus client-side path
  enumeration (web/src/api.ts:64-84, capped at 8).

Queries address vertices by **path** (the reference's page title); the
title→id resolution is the same (repo, path) lookup the build uses (J1).
The reference's 10s request timeout (serve.rs:203-206) maps to the
``max_supersteps`` cap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F

from wikipath_spark.functions.text import ci_equal
from wikipath_spark.operators.bfs import enumerate_paths, shortest_paths
from wikipath_spark.plans.catalog import DatasetCatalog


@dataclass
class LinkGraphService:
    catalog: DatasetCatalog

    def list_datasets(self) -> list[dict]:
        return [
            {"repo": r.repo, "commit": r.commit, "name": r.name}
            for r in self.catalog.list_datasets().collect()
        ]

    def _page_id(self, tables, path: str) -> int | None:
        """Path → page id, case/accent-insensitively (the reference frontend
        compares titles after lowercasing + accent folding, web/src/misc.ts:
        13-15).  An exact-case match wins over a folded match; folded ties
        break on minimum page_id — deterministic either way."""
        rows = (
            tables.pages.filter(ci_equal(F.col("path"), F.lit(path)))
            .select("page_id", "path")
            .collect()
        )
        if not rows:
            return None
        exact = [r.page_id for r in rows if r.path == path]
        return exact[0] if exact else min(r.page_id for r in rows)

    def shortest_paths(
        self,
        repo: str,
        commit: str,
        source_path: str,
        target_path: str,
        max_paths: int = 8,
        max_supersteps: int = 50,
    ) -> dict:
        """Full query: dataset lookup (J9) → title→id (J1) → bidirectional
        BFS → Paths dict + ≤``max_paths`` enumerated paths (as path strings).
        Unknown source/target paths yield the empty result (count 0), like
        the reference's dangling-title skip."""
        tables = self.catalog.get(repo, commit)
        src_id = self._page_id(tables, source_path)
        dst_id = self._page_id(tables, target_path)
        if src_id is None or dst_id is None:
            return {
                "source": source_path,
                "source_is_redirect": False,
                "target": target_path,
                "target_is_redirect": False,
                "links": {},
                "repo": repo,
                "commit": commit,
                "length": 0,
                "count": 0,
                "paths": [],
            }
        res = shortest_paths(
            tables.edges,
            src_id,
            dst_id,
            redirects=tables.redirects,
            max_supersteps=max_supersteps,
        )
        id_paths = enumerate_paths(res, max_paths=max_paths)
        # resolve ids back to titles for the response (≈ the frontend's
        # title fetch, web/src/api.ts:93-129 — here a single broadcast join)
        ids = sorted({v for p in id_paths for v in p} | {res.source, res.target})
        id_to_path = {
            r.page_id: r.path
            for r in tables.pages.filter(F.col("page_id").isin(ids))
            .select("page_id", "path")
            .collect()
        }
        out = res.to_dict()
        out.update(
            {
                "repo": repo,
                "commit": commit,
                "source": id_to_path.get(res.source, res.source),
                "target": id_to_path.get(res.target, res.target),
                "paths": [[id_to_path.get(v, v) for v in p] for p in id_paths],
            }
        )
        return out
