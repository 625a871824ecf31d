#!/usr/bin/env python
"""Full oracle gate at an arbitrary scale factor.

Runs EVERY ``__spark_entry__.queries()`` entry that has an ``oracle_sql()``
twin side-by-side on Spark and DuckDB over ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) and reports per-query row/schema/value-hash matches —
the same comparison the driver's correctness gate applies at sf0.01, scaled
up (VERDICT r3 item 5: the spot subset was 17 queries; this runs all of
them).  Prints one JSON line and exits non-zero on any mismatch.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/oracle_gate.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from wikipath_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.9g}"
    if val is None:
        return "␀"
    return str(val)


def fixpoint_holds(con, oracle_rows, sql_one_more_round) -> bool:
    """True iff re-running an unrolled-fixpoint oracle with ONE extra round
    reproduces ``oracle_rows`` exactly (order-insensitive).  False means the
    unroll margin no longer covers this scale factor — the oracle itself is
    under-converged and any Spark comparison against it is meaningless."""
    again = con.execute(sql_one_more_round).fetchall()
    return sorted(map(tuple, again)) == sorted(map(tuple, oracle_rows))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="oracle-gate", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fixpoints = entrymod.oracle_fixpoints()

    only = os.environ.get("WPS_GATE_ONLY")
    names = sorted(only.split(",")) if only else sorted(queries)
    results: dict[str, dict] = {}
    fails = []
    for name in names:
        if name not in oracles:
            results[name] = {"status": "rows_only_no_oracle"}
            continue
        t0 = time.time()
        con = None
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(_canon(rec[c]) for c in scols)
                for rec in (r.asDict() for r in sdf.collect())
            )
            con = duckdb.connect()
            for t in TABLES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
            # watchdog: some twins that are tractable at the driver's sf0.01
            # gate blow up at sf0.1 (e.g. an unrolled fixpoint whose frontier
            # state grows with the edge set); interrupt instead of hanging
            # the whole gate and record the timeout honestly
            import threading

            limit = float(os.environ.get("WPS_ORACLE_TIMEOUT", "900"))

            def guarded_watchdog(target_con):
                """(done_event, finish()) pair: the watchdog re-checks the
                completion flag UNDER a lock before interrupting, and the
                runner sets it under the same lock — so an interrupt can no
                longer fire after fetchall has already returned and poison a
                later query on the connection (ADVICE r5 item 4)."""
                done = threading.Event()
                lock = threading.Lock()

                def watchdog():
                    if not done.wait(limit):
                        with lock:
                            if not done.is_set():
                                target_con.interrupt()

                threading.Thread(target=watchdog, daemon=True).start()

                def finish():
                    with lock:
                        done.set()

                return finish

            finish = guarded_watchdog(con)
            try:
                ddf = con.execute(oracles[name])
                dcols_raw = ddf.description and [d[0] for d in ddf.description]
                rows_raw = ddf.fetchall()
            finally:
                finish()
            # unrolled-fixpoint oracles must prove their margin at THIS
            # scale factor: one extra round has to be a no-op, else the
            # oracle (not the engine) is wrong and the comparison below
            # would report a false mismatch.  The re-run gets its OWN
            # watchdog window: the main comparison is already fetched above,
            # so a slow fixpoint re-run can time out on its own ("timeout" =
            # margin unverified, comparison still recorded) without silently
            # displacing a previously-green check.
            fixpoint = None
            if name in fixpoints:
                # the re-run gets its OWN connection (plus its own guarded
                # watchdog): even the residual interrupt race on the main
                # connection cannot cancel the fixpoint query or any later
                # use of it (ADVICE r5 item 4)
                con2 = duckdb.connect()
                for t in TABLES:
                    con2.sql(
                        f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                    )
                finish2 = guarded_watchdog(con2)
                try:
                    fixpoint = (
                        "holds"
                        if fixpoint_holds(con2, rows_raw, fixpoints[name])
                        else "under_converged"
                    )
                except Exception as fe:  # noqa: BLE001
                    if "INTERRUPT" not in str(fe).upper():
                        raise
                    fixpoint = "timeout"
                finally:
                    finish2()
                    con2.close()
                if fixpoint == "under_converged":
                    results[name] = {
                        "status": "ORACLE_UNDER_CONVERGED",
                        "sec": round(time.time() - t0, 1),
                    }
                    fails.append(name)
                    print(f"  {name}: ORACLE_UNDER_CONVERGED — raise the "
                          "oracle's unroll rounds for this SF", file=sys.stderr)
                    continue
            dcols = sorted(dcols_raw)
            drows = sorted(
                tuple(_canon(dict(zip(dcols_raw, row))[c]) for c in dcols)
                for row in rows_raw
            )
            ok = scols == dcols and len(srows) == len(drows) and srows == drows
            results[name] = {
                "status": "match" if ok else "MISMATCH",
                "rows": len(srows),
                "schema_match": scols == dcols,
                "rows_match": len(srows) == len(drows),
                "values_match": srows == drows,
                "sec": round(time.time() - t0, 1),
            }
            if fixpoint is not None:
                results[name]["fixpoint"] = fixpoint
            if not ok:
                fails.append(name)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                # oracle intractable at this SF — not an engine failure; the
                # summary separates these from real mismatches
                results[name] = {
                    "status": "oracle_timeout",
                    "sec": round(time.time() - t0, 1),
                }
            else:
                results[name] = {"status": "ERROR", "err": msg[:300]}
                fails.append(name)
        finally:
            if con is not None:
                con.close()  # a failed oracle must not leak the connection
        print(f"  {name}: {results[name]['status']} "
              f"({results[name].get('rows', '?')} rows, "
              f"{results[name].get('sec', '?')}s)", file=sys.stderr)

    summary = {
        "sf_dir": sf_dir,
        "compared": sum(1 for r in results.values() if "rows" in r),
        "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only_no_oracle"),
        "oracle_timeout": sorted(
            n for n, r in results.items() if r["status"] == "oracle_timeout"
        ),
        "failed": fails,
        "results": results,
    }
    print(json.dumps(summary))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
