"""Wrap-ritual gate: run the driver's correctness check over the FULL
current contract and fail loudly on any gap.

Round 3's process bug: three queries landed *after* the driver check ran,
so CORRECTNESS_r03.json covered 50/53 entries.  This tool makes the wrap
queries()-driven, like the generated STATUS counts:

    python tools/check_contract.py                      # sf0.01, like the driver
    python tools/check_contract.py --against CORRECTNESS_r03.json

* every ``queries()`` entry runs on Spark at --sf-dir;
* every ``oracle_sql()`` entry also runs in DuckDB and must match on
  rows + schema + order-insensitive value hash (the driver's compare);
* entries without an oracle get the driver's weaker rows-only check;
* with --against, exits nonzero if the recorded file's key set differs
  from the live contract (the stale-CORRECTNESS failure mode).

Writes a driver-shaped JSON report to --out (default
CORRECTNESS_local.json, gitignored-ish scratch) and exits 0 only if every
check is green AND coverage is complete.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# the driver records only the first N queries() entries (see the ordering
# note in __spark_entry__.queries)
DRIVER_CAP = 50


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            if hasattr(v, "isoformat"):
                v = v.isoformat()
            vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument(
        "--out",
        default=None,
        help="report path; defaults to CORRECTNESS_local.json for full runs "
        "and CORRECTNESS_partial.json when --only is given (a partial run "
        "must never overwrite the full-contract wrap artifact)",
    )
    p.add_argument(
        "--against",
        default=None,
        help="recorded CORRECTNESS_r{N}.json to diff key-coverage against",
    )
    p.add_argument("--only", default=None, help="comma-separated subset of queries")
    p.add_argument(
        "--determinism",
        action="store_true",
        help="run every query TWICE — before the second run all plan-keyed "
        "persist slots are evicted and the Spark SQL cache is cleared, so "
        "it is a true plan re-execution, not a read of the first run's "
        "cache — and require identical normalized values; catches "
        "nondeterminism the driver's rows-only check cannot",
    )
    args = p.parse_args(argv)
    if args.out is None:
        args.out = "CORRECTNESS_partial.json" if args.only else "CORRECTNESS_local.json"
    elif args.only and os.path.basename(args.out) == "CORRECTNESS_local.json":
        p.error("--only runs may not write CORRECTNESS_local.json (the "
                "full-contract wrap artifact); pick another --out")

    import __spark_entry__ as entrymod
    from harvesttext_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    spark = get_spark(app_name="check_contract")
    report: dict[str, dict] = {}
    red: list[str] = []
    t_all = time.time()
    for name in names:
        t0 = time.time()
        entry: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = queries[name](spark, args.sf_dir).toPandas()
            entry["spark_rows"] = len(sdf)
            if name in oracles:
                con = _duck(args.sf_dir)
                ddf = con.execute(oracles[name]).df()
                entry["oracle_rows"] = len(ddf)
                entry["rows_match"] = len(sdf) == len(ddf)
                entry["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
                entry["hash_match"] = entry["schema_match"] and _normalize(
                    sdf.to_dict("records"), list(sdf.columns)
                ) == _normalize(ddf.to_dict("records"), list(ddf.columns))
                ok = entry["rows_match"] and entry["schema_match"] and entry["hash_match"]
            else:
                entry["rows_match"] = entry["spark_rows"] >= 0  # rows-only check
                ok = entry["rows_match"]
            if ok and args.determinism:
                from harvesttext_spark.session import clear_persist_slots

                clear_persist_slots()
                spark.catalog.clearCache()
                sdf2 = queries[name](spark, args.sf_dir).toPandas()
                same = _normalize(
                    sdf.to_dict("records"), list(sdf.columns)
                ) == _normalize(sdf2.to_dict("records"), list(sdf2.columns))
                entry["deterministic"] = same
                ok = ok and same
        except Exception as exc:  # noqa: BLE001 — record and keep going
            entry["err"] = f"{type(exc).__name__}: {exc}"[:500]
            ok = False
        if not ok:
            red.append(name)
        kind = "oracle" if name in oracles else "rows-only"
        print(
            f"{'OK ' if ok else 'RED'} {name:34s} {kind:9s} "
            f"{time.time() - t0:6.2f}s  rows={entry['spark_rows']}",
            file=sys.stderr,
        )
        report[name] = entry
    spark.stop()

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)

    rc = 0
    if red:
        print(f"RED queries: {red}", file=sys.stderr)
        rc = 1
    if args.against:
        with open(args.against) as f:
            recorded = set(json.load(f))
        live = set(queries)
        # the driver records only the first DRIVER_CAP queries() entries,
        # so a driver artifact lawfully misses live tail entries IF the
        # recorded set is exactly the live prefix at the cap.  Across a
        # round boundary the prefix also rotates lawfully: retired
        # queries (RETIRED_QUERIES manifest — each keeps a dedicated
        # parity test) leave, promoted oracles enter, displaced oracles
        # move past the cap but stay live.  Drift = a recorded key that
        # is neither live nor documented-retired (query renamed/lost),
        # or a prefix delta outside those lawful moves.
        retired = set(getattr(entrymod, "RETIRED_QUERIES", {}))
        cap_prefix = set(list(queries)[:DRIVER_CAP])
        stale = recorded - live - retired
        rotated_out = recorded - cap_prefix  # may sit past-cap or be retired
        rotated_in = cap_prefix - recorded  # must be live oracles (promoted)
        lawful_rotation = all(
            k in live or k in retired for k in rotated_out
        ) and all(k in oracles for k in rotated_in)
        ok_cover = recorded == live or recorded == cap_prefix or lawful_rotation
        if stale or not ok_cover:
            print(
                f"contract drift vs {args.against}: "
                f"missing={sorted(live - recorded)} stale={sorted(stale)} "
                f"(driver cap prefix={'match' if recorded == cap_prefix else 'MISMATCH'})",
                file=sys.stderr,
            )
            rc = 1
        else:
            if recorded == live:
                kind = "full"
            elif recorded == cap_prefix:
                kind = f"driver-capped ({DRIVER_CAP})"
            else:
                kind = (
                    f"driver-capped ({DRIVER_CAP}) + lawful rotation: "
                    f"out={sorted(rotated_out & (retired | (live - cap_prefix)))} "
                    f"in={sorted(rotated_in)}"
                )
            print(
                f"coverage complete vs {args.against}: {len(recorded)} recorded "
                f"[{kind}] of {len(live)} live queries",
                file=sys.stderr,
            )
    n_orc = sum(1 for n in names if n in oracles)
    print(
        f"checked {len(names)} queries ({n_orc} value oracles) at {args.sf_dir} "
        f"in {time.time() - t_all:.1f}s — {'ALL GREEN' if rc == 0 or not red else 'FAILURES'}",
        file=sys.stderr,
    )
    return rc


if __name__ == "__main__":
    sys.exit(main())
