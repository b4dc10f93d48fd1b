"""Per-domain snapshot time series (operators/snapshot_metrics.py):
hand-computed drift rows, the full Spark-vs-DuckDB value compare the
contract would run if the driver prefix had a free slot, and the
--domain-history job wiring."""

import duckdb

from harvesttext_spark.operators.snapshot_metrics import (
    domain_timeseries,
    domain_timeseries_sql,
)

ROWS = [
    # domain, snapshot, n_pages, n_keep
    ("steady.example", 0, 100, 90),
    ("steady.example", 1, 110, 99),
    ("collapse.example", 0, 200, 180),
    ("collapse.example", 1, 400, 120),  # 0.9 -> 0.3: collapsing
    ("newcomer.example", 1, 50, 25),
    ("zero.example", 0, 0, 0),  # greatest(n_pages, 1) guard
]


def test_hand_computed_drift(spark):
    dm = spark.createDataFrame(
        ROWS, "domain string, snapshot int, n_pages bigint, n_keep bigint"
    )
    got = {
        (r["domain"], r["snapshot"]): r.asDict()
        for r in domain_timeseries(dm).collect()
    }
    assert len(got) == len(ROWS)
    s1 = got[("steady.example", 1)]
    assert s1["keep_rate"] == 0.9 and s1["prev_rate"] == 0.9
    assert s1["rate_delta"] == 0.0 and s1["collapsing"] is False
    assert s1["page_growth"] == 1.1 and s1["is_new"] is False
    c1 = got[("collapse.example", 1)]
    assert c1["rate_delta"] == -0.6 and c1["collapsing"] is True
    assert c1["page_growth"] == 2.0
    n = got[("newcomer.example", 1)]
    assert n["is_new"] is True and n["prev_rate"] is None
    assert n["collapsing"] is False
    z = got[("zero.example", 0)]
    assert z["keep_rate"] == 0.0 and z["is_new"] is True


def test_domain_timeseries_sql_parity(spark):
    """The contract-grade value compare (rows + columns + normalized
    values) for the rows-only queries() entry — the driver prefix is
    full, so this pytest IS the value gate for domain_timeseries."""
    import math
    import os

    import __spark_entry__ as entrymod

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    sdf = entrymod.q_domain_timeseries(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    sql = domain_timeseries_sql(
        "SELECT source AS domain, doc_id % 3 AS snapshot, "
        "count(*) AS n_pages, "
        "CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_keep FROM documents GROUP BY 1, 2"
    )
    ddf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0

    def norm(df):
        out = []
        for row in df.to_dict("records"):
            vals = []
            for c in sorted(df.columns):
                v = row[c]
                if isinstance(v, float):
                    v = "nan" if math.isnan(v) else round(v, 6)
                    v = 0.0 if v == 0 else v
                vals.append(str(v))
            out.append("|".join(vals))
        return sorted(out)

    assert norm(sdf) == norm(ddf)


def test_domain_history_job_flag(spark, tmp_path):
    """--domain-history: run B stacks run A's domain_metrics with its
    own and writes OUTPUT/domain_timeseries with drift vs A.
    Subprocess because main() stops its context."""
    import os
    import subprocess
    import sys

    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8", "PYTHONPATH": os.getcwd()}
    ra = subprocess.run(
        [sys.executable, "jobs/run_quality_filter.py", "--synthesize", "200",
         "--output", out_a],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert ra.returncode == 0, ra.stderr[-2000:]
    rb = subprocess.run(
        [sys.executable, "jobs/run_quality_filter.py", "--synthesize", "300",
         "--output", out_b, "--domain-history", out_a],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert rb.returncode == 0, rb.stderr[-2000:]
    ts = spark.read.parquet(out_b + "/domain_timeseries")
    rows = ts.collect()
    assert rows
    assert {"domain", "snapshot", "keep_rate", "rate_delta", "collapsing"} <= set(
        ts.columns
    )
    # run A's domains appear at snapshot 0, run B's at snapshot 1 with drift
    assert {r["snapshot"] for r in rows} == {0, 1}
    assert any(r["snapshot"] == 1 and r["prev_rate"] is not None for r in rows)
