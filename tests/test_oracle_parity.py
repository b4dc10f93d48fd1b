"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() in DuckDB over the same parquet (sf0.001 for
speed locally; the driver uses sf0.01), compare row count, column names, and
order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
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


QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_oracle_parity(spark, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.oracle_sql()[name]).df()

    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    )
    assert len(sdf) == len(ddf), f"{name}: rows {len(sdf)} vs {len(ddf)}"

    srows = _normalize(sdf.to_dict("records"), list(sdf.columns))
    drows = _normalize(ddf.to_dict("records"), list(ddf.columns))
    mism = [(a, b) for a, b in zip(srows, drows) if a != b]
    assert not mism, f"{name}: first mismatches {mism[:5]}"


def test_rows_only_queries_run(spark):
    orc = set(entrymod.oracle_sql())
    for name, fn in entrymod.queries().items():
        if name in orc:
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_retired_minhash_signature_oracle_parity(spark):
    """minhash_signature was retired from the driver contract in round 7
    (its shingle->hashpair->signature chain is recomputed end-to-end
    inside the minhash_lsh_pairs oracle; 6 rounds of committed driver
    green history) — the per-doc signature value check stays here with
    the same compare the contract used, freeing the prefix slot for
    script_mix."""
    sdf = entrymod.q_minhash_signature(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_MINHASH_SIGNATURE).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_simhash_oracle_parity(spark):
    """simhash was retired from the driver contract in round 7 (its
    tok->bit->sign->fold signature chain is recomputed end-to-end inside
    the simhash_pairs32 oracle; 6 rounds of committed driver green
    history) — the per-doc signature value check stays here with the
    same compare the contract used, freeing the prefix slot for
    c4_line_filters."""
    sdf = entrymod.q_simhash(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_SIMHASH).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_quality_filter_labels_oracle_parity(spark):
    """quality_filter_labels was retired from the driver contract in
    round 7 (its battery chain + base keep/drop cascade SQL is recomputed
    verbatim inside the quality_filter_full_labels oracle —
    _sql_quality_filter_full_labels composes _sql_clean_chain plus the
    same when-chain; green r03-r06 driver history) — the full per-doc
    label value check stays here with the same compare the contract
    used, freeing the prefix slot for fineweb_signals."""
    sdf = entrymod.q_quality_filter_labels(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_QUALITY_FILTER_LABELS).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_repetition_signals_oracle_parity(spark):
    """repetition_signals was retired from the driver contract in round 7
    (its dup-line / top-bigram SQL shapes are recomputed inside the
    quality_filter_full_labels oracle's repetition when-chain; green
    r04-r06 driver history) — the full per-doc ratio value check stays
    here with the same compare the contract used, freeing the prefix
    slot for quality_classifier."""
    sdf = entrymod.q_repetition_signals(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_REPETITION_SIGNALS).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_repetition_ngrams_oracle_parity(spark):
    """repetition_ngrams was retired from the driver contract in round 7
    (its top-n-gram CTE shapes are recomputed inside the
    quality_filter_full_labels oracle's gopher when-chain; green r04-r06
    driver history) — the full per-doc value check stays here with the
    same compare the contract used, freeing the prefix slot for
    domain_reputation."""
    sdf = entrymod.q_repetition_ngrams(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_REPETITION_NGRAMS).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_events_window_oracle_parity(spark):
    """events_window was retired from the driver contract in round 7
    (its windowed-agg coverage is redundant with events_sessionize +
    events_rollup; 6 rounds of committed driver green history) — the
    OPERATOR and its SQL mirror stay fully verified here with the same
    rows/columns/values compare the contract used, freeing the allowlist
    slot doc_stats rotated into when dsir_topk claimed a prefix slot."""
    sdf = entrymod.q_events_window(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_EVENTS_WINDOW).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_grouping_sets_oracle_parity(spark):
    """events_grouping_sets was retired from the driver contract in
    round 6 (redundant with events_rollup's slot; 4 rounds of committed
    driver green history) — the OPERATOR and its SQL mirror stay fully
    verified here with the same rows/columns/values compare the
    contract used."""
    sdf = entrymod.q_events_grouping_sets(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_EVENTS_GROUPING_SETS).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_token_freq_oracle_parity(spark):
    """token_freq was retired from the driver contract in round 7 third
    session (its tokenize + global-count chain is recomputed verbatim as
    the domain_quality oracle's `uni` CTE; driver-green r01-r06) — the
    value check stays here with the contract's compare, freeing the
    allowlist slot top_customers rotated into (whose prefix slot went to
    edu_score)."""
    sdf = entrymod.q_token_freq(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_TOKEN_FREQ).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b


def test_retired_token_docfreq_oracle_parity(spark):
    """token_docfreq was retired from the driver contract in round 7
    third session (its per-word distinct-doc count is recomputed as the
    tfidf_topk oracle's `idf` CTE — tf groups by (doc_id, word), so
    count(*) over tf rows == count(DISTINCT doc_id); driver-green
    r01-r06) — the value check stays here, freeing the allowlist slot
    region_revenue rotated into (whose prefix slot went to semdedup)."""
    sdf = entrymod.q_token_docfreq(spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(entrymod.SQL_TOKEN_DOCFREQ).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    a = _normalize(sdf.to_dict("records"), sdf.columns)
    b = _normalize(ddf.to_dict("records"), ddf.columns)
    assert a == b
