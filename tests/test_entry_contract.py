"""Entry-contract invariants.

The driver records only the FIRST 50 entries of ``queries()`` in
CORRECTNESS_r{N}.json (round-4 verdict, "What's wrong" #1): every
oracle-bearing query must therefore sit inside that prefix, or its value
oracle never receives a driver-verified row.  These tests pin the
ordering so a new query cannot silently push an oracle past the cap, and
re-verify the scrub_text chain-mirror equivalence the oracle relies on.
"""

import os

import pytest

DRIVER_CAP = 50
SF_DIR = "/root/testdata/sf0.001"


# oracles allowed past the cap: must ALREADY have driver-verified rows in
# committed CORRECTNESS_r{N}.json files (the cap holds 50 and the contract
# has more oracles than that; never park a never-driver-checked oracle here)
# the events relational family rotates here as new pipeline oracles claim
# prefix slots — every member is value-green in r01-r04 driver files;
# fingerprint (frozen since r01, value-green in r01-r05 driver files)
# rotated out in round 6 when ann_ivf_topk was promoted to a value oracle
# events_grouping_sets was RETIRED outright in round 6 (redundant with
# events_rollup, per the round-5 verdict's suggestion) — its operator and
# SQL mirror remain verified by test_retired_grouping_sets_oracle_parity
# events_window was RETIRED in round 7 (redundant with
# events_sessionize+events_rollup; green r01-r06) — verified by
# test_retired_events_window_oracle_parity; its slot went to doc_stats
# token_freq / token_docfreq RETIRED outright in round 7 third session
# (chains recomputed inside domain_quality / tfidf_topk oracles; value
# checks live on in test_retired_token_*_oracle_parity) — their slots
# went to top_customers + region_revenue, whose prefix slots went to the
# edu_score + semdedup promotions
PAST_CAP_ALLOWED = {
    "events_rollup",
    "events_asof",
    "doc_stats",  # rotated round 7 for dsir_topk (green r01-r06)
    "fingerprint",
    "top_customers",  # rotated round 7 for edu_score (green r01-r06)
    "region_revenue",  # rotated round 7 for semdedup (green r01-r06)
    "exact_dup_groups",  # rotated round 6 for curation_split (green r01-r05)
}


def test_every_oracle_inside_driver_cap():
    import __spark_entry__ as e

    order = list(e.queries())
    oracles = set(e.oracle_sql())
    past_cap = [k for i, k in enumerate(order) if i >= DRIVER_CAP and k in oracles]
    assert set(past_cap) <= PAST_CAP_ALLOWED, (
        f"oracle-bearing queries past the driver's {DRIVER_CAP}-entry "
        f"CORRECTNESS cap: {past_cap} — reorder queries() so rows-only "
        "entries absorb the overflow (only historically-driver-verified "
        f"oracles may sit here: {sorted(PAST_CAP_ALLOWED)})"
    )
    # and the prefix must be pure oracle coverage — no rows-only entry may
    # burn one of the 50 driver-checked slots while an oracle sits outside
    non_oracle_prefix = [k for i, k in enumerate(order) if i < DRIVER_CAP and k not in oracles]
    assert not (non_oracle_prefix and past_cap), (
        f"rows-only {non_oracle_prefix} inside the cap while oracles "
        f"{past_cap} sit past it"
    )


def test_past_cap_allowlist_is_driver_verified():
    """Every allowlisted past-cap oracle must have a green value row in a
    committed driver CORRECTNESS file — the allowlist must never become a
    parking lot for unverified oracles."""
    import glob
    import json

    for name in PAST_CAP_ALLOWED:
        seen_green = False
        for path in sorted(glob.glob("CORRECTNESS_r*.json")):
            entry = json.load(open(path)).get(name)
            if entry and entry.get("hash_match") is True:
                seen_green = True
                break
        assert seen_green, f"{name} has no driver-verified green row on disk"


def test_retired_manifest_consistent():
    """Every RETIRED_QUERIES entry must (a) be absent from the live
    contract and (b) keep its query function + SQL mirror importable —
    the retirement parity tests depend on both, and the drift check in
    tools/check_contract.py trusts this manifest to distinguish
    documented retirements from accidental renames."""
    import __spark_entry__ as e

    artifacts = {
        "events_grouping_sets": ("q_events_grouping_sets", "SQL_EVENTS_GROUPING_SETS"),
        "minhash_signature": ("q_minhash_signature", "SQL_MINHASH_SIGNATURE"),
        "events_window": ("q_events_window", "SQL_EVENTS_WINDOW"),
        "simhash": ("q_simhash", "SQL_SIMHASH"),
        "quality_filter_labels": (
            "q_quality_filter_labels",
            "SQL_QUALITY_FILTER_LABELS",
        ),
        "repetition_signals": (
            "q_repetition_signals",
            "SQL_REPETITION_SIGNALS",
        ),
        "repetition_ngrams": (
            "q_repetition_ngrams",
            "SQL_REPETITION_NGRAMS",
        ),
        "token_freq": ("q_token_freq", "SQL_TOKEN_FREQ"),
        "token_docfreq": ("q_token_docfreq", "SQL_TOKEN_DOCFREQ"),
    }
    assert set(e.RETIRED_QUERIES) == set(artifacts)
    live = set(e.queries()) | set(e.oracle_sql())
    for name, (qfn, sql) in artifacts.items():
        assert name not in live, f"{name} is retired but still in the contract"
        assert callable(getattr(e, qfn))
        assert isinstance(getattr(e, sql), str)


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    extra = set(e.oracle_sql()) - set(e.queries())
    assert not extra, f"oracle_sql() keys with no queries() entry: {extra}"


def _chain_scrub(text, chain):
    if text is None:
        return None
    for mention, placeholder in chain:
        text = text.replace(mention, placeholder)
    return text


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="testdata absent")
def test_scrub_text_equals_chain_mirror(spark):
    """The scrub_text value oracle compares the real AC leftmost-longest
    scan against a fixed-order chain of literal replaces (DuckDB has no
    AC automaton).  Equivalence is KB-specific — _SCRUB_CHAIN's comment
    states the argument — so re-verify it row-for-row on the real table
    + probes whenever the KB, chain, or scan implementation changes."""
    import __spark_entry__ as e

    out = {
        r["doc_id"]: r["text_scrubbed"]
        for r in e.q_scrub_text(spark, SF_DIR).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in e._docs(spark, SF_DIR).select("doc_id", "text").collect()
    }
    docs.update({i: t for i, t in e.SCRUB_PROBES})
    assert set(out) == set(docs)
    for doc_id, text in docs.items():
        assert out[doc_id] == _chain_scrub(text, e._SCRUB_CHAIN), doc_id


def test_scrub_chain_divergence_class_documented():
    """The chain mirror and the AC scan DO diverge on pathological
    overlaps absent from this KB's corpus (leftmost-longest links
    'customer' in 'customerge join'; a length-ordered chain would hit
    'merge join' first).  Pin the counter-example so the equivalence
    argument in _SCRUB_CHAIN's comment stays honest."""
    from harvesttext_spark.operators.linking import EntityKB, decoref

    import __spark_entry__ as e

    kb = EntityKB.from_triples(e._DEMO_KB_TRIPLES)
    adversarial = "customerge join"
    ac = decoref(adversarial, kb.link(adversarial))
    assert ac == "#table#ge join"  # leftmost-longest
    by_len = sorted(e._SCRUB_CHAIN, key=lambda mp: -len(mp[0]))
    assert _chain_scrub(adversarial, by_len) == "custo#operator#"  # differs
    # the committed chain order happens to agree here (customer precedes
    # merge join is false — sort merge/merge join lead) — what protects
    # the oracle is the corpus check above, not chain order alone
