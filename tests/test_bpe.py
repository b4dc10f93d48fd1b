"""BPE learner + tokenizer (operators/bpe.py): the Sennrich worked
example, heap-vs-naive trainer equivalence, row-for-row tokenizer pin,
partitioning determinism, and the word-count cap ordering."""

from harvesttext_spark.operators.bpe import (
    END,
    bpe_tokenize,
    encode_word,
    learn_bpe_merges,
    train_bpe,
    word_counts,
)

SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _naive_bpe(word_cnt, n_merges):
    """Independent reference: full pair-table rescan every merge, max
    count with lexicographically-smallest tie-break."""
    vocab = {tuple(list(w) + [END]): c for w, c in word_cnt}
    merges = []
    for _ in range(n_merges):
        stats = {}
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                stats[p] = stats.get(p, 0) + c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_sennrich_worked_example():
    merges = learn_bpe_merges(SENNRICH, n_merges=10)
    assert merges == _naive_bpe(SENNRICH, 10)
    # the famous first merges: ('e','s') at 9, then ('es','t') at 9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_heap_trainer_matches_naive_on_adversarial_counts():
    """Counts that rise back to previously-seen values exercise the
    lazy-heap staleness check both ways."""
    vocab = [
        ("abab", 4),
        ("abba", 3),
        ("baba", 3),
        ("aabb", 2),
        ("bbbb", 2),
        ("aaaa", 1),
    ]
    assert learn_bpe_merges(vocab, 20) == _naive_bpe(vocab, 20)


def test_encode_word_applies_ranks_in_order():
    merges = learn_bpe_merges(SENNRICH, n_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    # 'lowest' was never a training word: 'low' + 'est</w>' compose
    syms = encode_word("lowest", ranks)
    assert "".join(syms) == "lowest" + END
    assert "low" in syms and ("est" + END in syms or "est" in syms)
    # untrainable word falls back to chars
    assert encode_word("xyz", {}) == ["x", "y", "z", END]


def test_tokenize_matches_python_rowwise(spark):
    docs = spark.createDataFrame(
        [
            (1, "low lower newest"),
            (2, "the widest low"),
            (3, ""),
            (4, None),
            (5, "LOW Lower"),  # lowercase path
        ],
        "doc_id bigint, text string",
    )
    train = spark.createDataFrame(
        [(0, " ".join(w for w, c in SENNRICH for _ in range(c)))],
        "doc_id bigint, text string",
    )
    model = train_bpe(train, n_merges=10)
    assert model["merges"] == _naive_bpe(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(model["merges"])}
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in bpe_tokenize(docs, model).collect()
    }
    for did, text in [(1, "low lower newest"), (2, "the widest low"), (5, "LOW Lower")]:
        expect = []
        for w in text.lower().split():
            expect.extend(encode_word(w, ranks))
        assert got[did] == (expect, len(expect)), did
    assert got[3] == ([], 0) and got[4] == ([], 0)


def test_train_deterministic_across_partitionings(spark):
    rows = [(i, f"alpha beta gamma delta word{i % 7} tail") for i in range(64)]
    one = spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1)
    many = spark.createDataFrame(rows, "doc_id bigint, text string").repartition(13)
    assert train_bpe(one, n_merges=30) == train_bpe(many, n_merges=30)


def test_word_count_cap_keeps_most_frequent(spark):
    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc dd")], "doc_id bigint, text string"
    )
    got = [
        (r["word"], r["cnt"])
        for r in word_counts(docs, max_word_types=2).collect()
    ]
    assert got == [("aa", 3), ("bb", 2)]


def test_bpe_vocab_out_job_artifact(spark, tmp_path):
    """--bpe-vocab-out end to end: the job trains on the kept output and
    writes one 'a b' merge pair per line.  Subprocess because main()
    stops its context."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "out")
    vocab = str(tmp_path / "merges.txt")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8", "PYTHONPATH": os.getcwd()}
    r = subprocess.run(
        [sys.executable, "jobs/run_quality_filter.py", "--synthesize", "200",
         "--output", out, "--bpe-vocab-out", vocab, "--bpe-merges", "50"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = open(vocab, encoding="utf-8").read().splitlines()
    assert 0 < len(lines) <= 50
    assert all(len(ln.split(" ")) == 2 for ln in lines)
