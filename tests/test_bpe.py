"""`text/bpe.py`: distributed BPE training — exact merge-sequence parity
with a pure-Python reference, greedy-overlap semantics, encoding
round-trip, OOV fallback, and the min-count stop condition."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.text.bpe import (
    tokenize_documents,
    train_bpe,
    word_frequency_table,
)


def _reference_bpe(texts, n_merges, min_pair_count=2):
    """Straight Sennrich: dict of word->symbols, greedy left-to-right."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {w: [c for c in w] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        (a, b), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((a, b))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_merges_match_reference_on_fixture_corpus(spark):
    from dataworks_audit_data_ingest_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    texts = [r.text for r in docs.select("text").collect()]
    got_merges, got_vocab = train_bpe(docs, n_merges=12)
    want_merges, want_vocab = _reference_bpe(texts, 12)
    assert got_merges == want_merges
    sample = {r.w: list(r.syms) for r in got_vocab.limit(2000).collect()}
    for w, syms in sample.items():
        assert syms == want_vocab[w], w


def test_greedy_overlap_semantics(spark):
    """'aaaa' under merge (a,a): left-to-right gives [aa, aa]; 'aaa'
    gives [aa, a] — the merged token never re-merges within a round."""
    docs = _docs(spark, ["aaaa aaa aaaa"])
    merges, vocab = train_bpe(docs, n_merges=1)
    assert merges == [("a", "a")]
    got = {r.w: list(r.syms) for r in vocab.collect()}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]


def test_tokenize_round_trip_and_order(spark):
    docs = _docs(spark, ["banana band", "ban banana"])
    _, vocab = train_bpe(docs, n_merges=5)
    out = {r.doc_id: list(r.tokens) for r in
           tokenize_documents(docs, vocab).collect()}
    # concatenating tokens reproduces the original words, in order
    assert "".join(out[0]) == "bananaband"
    assert "".join(out[1]) == "banbanana"


def test_oov_falls_back_to_characters(spark):
    train = _docs(spark, ["banana banana band"])
    _, vocab = train_bpe(train, n_merges=4)
    unseen = _docs(spark, ["zzq banana"])
    out = {r.doc_id: list(r.tokens) for r in
           tokenize_documents(unseen, vocab).collect()}
    toks = out[0]
    # 'zzq' was never trained: appears as single characters
    assert toks[:3] == ["z", "z", "q"]
    assert "".join(toks) == "zzqbanana"


def test_min_pair_count_stops_training(spark):
    docs = _docs(spark, ["ab cd ef"])  # every pair occurs exactly once
    merges, _ = train_bpe(docs, n_merges=10, min_pair_count=2)
    assert merges == []


def test_word_table_is_the_only_corpus_pass(spark):
    """The working set is distinct words — repeated words collapse."""
    docs = _docs(spark, ["spark spark spark", "spark scan"])
    wc = word_frequency_table(docs)
    rows = {r.w: r.cnt for r in wc.collect()}
    assert rows == {"spark": 4, "scan": 1}


def test_training_is_all_jvm(spark):
    """No Python eval anywhere in a training round's plans."""
    from dataworks_audit_data_ingest_spark.text.bpe import _pair_counts

    docs = _docs(spark, ["banana band banana"])
    vocab = word_frequency_table(docs)
    for df in (vocab, _pair_counts(vocab)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
