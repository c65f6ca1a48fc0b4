"""C7 Tokens container ops + RAKE query trimming (reference parity:
tokenizer.py:12-125, pre_process.py:92)."""

from word2doc_spark.functions.rake import (
    candidate_phrases, rake_phrases, rake_top_phrase,
)
from word2doc_spark.functions.tokens import Tokens, tokenize_tokens


def test_tokens_words_offsets_untokenize():
    text = "Hello, wide  world"
    t = tokenize_tokens(text)
    assert t.words() == ["Hello", ",", "wide", "world"]
    assert t.words(uncased=True) == ["hello", ",", "wide", "world"]
    # spans index the original text
    for tok, (s, e) in zip(t.words(), t.offsets()):
        assert text[s:e] == tok
    # whitespace-faithful reconstruction (incl. the double space)
    assert t.untokenize() == text
    assert t.slice(0, 3).untokenize() == "Hello, wide"


def test_tokens_regexp_substitutions():
    t = tokenize_tokens('he said “hi” -- bye…', tokenizer="regexp")
    assert "``" in t.words() and "''" in t.words()
    assert "--" in t.words() and "..." in t.words()


def test_entity_groups():
    text = "Barack Obama visited Paris today"
    t = tokenize_tokens(text)
    ents = ["PER", "PER", "O", "LOC", "O"]
    assert t.entity_groups(ents) == [("Barack Obama", "PER"),
                                     ("Paris", "LOC")]


def test_rake_phrase_split_and_ranking():
    text = "deep learning of compatibility criteria and the minimal set"
    phrases = [" ".join(p) for p in candidate_phrases(text)]
    # split at stopwords ('of', 'and', 'the')
    assert phrases == ["deep learning", "compatibility criteria",
                       "minimal set"]
    ranked = rake_phrases(text)
    assert len(ranked) == 3
    # all two-word phrases with unique words score 4.0; ties keep order
    assert [p for p, _ in ranked] == phrases
    assert all(abs(s - 4.0) < 1e-12 for _, s in ranked)


def test_rake_degree_favors_longer_phrases():
    text = "solve linear diophantine equations with strict equations"
    ranked = rake_phrases(text)
    # the longer phrase outranks 'strict equations' (degree dominates)
    assert ranked[0][0] == "solve linear diophantine equations"
    assert ranked[0][1] > ranked[-1][1]


def test_rake_top_phrase_fallbacks():
    assert rake_top_phrase("The Of And") == "the of and"  # no candidates
    assert rake_top_phrase("What is Deep Learning?") == "deep learning"


def test_trim_queries_rake_spark(spark):
    from word2doc_spark.sources.squad import trim_queries_rake
    qdf = spark.createDataFrame(
        [(1, "What is the capital of France?"),
         (2, "Who wrote War and Peace?")],
        "query_id long, query string")
    got = {r["query_id"]: r["query"]
           for r in trim_queries_rake(qdf).collect()}
    # 'capital' and 'france' both score 1.0 → tie keeps occurrence order
    assert got[1] == "capital"
    # 'wrote war' (score 4) outranks 'peace' (score 1)
    assert got[2] == "wrote war"


def test_substring_dedup_guard(spark):
    """dedup_substring_questions refuses corpus-sized inputs — the
    containment join is O(n^2) and exists for query-set prep only."""
    import pytest
    from word2doc_spark.sources.squad import dedup_substring_questions

    qs = spark.createDataFrame(
        [(i, f"question number {i}x") for i in range(12)],
        "query_id long, query string")
    with pytest.raises(ValueError, match="max_rows"):
        dedup_substring_questions(qs, max_rows=10)
    # under the cap it still runs
    assert dedup_substring_questions(qs, max_rows=100).count() == 12
