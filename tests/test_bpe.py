"""BPE vocabulary training: hand-computed merge sequences, greedy
left-to-right overlap semantics, and the DuckDB oracle twin."""

from __future__ import annotations

import duckdb

from tomasz_weight_tracker_spark.operators.bpe import bpe_train, sql_bpe_chain


def _words(spark, items):
    return spark.createDataFrame(items, "word string, freq long")


class TestBpeTrain:
    def test_known_tiny_corpus_sequence(self, spark):
        """Merges hand-derived on paper:

        corpus = abab x3, ab x2, aaa x1
        r1: (a,b) count 3*2+2 = 8 -> 'ab'     (abab->[ab,ab], ab->[ab])
        r2: (ab,ab) count 3    -> 'abab'
        r3: (a,a) count 2      -> 'aa'        (aaa -> [aa, a], greedy)
        r4: (aa,a) count 1     -> 'aaa'
        """
        out = bpe_train(
            spark, _words(spark, [("abab", 3), ("ab", 2), ("aaa", 1)]), 4
        ).collect()
        got = [(r["round"], r.left_sym, r.right_sym, r.merged, r.cnt) for r in out]
        assert got == [
            (1, "a", "b", "ab", 8),
            (2, "ab", "ab", "abab", 3),
            (3, "a", "a", "aa", 2),
            (4, "aa", "a", "aaa", 1),
        ]

    def test_greedy_overlap_alternation(self, spark):
        """'aaaa' with merge (a,a): greedy left-to-right produces
        [aa, aa] (offsets 0 and 2 of the 3-position overlap run),
        so round 2 learns (aa, aa) — the classic BPE subtlety."""
        out = bpe_train(spark, _words(spark, [("aaaa", 1)]), 2).collect()
        got = [(r.left_sym, r.right_sym, r.cnt) for r in out]
        assert got == [("a", "a", 3), ("aa", "aa", 1)]

    def test_tie_break_is_lexicographic(self, spark):
        # (a,b) and (c,d) both count 2 -> (a,b) wins the tie.
        out = bpe_train(spark, _words(spark, [("ab", 2), ("cd", 2)]), 1).collect()
        assert (out[0].left_sym, out[0].right_sym) == ("a", "b")

    def test_early_stop_when_no_pairs_remain(self, spark):
        # Two rounds exhaust 'ab'; round 3 has no adjacent pairs left.
        out = bpe_train(spark, _words(spark, [("ab", 1)]), 3).collect()
        assert len(out) == 1  # (a,b) then single-symbol words only

    def test_segment_words_applies_learned_merges(self, spark):
        """After training on abab x3 / ab x2 / aaa x1 (4 rounds, the
        hand-derived sequence above), the final state segments each
        vocabulary word with the learned merges applied greedily."""
        from tomasz_weight_tracker_spark.operators.bpe import (
            bpe_train_full,
            segment_words,
        )

        _, state = bpe_train_full(
            spark, _words(spark, [("abab", 3), ("ab", 2), ("aaa", 1)]), 4
        )
        out = {r.word: r for r in segment_words(state).collect()}
        assert (out["abab"].n_tokens, out["abab"].segmented) == (1, "abab")
        assert (out["ab"].n_tokens, out["ab"].segmented) == (1, "ab")
        # r3 merged (a,a) greedily: aaa -> [aa, a]; r4 merged (aa, a).
        assert (out["aaa"].n_tokens, out["aaa"].segmented) == (1, "aaa")
        assert out["abab"].freq == 3

    def test_segment_oracle_matches_engine(self, spark):
        from tomasz_weight_tracker_spark.operators.bpe import (
            bpe_train_full,
            segment_words,
            sql_bpe_segments,
        )

        words = [("abab", 3), ("ab", 2), ("aaa", 1), ("banana", 2)]
        cte = " UNION ALL ".join(
            f"SELECT '{w}' AS word, {f}::BIGINT AS freq" for w, f in words
        )
        oracle = duckdb.connect().execute(sql_bpe_segments(cte, 3)).fetchall()
        _, state = bpe_train_full(spark, _words(spark, words), 3)
        got = [tuple(r) for r in segment_words(state).collect()]
        assert sorted(got) == sorted(tuple(r) for r in oracle)

    def test_oracle_chain_matches_engine(self, spark):
        words = [("abab", 3), ("ab", 2), ("aaa", 1), ("banana", 2)]
        cte = " UNION ALL ".join(
            f"SELECT '{w}' AS word, {f}::BIGINT AS freq" for w, f in words
        )
        oracle = duckdb.connect().execute(sql_bpe_chain(cte, 5)).fetchall()
        got = [
            tuple(r)
            for r in bpe_train(spark, _words(spark, words), 5).collect()
        ]
        assert sorted(got) == sorted(tuple(r) for r in oracle)
