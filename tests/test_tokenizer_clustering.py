"""Semantics pins for the round-12-continuation operators: the BPE
trainer's leftmost-greedy merge application (the part a hash-match on
real text exercises only statistically), k-means determinism/exactness
edges, and power iteration against a hand-solvable matrix."""

from __future__ import annotations

from pyspark.sql import functions as F


def _merges(spark, words_with_counts, n):
    from eventstream_fanout_spark.operators.tokenizer import bpe_train

    wc = spark.createDataFrame(words_with_counts, "word string, wc long")
    return [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_freq"])
        for r in bpe_train(wc, n).orderBy("merge_rank").collect()
    ]


class TestBpeGreedy:
    def test_even_run_merges_all_pairs(self, spark):
        # 'aaaa' -> greedy (a,a) gives [aa, aa]; round 2 must see the
        # pair (aa, aa) with freq 1.  A non-greedy or
        # alternate-occurrence application would leave [aa, a, a] and
        # round 2 would pick (aa, a) or (a, a) instead.
        got = _merges(spark, [("aaaa", 1)], 2)
        assert got[0] == (1, "a", "a", 3)  # 3 adjacent pairs pre-merge
        assert got[1] == (2, "aa", "aa", 1)

    def test_odd_run_leaves_leftover_singleton(self, spark):
        # 'aaaaa' -> greedy [aa, aa, a]: round 2 pairs are (aa,aa)=1
        # and (aa,a)=1 — tie on freq, lexicographic tiebreak picks
        # (aa, a) ('a' < 'aa').  The string-replace shortcut (which
        # merges occurrences 1 and 3, leaving [aa, a, aa]) would
        # instead produce pairs (aa,a)=1 and (a,aa)=1.
        got = _merges(spark, [("aaaaa", 1)], 2)
        assert got[0] == (1, "a", "a", 4)
        assert got[1] == (2, "aa", "a", 1)

    def test_merged_symbol_participates_in_later_rounds(self, spark):
        # Classic: 'the' x3 + 'he' x1.  Round 1: (h,e) freq 4 beats
        # (t,h) freq 3.  Round 2 must count (t, he) — the merged
        # symbol — with freq 3.
        got = _merges(spark, [("the", 3), ("he", 1)], 2)
        assert got[0] == (1, "h", "e", 4)
        assert got[1] == (2, "t", "he", 3)

    def test_frequency_weighting_and_tiebreak(self, spark):
        # (a,b) appears in 2 words with total corpus weight 5;
        # (c,d) weight 5 as well -> lexicographic tiebreak picks ab.
        got = _merges(spark, [("ab", 2), ("abx", 3), ("cd", 5)], 1)
        assert got[0] == (1, "a", "b", 5)

    def test_no_cross_word_pairs(self, spark):
        # Single-char words carry no pairs; boundaries never merge.
        got = _merges(spark, [("ab", 1)], 1)
        assert got[0] == (1, "a", "b", 1)
        assert len(got) == 1


class TestKmeans:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )

    def test_two_obvious_clusters_exact_sizes(self, spark):
        from eventstream_fanout_spark.operators.clustering import (
            kmeans_fit,
        )

        rows = [(i, [0.9, 0.9]) for i in range(10)] + [
            (100 + i, [-0.9, -0.9]) for i in range(10)
        ]
        assigned, cents = kmeans_fit(self._emb(spark, rows), k=2, n_iter=2)
        sizes = sorted(
            r["n"]
            for r in assigned.groupBy("cluster_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert sizes == [10, 10]
        # identical points => zero inertia within each cluster
        assert assigned.agg(F.sum("dist")).collect()[0][0] == 0
        # centroids are the exact quantized points
        cvals = sorted(
            tuple(r["c"]) for r in cents.collect()
        )
        assert cvals == [(-900000, -900000), (900000, 900000)]

    def test_deterministic_across_runs(self, spark):
        from eventstream_fanout_spark.operators.clustering import (
            kmeans_report,
        )

        rows = [
            (i, [((i * 37) % 11) / 11.0, ((i * 53) % 7) / 7.0])
            for i in range(40)
        ]
        a = kmeans_report(self._emb(spark, rows), k=3, n_iter=2).collect()
        b = kmeans_report(self._emb(spark, rows), k=3, n_iter=2).collect()
        assert a == b

    def test_minibatch_serve_is_exact_merged_mean(self, spark):
        from eventstream_fanout_spark.operators.clustering import (
            centroid_sums,
            serve_centroids,
        )

        # one cluster, two deltas: members q=[2e5],[4e5] then [9e5]
        assigned = spark.createDataFrame(
            [(1, [200000], 0, 0), (2, [400000], 0, 0), (3, [900000], 0, 0)],
            "vec_id long, q array<long>, cluster_id long, dist long",
        )
        sums = centroid_sums(assigned)
        served = serve_centroids(sums).collect()
        assert served[0]["c"] == [500000]  # floor(1.5e6 / 3)


class TestPowerIteration:
    def test_known_dominant_direction(self, spark):
        from eventstream_fanout_spark.operators.linalg import (
            power_iteration,
        )

        # M = [[2, 0], [0, 1]] (already scaled): dominant eigenvector
        # is e0; after each step v = floor(u * 1e6 / max|u|) the first
        # component stays 1e6 and the second halves per step.
        m = spark.createDataFrame(
            [(0, 0, 2), (0, 1, 0), (1, 0, 0), (1, 1, 1)],
            "fi int, fj int, m long",
        )
        v = {
            r["fi"]: r["loading"]
            for r in power_iteration(m, 3).collect()
        }
        assert v[0] == 1_000_000
        assert v[1] == 125_000  # 1e6 / 2^3


class TestClusterStorePhysical:
    """Physical contracts of streaming/cluster_ingest.py that the
    registered stream query exercises only end-to-end: trigger replay
    idempotence via the batch-id partition overwrite, and the
    empty-batch no-op."""

    def _store(self, spark, tmp_path):
        from eventstream_fanout_spark.streaming.cluster_ingest import (
            build_cluster_fit_store,
        )

        emb = spark.createDataFrame(
            [(i, [float(i % 3) / 4.0, float(i % 5) / 8.0]) for i in range(24)],
            "vec_id long, embedding array<float>",
        )
        path = str(tmp_path / "store")
        build_cluster_fit_store(
            spark, emb.where("vec_id % 2 = 0"), path
        )
        return emb, path

    def test_replayed_trigger_is_idempotent(self, spark, tmp_path):
        from eventstream_fanout_spark.streaming.cluster_ingest import (
            cluster_sums_sink,
            read_refreshed_centroids,
        )

        emb, path = self._store(spark, tmp_path)
        sink = cluster_sums_sink(path)
        sink(emb.where("vec_id % 4 = 1"), 1)
        sink(emb.where("vec_id % 4 = 3"), 2)
        before = read_refreshed_centroids(spark, path).collect()
        sink(emb.where("vec_id % 4 = 1"), 1)  # crash/retry replay
        after = read_refreshed_centroids(spark, path).collect()
        assert before == after

    def test_empty_batch_is_noop(self, spark, tmp_path):
        from eventstream_fanout_spark.streaming.cluster_ingest import (
            cluster_sums_sink,
            read_refreshed_centroids,
        )

        emb, path = self._store(spark, tmp_path)
        sink = cluster_sums_sink(path)
        sink(emb.where("vec_id % 4 = 1"), 1)
        before = read_refreshed_centroids(spark, path).collect()
        sink(emb.where("vec_id < 0"), 2)  # empty micro-batch
        after = read_refreshed_centroids(spark, path).collect()
        assert before == after
