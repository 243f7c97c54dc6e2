"""Dedup + similarity operator tests: correctness on the driver-generated
documents/embeddings tables plus plan-shape assertions for the scale
contracts (no user broadcast of corpus-sized relations; multi-probe
recall)."""

import os

import pytest
from pyspark.sql import functions as F

from valico_spark.operators import dedup, similarity
from valico_spark.operators.validate import (
    validate_dataframe, verdict_summary, violation_counts_by_code,
)

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def analyzed_plan(df):
    return df._jdf.queryExecution().analyzed().toString()


class TestMinhash:
    def test_candidates_superset_of_high_jaccard(self, documents):
        """Every pair the exact verifier confirms must have come through
        the LSH bucketing (internal consistency), and verified pairs
        really have Jaccard >= threshold."""
        out = dedup.minhash_dedup(documents, jaccard_threshold=0.7,
                                  bands=4).collect()
        assert all(r.jaccard >= 0.7 for r in out)
        assert all(r.a_id < r.b_id for r in out)

    def test_no_user_broadcast_of_corpus(self, documents):
        """The verify join must not hint-broadcast the corpus shingle
        table: the analyzed plan carries no ResolvedHint (AQE runtime
        broadcasts are size-gated and fine; a hint is unconditional)."""
        out = dedup.minhash_dedup(documents, jaccard_threshold=0.7, bands=4)
        plan = analyzed_plan(out)
        assert "ResolvedHint" not in plan
        assert "UnresolvedHint" not in plan

    def test_matches_blocked_exact_jaccard(self, documents):
        """LSH-verified pairs at a high threshold should equal the
        exact blocked-Jaccard pairs restricted to LSH candidates."""
        verified = {(r.a_id, r.b_id)
                    for r in dedup.minhash_dedup(
                        documents, jaccard_threshold=0.8, bands=4).collect()}
        cand = {(r.a_id, r.b_id)
                for r in dedup.minhash_lsh_candidates(
                    documents, bands=4).collect()}
        exact = {(r.a_id, r.b_id)
                 for r in dedup.ngram_jaccard_pairs(
                     documents, threshold=0.8, n=5,
                     allow_quadratic=True).collect()}
        assert verified == (exact & cand)


class TestUniquenessPlan:
    def test_no_unconditional_broadcast(self, documents):
        from valico_spark.operators import relational

        out = relational.uniqueness_violations(documents, ["text"],
                                               ["doc_id"])
        assert "ResolvedHint" not in analyzed_plan(out)


class TestLshTopk:
    def test_multiprobe_recall_vs_brute_force(self, embeddings):
        queries = embeddings.where(F.col("vec_id") < 8)
        dim = len(embeddings.select("embedding").first()[0])
        exact = similarity.brute_force_topk(embeddings, queries, k=5)
        # this table's true neighbors sit at ~70 deg (near-uniform cloud:
        # per-bit SRP agreement ~0.61), so recall needs wide buckets —
        # bits=4. Real near-dup loads (cosine>=0.9, p~0.9) use bits=8+.
        approx = similarity.lsh_topk(embeddings, queries, k=5, bits=4,
                                     tables=4, dim=dim, probe_dist=1)
        e = {(r.q_id, r.n_id) for r in exact.collect()}
        a = {(r.q_id, r.n_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.6, f"recall {recall}"
        single = similarity.lsh_topk(embeddings, queries, k=5, bits=4,
                                     tables=1, dim=dim, probe_dist=0)
        s = {(r.q_id, r.n_id) for r in single.collect()}
        # OR-amplification + multi-probe never hurts recall
        assert len(e & a) >= len(e & s)

    def test_dim_param_avoids_corpus_action(self, embeddings):
        """With dim passed, building the plan triggers no Spark job."""
        spark = embeddings.sparkSession
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        similarity.lsh_topk(embeddings, embeddings.limit(2), k=3, bits=4,
                            dim=8)
        after = tracker.getJobIdsForGroup(None)
        assert before == after


class TestVerdictSummary:
    RULESET = {"type": "object",
               "required": ["doc_id"],
               "properties": {"n_chars": {"type": "integer", "minimum": 0,
                                          "maximum": 3}}}

    def test_counts_documents_not_violations(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", 99), (None, 99)], "doc_id string, n_chars int")
        v = validate_dataframe(df, self.RULESET)
        row = verdict_summary(v).collect()[0]
        assert row.docs == 3
        assert row.valid_docs == 1
        # b: maximum; null-doc_id row: required AND maximum (n_chars=99)
        # — 3 violations over 2 invalid docs
        assert row.total_violations == 3

    def test_counts_by_code(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("b", 99), ("c", 99), (None, 99)],
            "doc_id string, n_chars int")
        v = validate_dataframe(df, self.RULESET)
        rows = {r.code: r for r in violation_counts_by_code(v).collect()}
        assert rows["maximum"].n_violations == 3
        assert rows["maximum"].n_docs == 3
        assert rows["required"].n_violations == 1
        assert rows["required"].n_docs == 1


class TestSrpBlocking:
    def test_block_bits_pairs_are_valid_subset(self, embeddings):
        dim = len(embeddings.select("embedding").first()[0])
        blocked = similarity.all_pairs_above(
            embeddings, 0.30, block_bits=4, dim=dim)
        got = blocked.collect()
        assert all(r.sim >= 0.30 for r in got)
        full = {(r.a_id, r.b_id)
                for r in similarity.all_pairs_above(embeddings, 0.30,
                                                    block_col="label"
                                                    ).collect()}
        # SRP blocking finds a non-trivial, threshold-true set; its
        # output columns match the unblocked operator's
        assert {(r.a_id, r.b_id) for r in got} and \
            set(blocked.columns) == {"a_id", "b_id", "sim"}
        assert full  # sanity: the label-blocked baseline is non-empty


class TestIvfTopk:
    def test_ivf_recall_vs_brute_force(self, embeddings):
        queries = embeddings.where(F.col("vec_id") < 8)
        exact = similarity.brute_force_topk(embeddings, queries, k=5)
        approx = similarity.ivf_topk(embeddings, queries, k=5,
                                     n_centroids=8, nprobe=3)
        e = {(r.q_id, r.n_id) for r in exact.collect()}
        a = {(r.q_id, r.n_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.6, f"recall {recall}"
        # probing more cells never hurts recall
        wide = similarity.ivf_topk(embeddings, queries, k=5,
                                   n_centroids=8, nprobe=8)
        wset = {(r.q_id, r.n_id) for r in wide.collect()}
        assert wset >= (e & a) or len(e & wset) >= len(e & a)

    def test_precomputed_centroids_skip_sampling_job(self, embeddings):
        import numpy as np

        spark = embeddings.sparkSession
        dim = len(embeddings.select("embedding").first()[0])
        rng = np.random.default_rng(3)
        cents = rng.standard_normal((4, dim))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        similarity.ivf_topk(embeddings, embeddings.limit(2), k=3,
                            centroids=cents)
        after = tracker.getJobIdsForGroup(None)
        assert before == after


class TestDecontamination:
    def _tables(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
             (2, "alpha beta gamma delta epsilon zeta eta theta KAPPA"),
             (3, "totally different words with no overlap at all here"),
             (4, "short doc")],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100,
              "xx alpha beta gamma delta epsilon zeta eta theta iota yy")],
            "doc_id long, text string")
        return docs, bench

    def test_report_matches_brute_force(self, spark):
        from valico_spark.operators.decontam import contamination_report

        docs, bench = self._tables(spark)
        rows = {r.doc_id: r for r in
                contamination_report(docs, bench, n=8).collect()}
        # doc 1: grams {w1..w8, w2..w9}; bench shares both
        assert rows[1].hit_grams == 2 and rows[1].doc_grams == 2
        assert rows[1].bench_docs == 1
        assert abs(rows[1].contamination_r - 1.0) < 1e-9
        # doc 2 ends differently: only the first 8-gram is shared
        assert rows[2].hit_grams == 1 and rows[2].doc_grams == 2
        # clean + too-short docs are absent from the report
        assert 3 not in rows and 4 not in rows

    def test_decontaminate_drops_only_contaminated(self, spark):
        from valico_spark.operators.decontam import decontaminate

        docs, bench = self._tables(spark)
        kept = sorted(r.doc_id for r in
                      decontaminate(docs, bench, n=8).collect())
        assert kept == [3, 4]
        # threshold keeps the partially-contaminated doc
        kept_t = sorted(r.doc_id for r in
                        decontaminate(docs, bench, n=8,
                                      max_contamination=0.6).collect())
        assert kept_t == [2, 3, 4]


class TestSemanticDedup:
    def test_drops_seeded_near_dups_with_high_recall(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.standard_normal((40, 16))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        dup = base[:15] + 0.02 * rng.standard_normal((15, 16))
        rows = [(i, v.tolist()) for i, v in enumerate(base)]
        rows += [(100 + i, v.tolist()) for i, v in enumerate(dup)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        rep = similarity.semantic_dedup(df, threshold=0.95, n_centroids=4,
                                        sample_size=100, seed=3)
        got = {r.dropped_id: r.kept_id for r in rep.collect()}
        # ground truth: every seeded dup has exactly its base above 0.95
        truth = {100 + i: i for i in range(15)}
        hits = sum(1 for d, k in got.items() if truth.get(d) == k)
        assert hits >= 13, f"recall {hits}/15: {got}"
        # nothing outside the seeded dups is dropped
        assert all(d in truth for d in got)

    def test_precomputed_centroids_skip_sampling_job(self, spark):
        import numpy as np

        df = spark.createDataFrame(
            [(i, np.eye(8)[i % 8].tolist()) for i in range(16)],
            "vec_id long, embedding array<double>")
        cents = np.eye(8)[:4]
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        similarity.semantic_dedup(df, threshold=0.99, centroids=cents)
        after = tracker.getJobIdsForGroup(None)
        assert before == after


class TestHotBucketGuards:
    """Mega-bucket safety rails (VERDICT r4 'what's wrong' #1): a cluster
    of exact duplicates shares every band bucket, so the banded joins
    must either FAIL LOUDLY at the bucket stage or, with
    ``precollapse_exact=True``, keep the candidate volume linear."""

    _TXT = ("the quick brown fox jumps over the lazy dog while the "
            "archive crawler stores yet another copy of this page")

    def _identical_docs(self, spark, n, text=None):
        return spark.createDataFrame(
            [(i, text or self._TXT) for i in range(n)],
            "doc_id long, text string")

    def test_minhash_guard_fires_on_exact_dup_cluster(self, spark):
        docs = self._identical_docs(spark, 200)
        out = dedup.minhash_lsh_candidates(docs, bands=4,
                                           max_bucket_size=50)
        with pytest.raises(Exception, match="max_group_size=50"):
            out.collect()

    def test_simhash_guard_fires_on_exact_dup_cluster(self, spark):
        docs = self._identical_docs(spark, 200)
        out = dedup.simhash_candidates(docs, max_bucket_size=50)
        with pytest.raises(Exception, match="max_group_size=50"):
            out.collect()

    def test_minhash_precollapse_keeps_candidates_linear(self, spark):
        """200 identical docs with a cap of 50: banding the raw corpus
        would trip the guard (previous test); pre-collapsing feeds ONE
        representative through the bands and returns the members as
        199 linear (rep, member, 1.0) edges."""
        docs = self._identical_docs(spark, 200)
        rows = dedup.minhash_dedup(docs, jaccard_threshold=0.7, bands=4,
                                   max_bucket_size=50,
                                   precollapse_exact=True).collect()
        assert len(rows) == 199
        assert all(r.a_id == 0 and r.jaccard == 1.0 for r in rows)
        assert sorted(r.b_id for r in rows) == list(range(1, 200))

    def test_precollapse_preserves_cross_group_near_dups(self, spark):
        """Two exact-dup groups whose texts are near-duplicates of each
        other: the rep-level pair must survive pre-collapse alongside
        both groups' member edges."""
        t2 = self._TXT.replace("lazy dog", "lazy cat")
        rows = ([(i, self._TXT) for i in range(100)]
                + [(100 + i, t2) for i in range(100)])
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = dedup.minhash_dedup(docs, jaccard_threshold=0.7, bands=4,
                                  max_bucket_size=50,
                                  precollapse_exact=True).collect()
        exact = [(r.a_id, r.b_id) for r in out if r.jaccard == 1.0]
        near = [(r.a_id, r.b_id, r.jaccard) for r in out
                if r.jaccard < 1.0]
        assert len(exact) == 198  # 99 per group
        assert near == [(0, 100, pytest.approx(near[0][2]))]
        assert near[0][2] >= 0.7

    def test_simhash_precollapse_members_at_hamming_zero(self, spark):
        docs = self._identical_docs(spark, 120)
        out = dedup.simhash_candidates(docs, max_bucket_size=50,
                                       precollapse_exact=True).collect()
        assert len(out) == 119
        assert all(r.a_id == 0 and r.hamming == 0 for r in out)

    def test_jaccard_prefix_precollapse_linear(self, spark):
        docs = self._identical_docs(spark, 150)
        out = dedup.jaccard_pairs_prefix(docs, threshold=0.8,
                                         precollapse_exact=True).collect()
        assert len(out) == 149
        assert all(r.a_id == 0 and r.jaccard == 1.0 for r in out)

    def test_empty_docs_do_not_band(self, spark):
        """Null / whitespace / sub-shingle texts fold to the degenerate
        signature (minhash: init array; simhash: 0), so uncapped they
        ALL share every band bucket — the empty-page mega-bucket. They
        carry no similarity signal (empty shingle sets have jaccard 0
        with everything), so both candidate generators exclude them —
        which also matches the SQL oracles, whose unnest() never emits
        zero-shingle/zero-token docs."""
        rows = ([(i, None) for i in range(100)]
                + [(100 + i, "   ") for i in range(100)]
                + [(200 + i, "abc") for i in range(100)]  # < 5-gram
                + [(300, self._TXT), (301, self._TXT)])
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        mh = dedup.minhash_lsh_candidates(docs, bands=4,
                                          max_bucket_size=50).collect()
        assert {(r.a_id, r.b_id) for r in mh} == {(300, 301)}
        # 'abc' docs DO tokenize (1 token) — a legit 100-member
        # identical cluster, so the RAW banding must trip the guard...
        with pytest.raises(Exception, match="max_group_size=50"):
            dedup.simhash_candidates(docs, max_bucket_size=50).collect()
        # ...and pre-collapse must make the same corpus pass linearly
        out = dedup.simhash_candidates(
            docs, max_bucket_size=50, precollapse_exact=True).collect()
        assert all(r.hamming == 0 for r in out)
        # exact-dup member edges: whitespace docs ARE byte-identical
        # (legit exact dups, 99 edges from rep 100), same for the abc
        # cluster (99 edges from rep 200) and the TXT pair; the banded
        # stage itself only ever sees the four reps
        assert {(r.a_id, r.b_id) for r in out} == (
            {(100, 100 + i) for i in range(1, 100)}
            | {(200, 200 + i) for i in range(1, 100)}
            | {(300, 301)})
        # null-text docs are not duplicates of each other: no edges
        assert all(r.a_id >= 100 and r.b_id >= 100 for r in out)

    def test_collapse_exact_null_texts_stay_singletons(self, spark):
        docs = spark.createDataFrame(
            [(1, None), (2, None), (3, "x"), (4, "x")],
            "doc_id long, text string")
        reps, edges = dedup.collapse_exact(docs)
        assert sorted(r.doc_id for r in reps.collect()) == [1, 2, 3]
        assert [(r.a_id, r.b_id) for r in edges.collect()] == [(3, 4)]

    def test_all_pairs_block_guard_fires(self, spark):
        import numpy as np

        v = (np.ones(8) / np.sqrt(8)).tolist()
        df = (spark.createDataFrame(
                  [(i, v) for i in range(80)],
                  "vec_id long, embedding array<double>")
              .withColumn("blk", F.lit(1)))
        out = similarity.all_pairs_above(df, 0.9, block_col="blk",
                                         max_block_size=20)
        with pytest.raises(Exception, match="max_group_size=20"):
            out.collect()

    def test_semantic_dedup_cell_guard_fires_on_skew(self, spark):
        """A corpus the coarse clustering cannot split (every vector
        identical -> one cell) must fail at the cell-size assert, not
        silently square inside the cell."""
        import numpy as np

        v = (np.ones(8) / np.sqrt(8)).tolist()
        df = spark.createDataFrame(
            [(i, v) for i in range(60)],
            "vec_id long, embedding array<double>")
        rep = similarity.semantic_dedup(df, threshold=0.99,
                                        n_centroids=4, sample_size=64,
                                        max_cell_size=10)
        with pytest.raises(Exception, match="max_group_size=10"):
            rep.collect()

    def test_precollapse_clusters_equal_raw_clusters_randomized(
            self, spark):
        """Invariant across the two postures: pre-collapse changes the
        PAIR set (linear rep->member edges instead of O(c^2) in-group
        pairs; cross-group near-dups at rep level only) but must NOT
        change the connected-components CLUSTERS — identical docs share
        signatures, so raw banding links them too, and CC closes the
        transitivity either way. Randomized corpora with exact-dup
        multiplicities and perturbed near-dups."""
        import random

        from valico_spark.operators.graph import connected_components

        vocab = ("alpha beta gamma delta epsilon zeta eta theta iota "
                 "kappa lam mu nu xi omicron pi rho sigma tau").split()
        for seed in (1, 7, 23):
            rnd = random.Random(seed)
            docs, nid = [], 0
            for b in range(8):
                words = [rnd.choice(vocab) for _ in range(30)]
                base = " ".join(words)
                for _ in range(rnd.randint(1, 6)):  # exact copies
                    docs.append((nid, base)); nid += 1
                if rnd.random() < 0.6:  # near-dup: one word swapped
                    w2 = list(words)
                    w2[rnd.randrange(len(w2))] = rnd.choice(vocab)
                    docs.append((nid, " ".join(w2))); nid += 1
            df = spark.createDataFrame(docs, "doc_id long, text string")

            def clusters(pairs):
                comp = connected_components(pairs).collect()
                by = {}
                for r in comp:
                    by.setdefault(r.comp, set()).add(r.id)
                return {frozenset(s) for s in by.values()}

            raw = dedup.minhash_dedup(df, jaccard_threshold=0.6, bands=4)
            pre = dedup.minhash_dedup(df, jaccard_threshold=0.6, bands=4,
                                      precollapse_exact=True)
            assert clusters(raw) == clusters(pre), f"seed {seed}"

    def test_zero_norm_vectors_excluded_everywhere(self, spark):
        """Cosine with a zero vector is 0/0 = NaN, and Spark's NaN
        ordering puts NaN ABOVE every real number — so a single zero
        corpus vector would 'match' its whole block in all_pairs_above
        and rank FIRST in every top-k list. Undefined-by-definition:
        excluded on every side of every cosine operator."""
        import numpy as np

        rng = np.random.default_rng(9)
        good = rng.standard_normal((10, 8))
        rows = [(i, v.tolist()) for i, v in enumerate(good)]
        rows.append((99, [0.0] * 8))
        df = (spark.createDataFrame(rows,
                                    "vec_id long, embedding array<double>")
              .withColumn("blk", F.lit(1)))
        pairs = similarity.all_pairs_above(df, 0.9, block_col="blk")
        assert all(r.a_id != 99 and r.b_id != 99
                   for r in pairs.collect())
        topk = similarity.brute_force_topk(df, df.limit(3), k=5).collect()
        assert all(r.n_id != 99 for r in topk)
        assert all(not np.isnan(r.sim) for r in topk)
        ivf = similarity.ivf_topk(df, df.limit(3), k=5, n_centroids=2,
                                  sample_size=16).collect()
        assert all(r.n_id != 99 and not np.isnan(r.sim) for r in ivf)

    def test_semantic_dedup_derives_centroids_from_corpus(self, spark):
        """n_centroids=None derives the SemDeDup-style ~sqrt(N) count
        (floored at 16) instead of a fixed test-scale constant; the
        run stays correct on a small corpus where the floor applies."""
        import numpy as np

        rng = np.random.default_rng(5)
        base = rng.standard_normal((30, 8))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        rows = [(i, v.tolist()) for i, v in enumerate(base)]
        rows += [(100 + i, base[i].tolist()) for i in range(5)]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>")
        got = {r.dropped_id: r.kept_id
               for r in similarity.semantic_dedup(
                   df, threshold=0.999, sample_size=64, seed=3).collect()}
        assert got == {100 + i: i for i in range(5)}


class TestParagraphDedup:
    def test_corpus_wide_winner_and_reassembly(self, spark):
        from valico_spark.operators.dedup import paragraph_dedup

        docs = spark.createDataFrame(
            [("a", "one\n\ntwo\n\nthree"),
             ("b", "two\n\nfour"),          # "two" loses to a's copy
             ("c", "one\n\ntwo"),           # both lose -> empty husk
             ("d", "")],                     # no paragraphs at all
            "doc_id string, text string")
        out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
        assert out["a"]["text"] == "one\n\ntwo\n\nthree"
        assert (out["a"]["n_paragraphs"], out["a"]["n_kept"]) == (3, 3)
        assert out["b"]["text"] == "four"
        assert (out["b"]["n_paragraphs"], out["b"]["n_kept"]) == (2, 1)
        assert out["c"]["text"] == ""
        assert (out["c"]["n_paragraphs"], out["c"]["n_kept"]) == (2, 0)
        assert out["d"]["text"] == ""
        assert (out["d"]["n_paragraphs"], out["d"]["n_kept"]) == (0, 0)

    def test_winner_is_smallest_position_within_doc(self, spark):
        from valico_spark.operators.dedup import paragraph_dedup

        docs = spark.createDataFrame(
            [("a", "x\n\nx\n\ny")],
            "doc_id string, text string")
        r = paragraph_dedup(docs).collect()[0]
        # intra-doc repeat collapses too (first occurrence survives)
        assert r["text"] == "x\n\ny"
        assert (r["n_paragraphs"], r["n_kept"]) == (3, 2)

    def test_boilerplate_filter(self, spark):
        from valico_spark.operators.dedup import boilerplate_filter

        docs = spark.createDataFrame(
            [("a", "footer\n\nunique-a"),
             ("b", "footer\n\nunique-b\n\nfooter"),  # in-doc repeat: df=1
             ("c", "footer\n\nunique-c")],
            "doc_id string, text string")
        out = {r["doc_id"]: r for r in
               boilerplate_filter(docs, max_df=2).collect()}
        # "footer" appears in 3 DISTINCT docs > max_df=2 -> dropped
        assert out["a"]["text"] == "unique-a"
        assert (out["a"]["n_paragraphs"], out["a"]["n_dropped"]) == (2, 1)
        assert out["b"]["text"] == "unique-b"
        assert (out["b"]["n_paragraphs"], out["b"]["n_dropped"]) == (3, 2)
        assert out["c"]["text"] == "unique-c"


class TestExactSubstringSpans:
    """repeated_ngram_spans / remove_repeated_spans (Lee et al. 2022
    exact-substring dedup, word-granularity)."""

    BOILER = ("the quick brown fox jumps over the lazy dog while "
              "seventeen purple crows watch")  # 14 words

    def _docs(self, spark):
        rows = [
            (1, "alpha beta " + self.BOILER + " gamma delta"),
            (2, "one two three " + self.BOILER + " four five six"),
            (3, "totally unrelated text with nothing repeated in it "
                "at all not even close"),
            (4, "tiny doc"),
            (5, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_spans_mark_later_copy_only(self, spark):
        from valico_spark.operators.dedup import repeated_ngram_spans

        spans = repeated_ngram_spans(self._docs(spark), n=10) \
            .collect()
        # keep_first: doc 1 holds every gram's (min doc_id, pos) winner
        assert {r.doc_id for r in spans} == {2}
        (s,) = spans
        # boilerplate starts at word 3 of doc 2, 14 words long; the 5
        # overlapping marked 10-grams merge to ONE maximal interval
        assert (s.start, s.end) == (3, 17)

    def test_keep_first_false_marks_both(self, spark):
        from valico_spark.operators.dedup import repeated_ngram_spans

        spans = repeated_ngram_spans(self._docs(spark), n=10,
                                     keep_first=False).collect()
        got = {(r.doc_id, r.start, r.end) for r in spans}
        assert got == {(1, 2, 16), (2, 3, 17)}

    def test_min_count_threshold(self, spark):
        from valico_spark.operators.dedup import repeated_ngram_spans

        assert repeated_ngram_spans(self._docs(spark), n=10,
                                    min_count=3).count() == 0

    def test_remove_rewrites_only_marked_docs(self, spark):
        from valico_spark.operators.dedup import remove_repeated_spans

        out = {r.doc_id: r for r in
               remove_repeated_spans(self._docs(spark), n=10).collect()}
        assert out[2].text == "one two three four five six"
        assert out[2].n_removed == 14 and out[2].n_words == 20
        # untouched docs keep their text verbatim (no normalization)
        src = {r.doc_id: r.text for r in self._docs(spark).collect()}
        for d in (1, 3, 4):
            assert out[d].text == src[d] and out[d].n_removed == 0
        assert out[5].text is None and out[5].n_words == 0

    def test_intra_doc_repeat_keeps_first_occurrence(self, spark):
        from valico_spark.operators.dedup import remove_repeated_spans

        filler = ("completely different middle section words here "
                  "that pad things out nicely")  # 11 words
        text = self.BOILER + " " + filler + " " + self.BOILER
        df = spark.createDataFrame([(7, text)],
                                   "doc_id long, text string")
        (r,) = remove_repeated_spans(df, n=10).collect()
        assert r.text == self.BOILER + " " + filler
        assert r.n_removed == 14

    def test_validation_errors(self, spark):
        import pytest as _pt

        from valico_spark.operators.dedup import repeated_ngram_spans

        with _pt.raises(ValueError):
            repeated_ngram_spans(self._docs(spark), n=1)
        with _pt.raises(ValueError):
            repeated_ngram_spans(self._docs(spark), min_count=1)


class TestExactSubstringRandomizedParity:
    """remove_repeated_spans vs a brute-force Python oracle on seeded
    random corpora. An 8-word vocabulary at n=3 makes duplicated grams,
    overlapping/adjacent interval merges, intra-doc repeats, and
    keep_first winner ties-by-position all common instead of crafted."""

    @staticmethod
    def _oracle(rows, n, min_count, keep_first):
        toks = {i: (t.split() if t else []) for i, t in rows}
        occ = {}
        for i, t in sorted(toks.items()):
            for p in range(len(t) - n + 1):
                occ.setdefault(tuple(t[p:p + n]), []).append((i, p))
        spans = {}
        for g, positions in occ.items():
            if len(positions) < min_count:
                continue
            first = min(positions)
            for i, p in positions:
                if keep_first and (i, p) == first:
                    continue
                spans.setdefault(i, []).append((p, p + n))
        out = {}
        for i, t in rows:
            ivs = sorted(spans.get(i, []))
            merged = []
            for s, e in ivs:
                if merged and s <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e))
                else:
                    merged.append((s, e))
            w = toks[i]
            if not merged:
                out[i] = (t, len(w), 0)
            else:
                kept = [x for j, x in enumerate(w)
                        if not any(s <= j < e for s, e in merged)]
                out[i] = (" ".join(kept), len(w), len(w) - len(kept))
        return out

    def test_parity_on_seeded_corpora(self, spark):
        import random

        from valico_spark.operators.dedup import remove_repeated_spans

        vocab = ["ax", "bo", "cu", "dee", "eff", "gee", "ha", "iy"]
        for seed in range(12):
            rng = random.Random(seed)
            n = rng.choice([2, 3, 4])
            min_count = rng.choice([2, 2, 3])
            keep_first = rng.random() < 0.5
            rows = []
            for i in range(rng.randint(5, 12)):
                if rng.random() < 0.1:
                    rows.append((i, None if rng.random() < 0.5 else ""))
                    continue
                words = [rng.choice(vocab)
                         for _ in range(rng.randint(0, 25))]
                rows.append((i, " ".join(words)))
            df = spark.createDataFrame(rows,
                                       "doc_id long, text string")
            got = {r.doc_id: (r.text, r.n_words, r.n_removed)
                   for r in remove_repeated_spans(
                       df, n=n, min_count=min_count,
                       keep_first=keep_first).collect()}
            want = self._oracle(rows, n, min_count, keep_first)
            assert got == want, (seed, n, min_count, keep_first)


class TestIncrementalMinhash:
    """minhash_band_index / minhash_incremental: dedup a new batch
    against a persisted band index without re-banding history."""

    @staticmethod
    def _corpus(seed, n_docs, id_base):
        import random

        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(40)]
        rows = []
        texts = []
        for i in range(n_docs):
            words = [rng.choice(vocab) for _ in range(30)]
            texts.append(words)
            rows.append((id_base + i, " ".join(words)))
            if rng.random() < 0.35 and texts:
                # near-dup of an earlier doc (same run): mutate 1 word
                src = list(rng.choice(texts))
                src[rng.randrange(len(src))] = rng.choice(vocab)
                n_docs_so_far = len(rows)
                rows.append((id_base + n_docs + n_docs_so_far,
                             " ".join(src)))
        return rows

    def _frames(self, spark, seed=3):
        old = self._corpus(seed, 12, 1000)
        new = self._corpus(seed + 100, 8, 5000)
        # one new doc is a near-dup of an old doc (cross-run dup)
        new.append((5999, old[0][1]))
        schema = "doc_id long, text string"
        return (spark.createDataFrame(old, schema),
                spark.createDataFrame(new, schema))

    def test_decomposition_invariant(self, spark):
        from valico_spark.operators.dedup import (
            minhash_band_index, minhash_incremental,
            minhash_lsh_candidates)

        old_df, new_df = self._frames(spark)
        full = {(r.a_id, r.b_id) for r in minhash_lsh_candidates(
            old_df.unionByName(new_df)).collect()}
        old_pairs = {(r.a_id, r.b_id)
                     for r in minhash_lsh_candidates(old_df).collect()}
        idx = minhash_band_index(old_df)
        cand, _ = minhash_incremental(new_df, idx)
        got = {(min(r.a_id, r.b_id), max(r.a_id, r.b_id))
               for r in cand.collect()}
        want = {(min(a, b), max(a, b)) for a, b in full} - \
               {(min(a, b), max(a, b)) for a, b in old_pairs}
        assert got == want and len(got) > 0

    def test_increment_matches_index_of_batch(self, spark):
        from valico_spark.operators.dedup import (
            minhash_band_index, minhash_incremental)

        old_df, new_df = self._frames(spark)
        _, inc = minhash_incremental(new_df, minhash_band_index(old_df))
        direct = minhash_band_index(new_df)
        assert ({tuple(r) for r in inc.collect()}
                == {tuple(r) for r in direct.collect()})

    def test_reprocessed_batch_never_self_pairs(self, spark):
        from valico_spark.operators.dedup import (
            minhash_band_index, minhash_incremental)

        old_df, _ = self._frames(spark)
        idx = minhash_band_index(old_df)
        cand, _ = minhash_incremental(old_df, idx)  # replay history
        hist = cand.where("vs = 'history'").collect()
        assert all(r.a_id != r.b_id for r in hist)

    def test_verify_passes_vs_through(self, spark):
        from valico_spark.operators.dedup import (
            minhash_band_index, minhash_incremental,
            verify_jaccard_candidates)

        old_df, new_df = self._frames(spark)
        cand, _ = minhash_incremental(new_df, minhash_band_index(old_df))
        docs = old_df.unionByName(new_df)
        verified = verify_jaccard_candidates(cand, docs,
                                             jaccard_threshold=0.8)
        rows = verified.collect()
        assert rows and set(verified.columns) == {"a_id", "b_id", "vs",
                                                  "jaccard"}
        # the planted cross-run exact dup must verify at jaccard 1.0
        assert any(r.vs == "history" and r.b_id == 5999
                   and r.jaccard == 1.0 for r in rows)
        assert all(r.jaccard >= 0.8 for r in rows)


class TestIncrementalSimhash:
    """simhash_index / simhash_incremental mirror the MinHash
    incremental contract with a (doc_id, sig) index."""

    def _frames(self, spark):
        old = TestIncrementalMinhash._corpus(7, 12, 1000)
        new = TestIncrementalMinhash._corpus(107, 8, 5000)
        new.append((5999, old[0][1]))  # cross-run exact dup
        schema = "doc_id long, text string"
        return (spark.createDataFrame(old, schema),
                spark.createDataFrame(new, schema))

    def test_decomposition_invariant(self, spark):
        from valico_spark.operators.dedup import (
            simhash_candidates, simhash_incremental, simhash_index)

        old_df, new_df = self._frames(spark)

        def key(rows):
            return {(min(r.a_id, r.b_id), max(r.a_id, r.b_id), r.hamming)
                    for r in rows}

        full = key(simhash_candidates(
            old_df.unionByName(new_df)).collect())
        old_pairs = key(simhash_candidates(old_df).collect())
        cand, _ = simhash_incremental(new_df, simhash_index(old_df))
        got = key(cand.collect())
        assert got == full - old_pairs and len(got) > 0
        # the planted cross-run exact dup arrives at hamming 0
        assert any(h == 0 and b == 5999 for _, b, h in got)

    def test_increment_matches_index_of_batch(self, spark):
        from valico_spark.operators.dedup import (
            simhash_incremental, simhash_index)

        old_df, new_df = self._frames(spark)
        _, inc = simhash_incremental(new_df, simhash_index(old_df))
        assert ({tuple(r) for r in inc.collect()}
                == {tuple(r) for r in simhash_index(new_df).collect()})

    def test_replayed_batch_never_self_pairs(self, spark):
        from valico_spark.operators.dedup import (
            simhash_incremental, simhash_index)

        old_df, _ = self._frames(spark)
        cand, _ = simhash_incremental(old_df, simhash_index(old_df))
        assert all(r.a_id != r.b_id
                   for r in cand.where("vs = 'history'").collect())


class TestIncrementalExactDedup:
    """exact_dedup_index / exact_dedup_incremental: fingerprint index,
    no history text scan."""

    def _frames(self, spark):
        old = [(1, "shared page body"), (2, "old unique one"),
               (3, "shared page body"), (4, None)]
        new = [(10, "shared page body"),       # dup of history rep 1
               (11, "batch dup x"), (12, "batch dup x"),  # new group
               (13, "brand new unique"), (14, None)]
        schema = "doc_id long, text string"
        return (spark.createDataFrame(old, schema),
                spark.createDataFrame(new, schema))

    def test_edges_and_increment(self, spark):
        from valico_spark.operators.dedup import (
            exact_dedup_incremental, exact_dedup_index)

        old_df, new_df = self._frames(spark)
        idx = exact_dedup_index(old_df)
        # index: one row per distinct old text (min-id rep), nulls out
        assert ({r.doc_id for r in idx.collect()} == {1, 2})
        edges, inc = exact_dedup_incremental(new_df, idx)
        got = {(r.a_id, r.b_id, r.vs) for r in edges.collect()}
        assert got == {(11, 12, "batch"), (1, 10, "history")}
        # increment: batch reps NOT in history; null-text never indexes
        assert ({r.doc_id for r in inc.collect()} == {11, 13})

    def test_replay_is_idempotent(self, spark):
        from valico_spark.operators.dedup import (
            exact_dedup_incremental, exact_dedup_index)

        old_df, _ = self._frames(spark)
        idx = exact_dedup_index(old_df)
        edges, inc = exact_dedup_incremental(old_df, idx)
        got = {(r.a_id, r.b_id, r.vs) for r in edges.collect()}
        assert got == {(1, 3, "batch")}  # no history self-pairs
        assert inc.count() == 0

    def test_components_match_full_collapse(self, spark):
        from valico_spark.operators.dedup import (
            collapse_exact, exact_dedup_incremental, exact_dedup_index)
        from valico_spark.operators.graph import connected_components

        old_df, new_df = self._frames(spark)
        _, full_edges = collapse_exact(old_df.unionByName(new_df))
        want = {tuple(sorted((r.a_id, r.b_id)))
                for r in full_edges.collect()}
        _, old_edges = collapse_exact(old_df)
        edges, _ = exact_dedup_incremental(new_df,
                                           exact_dedup_index(old_df))
        inc_edges = old_edges.withColumn(
            "vs", F.lit("old")).unionByName(edges)
        # same COMPONENTS (edge sets differ in shape, closure agrees)
        comp = {(r.id, r.comp) for r in connected_components(
            inc_edges.select("a_id", "b_id")).collect()}
        full_comp = {(r.id, r.comp) for r in connected_components(
            full_edges.select("a_id", "b_id")).collect()}
        assert comp == full_comp and len(comp) > 0


class TestIncrementalEmbedding:
    """srp_index / embedding_incremental: the embedding-modality member
    of the incremental dedup family."""

    @staticmethod
    def _vecs(seed, n, id_base, spark, planted=None):
        import random

        rng = random.Random(seed)
        rows = []
        for i in range(n):
            v = [rng.gauss(0, 1) for _ in range(8)]
            rows.append((id_base + i, v))
            if rng.random() < 0.3:
                # near-dup: tiny perturbation, cosine ~0.999
                rows.append((id_base + n + len(rows),
                             [x + rng.gauss(0, 0.01) for x in v]))
        rows += planted or []
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def _frames(self, spark):
        old = self._vecs(5, 10, 1000, spark)
        first_old = old.orderBy("vec_id").first()
        new = self._vecs(205, 6, 5000, spark,
                         planted=[(5999, list(first_old.embedding))])
        return old, new

    def test_decomposition_invariant(self, spark):
        from valico_spark.operators.similarity import (
            embedding_incremental, srp_index)

        old_df, new_df = self._frames(spark)
        kw = dict(threshold=0.98, bits=4, tables=2, dim=8)
        empty = srp_index(old_df.limit(0), bits=4, tables=2, dim=8)

        def key(df):
            return {(min(r.a_id, r.b_id), max(r.a_id, r.b_id),
                     round(r.sim, 9)) for r in df.collect()}

        full, _ = embedding_incremental(
            old_df.unionByName(new_df), empty, **kw)
        old_pairs, _ = embedding_incremental(old_df, empty, **kw)
        idx = srp_index(old_df, bits=4, tables=2, dim=8)
        got, inc = embedding_incremental(new_df, idx, **kw)
        assert key(got) == key(full) - key(old_pairs)
        assert len(key(got)) > 0
        # the planted identical vector pairs with its history original
        assert any(a == 1000 and b == 5999 and s > 0.999999
                   for a, b, s in key(got))
        # increment rows mirror srp_index of the batch
        direct = srp_index(new_df, bits=4, tables=2, dim=8)
        assert ({(r.vec_id, tuple(r.buckets)) for r in inc.collect()}
                == {(r.vec_id, tuple(r.buckets))
                    for r in direct.collect()})

    def test_replay_never_self_pairs_and_zero_norm_excluded(self, spark):
        from valico_spark.operators.similarity import (
            embedding_incremental, srp_index)

        old_df, _ = self._frames(spark)
        withzero = old_df.unionByName(spark.createDataFrame(
            [(9999, [0.0] * 8)], "vec_id long, embedding array<double>"))
        idx = srp_index(withzero, bits=4, tables=2, dim=8)
        assert idx.where("vec_id = 9999").count() == 0
        pairs, _ = embedding_incremental(withzero, idx, threshold=0.5,
                                         bits=4, tables=2, dim=8)
        rows = pairs.where("vs = 'history'").collect()
        assert rows and all(r.a_id != r.b_id for r in rows)
        assert all(9999 not in (r.a_id, r.b_id) for r in pairs.collect())


class TestDecontamGramIndex:
    """benchmark_gram_index: the persisted per-batch decontam posture
    must produce frame-identical reports to the inline benchmark path."""

    def test_index_path_matches_inline(self, spark, tmp_path):
        from valico_spark.operators.decontam import (
            benchmark_gram_index, contamination_report, decontaminate)

        docs = spark.createDataFrame(
            [(1, "the five boxing wizards jump quickly over a lazy "
                 "brown dog tonight"),
             (2, "completely unrelated material with no benchmark "
                 "overlap whatsoever in any gram"),
             (3, None)],
            "doc_id long, text string")
        bench = spark.createDataFrame(
            [(100, "the five boxing wizards jump quickly over a lazy "
                   "brown dog yesterday")],
            "doc_id long, text string")
        inline = contamination_report(docs, bench, n=8).collect()
        # persist the index, reload, reuse across "batches"
        idx_path = str(tmp_path / "gram_idx")
        benchmark_gram_index(bench, n=8).write.parquet(idx_path)
        idx = spark.read.parquet(idx_path)
        via_index = contamination_report(docs, n=8,
                                         gram_index=idx).collect()
        assert sorted(map(tuple, inline)) == sorted(map(tuple, via_index))
        assert len(inline) == 1 and inline[0].doc_id == 1
        # decontaminate via index: doc 1 dropped, others survive
        kept = decontaminate(docs, n=8, gram_index=idx)
        assert {r.doc_id for r in kept.collect()} == {2, 3}

    def test_exactly_one_source_required(self, spark):
        import pytest as _pt

        from valico_spark.operators.decontam import contamination_report

        docs = spark.createDataFrame([(1, "x")],
                                     "doc_id long, text string")
        with _pt.raises(ValueError):
            contamination_report(docs)
        with _pt.raises(ValueError):
            contamination_report(docs, docs, gram_index=docs)
