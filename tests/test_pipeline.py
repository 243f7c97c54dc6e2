"""Curation-pipeline composition lane (plans/pipeline.py): sequential
semantics, first-drop-reason attribution, row-stage fusion (zero
shuffles), and the standard recipe end-to-end against hand-applied
operator ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from valico_spark.plans.pipeline import (
    Stage, blocklist_stage, curate, decontam_stage, invalid_stage,
    low_quality_stage, near_dup_stage, row_stage, set_stage,
    wrong_lang_stage,
)

RULESET = {
    "type": "object",
    "required": ["text"],
    "properties": {"text": {"type": "string", "minLength": 12}},
}

GOOD_EN = ("the quick brown fox jumps over the lazy dog and runs on "
           "to the hills in a bright morning of wind and sun")
NEAR_EN = ("the quick brown fox jumps over the lazy dog and runs on "
           "to the hills in a bright morning of wind and fog")
FRENCH = ("le chat est sur la table et le chien est dans le jardin "
          "avec une balle et un os")
JUNK = ")(*&^%$#@! ~~~ ::: |||"
BENCH8 = ("alpha beta gamma delta epsilon zeta eta theta")
CONTAMINATED = ("this document quotes alpha beta gamma delta epsilon "
                "zeta eta theta verbatim and the rest of the text is "
                "long enough to be a real page about many things")


def _corpus(spark):
    rows = [
        (1, GOOD_EN),            # survives everything
        (2, None),               # invalid: required text
        (3, "tiny"),             # invalid: minLength
        (4, JUNK + " " + JUNK),  # low quality
        (5, FRENCH),             # wrong language
        (6, GOOD_EN),            # exact dup of 1 (longest tie -> min id keeps 1)
        (7, NEAR_EN),            # near dup of 1
        (8, CONTAMINATED),       # contaminated vs benchmark
        (9, "a page that mentions https://spam.example.com explicitly "
            "and is otherwise long and fine and full of the usual words"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame([(100, BENCH8)],
                                 "doc_id long, text string")


def _stages(spark):
    docs = _corpus(spark)
    return docs, [
        invalid_stage(RULESET, docs.schema),
        low_quality_stage(0.30),
        wrong_lang_stage(["en"]),
        blocklist_stage(["spam.example.com"]),
        near_dup_stage(jaccard_threshold=0.8, n=5),
        decontam_stage(_bench(spark), n=8),
    ]


class TestStandardRecipe:
    def test_reasons_and_survivors(self, spark):
        docs, stages = _stages(spark)
        curated, tagged, report = curate(docs, stages)
        got = {r.doc_id: r.drop_reason for r in tagged.collect()}
        assert got == {
            1: None,
            2: "invalid",
            3: "invalid",
            4: "low_quality",
            5: "wrong_lang",
            6: "near_dup",
            7: "near_dup",
            8: "contaminated",
            9: "blocklisted",
        }
        assert sorted(r.doc_id for r in curated.collect()) == [1]
        assert curated.columns == docs.columns

    def test_report_counts_and_order(self, spark):
        docs, stages = _stages(spark)
        _, _, report = curate(docs, stages)
        rows = [(r.stage, r.n_rows) for r in report.collect()]
        assert rows == [("invalid", 2), ("low_quality", 1),
                        ("wrong_lang", 1), ("blocklisted", 1),
                        ("near_dup", 2), ("contaminated", 1),
                        ("kept", 1)]
        assert sum(n for _, n in rows) == docs.count()


class TestSemantics:
    def test_first_stage_wins(self, spark):
        # French text short enough to also fail quality: charged to the
        # EARLIER stage only
        docs = spark.createDataFrame(
            [(1, "le et la un une est"), (2, GOOD_EN)],
            "doc_id long, text string")
        _, tagged, _ = curate(docs, [
            low_quality_stage(0.99, name="q"),
            wrong_lang_stage(["en"], name="l"),
        ])
        got = {r.doc_id: r.drop_reason for r in tagged.collect()}
        assert got[1] == "q"

    def test_set_stage_sees_survivors_only(self, spark):
        # doc 2 is an exact dup of doc 1, but doc 1 is dropped by an
        # earlier stage — sequentially doc 2 has no duplicate left and
        # MUST survive; naive all-rows tagging would drop it
        docs = spark.createDataFrame(
            [(1, GOOD_EN), (2, GOOD_EN)], "doc_id long, text string")
        _, tagged, _ = curate(docs, [
            row_stage("first_only", lambda d: F.col("doc_id") == 1),
            near_dup_stage(n=5),
        ])
        got = {r.doc_id: r.drop_reason for r in tagged.collect()}
        assert got == {1: "first_only", 2: None}

    def test_row_stages_fuse_no_shuffle(self, spark):
        docs, stages = _stages(spark)
        row_only = [s for s in stages if s.kind == "row"]
        _, tagged, _ = curate(docs, row_only)
        tagged.collect()
        plan = tagged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_bad_spans_and_semantic_dup_stages(self, spark):
        """The span-invariant row stage and the embedding set stage
        compose with the text stages in one pipeline."""
        from valico_spark.plans.pipeline import (
            bad_spans_stage, semantic_dup_stage)

        rows = [
            (1, GOOD_EN, [(0, "text"), (10, "image")], [1.0, 0.0]),
            (2, GOOD_EN + " two", [(0, "text"), (5, "text")],
             [0.999, 0.01]),                       # semantic dup of 1
            (3, FRENCH, [(7, "text"), (3, "image")], [0.0, 1.0]),
            (4, GOOD_EN + " four", [(2, "text")], None),  # null vec ok
        ]
        docs = spark.createDataFrame(
            [(i, t, [{"offset": o, "kind": k, "text": "x",
                      "media_ref": None} for o, k in sp], v)
             for i, t, sp, v in rows],
            "doc_id long, text string, spans array<struct<offset int, "
            "kind string, text string, media_ref string>>, "
            "embedding array<double>")
        _, tagged, _ = curate(docs, [
            bad_spans_stage(),
            semantic_dup_stage(threshold=0.95,
                               centroids=[[1.0, 0.0], [0.0, 1.0]]),
        ])
        got = {r.doc_id: r.drop_reason for r in tagged.collect()}
        assert got == {1: None, 2: "semantic_dup", 3: "bad_spans",
                       4: None}

    def test_bad_media_stage(self, spark):
        from valico_spark.plans.pipeline import bad_media_stage

        rows = [
            (1, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"jpegdata"),
            (2, b"\x89PNG\r\n\x1a\nxxxx"),
            (3, b"not a known magic"),
            (4, None),
        ]
        docs = spark.createDataFrame(rows,
                                     "doc_id long, payload binary")
        _, tagged, _ = curate(docs, [
            bad_media_stage(allowed_types=["image/jpeg", "image/png"]),
        ])
        got = {r.doc_id: r.drop_reason for r in tagged.collect()}
        assert got == {1: None, 2: None, 3: "bad_media", 4: "bad_media"}
        # restricting the allowlist drops the png too
        _, tagged2, _ = curate(docs, [
            bad_media_stage(allowed_types=["image/jpeg"]),
        ])
        got2 = {r.doc_id: r.drop_reason for r in tagged2.collect()}
        assert got2[2] == "bad_media" and got2[1] is None

    def test_near_dup_stage_custom_id_col(self, spark):
        """The id parameter must work for names other than 'doc_id'
        (select_representatives emits 'doc_id' internally)."""
        docs = spark.createDataFrame(
            [(10, GOOD_EN), (20, GOOD_EN), (30, FRENCH)],
            "page_id long, text string")
        _, tagged, _ = curate(
            docs, [near_dup_stage(n=5, id_col="page_id")],
            id_col="page_id")
        got = {r.page_id: r.drop_reason for r in tagged.collect()}
        assert got == {10: None, 20: "near_dup", 30: None}

    def test_stage_validation(self, spark):
        docs = _corpus(spark)
        with pytest.raises(ValueError, match="unique"):
            curate(docs, [low_quality_stage(0.1, name="x"),
                          wrong_lang_stage(["en"], name="x")])
        with pytest.raises(ValueError, match="one id column"):
            bad = set_stage("s", lambda d: d.select("doc_id", "text"))
            curate(docs, [bad])[1].collect()

    def test_stream_row_tier_matches_batch(self, spark, tmp_path):
        """curate_stream over a file-source stream == batch curate with
        the same row stages, and the windowed attrition counts match a
        batch aggregation — the in-flight tier cannot drift."""
        import datetime as dt

        from valico_spark.plans.pipeline import (
            curate_stream, stream_attrition_counts)

        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        rows = [(i,
                 GOOD_EN if i % 3 == 0 else
                 (FRENCH if i % 3 == 1 else JUNK + " " + JUNK),
                 base + dt.timedelta(seconds=40 * i))
                for i in range(30)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, ts timestamp")
        src = str(tmp_path / "src")
        docs.repartition(3).write.parquet(src)

        stages = [low_quality_stage(0.30), wrong_lang_stage(["en"])]
        stream = spark.readStream.schema(docs.schema).parquet(src)
        tagged = curate_stream(stream, stages)
        counts = stream_attrition_counts(tagged, "ts", "1 minute")
        q = (counts.writeStream.outputMode("complete").format("memory")
                   .queryName("pipe_attrition")
                   .option("checkpointLocation", str(tmp_path / "ck"))
                   .trigger(availableNow=True).start())
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        got = sorted(map(tuple, spark.sql(
            "select * from pipe_attrition").collect()))
        spark.catalog.dropTempView("pipe_attrition")

        _, btag, _ = curate(spark.read.parquet(src), stages)
        want = sorted(map(tuple, (
            btag.groupBy(F.window("ts", "1 minute").alias("w"),
                         F.coalesce(F.col("drop_reason"), F.lit("kept"))
                          .alias("stage"))
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .select(F.col("w.start").alias("window_start"),
                        F.col("w.end").alias("window_end"),
                        "stage", "n_rows")).collect()))
        assert got == want and len(got) > 3

    def test_stream_refuses_set_stages(self, spark, tmp_path):
        from valico_spark.plans.pipeline import curate_stream

        docs = _corpus(spark)
        src = str(tmp_path / "s2")
        docs.write.parquet(src)
        stream = spark.readStream.schema(docs.schema).parquet(src)
        with pytest.raises(ValueError, match="row stages only"):
            curate_stream(stream, [near_dup_stage()])

    def test_cli_curate_run(self, spark, tmp_path):
        """--curate end-to-end on the real sf0.001 documents table:
        tagged + curated parquet + report.json, counts consistent."""
        import json
        import os

        import valico_spark.cli as cli

        out = str(tmp_path / "out")
        rc = cli.main(["--input",
                       "/root/testdata/sf0.001/documents.parquet",
                       "--curate", "--output-dir", out,
                       "--min-quality", "0.3",
                       "--langs", "en,de",
                       "--near-dup",
                       "--master", "local[4]"])
        assert rc == 0
        report = json.load(open(os.path.join(out, "report.json")))
        tagged = spark.read.parquet(os.path.join(out, "tagged"))
        curated = spark.read.parquet(os.path.join(out, "curated"))
        assert report["input_rows"] == 500 == tagged.count()
        assert curated.count() == report["kept_rows"]
        assert (report["kept_rows"]
                + sum(report["dropped"].values())) == 500
        assert "drop_reason" in tagged.columns
        assert "drop_reason" not in curated.columns
        # the near-dup stage must have dropped something on this corpus
        assert report["dropped"]["near_dup"] > 0

    def test_cli_curate_mixture_shards(self, spark, tmp_path):
        """Full raw-corpus -> dataloader path in one CLI call: curate,
        mixture-sample (n_chars mass), shard-write with manifest."""
        import json
        import os

        import valico_spark.cli as cli

        out = str(tmp_path / "full")
        rc = cli.main(["--input",
                       "/root/testdata/sf0.001/documents.parquet",
                       "--curate", "--output-dir", out,
                       "--min-quality", "0.3",
                       "--mixture", json.dumps(
                           {f"src{i}": 1.0 for i in range(20)}),
                       "--shards", "4",
                       "--master", "local[4]"])
        assert rc == 0
        report = json.load(open(os.path.join(out, "report.json")))
        # mixture: 20 equal-weight sources, one binding at rate 1.0
        rates = {m["source"]: m["rate"] for m in report["mixture"]}
        assert len(rates) == 20 and max(rates.values()) == 1.0
        assert report["mixture_rows"] < report["kept_rows"]
        # shards: manifest counts sum to the sampled rows and the
        # parquet on disk agrees
        assert sum(report["shards"].values()) == report["mixture_rows"]
        back = spark.read.parquet(os.path.join(out, "shards"))
        assert back.count() == report["mixture_rows"]

    def test_cli_remove_repeated_spans_tail(self, spark, tmp_path):
        """--remove-repeated-spans rewrites the curated corpus (exact-
        substring dedup) and later tiers consume the despanned table."""
        import json
        import os

        import valico_spark.cli as cli

        boiler = ("the quick brown fox jumps over the lazy dog while "
                  "seventeen purple crows watch")  # 14 words
        rows = [(1, "alpha beta " + boiler, "s"),
                (2, "one two three " + boiler + " four", "s"),
                (3, "completely unique words with no internal "
                    "repetition whatsoever in this document at all",
                 "s")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        src = str(tmp_path / "in")
        docs.write.parquet(src)
        out = str(tmp_path / "spans")
        rc = cli.main(["--input", src, "--curate", "--output-dir", out,
                       "--min-quality", "0.0",
                       "--remove-repeated-spans", "10",
                       "--shards", "2",
                       "--master", "local[4]"])
        assert rc == 0
        report = json.load(open(os.path.join(out, "report.json")))
        assert report["repeated_spans"] == {
            "n": 10, "docs": 3, "docs_rewritten": 1,
            "words_removed": 14}
        desp = {r.doc_id: r for r in spark.read.parquet(
            os.path.join(out, "despanned")).collect()}
        # keep-first: doc 1 keeps the boilerplate whole, doc 2 loses it
        assert desp[1].text == "alpha beta " + boiler
        assert desp[2].text == "one two three four"
        # shards derive from the despanned table
        assert sum(report["shards"].values()) == 3
        back = spark.read.parquet(os.path.join(out, "shards"))
        assert "n_removed" in back.columns and back.count() == 3

    def test_cli_mixture_error_degrades_gracefully(self, spark,
                                                   tmp_path):
        """A weighted source absent from the curated corpus must not
        crash the run after the expensive tiers: the diagnostic lands
        in the report and shards fall back to the curated table."""
        import json
        import os

        import valico_spark.cli as cli

        out = str(tmp_path / "deg")
        rc = cli.main(["--input",
                       "/root/testdata/sf0.001/documents.parquet",
                       "--curate", "--output-dir", out,
                       "--min-quality", "0.3",
                       "--mixture", json.dumps({"no_such_source": 1.0}),
                       "--shards", "2",
                       "--master", "local[4]"])
        assert rc == 0
        report = json.load(open(os.path.join(out, "report.json")))
        assert "no tokens" in report["mixture_error"]
        assert "mixture" not in report
        assert sum(report["shards"].values()) == report["kept_rows"]

    def test_matches_sequential_operator_application(self, spark):
        """curate == running the same operators as successive filters."""
        from valico_spark.operators.decontam import decontaminate
        from valico_spark.operators.dedup import minhash_dedup
        from valico_spark.operators.graph import (
            dedup_clusters, select_representatives)
        from valico_spark.operators.text import (
            filter_blocklisted_domains, pred_lang_col, quality_score_col)
        from valico_spark.operators.validate import validate_dataframe

        docs, stages = _stages(spark)
        curated, _, _ = curate(docs, stages)

        s = validate_dataframe(docs, RULESET).where("valid") \
            .drop("violations", "valid")
        s = s.where(quality_score_col(F.col("text")) >= 0.30)
        s = s.where(pred_lang_col(F.col("text")) == "en")
        s = filter_blocklisted_domains(s, ["spam.example.com"])
        pairs = minhash_dedup(s, jaccard_threshold=0.8, n=5,
                              precollapse_exact=True)
        reps = select_representatives(
            dedup_clusters(pairs),
            s.select("doc_id", F.coalesce(F.length("text"), F.lit(0))
                     .alias("__len")), "__len")
        s = s.join(reps.where(~F.col("keep")).select("doc_id"),
                   "doc_id", "left_anti")
        s = decontaminate(s, _bench(spark), n=8)

        assert (sorted(r.doc_id for r in curated.collect())
                == sorted(r.doc_id for r in s.collect()))
