"""Tests: JSON-lines sources, defaults application, custom checks, CLI."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F


class TestJsonlSource:
    def test_validate_json_file(self, spark, tmp_path):
        from valico_spark.sources.jsonl import validate_json_file

        p = tmp_path / "docs.jsonl"
        p.write_text('{"a": 1}\n{"a": "x"}\n\n{"b": 2}\n')
        ruleset = {"type": "object", "required": ["a"],
                   "properties": {"a": {"type": "integer"}}}
        rows = validate_json_file(spark, str(p), ruleset).collect()
        got = sorted((r["doc_json"], r["valid"]) for r in rows)
        assert got == [('{"a": "x"}', False), ('{"a": 1}', True),
                       ('{"b": 2}', False)]

    def test_typed_reader_feeds_column_compiler(self, spark, tmp_path):
        from valico_spark.operators.validate import validate_dataframe
        from valico_spark.sources.jsonl import read_json_typed

        p = tmp_path / "t.jsonl"
        p.write_text('{"a": 1, "s": "xx"}\n{"a": -5, "s": "y"}\n')
        df = read_json_typed(spark, str(p))
        ruleset = {"properties": {"a": {"minimum": 0},
                                  "s": {"minLength": 2}}}
        out = validate_dataframe(df, ruleset, mode="columns")
        assert out.where(F.col("valid")).count() == 1
        bad = out.where(~F.col("valid")).collect()[0]
        assert sorted(v["code"] for v in bad["violations"]) == \
            ["min_length", "minimum"]


class TestDefaults:
    def test_apply_defaults(self, spark):
        from valico_spark.operators.validate import apply_defaults

        df = spark.createDataFrame([(1, None), (2, "x")], ["id", "s"])
        ruleset = {"properties": {"s": {"type": "string",
                                        "default": "d"}}}
        out = {r["id"]: r["s"] for r in apply_defaults(df, ruleset).collect()}
        assert out == {1: "d", 2: "x"}


class TestCustomCheck:
    def test_custom_check_udf(self, spark):
        from valico_spark.operators.validate import custom_check

        df = spark.createDataFrame([(1, 10), (2, -3)], ["id", "v"])

        def check(pdf):
            return [[] if v >= 0 else
                    [{"code": "wrong_value", "title": "neg", "path": "/v",
                      "detail": f"{v} < 0"}]
                    for v in pdf["v"]]

        out = {r["id"]: r["custom_violations"]
               for r in custom_check(df, check).collect()}
        assert out[1] == []
        assert out[2][0]["code"] == "wrong_value"
        assert out[2][0]["detail"] == "-3 < 0"


class TestCli:
    def test_cli_run_and_resume(self, spark, docs_df, tmp_path,
                                monkeypatch):
        import valico_spark.cli as cli
        import valico_spark.session as sess

        docs_path = str(tmp_path / "docs")
        docs_df.limit(500).write.parquet(docs_path)
        rules_path = tmp_path / "rules.json"
        from valico_spark.rulesets import DOCS_RULESET
        rules_path.write_text(json.dumps(DOCS_RULESET))

        monkeypatch.setattr(sess, "get_spark",
                            lambda *a, **k: spark)
        rc = cli.main(["--input", docs_path, "--ruleset", str(rules_path),
                       "--audit-dir", str(tmp_path / "audit"),
                       "--run-id", "t1", "--buckets", "3"])
        assert rc == 0
        # resume: nothing pending
        rc = cli.main(["--input", docs_path, "--ruleset", str(rules_path),
                       "--audit-dir", str(tmp_path / "audit"),
                       "--run-id", "t1", "--buckets", "3"])
        assert rc == 0
        from valico_spark.plans.audit import AuditRun
        run = AuditRun(spark, str(tmp_path / "audit"), "t1", n_buckets=3)
        assert run.pending_buckets() == []
        assert sum(m["docs"] for m in run.metrics()) == 500


class TestCsvCoerced:
    def test_read_csv_coerced(self, spark, tmp_path):
        from valico_spark.sources.jsonl import read_csv_coerced

        p = tmp_path / "in.csv"
        p.write_text("a,b,c\n1,2.5,true\nx,NOPE,TRUE\n+42,.5,false\n")
        out = read_csv_coerced(spark, str(p),
                               {"a": "i64", "b": "f64", "c": "boolean"})
        rows = sorted(out.collect(), key=lambda r: (r["a"] is None, r["a"]))
        ok = [r for r in rows if r["a"] == 1][0]
        assert ok["b"] == 2.5 and ok["c"] is True
        assert not ok["coerce_violations"]
        bad = [r for r in rows if r["a"] is None][0]
        assert bad["b"] is None and bad["c"] is None
        assert len(bad["coerce_violations"]) == 3
        assert {v["code"] for v in bad["coerce_violations"]} == {"wrong_type"}
        plus = [r for r in rows if r["a"] == 42][0]
        assert plus["b"] == 0.5 and plus["c"] is False


class TestBucketedJoins:
    def test_bucketed_join_has_no_exchange(self, spark, docs_df, tmp_path):
        """Both sides bucketed+sorted on the join key: the sort-merge
        join must run with ZERO Exchange operators (the 100 TB contract
        for uniqueness/referential/dedup-verify joins)."""
        from valico_spark.sources.bucketed import (
            plan_has_exchange, write_bucketed,
        )

        a = docs_df.select("doc_id", "spans")
        # distinct: the fixture seeds duplicate doc_ids, which would
        # multiply the joined count
        b = docs_df.select("doc_id").distinct().withColumn(
            "flag", F.length(F.col("doc_id")) % 2 == 0)
        write_bucketed(a, "bk_docs", ["doc_id"], 8)
        write_bucketed(b, "bk_flags", ["doc_id"], 8)
        ta = spark.table("bk_docs")
        tb = spark.table("bk_flags")
        # forbid broadcast so the test exercises the SMJ path
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = ta.join(tb, "doc_id")
            assert not plan_has_exchange(joined), \
                joined._jdf.queryExecution().executedPlan().toString()[:2000]
            assert joined.count() == docs_df.count()
            # control: the same join on non-bucketed inputs shuffles
            assert plan_has_exchange(
                docs_df.select("doc_id").join(
                    docs_df.select("doc_id", "lang_hint")
                    if "lang_hint" in docs_df.columns
                    else docs_df.select("doc_id", "spans"), "doc_id"))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_incremental_index_join_is_one_sided(self, spark):
        """minhash_incremental against a BUCKETED band index: the
        history join must repartition ONLY the batch side — the index
        FileScan feeds the sort-merge join with no Exchange (history is
        never reshuffled per batch, the recrawl contract)."""
        from valico_spark.operators.dedup import (
            minhash_band_index, minhash_incremental)
        from valico_spark.sources.bucketed import write_bucketed

        docs = spark.createDataFrame(
            [(i, f"document body number {i} with some shared words "
                 "to make shingles plentiful") for i in range(40)],
            "doc_id long, text string")
        write_bucketed(minhash_band_index(docs), "bk_mh_idx",
                       ["band", "bucket"], 8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            cand, _ = minhash_incremental(
                docs.withColumn("doc_id", F.col("doc_id") + 100),
                spark.table("bk_mh_idx"), max_bucket_size=None)
            hist = cand.where("vs = 'history'")
            plan = hist._jdf.queryExecution().executedPlan().toString()
            n_bb_exchanges = plan.count(
                "Exchange hashpartitioning(band")
            assert n_bb_exchanges == 1, plan[:2000]
            assert hist.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestNestedDefaults:
    def test_nested_struct_defaults(self, spark):
        from valico_spark.operators.validate import apply_defaults

        df = spark.createDataFrame(
            [(1, (None, 2)), (2, (5, None)), (3, None)],
            "id long, cfg struct<retries: int, timeout: int>")
        rs = {"properties": {
            "cfg": {"properties": {"retries": {"default": 3},
                                   "timeout": {"default": 30}}},
            "id": {"default": 0}}}
        out = {r["id"]: r["cfg"] for r in
               apply_defaults(df, rs).collect()}
        assert tuple(out[1]) == (3, 2)
        assert tuple(out[2]) == (5, 30)
        assert out[3] is None  # NULL parent stays NULL (walker's domain)


class TestPartitionPruning:
    def test_partitioned_layout_prunes_scan(self, spark, docs_df, tmp_path):
        """Hive-style partitionBy(lang) layout: a lang-filtered query's
        scan must show the predicate as a PartitionFilter (pruned at
        planning, zero IO for other partitions) — the disk analogue of
        the bucketed-join contract."""
        docs = docs_df.withColumn(
            "lang", F.coalesce(F.try_element_at(F.col("spans"), F.lit(1))["kind"], F.lit("none")))
        out = str(tmp_path / "by_lang")
        docs.write.mode("overwrite").partitionBy("lang").parquet(out)
        df = spark.read.parquet(out).where(F.col("lang") == "text")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "lang" in plan.split("PartitionFilters")[1][:120]


class TestSparkSubmitLaunch:
    def test_spark_submit_py_files_audit_run(self, tmp_path):
        """The literal launch contract: a REAL ``spark-submit
        --py-files valico_spark.zip`` subprocess runs a resumable audit
        end-to-end (fresh JVM, package imported from the zip)."""
        import json as _json
        import shutil
        import subprocess

        spark_submit = shutil.which("spark-submit") or \
            "/opt/spark/bin/spark-submit"
        if not os.path.exists(spark_submit):
            pytest.skip("no spark-submit on PATH")

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zip_base = str(tmp_path / "valico_spark")
        shutil.make_archive(zip_base, "zip", root_dir=root,
                            base_dir="valico_spark")
        ruleset = {"type": "object", "required": ["doc_id"],
                   "properties": {"n_chars": {"type": "integer",
                                              "minimum": 0}}}
        rs_path = tmp_path / "rules.json"
        rs_path.write_text(_json.dumps(ruleset))
        audit_dir = str(tmp_path / "audit")

        proc = subprocess.run(
            [spark_submit, "--master", "local[2]",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_base + ".zip",
             os.path.join(root, "valico_spark", "cli.py"),
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--ruleset", str(rs_path), "--audit-dir", audit_dir,
             "--run-id", "submit-smoke", "--buckets", "2"],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        summary = _json.loads(proc.stdout.strip().splitlines()[-1])
        assert summary["processed_buckets"] == 2
        assert summary["total_docs"] == 500
        # manifest is resumable state: a second launch processes nothing
        proc2 = subprocess.run(
            [spark_submit, "--master", "local[2]",
             "--conf", "spark.ui.enabled=false",
             "--py-files", zip_base + ".zip",
             os.path.join(root, "valico_spark", "cli.py"),
             "--input", "/root/testdata/sf0.001/documents.parquet",
             "--ruleset", str(rs_path), "--audit-dir", audit_dir,
             "--run-id", "submit-smoke", "--buckets", "2"],
            capture_output=True, text=True, timeout=300,
            env={**os.environ, "PYSPARK_PYTHON": sys.executable},
        )
        assert proc2.returncode == 0, proc2.stderr[-2000:]
        summary2 = _json.loads(proc2.stdout.strip().splitlines()[-1])
        assert summary2["processed_buckets"] == 0


class TestEmptyInputs:
    def test_every_driver_query_survives_empty_tables(self, spark,
                                                      tmp_path):
        """Zero-row versions of every driver table (the empty-partition
        / empty-source case at scale): every queries() entry must plan
        and execute to an empty (or schema-only) result, never raise.
        Caught two real ANN crashes (None dim probe, empty k-means
        sample) when first introduced."""
        import pyarrow.parquet as pq

        import __spark_entry__ as entrymod

        src = "/root/testdata/sf0.001"
        dst = str(tmp_path / "empty_sf")
        os.makedirs(dst)
        for name in ("region nation customer supplier part orders "
                     "lineitem events documents embeddings").split():
            schema = pq.ParquetFile(f"{src}/{name}.parquet").schema_arrow
            pq.write_table(schema.empty_table(),
                           f"{dst}/{name}.parquet")
        failures = []
        for name, fn in entrymod.queries().items():
            try:
                fn(spark, dst).count()
            except Exception as ex:  # noqa: BLE001 - collecting all
                failures.append((name, type(ex).__name__, str(ex)[:120]))
        assert not failures, failures

    def test_every_driver_query_survives_all_null_rows(self, spark,
                                                       tmp_path):
        """Rows present but every column NULL (failed upstream extract):
        queries must degrade to empty/zero results, never raise. Caught
        a numpy AxisError in IVF centroid sampling when introduced."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        import __spark_entry__ as entrymod

        src = "/root/testdata/sf0.001"
        dst = str(tmp_path / "null_sf")
        os.makedirs(dst)
        for name in ("region nation customer supplier part orders "
                     "lineitem events documents embeddings").split():
            schema = pq.ParquetFile(f"{src}/{name}.parquet").schema_arrow
            cols = {f.name: pa.array([None] * 20, f.type)
                    for f in schema}
            pq.write_table(pa.table(cols, schema=schema),
                           f"{dst}/{name}.parquet")
        failures = []
        for name, fn in entrymod.queries().items():
            try:
                fn(spark, dst).count()
            except Exception as ex:  # noqa: BLE001 - collecting all
                failures.append((name, type(ex).__name__, str(ex)[:120]))
        assert not failures, failures


def test_bench_scaling_worker_smoke(tmp_path):
    """The driver runs bench.py per round; a broken --scaling-worker
    surfaces only at round end otherwise. Tiny corpus, one level."""
    import json
    import os
    import subprocess
    import sys

    from valico_spark.sources.tables import fixture_dir

    fx = fixture_dir(n_docs=2000, seed=42)
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "bench.py"),
         "--scaling-worker", "local[2]",
         f"{fx}/docs.parquet", f"{fx}/media_assets.parquet"],
        capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["docs"] == 2000
    assert out["sec"] > 0 and out["sec_planning"] >= 0
