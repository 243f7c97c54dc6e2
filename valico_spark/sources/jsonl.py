"""JSON document sources.

The reference's only input is an in-memory JSON value (files read in its
tests via std::fs). The engine's equivalents:

* ``read_json_documents`` — JSON-lines files as raw document strings
  (``text`` source, one doc per line) — feeds the full-semantics Arrow
  validator (heterogeneous/dynamic documents);
* ``read_json_typed`` — schema-on-read via ``spark.read.json`` (or an
  explicit ``StructType``) — feeds the vectorized column compiler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json_documents(spark: SparkSession, path: str,
                        doc_col: str = "doc_json") -> DataFrame:
    """One row per line: (line_id, <doc_col>) — the dynamic-JSON path."""
    return (spark.read.text(path)
            .where(F.length(F.trim(F.col("value"))) > 0)
            .select(F.monotonically_increasing_id().alias("line_id"),
                    F.col("value").alias(doc_col)))


def read_csv_coerced(spark: SparkSession, path: str,
                     specs: dict[str, str],
                     header: bool = True) -> DataFrame:
    """CSV ingestion typed by the DSL coercion stage: every column reads
    as a raw string (no permissive Spark inference), then
    ``coerce_columns`` applies the reference's coercer grammars
    (json_dsl/coercers.rs — strict digit/float/boolean-literal parses)
    producing typed columns + ``coerce_violations`` rows. The DSL is the
    typing authority; malformed cells become NULL + an audit row instead
    of silently skewing an inferred schema."""
    from valico_spark.operators.dsl_process import coerce_columns

    raw = spark.read.option("header", str(header).lower()).csv(path)
    return coerce_columns(raw, specs)


def read_json_typed(spark: SparkSession, path: str,
                    schema: T.StructType | None = None) -> DataFrame:
    """Schema-on-read typed documents — the column-compiler path.

    Without an explicit schema Spark infers one (two passes at scale —
    pass ``schema`` in production)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def validate_json_file(spark: SparkSession, path: str, ruleset,
                       version: int = 7) -> DataFrame:
    """End-to-end: JSON-lines file → reference-semantics verdicts."""
    from valico_spark.operators.validate import validate_json_column

    docs = read_json_documents(spark, path)
    return validate_json_column(docs, "doc_json", ruleset, version=version)
