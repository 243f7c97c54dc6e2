"""Profile-driven schema inference: propose a draft-07 ruleset from a
DataFrame — the bootstrap step when a table arrives without one.

The inferred ruleset is a real compiler input (``compile_ruleset`` /
``validate_dataframe`` accept it unchanged), so the loop is: infer on a
trusted sample → review → enforce on the firehose. Inference is TWO
bounded aggregation passes, never a collect of data rows:

1. one combined ``agg`` over all columns — null counts, numeric
   min/max, approx distinct (HLL) for strings;
2. one ``collect_set`` pass ONLY for the string columns whose HLL
   estimate cleared the enum-candidate gate (bounded by
   ``enum_max * n_candidates`` values on the driver).

Types map from the Spark schema itself (LongType → "integer",
DoubleType → "number", nested structs/arrays recurse structurally);
``required`` lists columns observed fully non-null. Bounds widen by
``bound_slack`` so the suggestion does not instantly page on the next
day's data (a min observed on Monday is rarely a law).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _type_schema(dt: T.DataType) -> dict:
    if isinstance(dt, _INTEGRAL):
        return {"type": "integer"}
    if isinstance(dt, _NUMERIC):
        return {"type": "number"}
    if isinstance(dt, T.StringType):
        return {"type": "string"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _type_schema(dt.elementType)}
    if isinstance(dt, T.StructType):
        props = {f.name: _type_schema(f.dataType) for f in dt.fields}
        return {"type": "object", "properties": props}
    if isinstance(dt, T.MapType):
        return {"type": "object",
                "additionalProperties": _type_schema(dt.valueType)}
    return {}  # timestamps/binary/...: presence-typed only


def _q(name: str) -> str:
    """Backtick-quote a column name so dotted names ("user.id") resolve
    as top-level columns, not struct-field paths."""
    return "`" + name.replace("`", "``") + "`"


def infer_ruleset(df: DataFrame, enum_max: int = 16,
                  bound_slack: float = 0.0) -> dict[str, Any]:
    """Suggest a draft-07 object ruleset for ``df``'s rows."""
    fields = df.schema.fields
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        aggs.append(F.sum(F.when(F.col(_q(f.name)).isNull(), 1)
                           .otherwise(0)).alias(f"{f.name}__nulls"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.min(_q(f.name)).alias(f"{f.name}__min"))
            aggs.append(F.max(_q(f.name)).alias(f"{f.name}__max"))
        elif isinstance(f.dataType, T.StringType):
            aggs.append(F.approx_count_distinct(_q(f.name))
                         .alias(f"{f.name}__dv"))
    row = df.agg(*aggs).collect()[0].asDict()

    # enum pass only for gated candidates (HLL overcounts are fine:
    # the exact set is re-checked against enum_max after collection)
    candidates = [f.name for f in fields
                  if isinstance(f.dataType, T.StringType)
                  and row[f"{f.name}__dv"] <= enum_max * 2]
    enums: dict[str, list] = {}
    if candidates:
        sets = df.agg(*[F.collect_set(F.col(_q(c))).alias(c)
                        for c in candidates]).collect()[0].asDict()
        enums = {c: sorted(v) for c, v in sets.items()
                 if len(v) <= enum_max}

    props: dict[str, Any] = {}
    required: list[str] = []
    for f in fields:
        sub = _type_schema(f.dataType)
        if isinstance(f.dataType, _NUMERIC):
            lo, hi = row[f"{f.name}__min"], row[f"{f.name}__max"]
            if lo is not None and hi is not None:
                if isinstance(f.dataType, _INTEGRAL):
                    # pure int arithmetic: float() would round int64
                    # beyond 2^53 and could tighten past observed values
                    import math
                    span_i = math.ceil((hi - lo) * bound_slack)
                    sub["minimum"] = int(lo) - span_i
                    sub["maximum"] = int(hi) + span_i
                else:
                    span = (float(hi) - float(lo)) * bound_slack
                    sub["minimum"] = float(lo) - span
                    sub["maximum"] = float(hi) + span
        if f.name in enums and enums[f.name]:
            sub = {"enum": enums[f.name]
                   + ([None] if row[f"{f.name}__nulls"] else [])}
        if row[f"{f.name}__nulls"] == 0:
            required.append(f.name)
        props[f.name] = sub
    return {"type": "object", "properties": props, "required": required}
