"""Rule compiler: valico-style JSON Schema → vectorized Spark Column plan.

This is the engine's hot path. A ruleset (same JSON-Schema dialect the
reference validates, SURVEY.md §2) is compiled **once on the driver**
against the *typed* Spark schema of the audited table, producing a single
``Column`` expression that evaluates to ``array<struct<code,title,path,
detail,states>>`` per row — empty array ⇔ valid document. Everything is
built-in ``pyspark.sql.functions`` (whole-stage codegen, no Python in the
row loop); higher-order functions (``transform``/``filter``/``forall``/
``exists``/``aggregate``) handle array keywords.

Semantics contract: identical verdicts and ``(code, title, path, detail)``
rows to ``pyvalidator`` (the reference-parity oracle) for the supported
subset, property-tested in ``tests/test_column_parity.py``. The mapping of
valico's dynamic-JSON semantics onto typed columns:

* a SQL ``NULL`` is *absent* (JSON has explicit ``null``; Parquet/Iceberg
  typed columns do not distinguish null from missing) — ``required`` fires
  on NULL, value keywords skip NULL (valico's nonstrict skip,
  validators/mod.rs:24-33);
* ``type`` is checked statically against the Spark type where decidable
  (free at scan time); only integer-ness of float columns is a runtime
  check (``validators/type_.rs:23-27``);
* keywords valico skips on type mismatch compile to a static no-op when
  the column type can never match — same verdict, zero runtime cost.

Constructs that need the dynamic walker (``unevaluated*`` with
branch-dependent evaluated sets, recursive ``$ref``, heterogeneous JSON)
raise ``UnsupportedRule``; ``operators.validate`` then routes the document
to the Arrow-batched fallback stage instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valico_spark.compiler.errors import SCHEMA_TITLES
from valico_spark.compiler.pyvalidator import (
    DRAFT2019, DRAFT7, EPSILON, FINAL_KEYS, NON_SCHEMA_KEYS, PRIMITIVE_TYPES,
    PROPERTY_KEYS, end_anchor_pattern, is_number,
)

VIOLATION_DDL = ("array<struct<code:string,title:string,path:string,"
                 "detail:string,states:string>>")


class UnsupportedRule(Exception):
    """Raised when a schema construct needs the Arrow fallback path."""


def inline_id_with_refs(schema: Any) -> bool:
    """True when the document has BOTH a non-root schema-position ``$id``
    and any ``$ref`` — the combination where pointer inlining diverges
    from the reference's URL-based resolution (rebased refs resolve
    relative to the inline $id's subtree; keyword sub-schemas below it
    silently go missing).  Position-aware, mirroring compile_sub's
    schema/non-schema walk (schema.rs:388-485): ``$id`` as a property
    NAME is data, not an identifier."""
    state = {"id": False, "ref": False}

    def walk(node: Any, parent_key: str, is_schema: bool, is_root: bool):
        if state["id"] and state["ref"]:
            return
        if isinstance(node, dict):
            if is_schema:
                if not is_root and isinstance(node.get("$id"), str):
                    state["id"] = True
                if isinstance(node.get("$ref"), str):
                    state["ref"] = True
            for key, value in node.items():
                if not isinstance(value, (dict, list, bool)):
                    continue
                if parent_key not in PROPERTY_KEYS and key in FINAL_KEYS:
                    continue
                sub_is_schema = (parent_key in PROPERTY_KEYS
                                 or key not in NON_SCHEMA_KEYS)
                walk(value, key, sub_is_schema, False)
        elif isinstance(node, list):
            for value in node:
                if isinstance(value, (dict, list)):
                    walk(value, parent_key, True, False)

    walk(schema, "#", True, True)
    return state["id"] and state["ref"]


def empty_violations() -> Column:
    return F.array().cast(VIOLATION_DDL)


def make_violation(code: str, path: Column, detail: Column | None = None,
                   states: Column | None = None) -> Column:
    return F.struct(
        F.lit(code).alias("code"),
        F.lit(SCHEMA_TITLES[code]).alias("title"),
        path.alias("path"),
        (detail if detail is not None
         else F.lit(None).cast("string")).alias("detail"),
        (states if states is not None
         else F.lit(None).cast("string")).alias("states"),
    )


def unicode_pattern(p: str) -> str:
    """Java regex defaults \\d/\\w/\\s/\\b to ASCII; the reference's
    fancy_regex (and the walker's Python ``re``) are Unicode-first.
    (?U) = UNICODE_CHARACTER_CLASS aligns ``rlike`` with them (pinned by
    the pattern-unicode-classes conformance group). Applied only when a
    shorthand class actually appears — for every other pattern the flag
    is a semantic no-op and would only disturb the matcher's fast
    paths in the regex-heavy validate hot loop."""
    import re as _re

    p = end_anchor_pattern(p, "\\z")  # Java \z = end of input, like Rust $
    if _re.search(r"\\[dwsbDWSB]", p):
        return "(?U)" + p
    return p


def _maybe(cond: Column, violation: Column) -> Column:
    """Array with one violation when ``cond`` (guarded) else empty."""
    return F.when(cond, F.array(violation)).otherwise(empty_violations())


def _concat(arrays: list[Column]) -> Column:
    arrays = [a for a in arrays if a is not None]
    if not arrays:
        return empty_violations()
    if len(arrays) == 1:
        return arrays[0]
    return F.concat(*arrays)


def _states_json(sub_viols: list[Column]) -> Column:
    """The nested ``states`` payload of any_of/one_of errors, byte-equal
    to the walker's serde-shaped serialization (errors.rs:154-172;
    common/error.rs:88-121): a JSON array of the FAILING substates only,
    each ``{"errors": [...], "missing": []}``, error keys in
    code/title/path/detail/states order with absent (NULL) detail/states
    dropped — exactly ``to_json``'s struct rendering."""
    entries = [F.struct(sv.alias("errors"),
                        F.array().cast("array<string>").alias("missing"))
               for sv in sub_viols]
    failing = F.filter(F.array(*entries),
                       lambda s: F.size(s["errors"]) != 0)
    return F.to_json(failing)


@dataclass
class Target:
    """The value a subschema is applied to."""
    col: Column
    dtype: T.DataType | None   # None → dynamic (inside map values)
    path: Column               # JSON-pointer string column
    # NULL ≡ absent. Value keywords skip absent values; `required`
    # (evaluated by the parent) is the only keyword that reports them.

    def child(self, col: Column, dtype, path: Column) -> "Target":
        return Target(col=col, dtype=dtype, path=path)


def spark_json_types(dtype: T.DataType | None) -> set[str] | None:
    """JSON primitive types a Spark type can materialize. None = unknown."""
    if dtype is None:
        return None
    if isinstance(dtype, T.StringType):
        return {"string"}
    if isinstance(dtype, T.BooleanType):
        return {"boolean"}
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                          T.LongType)):
        return {"integer", "number"}
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"number", "integer"}  # integer iff whole (runtime)
    if isinstance(dtype, T.ArrayType):
        return {"array"}
    if isinstance(dtype, (T.StructType, T.MapType)):
        return {"object"}
    if isinstance(dtype, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return {"string"}  # serialized as ISO strings in the JSON view
    if isinstance(dtype, T.NullType):
        return set()
    raise UnsupportedRule(f"untyped/unsupported Spark type {dtype}")


def _is_float(dtype) -> bool:
    return isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType))


def _is_numeric(dtype) -> bool:
    return isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType,
                              T.LongType, T.FloatType, T.DoubleType,
                              T.DecimalType))


class ColumnCompiler:
    """Compiles one ruleset against one typed target.

    Mirrors the reference's compile-once / validate-many split
    (schema.rs:128 vs :567): compilation happens once on the driver, the
    emitted Column DAG is optimized by Catalyst and codegen'd.
    """

    def __init__(self, version: int = DRAFT7, root_schema: Any = None):
        self.version = version
        self.root_schema = root_schema  # for local $ref resolution

    # -- entry ----------------------------------------------------------
    def compile(self, schema: Any, target: Target) -> Column:
        """Return the violations-array Column for ``schema`` at ``target``."""
        if inline_id_with_refs(self.root_schema
                               if self.root_schema is not None else schema):
            # An inline (non-root) $id rebases ref resolution and, in
            # the reference, silently kills keyword sub-schemas below it
            # (the root-fragment-under-new-base missing quirk,
            # keywords/properties.rs:27-35 + scope.rs:236-257).  Pointer
            # inlining cannot reproduce that; the walker can.
            raise UnsupportedRule("inline $id together with $ref")
        return self._node(schema, target, depth=0)

    # -- $ref (compile-time inlining; SURVEY.md §2.4) --------------------
    _MAX_REF_DEPTH = 24

    def _resolve_ref(self, ref: str) -> Any:
        if not ref.startswith("#"):
            raise UnsupportedRule(f"external $ref {ref!r}")
        if ref == "#":
            return self.root_schema
        if not ref.startswith("#/"):
            raise UnsupportedRule(f"anchor $ref {ref!r}")
        node = self.root_schema
        for raw in ref[2:].split("/"):
            key = raw.replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict) and key in node:
                node = node[key]
            elif isinstance(node, list) and key.isdigit():
                node = node[int(key)]
            else:
                raise UnsupportedRule(f"unresolvable $ref {ref!r}")
        return node

    # -- node ------------------------------------------------------------
    def _node(self, schema: Any, target: Target, depth: int) -> Column:
        if depth > self._MAX_REF_DEPTH:
            raise UnsupportedRule("recursive $ref beyond inlining depth")
        if schema is True:
            schema = {}
        elif schema is False:
            schema = {"not": {}}
        if not isinstance(schema, dict):
            raise UnsupportedRule("schema must be an object or boolean")

        if "$ref" in schema and self.version < DRAFT2019:
            # exclusive pre-2019-09: $ref replaces all siblings
            # (schema.rs:344-362)
            return self._node(self._resolve_ref(schema["$ref"]), target,
                              depth + 1)

        s, t = schema, target
        d = depth
        # emit parts in the walker's validator linearization so nested
        # states payloads (any_of/one_of) are byte-equal
        handlers = {
            "$ref": lambda: self._node(self._resolve_ref(s["$ref"]), t,
                                       d + 1),
            "type": lambda: self._type(s["type"], t),
            "enum": lambda: self._enum(s["enum"], t),
            "const": lambda: self._const(s["const"], t),
            "minimum": lambda: self._bound(s["minimum"], "min", t),
            "maximum": lambda: self._bound(s["maximum"], "max", t),
            "exclusiveMinimum": lambda: self._bound(
                s["exclusiveMinimum"], "emin", t),
            "exclusiveMaximum": lambda: self._bound(
                s["exclusiveMaximum"], "emax", t),
            "multipleOf": lambda: self._multiple_of(s["multipleOf"], t),
            "minLength": lambda: self._length(s["minLength"], False, t),
            "maxLength": lambda: self._length(s["maxLength"], True, t),
            "pattern": lambda: self._pattern(s["pattern"], t),
            "format": lambda: self._format(s["format"], t),
            "required": lambda: self._required(s["required"], t),
            "properties": lambda: self._properties(s, t, d),
            "propertyNames": lambda: self._property_names(
                s["propertyNames"], t, d),
            "minProperties": lambda: self._props_count(
                s["minProperties"], False, t),
            "maxProperties": lambda: self._props_count(
                s["maxProperties"], True, t),
            "dependencies": lambda: self._dependencies(s, t, d),
            "items": lambda: self._items(s, t, d),
            "minItems": lambda: self._items_count(s["minItems"], False, t),
            "maxItems": lambda: self._items_count(s["maxItems"], True, t),
            "uniqueItems": lambda: (self._unique_items(t)
                                    if s["uniqueItems"] is True else None),
            "contains": lambda: (self._contains(s, t, d)
                                 if "contains" in s else None),
            "allOf": lambda: self._all_of(s["allOf"], t, d),
            "anyOf": lambda: self._any_of(s["anyOf"], t, d),
            "oneOf": lambda: self._one_of(s["oneOf"], t, d),
            "not": lambda: self._not(s["not"], t, d),
            "if": lambda: (self._conditional(s, t, d)
                           if "if" in s else None),
            "unevaluatedProperties": lambda: (
                self._unevaluated_properties(s, t, d)
                if self.version >= DRAFT2019 else None),
            "unevaluatedItems": lambda: (
                self._unevaluated_items(s, t, d)
                if self.version >= DRAFT2019 else None),
            "contentMediaType": lambda: self._content_media(s, t),
        }
        from valico_spark.compiler.pyvalidator import keyword_dispatch_order

        parts: list[Column] = []
        for canon in keyword_dispatch_order(s, self.version):
            h = handlers.get(canon)
            if h is None:
                continue
            part = h()
            if part is not None:
                parts.append(part)
        return _concat(parts)

    # -- unevaluatedProperties (2019-09) ----------------------------------
    # SURVEY.md §7 hard-part 1: valico's `evaluated` set is dynamic —
    # properties mark a key evaluated only when that key's subschema
    # PASSED (validators/properties.rs:52-56), anyOf merges the sets of
    # valid branches, oneOf takes the single valid branch, if/then/else
    # merge conditionally. For typed struct targets the key space is
    # static, so the whole set compiles to one boolean column per key.

    def _evaluated_keys(self, s: dict, t: Target,
                        depth: int) -> dict[str, Column]:
        """Per-field 'evaluated' boolean columns mirroring
        validators/mod.rs evaluated-set semantics for a StructType target."""
        import re as _re

        if not isinstance(t.dtype, T.StructType):
            raise UnsupportedRule("evaluated-set analysis needs a struct")
        fields = {f.name: f for f in t.dtype.fields}
        ev: dict[str, Column] = {}

        def mark(key: str, cond: Column) -> None:
            ev[key] = (ev[key] | cond) if key in ev else cond

        def present(key: str) -> Column:
            return t.col.isNotNull() & t.col.getField(key).isNotNull()

        def child(key: str) -> Target:
            return t.child(t.col.getField(key), fields[key].dataType,
                           F.concat(t.path, F.lit("/" + key)))

        def branch_ev_and_valid(sub) -> tuple[dict[str, Column], Column]:
            sub_n = {"not": {}} if sub is False else ({} if sub is True
                                                      else sub)
            if not isinstance(sub_n, dict):
                raise UnsupportedRule("schema must be object/boolean")
            valid = F.size(self._node(sub_n, t, depth + 1)) == 0
            return self._evaluated_keys(sub_n, t, depth + 1), valid

        if "$ref" in s:
            ref_ev = self._evaluated_keys(
                self._resolve_ref(s["$ref"]), t, depth + 1)
            for k, c in ref_ev.items():
                mark(k, c)
            if self.version < DRAFT2019:
                return ev

        props = s.get("properties", {})
        patterns = s.get("patternProperties", {})
        additional = s.get("additionalProperties")
        for key in fields:
            matched = False
            if key in props:
                matched = True
                sub_viol = self._node(props[key], child(key), depth + 1)
                mark(key, present(key) & (F.size(sub_viol) == 0))
            for pat, psub in patterns.items():
                if _re.search(pat, key):
                    matched = True
                    sub_viol = self._node(psub, child(key), depth + 1)
                    mark(key, present(key) & (F.size(sub_viol) == 0))
            if not matched and additional is not None:
                if additional is True:
                    mark(key, present(key))  # properties.rs:106-108
                elif additional is False:
                    pass  # forbidden, never evaluated
                else:
                    sub_viol = self._node(additional, child(key), depth + 1)
                    mark(key, present(key) & (F.size(sub_viol) == 0))

        for sub in s.get("allOf", []):
            # allOf appends every branch state (of.rs:36-42): evaluated
            # flags merge regardless of branch validity (the flags are
            # already per-key success-conditioned)
            for k, c in branch_ev_and_valid(sub)[0].items():
                mark(k, c)

        if "anyOf" in s:
            for sub in s["anyOf"]:
                bev, bvalid = branch_ev_and_valid(sub)
                for k, c in bev.items():
                    mark(k, bvalid & c)

        if "oneOf" in s:
            branches = [branch_ev_and_valid(sub) for sub in s["oneOf"]]
            count = None
            for _, v in branches:
                x = F.when(v, 1).otherwise(0)
                count = x if count is None else (count + x)
            exactly_one = count == 1
            for bev, bvalid in branches:
                for k, c in bev.items():
                    mark(k, exactly_one & bvalid & c)

        if "if" in s:
            iev, ivalid = branch_ev_and_valid(s["if"])
            for k, c in iev.items():
                mark(k, ivalid & c)  # conditional.rs:31
            if "then" in s:
                tev, _ = branch_ev_and_valid(s["then"])
                for k, c in tev.items():
                    mark(k, ivalid & c)
            if "else" in s:
                eev, _ = branch_ev_and_valid(s["else"])
                for k, c in eev.items():
                    mark(k, ~ivalid & c)

        if "dependentSchemas" in s or "dependencies" in s:
            deps = dict(s.get("dependencies", {}))
            deps.update(s.get("dependentSchemas", {}))
            for trig, dsub in deps.items():
                if isinstance(dsub, (dict, bool)):
                    trig_present = (present(trig) if trig in fields
                                    else F.lit(False))
                    bev, _ = branch_ev_and_valid(dsub)
                    for k, c in bev.items():
                        mark(k, trig_present & c)

        if "unevaluatedProperties" in s:
            # a branch's own unevaluatedProperties ANNOTATES: its
            # per-entry check adds each passing entry to `evaluated`
            # (UnevaluatedV._check_one); allOf merges unconditionally
            # (of.rs:44), anyOf/oneOf gating happens at the combinator
            # marks above — so: evaluated(rest) OR entry-passes-uev
            uev = s["unevaluatedProperties"]
            if uev is True:
                for key in fields:
                    mark(key, present(key))
            elif uev is not False:
                for key in fields:
                    sub_viol = self._node(uev, child(key), depth + 1)
                    mark(key, present(key) & (F.size(sub_viol) == 0))
        return ev

    def _evaluated_items(self, s: dict, t: Target,
                         depth: int) -> Column:
        """array<boolean> aligned with the target array: element i
        evaluated? Mirrors validators/items.rs evaluated insertions
        (success-conditioned) and the combinator merge rules. valico's
        ``contains`` does NOT mark evaluated (validators/contains.rs)."""
        if not isinstance(t.dtype, T.ArrayType):
            raise UnsupportedRule("evaluated-items needs an array target")
        etype = t.dtype.elementType
        false_arr = F.transform(t.col, lambda x: F.lit(False))

        def merge(a: Column, b: Column) -> Column:
            return F.zip_with(a, b, lambda x, y: x | y)

        def gate(arr: Column, cond: Column) -> Column:
            return F.transform(arr, lambda x: cond & x)

        if "unevaluatedItems" in s:
            # annotation rule (see _evaluated_keys): per-item uev
            # success marks the item evaluated for the parent
            uev = s["unevaluatedItems"]
            if uev is True:
                return F.transform(t.col, lambda x: F.lit(True))
            rest_s = {k: v for k, v in s.items() if k != "unevaluatedItems"}
            ev_rest = self._evaluated_items(rest_s, t, depth)
            if uev is False:
                return ev_rest
            return merge(ev_rest, F.transform(
                t.col,
                lambda x: F.size(self._node(uev, Target(x, etype,
                                                        F.lit("")),
                                            depth + 1)) == 0))

        ev = false_arr

        items = s.get("items")
        additional = s.get("additionalItems")
        if isinstance(items, (dict, bool)):
            ev = merge(ev, F.transform(
                t.col,
                lambda x: F.size(self._node(items, Target(x, etype,
                                                          F.lit("")),
                                            depth + 1)) == 0))
        elif isinstance(items, list):
            def positional(x: Column, i: Column) -> Column:
                out = F.lit(False)
                for idx, sub in enumerate(items):
                    valid = F.size(self._node(sub, Target(x, etype,
                                                          F.lit("")),
                                              depth + 1)) == 0
                    out = F.when(i == idx, valid).otherwise(out)
                if additional is True:
                    out = F.when(i >= len(items), F.lit(True)) \
                        .otherwise(out)  # items.rs:118-123
                elif isinstance(additional, dict):
                    valid = F.size(self._node(additional,
                                              Target(x, etype, F.lit("")),
                                              depth + 1)) == 0
                    out = F.when(i >= len(items), valid).otherwise(out)
                return out
            ev = merge(ev, F.transform(t.col, positional))

        def branch(sub) -> tuple[Column, Column]:
            sub_n = {"not": {}} if sub is False else ({} if sub is True
                                                      else sub)
            if not isinstance(sub_n, dict):
                raise UnsupportedRule("schema must be object/boolean")
            valid = F.size(self._node(sub_n, t, depth + 1)) == 0
            return self._evaluated_items(sub_n, t, depth + 1), valid

        for sub in s.get("allOf", []):
            bev, _ = branch(sub)
            ev = merge(ev, bev)
        if "anyOf" in s:
            for sub in s["anyOf"]:
                bev, bvalid = branch(sub)
                ev = merge(ev, gate(bev, bvalid))
        if "oneOf" in s:
            branches = [branch(sub) for sub in s["oneOf"]]
            count = None
            for _, v in branches:
                x = F.when(v, 1).otherwise(0)
                count = x if count is None else (count + x)
            exactly_one = count == 1
            for bev, bvalid in branches:
                ev = merge(ev, gate(bev, exactly_one & bvalid))
        if "if" in s:
            iev, ivalid = branch(s["if"])
            ev = merge(ev, gate(iev, ivalid))
            if "then" in s:
                tev, _ = branch(s["then"])
                ev = merge(ev, gate(tev, ivalid))
            if "else" in s:
                eev, _ = branch(s["else"])
                ev = merge(ev, gate(eev, ~ivalid))
        if "$ref" in s:
            rev = self._evaluated_items(self._resolve_ref(s["$ref"]), t,
                                        depth + 1)
            ev = merge(ev, rev)
        return ev

    def _unevaluated_items(self, s: dict, t: Target, depth: int) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("unevaluatedItems on untyped target")
            return empty_violations()
        spec = s["unevaluatedItems"]
        rest = {k: v for k, v in s.items() if k != "unevaluatedItems"}
        ev = self._evaluated_items(rest, t, depth)
        etype = t.dtype.elementType
        idx_ev = F.zip_with(
            t.col, ev, lambda x, e: F.struct(x.alias("x"), e.alias("e")))

        if spec is True:
            return empty_violations()
        if spec is False:
            def emit(pair: Column, i: Column) -> Column:
                return F.when(~pair["e"], F.array(make_violation(
                    "unevaluated",
                    F.concat(t.path, F.lit("/"), i.cast("string")),
                    F.lit("Unevaluated items are not allowed")))
                ).otherwise(empty_violations())
        else:
            def emit(pair: Column, i: Column) -> Column:
                child = Target(pair["x"], etype,
                               F.concat(t.path, F.lit("/"),
                                        i.cast("string")))
                return F.when(~pair["e"],
                              self._node(spec, child, depth + 1)
                              ).otherwise(empty_violations())
        return F.when(t.col.isNotNull(),
                      F.flatten(F.transform(idx_ev, emit))
                      ).otherwise(empty_violations())

    def _entry_evaluated(self, s: dict, t: Target, depth: int,
                         key: Column, val: Column) -> Column:
        """Runtime 'is this map entry evaluated?' boolean — the open-map
        analogue of ``_evaluated_keys`` (keys are dynamic, so property
        matching happens per entry: equality for ``properties``, rlike
        for ``patternProperties``), with the same success-conditioned
        marking and combinator merge rules as the walker's evaluated-set
        semantics (validators/properties.rs:52-56, of.rs:94-110)."""
        if not isinstance(s, dict):
            s = {} if s is True else {"not": {}}
        vtype = t.dtype.valueType

        def sub_ok(sub) -> Column:
            child = Target(val, vtype, F.lit(""))
            return F.size(self._node(sub, child, depth + 1)) == 0

        def branch_valid(sub) -> Column:
            return F.size(self._node(sub, t, depth + 1)) == 0

        if "unevaluatedProperties" in s:
            # annotation rule (see _evaluated_keys): per-entry uev
            # success marks the entry evaluated for the parent
            uev = s["unevaluatedProperties"]
            if uev is True:
                return F.lit(True)
            rest = {k: v for k, v in s.items()
                    if k != "unevaluatedProperties"}
            base = self._entry_evaluated(rest, t, depth, key, val)
            if uev is False:
                return base
            return base | sub_ok(uev)

        conds: list[Column] = []
        if "$ref" in s:
            conds.append(self._entry_evaluated(
                self._resolve_ref(s["$ref"]), t, depth + 1, key, val))
            if self.version < DRAFT2019:
                return conds[0]
        props = s.get("properties", {})
        patterns = s.get("patternProperties", {})
        additional = s.get("additionalProperties")
        for k, sub in props.items():
            conds.append((key == F.lit(k)) & sub_ok(sub))
        for pat, psub in patterns.items():
            conds.append(key.rlike(unicode_pattern(pat)) & sub_ok(psub))
        if additional is not None:
            is_known = F.lit(False)
            if props:
                is_known = is_known | key.isin(list(props))
            for pat in patterns:
                is_known = is_known | key.rlike(unicode_pattern(pat))
            if additional is True:
                conds.append(~is_known)
            elif additional is not False:
                conds.append(~is_known & sub_ok(additional))
        for sub in s.get("allOf", []):
            conds.append(self._entry_evaluated(sub, t, depth + 1,
                                               key, val))
        for sub in s.get("anyOf", []):
            conds.append(branch_valid(sub)
                         & self._entry_evaluated(sub, t, depth + 1,
                                                 key, val))
        if "oneOf" in s:
            count = None
            for sub in s["oneOf"]:
                x = F.when(branch_valid(sub), 1).otherwise(0)
                count = x if count is None else (count + x)
            for sub in s["oneOf"]:
                conds.append((count == 1) & branch_valid(sub)
                             & self._entry_evaluated(sub, t, depth + 1,
                                                     key, val))
        if "if" in s:
            ivalid = branch_valid(s["if"])
            conds.append(ivalid & self._entry_evaluated(
                s["if"], t, depth + 1, key, val))
            if "then" in s:
                conds.append(ivalid & self._entry_evaluated(
                    s["then"], t, depth + 1, key, val))
            if "else" in s:
                conds.append(~ivalid & self._entry_evaluated(
                    s["else"], t, depth + 1, key, val))
        deps = dict(s.get("dependencies", {}))
        deps.update(s.get("dependentSchemas", {}))
        for trig, dsub in deps.items():
            if isinstance(dsub, (dict, bool)):
                trig_present = F.map_contains_key(t.col, F.lit(trig))
                conds.append(trig_present & self._entry_evaluated(
                    dsub, t, depth + 1, key, val))
        out = F.lit(False)
        for c in conds:
            out = out | c
        return out

    def _unevaluated_properties_map(self, s: dict, t: Target,
                                    depth: int) -> Column:
        spec = s["unevaluatedProperties"]
        if spec is True:
            return empty_violations()
        rest = {k: v for k, v in s.items()
                if k != "unevaluatedProperties"}
        vtype = t.dtype.valueType

        def emit(e: Column) -> Column:
            ev = self._entry_evaluated(rest, t, depth, e["key"], e["value"])
            path = F.concat(t.path, F.lit("/"), e["key"])
            if spec is False:
                return F.when(~ev, F.array(make_violation(
                    "unevaluated", path,
                    F.lit("Unevaluated properties are not allowed")))
                ).otherwise(empty_violations())
            child = Target(e["value"], vtype, path)
            return F.when(~ev, self._node(spec, child, depth + 1)) \
                    .otherwise(empty_violations())

        return F.when(
            t.col.isNotNull(),
            F.flatten(F.transform(F.map_entries(t.col), lambda e: emit(e)))
        ).otherwise(empty_violations())

    def _unevaluated_properties(self, s: dict, t: Target,
                                depth: int) -> Column:
        if not isinstance(t.dtype, T.StructType):
            if t.dtype is None:
                raise UnsupportedRule("unevaluatedProperties on untyped")
            if isinstance(t.dtype, T.MapType):
                return self._unevaluated_properties_map(s, t, depth)
            return empty_violations()
        spec = s["unevaluatedProperties"]
        rest = {k: v for k, v in s.items() if k != "unevaluatedProperties"}
        ev = self._evaluated_keys(rest, t, depth)
        parts = []
        for f_ in t.dtype.fields:
            key = f_.name
            present = t.col.isNotNull() & t.col.getField(key).isNotNull()
            unevaluated = present & ~ev.get(key, F.lit(False))
            if spec is False:
                parts.append(_maybe(unevaluated, make_violation(
                    "unevaluated", F.concat(t.path, F.lit("/" + key)),
                    F.lit("Unevaluated properties are not allowed"))))
            elif spec is True:
                continue
            else:
                child = t.child(t.col.getField(key), f_.dataType,
                                F.concat(t.path, F.lit("/" + key)))
                sub_viol = self._node(spec, child, depth + 1)
                parts.append(F.when(unevaluated, sub_viol)
                              .otherwise(empty_violations()))
        return _concat(parts)

    # -- keyword emitters -------------------------------------------------
    def _type(self, ty: Any, t: Target) -> Column:
        types = [ty] if isinstance(ty, str) else list(ty)
        for x in types:
            if x not in PRIMITIVE_TYPES:
                raise UnsupportedRule(f"unknown type {x!r}")
        if isinstance(ty, str):
            detail = F.lit(f"The value must be {ty}")
        else:
            detail = F.lit("The value must be any of: " + ", ".join(types))
        possible = spark_json_types(t.dtype)
        if possible is None:
            raise UnsupportedRule("dynamic type check on untyped target")
        # "null" in the requested set: absent/NULL passes anyway (we skip
        # on NULL), so it adds nothing beyond the skip guard.
        sat = possible & set(types)
        if sat == possible and not (
                _is_float(t.dtype) and "integer" in types
                and "number" not in types):
            return empty_violations()  # statically satisfied
        if not sat:
            # can never match → violation whenever present
            return _maybe(t.col.isNotNull(),
                          make_violation("wrong_type", t.path, detail))
        if _is_float(t.dtype) and "integer" in types and "number" not in types:
            # runtime whole-float check (type_.rs:23-27)
            bad = t.col.isNotNull() & ~(t.col == F.floor(t.col))
            return _maybe(bad, make_violation("wrong_type", t.path, detail))
        return empty_violations()

    def _match_value(self, value: Any, col: Column, dtype,
                     top_level: bool) -> Column | None:
        """Boolean column: does ``col`` (of ``dtype``) equal ``value``
        under the reference's matcher (helpers.rs:137-145)?
        Top-level numbers compare through f64; NESTED numbers are strict
        serde equality (int vs float are distinct Number variants — an
        int constant can never equal a value held by a float column and
        vice versa). Returns None when the match is statically impossible.
        """
        if value is None:
            # JSON null ≡ absent in typed mode; a present value never
            # matches the null constant
            return None
        if isinstance(value, bool):
            if isinstance(dtype, T.BooleanType):
                return col == F.lit(value)
            return None
        if is_number(value):
            if not _is_numeric(dtype):
                return None
            if top_level:
                return col.cast("double") == F.lit(float(value))
            # strict: type classes must match
            if isinstance(value, float) != _is_float(dtype):
                return None
            return col == F.lit(value)
        if isinstance(value, str):
            if isinstance(dtype, T.StringType):
                return col == F.lit(value)
            return None
        if isinstance(value, list):
            if not isinstance(dtype, T.ArrayType):
                return None
            et = dtype.elementType
            if len(value) == 0:
                return F.size(col) == 0
            elem_preds = []
            for i, v in enumerate(value):
                m = self._match_value(v, F.try_element_at(col, F.lit(i + 1)), et,
                                      top_level=False)
                if m is None and v is not None:
                    return None  # some element can never match
                if v is None:
                    m = F.try_element_at(col, F.lit(i + 1)).isNull()
                elem_preds.append(m)
            out = F.size(col) == len(value)
            for m in elem_preds:
                out = out & F.coalesce(m, F.lit(False))
            return out
        if isinstance(value, dict):
            if not isinstance(dtype, T.StructType):
                return None
            fields = {f.name: f for f in dtype.fields}
            if any(k not in fields for k in value):
                return None  # const has a key the row type can't hold
            preds = []
            for f_ in dtype.fields:
                c = col.getField(f_.name)
                if f_.name in value:
                    m = self._match_value(value[f_.name], c, f_.dataType,
                                          top_level=False)
                    if m is None:
                        return None
                    preds.append(F.coalesce(m, F.lit(False)))
                else:
                    preds.append(c.isNull())  # NULL ≡ absent
            out = col.isNotNull()
            for m in preds:
                out = out & m
            return out
        raise UnsupportedRule(f"unsupported const value {value!r}")

    def _enum(self, values: list, t: Target) -> Column:
        if not isinstance(values, list) or not values:
            raise UnsupportedRule("enum must be a non-empty array")
        if t.dtype is None:
            raise UnsupportedRule("enum on untyped target")
        ok = None
        for v in values:
            m = self._match_value(v, t.col, t.dtype, top_level=True)
            if m is not None:
                ok = m if ok is None else (ok | m)
        if ok is None:  # nothing can ever match
            return _maybe(t.col.isNotNull(), make_violation("enum", t.path))
        return _maybe(t.col.isNotNull() & ~ok,
                      make_violation("enum", t.path))

    def _const(self, value: Any, t: Target) -> Column:
        if t.dtype is None:
            raise UnsupportedRule("const on untyped target")
        m = self._match_value(value, t.col, t.dtype, top_level=True)
        if m is None:
            return _maybe(t.col.isNotNull(), make_violation("const", t.path))
        return _maybe(t.col.isNotNull() & ~m,
                      make_violation("const", t.path))

    def _bound(self, m: Any, op: str, t: Target) -> Column:
        if not is_number(m):
            raise UnsupportedRule("bound must be a number")
        if not _is_numeric(t.dtype) and t.dtype is not None:
            return empty_violations()  # nonstrict skip, statically
        c = t.col.cast("double")
        ok = {"min": c >= F.lit(float(m)), "emin": c > F.lit(float(m)),
              "max": c <= F.lit(float(m)), "emax": c < F.lit(float(m))}[op]
        code = "maximum" if op in ("max", "emax") else "minimum"
        return _maybe(t.col.isNotNull() & ~ok, make_violation(code, t.path))

    def _multiple_of(self, k: Any, t: Target) -> Column:
        if not is_number(k) or float(k) <= 0:
            raise UnsupportedRule("multipleOf must be > 0")
        if not _is_numeric(t.dtype) and t.dtype is not None:
            return empty_violations()
        k = float(k)
        c = t.col.cast("double")
        if not _is_float(t.dtype) and k == math.floor(k):
            ok = (t.col % F.lit(int(k))) == 0
        elif k == math.floor(k):
            # value may be fractional: integral branch applies only when
            # value.fract()==0 (multiple_of.rs:22-24)
            whole = c == F.floor(c)
            rem = (c / F.lit(k)) % F.lit(1.0)
            float_ok = ((F.isnan(rem) | (rem < F.lit(EPSILON)))
                        & (rem < F.lit(1.0 - EPSILON)))
            ok = F.when(whole, (c % F.lit(k)) == 0).otherwise(float_ok)
        else:
            rem = (c / F.lit(k)) % F.lit(1.0)
            ok = ((F.isnan(rem) | (rem < F.lit(EPSILON)))
                  & (rem < F.lit(1.0 - EPSILON)))
        return _maybe(t.col.isNotNull() & ~ok,
                      make_violation("multiple_of", t.path))

    def _length(self, n: Any, is_max: bool, t: Target) -> Column:
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return empty_violations()
        # F.length = UTF8String.numChars = Unicode code points — exact
        # parity with chars().count() (maxmin_length.rs:21,46), including
        # supplementary-plane characters.
        ln = F.length(t.col)
        ok = ln <= F.lit(int(n)) if is_max else ln >= F.lit(int(n))
        return _maybe(t.col.isNotNull() & ~ok, make_violation(
            "max_length" if is_max else "min_length", t.path))

    def _pattern(self, p: Any, t: Target) -> Column:
        if not isinstance(p, str):
            raise UnsupportedRule("pattern must be a string")
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return empty_violations()
        ok = t.col.rlike(unicode_pattern(p))  # unanchored, like find()
        return _maybe(t.col.isNotNull() & ~ok,
                      make_violation("pattern", t.path))

    # regex approximations for the JVM-side format fast path; semantics
    # pinned against pyvalidator in tests (exotic formats → fallback).
    _FORMAT_REGEX = {
        "date": r"^\d{4}-\d{2}-\d{2}$",
        "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?$",
        "date-time": (r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?"
                      r"([Zz]|[+-]\d{2}:\d{2})$"),
        "ipv4": (r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
                 r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"),
        "uuid": (r"^(urn:uuid:)?(\{)?([0-9a-fA-F]{8}-[0-9a-fA-F]{4}-"
                 r"[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
                 r"|[0-9a-fA-F]{32})(\})?$"),
        "json-pointer": r"^(/([^/~]|~[01])*)*$",
        "relative-json-pointer": r"^(/([^/~]|~[01])*)*$",
        "uri": r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$",
        # local part is dot-atom (no leading/trailing/double dots), <=64
        # chars enforced by the lookahead (Java regex, rlike)
        "email": (r"^(?=[^@]{1,64}@)"
                  r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+"
                  r"(\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*@"
                  r"([A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+"
                  r"[A-Za-z]{2,}$"),
        "hostname": (r"^([A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?\.)+"
                     r"[A-Za-z]{2,}$"),
    }
    _FORMAT_DETAILS = {
        "date": "Malformed date", "time": "Malformed time",
        "date-time": "Malformed date time",
        "ipv4": "Malformed IP address",
        "uuid": "Malformed UUID: invalid format",
        "json-pointer": "Malformed JSON pointer",
        "relative-json-pointer": "Malformed relative JSON pointer",
        "uri": "Malformed URI: invalid", "email": "Malformed email address",
        "hostname": "Malformed hostname",
    }

    @classmethod
    def format_ok_expr(cls, name: str, sv: Column) -> Column | None:
        """Shared format predicate over a string Column (walker-exact);
        ``None`` when the name is unknown (ignored, format.rs:172-175)
        or can never fail (uri-template, formats.rs:380-396).
        Raises UnsupportedRule for Arrow-fallback-only formats."""
        if name in ("uri-template",):
            return None
        regex = cls._FORMAT_REGEX.get(name)
        if regex is None:
            if name in ("ipv6", "iri", "uri-reference", "iri-reference",
                        "regex", "idn-email", "idn-hostname"):
                raise UnsupportedRule(f"format {name!r} needs Arrow fallback")
            return None
        ok = sv.rlike(regex)
        # date: reject impossible month/day values the regex admits
        # (try_to_date: NULL instead of an ANSI parse exception)
        if name == "date":
            ok = ok & F.try_to_date(sv, "yyyy-MM-dd").isNotNull()
        if name == "time":
            ok = ok & (F.substring(sv, 1, 2).cast("int") <= 23) \
                    & (F.substring(sv, 4, 2).cast("int") <= 59) \
                    & (F.substring(sv, 7, 2).cast("int") <= 60)
        if name == "date-time":
            # mirror check_date_time: real calendar date, field ranges
            # (leap-second 60 allowed), offset within +/-23:59
            off_h = F.regexp_extract(sv, r"([+-]\d{2}):\d{2}$", 1)
            off_m = F.regexp_extract(sv, r"[+-]\d{2}:(\d{2})$", 1)
            ok = ok \
                & F.try_to_date(F.substring(sv, 1, 10),
                                "yyyy-MM-dd").isNotNull() \
                & (F.substring(sv, 12, 2).cast("int") <= 23) \
                & (F.substring(sv, 15, 2).cast("int") <= 59) \
                & (F.substring(sv, 18, 2).cast("int") <= 60) \
                & ((off_h == "") | (F.abs(off_h.cast("int")) <= 23)) \
                & ((off_m == "") | (off_m.cast("int") <= 59))
        return ok

    def _format(self, name: Any, t: Target) -> Column:
        if not isinstance(name, str):
            raise UnsupportedRule("format must be a string")
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return empty_violations()
        ok = self.format_ok_expr(name, t.col)
        if ok is None:
            return empty_violations()
        return _maybe(t.col.isNotNull() & ~ok, make_violation(
            "format", t.path, F.lit(self._FORMAT_DETAILS[name])))

    def _required(self, keys: Any, t: Target) -> Column:
        if not isinstance(keys, list):
            raise UnsupportedRule("required must be an array")
        if isinstance(t.dtype, T.StructType):
            fields = {f.name for f in t.dtype.fields}
            parts = []
            for k in keys:
                present = (t.col.getField(k).isNotNull() if k in fields
                           else F.lit(False))
                parts.append(_maybe(
                    t.col.isNotNull() & ~present,
                    make_violation("required",
                                   F.concat(t.path, F.lit("/" + k)))))
            return _concat(parts)
        if isinstance(t.dtype, T.MapType):
            parts = []
            for k in keys:
                present = F.map_contains_key(t.col, F.lit(k))
                parts.append(_maybe(
                    t.col.isNotNull() & ~present,
                    make_violation("required",
                                   F.concat(t.path, F.lit("/" + k)))))
            return _concat(parts)
        if t.dtype is None:
            raise UnsupportedRule("required on untyped target")
        return empty_violations()  # non-object target → skip

    def _properties(self, s: dict, t: Target, depth: int) -> Column:
        props = s.get("properties", {})
        additional = s.get("additionalProperties")
        patterns = s.get("patternProperties")
        if isinstance(t.dtype, T.StructType):
            if patterns:
                raise UnsupportedRule(
                    "patternProperties on struct targets (closed schema)")
            # iterate FIELD order — the document key order of the
            # serialized row (properties.rs:47 walks the object's keys),
            # so states payloads are byte-equal to the walker's
            parts = []
            for f_ in t.dtype.fields:
                key = f_.name
                child = t.child(t.col.getField(key), f_.dataType,
                                F.concat(t.path, F.lit("/" + key)))
                present = t.col.isNotNull() & child.col.isNotNull()
                if key in props:
                    # valico validates a property only when the key
                    # exists (properties.rs:47-67): NULL ≡ absent, so
                    # the whole subschema — including combinators like
                    # `not` that would otherwise fire on a vacuously-
                    # skipped value — is gated on child presence
                    parts.append(F.when(
                        present, self._node(props[key], child, depth + 1)
                    ).otherwise(empty_violations()))
                elif additional is False:
                    parts.append(_maybe(
                        present,
                        make_violation(
                            "properties", t.path,
                            F.lit(f"Additional property '{key}'"
                                  " is not allowed"))))
                elif isinstance(additional, dict):
                    parts.append(F.when(
                        present,
                        self._node(additional, child, depth + 1)
                    ).otherwise(empty_violations()))
            return _concat(parts)
        if isinstance(t.dtype, T.MapType):
            return self._properties_map(s, t, depth)
        if t.dtype is None:
            raise UnsupportedRule("properties on untyped target")
        return empty_violations()  # non-object → skip

    def _properties_map(self, s: dict, t: Target, depth: int) -> Column:
        """properties/patternProperties/additionalProperties over
        MapType(string, V) — open-keyed objects. ONE pass over
        ``map_entries`` so violations come out in document key order
        (properties.rs:47), with the walker's per-key sub-order:
        property match, then each matching pattern, then additional."""
        props = s.get("properties", {})
        additional = s.get("additionalProperties")
        patterns = s.get("patternProperties", {})
        vtype = t.dtype.valueType

        def entry_viols(e: Column) -> Column:
            key, val = e["key"], e["value"]
            child = Target(val, vtype, F.concat(t.path, F.lit("/"), key))
            parts = []
            prop_case = None
            for k, sub in props.items():
                v = self._node(sub, child, depth + 1)
                prop_case = (F.when(key == F.lit(k), v) if prop_case is None
                             else prop_case.when(key == F.lit(k), v))
            if prop_case is not None:
                parts.append(prop_case.otherwise(empty_violations()))
            for pat, sub in patterns.items():
                parts.append(F.when(key.rlike(unicode_pattern(pat)),
                                    self._node(sub, child, depth + 1)
                                    ).otherwise(empty_violations()))
            if additional is not None:
                is_known = F.lit(False)
                if props:
                    is_known = is_known | key.isin(list(props))
                for p in patterns:
                    is_known = is_known | key.rlike(unicode_pattern(p))
                if additional is False:
                    parts.append(F.when(~is_known, F.array(make_violation(
                        "properties", t.path,
                        F.concat(F.lit("Additional property '"), key,
                                 F.lit("' is not allowed"))))
                    ).otherwise(empty_violations()))
                elif isinstance(additional, dict):
                    parts.append(F.when(
                        ~is_known,
                        self._node(additional, child, depth + 1)
                    ).otherwise(empty_violations()))
            return _concat(parts)

        return F.when(
            t.col.isNotNull(),
            F.flatten(F.transform(F.map_entries(t.col),
                                  lambda e: entry_viols(e)))
        ).otherwise(empty_violations())

    def _property_names(self, sub: Any, t: Target, depth: int) -> Column:
        if isinstance(t.dtype, T.StructType):
            # static keys: evaluate at compile time via pyvalidator
            from valico_spark.compiler.pyvalidator import validate_json
            parts = []
            for f_ in t.dtype.fields:
                st = validate_json(sub, f_.name, version=self.version)
                for e in st.errors:
                    parts.append(_maybe(
                        t.col.isNotNull() & t.col.getField(f_.name).isNotNull(),
                        make_violation(
                            e.code,
                            F.concat(t.path, F.lit(f"/[{f_.name}]")),
                            F.lit(e.detail) if e.detail else None)))
            return _concat(parts)
        if isinstance(t.dtype, T.MapType):
            def emit(k):
                child = Target(k, T.StringType(),
                               F.concat(t.path, F.lit("/["), k, F.lit("]")))
                return self._node(sub, child, depth + 1)
            return F.when(
                t.col.isNotNull(),
                F.flatten(F.transform(F.map_keys(t.col), emit))
            ).otherwise(empty_violations())
        if t.dtype is None:
            raise UnsupportedRule("propertyNames on untyped target")
        return empty_violations()

    def _props_count(self, n: Any, is_max: bool, t: Target) -> Column:
        if isinstance(t.dtype, T.StructType):
            # count present (non-null) fields
            present = [F.when(t.col.getField(f.name).isNotNull(), 1)
                       .otherwise(0) for f in t.dtype.fields]
            total = sum(present[1:], present[0]) if present else F.lit(0)
        elif isinstance(t.dtype, T.MapType):
            total = F.size(F.map_keys(t.col))
        elif t.dtype is None:
            raise UnsupportedRule("min/maxProperties on untyped target")
        else:
            return empty_violations()
        ok = total <= F.lit(int(n)) if is_max else total >= F.lit(int(n))
        return _maybe(t.col.isNotNull() & ~ok, make_violation(
            "max_properties" if is_max else "min_properties", t.path))

    def _dependencies(self, s: dict, t: Target, depth: int) -> Column:
        items: list[tuple[str, tuple[str, Any]]] = []
        if "dependencies" in s:
            for k, v in s["dependencies"].items():
                items.append((k, ("props", v) if isinstance(v, list)
                              else ("schema", v)))
        if "dependentRequired" in s:
            for k, v in s["dependentRequired"].items():
                items.append((k, ("props", v)))
        if "dependentSchemas" in s:
            for k, v in s["dependentSchemas"].items():
                items.append((k, ("schema", v)))

        def present(key: str) -> Column:
            if isinstance(t.dtype, T.StructType):
                names = {f.name for f in t.dtype.fields}
                return (t.col.getField(key).isNotNull() if key in names
                        else F.lit(False))
            if isinstance(t.dtype, T.MapType):
                return F.map_contains_key(t.col, F.lit(key))
            raise UnsupportedRule("dependencies on non-object target")

        if not isinstance(t.dtype, (T.StructType, T.MapType)):
            if t.dtype is None:
                raise UnsupportedRule("dependencies on untyped target")
            return empty_violations()

        parts = []
        for key, (kind, extra) in items:
            trigger = t.col.isNotNull() & present(key)
            if kind == "props":
                for k2 in extra:
                    parts.append(_maybe(
                        trigger & ~present(k2),
                        make_violation("required",
                                       F.concat(t.path, F.lit("/" + k2)))))
            else:
                sub_viol = self._node(extra, t, depth + 1)
                parts.append(F.when(trigger, sub_viol)
                              .otherwise(empty_violations()))
        return _concat(parts)

    def _items(self, s: dict, t: Target, depth: int) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("items on untyped target")
            return empty_violations()
        etype = t.dtype.elementType
        items = s.get("items")
        additional = s.get("additionalItems")
        parts = []
        if isinstance(items, (dict, bool)):
            def per_elem(x: Column, i: Column) -> Column:
                child = Target(x, etype,
                               F.concat(t.path, F.lit("/"),
                                        i.cast("string")))
                return self._node(items, child, depth + 1)
            parts.append(F.when(
                t.col.isNotNull(),
                F.flatten(F.transform(t.col, per_elem))
            ).otherwise(empty_violations()))
        elif isinstance(items, list):
            for idx, sub in enumerate(items):
                elem = F.element_at(t.col, idx + 1)
                child = Target(elem, etype,
                               F.concat(t.path, F.lit(f"/{idx}")))
                sub_viol = self._node(sub, child, depth + 1)
                parts.append(F.when(
                    t.col.isNotNull() & (F.size(t.col) > idx), sub_viol
                ).otherwise(empty_violations()))
            if additional is False:
                parts.append(_maybe(
                    t.col.isNotNull() & (F.size(t.col) > len(items)),
                    make_violation("items", t.path,
                                   F.lit("Additional items are not allowed"))))
            elif isinstance(additional, dict):
                def per_extra(x: Column, i: Column) -> Column:
                    child = Target(
                        x, etype,
                        F.concat(t.path, F.lit("/"),
                                 (i + len(items)).cast("string")))
                    return self._node(additional, child, depth + 1)
                tail = F.slice(t.col, len(items) + 1,
                               F.greatest(F.size(t.col) - len(items),
                                          F.lit(0)))
                parts.append(F.when(
                    t.col.isNotNull() & (F.size(t.col) > len(items)),
                    F.flatten(F.transform(tail, per_extra))
                ).otherwise(empty_violations()))
        return _concat(parts)

    def _items_count(self, n: Any, is_max: bool, t: Target) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("min/maxItems on untyped target")
            return empty_violations()
        sz = F.size(t.col)
        ok = sz <= F.lit(int(n)) if is_max else sz >= F.lit(int(n))
        return _maybe(t.col.isNotNull() & ~ok, make_violation(
            "max_items" if is_max else "min_items", t.path))

    def _unique_items(self, t: Target) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("uniqueItems on untyped target")
            return empty_violations()
        # O(n) array_distinct vs the reference's O(n²) loop
        # (validators/unique_items.rs:18 'TODO quicker algorithm')
        ok = F.size(F.array_distinct(t.col)) == F.size(t.col)
        return _maybe(t.col.isNotNull() & ~ok,
                      make_violation("unique_items", t.path))

    def _contains(self, s: dict, t: Target, depth: int) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise UnsupportedRule("contains on untyped target")
            return empty_violations()
        sub = s["contains"]
        min_c = s.get("minContains") if self.version >= DRAFT2019 else None
        max_c = s.get("maxContains") if self.version >= DRAFT2019 else None
        etype = t.dtype.elementType

        def ok_elem(x: Column) -> Column:
            child = Target(x, etype, F.lit(""))
            return F.size(self._node(sub, child, depth + 1)) == 0

        parts = []
        if min_c is None and max_c is None:
            # F.exists short-circuits (contains.rs:38-40 parity, but free)
            parts.append(_maybe(t.col.isNotNull() & ~F.exists(t.col, ok_elem),
                                make_violation("contains", t.path)))
        else:
            matched = F.size(F.filter(t.col, ok_elem))
            if min_c != 0:
                parts.append(_maybe(t.col.isNotNull() & (matched == 0),
                                    make_violation("contains", t.path)))
            if max_c is not None:
                parts.append(_maybe(
                    t.col.isNotNull() & (matched > F.lit(int(max_c))),
                    make_violation("min_contains/max_contains", t.path)))
            if min_c is not None:
                parts.append(_maybe(
                    t.col.isNotNull() & (matched < F.lit(int(min_c))),
                    make_violation("min_contains/max_contains", t.path)))
        return _concat(parts)

    def _all_of(self, subs: list, t: Target, depth: int) -> Column:
        return _concat([self._node(sub, t, depth + 1) for sub in subs])

    def _any_of(self, subs: list, t: Target, depth: int) -> Column:
        sub_viols = [self._node(sub, t, depth + 1) for sub in subs]
        any_ok = None
        for sv in sub_viols:
            ok = F.size(sv) == 0
            any_ok = ok if any_ok is None else (any_ok | ok)
        return _maybe(~any_ok, make_violation("any_of", t.path,
                                              states=_states_json(sub_viols)))

    def _one_of(self, subs: list, t: Target, depth: int) -> Column:
        sub_viols = [self._node(sub, t, depth + 1) for sub in subs]
        count = None
        for sv in sub_viols:
            ok_int = F.when(F.size(sv) == 0, 1).otherwise(0)
            count = ok_int if count is None else (count + ok_int)
        return _maybe(count != 1, make_violation("one_of", t.path,
                                                 states=_states_json(sub_viols)))

    def _not(self, sub: Any, t: Target, depth: int) -> Column:
        sub_viol = self._node(sub, t, depth + 1)
        return _maybe(F.size(sub_viol) == 0, make_violation("not", t.path))

    def _conditional(self, s: dict, t: Target, depth: int) -> Column:
        if_ok = F.size(self._node(s["if"], t, depth + 1)) == 0
        then_v = (self._node(s["then"], t, depth + 1)
                  if "then" in s else empty_violations())
        else_v = (self._node(s["else"], t, depth + 1)
                  if "else" in s else empty_violations())
        return F.when(if_ok, then_v).otherwise(else_v)

    def _content_media(self, s: dict, t: Target) -> Column:
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return empty_violations()
        enc = s.get("contentEncoding")
        mt = s.get("contentMediaType")
        parts = []
        val = t.col
        decodable = F.lit(True)
        if enc == "base64":
            # strict alphabet check then decode (content_media.rs:52-63);
            # details normalized with the walker (formats.py
            # decode_base64_utf8): "Invalid byte" / "Invalid UTF-8"
            b64_ok = t.col.rlike(
                r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}=="
                r"|[A-Za-z0-9+/]{3}=)?$")
            utf8_ok = F.is_valid_utf8(F.unbase64(t.col))
            parts.append(_maybe(t.col.isNotNull() & ~b64_ok,
                                make_violation("format", t.path,
                                               F.lit("Invalid byte"))))
            parts.append(_maybe(t.col.isNotNull() & b64_ok & ~utf8_ok,
                                make_violation("format", t.path,
                                               F.lit("Invalid UTF-8"))))
            decodable = b64_ok & utf8_ok
            val = F.when(decodable, F.decode(F.unbase64(t.col), "UTF-8"))
        if mt == "application/json":
            parsed = F.try_parse_json(val)
            bad = t.col.isNotNull() & decodable & parsed.isNull()
            parts.append(_maybe(bad, make_violation("format", t.path,
                                                    F.lit(""))))
        return _concat(parts)


class _GateUnsupported(Exception):
    """A construct the validity-gate mirror does not cover — the caller
    falls back to the ungated violations expression (never to a wrong
    one)."""


class _GateCompiler:
    """Predicate mirror of :class:`ColumnCompiler` for a conservative
    keyword subset: ``ok_node`` returns a BOOLEAN column that is TRUE
    only when the corresponding ``_node`` violations array is empty.

    Every violation the main compiler emits through ``_maybe(cond, v)``
    mirrors here as ``~cond`` over the IDENTICAL condition tree, so the
    gate can never claim ok while a violation exists (a NULL/false gate
    merely routes the row to the full expression, which is always
    correct). The payoff: the full expression allocates arrays/structs
    and string paths per checked node (interpreted inside array HOFs),
    while this mirror is pure boolean arithmetic — measured 4.3x
    cheaper on the 2M-doc bench ruleset, with 96% of rows taking the
    gated fast path. Unsupported constructs (combinators, refs beyond
    inlining, maps, formats, tuple items, dependencies, contains,
    content checks, unevaluated*) raise :class:`_GateUnsupported`.
    """

    _MIRRORED = {"$ref", "type", "enum", "const", "minimum", "maximum",
                 "exclusiveMinimum", "exclusiveMaximum", "multipleOf",
                 "minLength", "maxLength", "pattern", "required",
                 "properties", "minProperties", "maxProperties",
                 "items", "minItems", "maxItems", "uniqueItems"}

    #: keywords the MAIN dispatcher materializes (must stay in sync with
    #: ColumnCompiler._node's handlers dict): dispatch-order entries
    #: outside this set contribute no violations, so the mirror skips
    #: them exactly like _node does
    _MAIN_HANDLED = {"$ref", "type", "enum", "const", "minimum",
                     "maximum", "exclusiveMinimum", "exclusiveMaximum",
                     "multipleOf", "minLength", "maxLength", "pattern",
                     "format", "required", "properties", "propertyNames",
                     "minProperties", "maxProperties", "dependencies",
                     "items", "minItems", "maxItems", "uniqueItems",
                     "contains", "allOf", "anyOf", "oneOf", "not", "if",
                     "unevaluatedProperties", "unevaluatedItems",
                     "contentMediaType"}

    def __init__(self, main: "ColumnCompiler"):
        self.m = main

    def ok_node(self, schema: Any, target: Target, depth: int) -> Column:
        m = self.m
        if depth > m._MAX_REF_DEPTH:
            raise _GateUnsupported("ref depth")
        if schema is True:
            schema = {}
        elif schema is False or not isinstance(schema, dict):
            raise _GateUnsupported("boolean/non-dict schema")
        if "$ref" in schema and m.version < DRAFT2019:
            return self.ok_node(m._resolve_ref(schema["$ref"]), target,
                                depth + 1)
        from valico_spark.compiler.pyvalidator import (
            keyword_dispatch_order,
        )

        s, t = schema, target
        parts: list[Column] = []
        for canon in keyword_dispatch_order(s, m.version):
            if canon not in self._MAIN_HANDLED:
                continue  # _node materializes nothing for it either
            if canon not in self._MIRRORED:
                # a keyword the main dispatcher would materialize but
                # the mirror cannot (combinators, formats, ...): the
                # mirror is incomplete for this schema
                raise _GateUnsupported(canon)
            part = self._dispatch(canon, s, t, depth)
            if part is not None:
                parts.append(part)
        if not parts:
            return F.lit(True)
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out

    def _dispatch(self, canon: str, s: dict, t: Target,
                  d: int) -> Column | None:
        m = self.m
        if canon == "$ref":
            return self.ok_node(m._resolve_ref(s["$ref"]), t, d + 1)
        if canon == "type":
            return self._ok_type(s["type"], t)
        if canon == "enum":
            return self._ok_match_list(s["enum"], t)
        if canon == "const":
            return self._ok_match_list([s["const"]], t)
        if canon in ("minimum", "maximum", "exclusiveMinimum",
                     "exclusiveMaximum"):
            op = {"minimum": "min", "maximum": "max",
                  "exclusiveMinimum": "emin",
                  "exclusiveMaximum": "emax"}[canon]
            return self._ok_bound(s[canon], op, t)
        if canon == "multipleOf":
            return self._ok_multiple_of(s["multipleOf"], t)
        if canon in ("minLength", "maxLength"):
            return self._ok_length(s[canon], canon == "maxLength", t)
        if canon == "pattern":
            return self._ok_pattern(s["pattern"], t)
        if canon == "required":
            return self._ok_required(s["required"], t)
        if canon == "properties":
            return self._ok_properties(s, t, d)
        if canon in ("minProperties", "maxProperties"):
            return self._ok_props_count(s[canon],
                                        canon == "maxProperties", t)
        if canon == "items":
            return self._ok_items(s, t, d)
        if canon in ("minItems", "maxItems"):
            return self._ok_items_count(s[canon], canon == "maxItems", t)
        if canon == "uniqueItems":
            if s["uniqueItems"] is not True:
                return None
            return self._ok_unique(t)
        raise _GateUnsupported(canon)

    # each mirror repeats the EXACT cond of the corresponding
    # ColumnCompiler rule, negated; guard branches that return
    # empty_violations() become lit(True)

    def _ok_type(self, ty: Any, t: Target) -> Column:
        types = [ty] if isinstance(ty, str) else list(ty)
        for x in types:
            if x not in PRIMITIVE_TYPES:
                raise _GateUnsupported("type")
        possible = spark_json_types(t.dtype)
        if possible is None:
            raise _GateUnsupported("type on untyped")
        sat = possible & set(types)
        whole_float = (_is_float(t.dtype) and "integer" in types
                       and "number" not in types)
        if sat == possible and not whole_float:
            return F.lit(True)
        if not sat:
            return ~t.col.isNotNull()
        if whole_float:
            return ~(t.col.isNotNull() & ~(t.col == F.floor(t.col)))
        return F.lit(True)

    def _ok_match_list(self, values: list, t: Target) -> Column:
        if not isinstance(values, list) or not values:
            raise _GateUnsupported("enum/const shape")
        if t.dtype is None:
            raise _GateUnsupported("enum/const on untyped")
        ok = None
        for v in values:
            mm = self.m._match_value(v, t.col, t.dtype, top_level=True)
            if mm is not None:
                ok = mm if ok is None else (ok | mm)
        if ok is None:
            return ~t.col.isNotNull()
        return ~(t.col.isNotNull() & ~ok)

    def _ok_bound(self, b: Any, op: str, t: Target) -> Column:
        if not is_number(b):
            raise _GateUnsupported("bound")
        if not _is_numeric(t.dtype) and t.dtype is not None:
            return F.lit(True)
        if t.dtype is None:
            raise _GateUnsupported("bound on untyped")
        c = t.col.cast("double")
        ok = {"min": c >= F.lit(float(b)), "emin": c > F.lit(float(b)),
              "max": c <= F.lit(float(b)), "emax": c < F.lit(float(b))}[op]
        return ~(t.col.isNotNull() & ~ok)

    def _ok_multiple_of(self, k: Any, t: Target) -> Column:
        if not is_number(k) or float(k) <= 0:
            raise _GateUnsupported("multipleOf")
        if not _is_numeric(t.dtype) and t.dtype is not None:
            return F.lit(True)
        if t.dtype is None:
            raise _GateUnsupported("multipleOf on untyped")
        k = float(k)
        c = t.col.cast("double")
        if not _is_float(t.dtype) and k == math.floor(k):
            ok = (t.col % F.lit(int(k))) == 0
        elif k == math.floor(k):
            whole = c == F.floor(c)
            rem = (c / F.lit(k)) % F.lit(1.0)
            float_ok = ((F.isnan(rem) | (rem < F.lit(EPSILON)))
                        & (rem < F.lit(1.0 - EPSILON)))
            ok = F.when(whole, (c % F.lit(k)) == 0).otherwise(float_ok)
        else:
            rem = (c / F.lit(k)) % F.lit(1.0)
            ok = ((F.isnan(rem) | (rem < F.lit(EPSILON)))
                  & (rem < F.lit(1.0 - EPSILON)))
        return ~(t.col.isNotNull() & ~ok)

    def _ok_length(self, n: Any, is_max: bool, t: Target) -> Column:
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return F.lit(True)
        if t.dtype is None:
            raise _GateUnsupported("length on untyped")
        ln = F.length(t.col)
        ok = ln <= F.lit(int(n)) if is_max else ln >= F.lit(int(n))
        return ~(t.col.isNotNull() & ~ok)

    def _ok_pattern(self, p: Any, t: Target) -> Column:
        if not isinstance(p, str):
            raise _GateUnsupported("pattern")
        if not isinstance(t.dtype, T.StringType) and t.dtype is not None:
            return F.lit(True)
        if t.dtype is None:
            raise _GateUnsupported("pattern on untyped")
        ok = t.col.rlike(unicode_pattern(p))
        return ~(t.col.isNotNull() & ~ok)

    def _ok_required(self, keys: Any, t: Target) -> Column:
        if not isinstance(keys, list):
            raise _GateUnsupported("required")
        if isinstance(t.dtype, T.StructType):
            fields = {f.name for f in t.dtype.fields}
            parts = []
            for k in keys:
                present = (t.col.getField(k).isNotNull() if k in fields
                           else F.lit(False))
                parts.append(~(t.col.isNotNull() & ~present))
            return self._all(parts)
        if isinstance(t.dtype, T.MapType):
            parts = []
            for k in keys:
                present = F.map_contains_key(t.col, F.lit(k))
                parts.append(~(t.col.isNotNull() & ~present))
            return self._all(parts)
        if t.dtype is None:
            raise _GateUnsupported("required on untyped")
        return F.lit(True)

    def _ok_properties(self, s: dict, t: Target, depth: int) -> Column:
        props = s.get("properties", {})
        additional = s.get("additionalProperties")
        if s.get("patternProperties"):
            raise _GateUnsupported("patternProperties")
        if isinstance(t.dtype, T.StructType):
            parts = []
            for f_ in t.dtype.fields:
                key = f_.name
                child = t.child(t.col.getField(key), f_.dataType,
                                F.lit(""))
                present = t.col.isNotNull() & child.col.isNotNull()
                if key in props:
                    parts.append(
                        ~present
                        | self.ok_node(props[key], child, depth + 1))
                elif additional is False:
                    parts.append(~present)
                elif isinstance(additional, dict):
                    parts.append(
                        ~present
                        | self.ok_node(additional, child, depth + 1))
            return self._all(parts)
        if isinstance(t.dtype, T.MapType):
            raise _GateUnsupported("properties on map")
        if t.dtype is None:
            raise _GateUnsupported("properties on untyped")
        return F.lit(True)

    def _ok_props_count(self, n: Any, is_max: bool, t: Target) -> Column:
        if isinstance(t.dtype, T.StructType):
            present = [F.when(t.col.getField(f.name).isNotNull(), 1)
                       .otherwise(0) for f in t.dtype.fields]
            total = sum(present[1:], present[0]) if present else F.lit(0)
        elif isinstance(t.dtype, T.MapType):
            total = F.size(F.map_keys(t.col))
        elif t.dtype is None:
            raise _GateUnsupported("props count on untyped")
        else:
            return F.lit(True)
        ok = total <= F.lit(int(n)) if is_max else total >= F.lit(int(n))
        return ~(t.col.isNotNull() & ~ok)

    def _ok_items(self, s: dict, t: Target, depth: int) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise _GateUnsupported("items on untyped")
            return F.lit(True)
        items = s.get("items")
        if s.get("additionalItems") is not None or isinstance(items, list):
            raise _GateUnsupported("tuple items")
        if isinstance(items, (dict, bool)):
            etype = t.dtype.elementType

            def elem_ok(x: Column) -> Column:
                child = Target(x, etype, F.lit(""))
                return self.ok_node(items, child, depth + 1)

            return ~t.col.isNotNull() | F.forall(t.col, elem_ok)
        return F.lit(True)

    def _ok_items_count(self, n: Any, is_max: bool, t: Target) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise _GateUnsupported("items count on untyped")
            return F.lit(True)
        sz = F.size(t.col)
        ok = sz <= F.lit(int(n)) if is_max else sz >= F.lit(int(n))
        return ~(t.col.isNotNull() & ~ok)

    def _ok_unique(self, t: Target) -> Column:
        if not isinstance(t.dtype, T.ArrayType):
            if t.dtype is None:
                raise _GateUnsupported("uniqueItems on untyped")
            return F.lit(True)
        ok = F.size(F.array_distinct(t.col)) == F.size(t.col)
        return ~(t.col.isNotNull() & ~ok)

    @staticmethod
    def _all(parts: list[Column]) -> Column:
        if not parts:
            return F.lit(True)
        out = parts[0]
        for p in parts[1:]:
            out = out & p
        return out


def compile_ruleset(schema: Any, spark_schema: T.StructType,
                    version: int = DRAFT7) -> Column:
    """Compile ``schema`` against a table's row type.

    The document is the whole row (as valico validates a whole JSON
    object). Returns the violations-array Column; ``F.size(...) == 0`` is
    the verdict. GetStructField(CreateStruct(...)) collapses in Catalyst's
    SimplifyExtractValueOps, so column pruning/pushdown still reach the
    scan.

    When every keyword in the ruleset is covered by the
    :class:`_GateCompiler` mirror, the expression is wrapped in a
    validity GATE: a pure-boolean fast path decides emptiness first and
    only violating rows evaluate the allocating violations tree —
    ``when(ok, empty).otherwise(full)``. The gate is sound by
    construction (it negates the identical condition trees), so the
    emitted violations are byte-identical with or without it; any
    construct outside the mirror simply disables the gate.
    """
    root_col = F.struct(*[F.col(f.name).alias(f.name)
                          for f in spark_schema.fields])
    target = Target(col=root_col, dtype=spark_schema, path=F.lit(""))
    comp = ColumnCompiler(version=version, root_schema=schema)
    viol = comp.compile(schema, target)
    try:
        ok = _GateCompiler(comp).ok_node(schema, target, 0)
    except Exception:
        # any construct (or resolution failure) outside the mirror:
        # emit the ungated expression — never a wrong gate
        return viol
    return F.when(ok, empty_violations()).otherwise(viol)
