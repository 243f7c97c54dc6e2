"""DSL golden tests — cases lifted from the reference's end-to-end DSL
suite (/root/reference/tests/dsl/mod.rs), asserting the exact mutated
document and typed-error-at-path behavior."""

from valico_spark.compiler import dsl


def process(builder, value):
    state, out = builder.process(value)
    return state, out


def assert_golden(builder, value, expected):
    state, out = process(builder, value)
    assert state.is_valid(), [e.as_dict() for e in state.errors]
    assert out == expected, f"{out!r} != {expected!r}"


def assert_error(builder, value, code, path):
    state, _ = process(builder, value)
    assert not state.is_valid()
    assert any(e.code == code and e.path == path for e in state.errors), \
        [(e.code, e.path) for e in state.errors]


class TestCoercion:
    def test_empty_builder(self):
        b = dsl.Builder.build(lambda p: None)
        assert_golden(b, {"a": 1}, {"a": 1})

    def test_simple_require(self):
        b = dsl.Builder.build(lambda p: p.req_defined("a"))
        assert_golden(b, {"a": 1}, {"a": 1})
        assert_error(b, {}, "required", "/a")

    def test_i64(self):
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.i64()))
        assert_golden(b, {"a": "1"}, {"a": 1})
        assert_golden(b, {"a": 1.112}, {"a": 1})  # truncates (dsl/mod.rs:38)
        assert_error(b, {"a": "not-int"}, "wrong_type", "/a")
        assert_error(b, {"a": {"a": 1}}, "wrong_type", "/a")

    def test_string(self):
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.string()))
        assert_golden(b, {"a": "1"}, {"a": "1"})
        assert_golden(b, {"a": 1}, {"a": "1"})
        assert_golden(b, {"a": 1.112}, {"a": "1.112"})
        assert_error(b, {"a": {}}, "wrong_type", "/a")
        assert_error(b, {"a": None}, "wrong_type", "/a")

    def test_boolean(self):
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.boolean()))
        assert_golden(b, {"a": True}, {"a": True})
        assert_golden(b, {"a": "true"}, {"a": True})
        assert_golden(b, {"a": "false"}, {"a": False})
        assert_error(b, {"a": None}, "wrong_type", "/a")
        assert_error(b, {"a": 1}, "wrong_type", "/a")
        assert_error(b, {"a": "not-bool"}, "wrong_type", "/a")

    def test_null(self):
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.null()))
        assert_golden(b, {"a": ""}, {"a": None})
        assert_golden(b, {"a": None}, {"a": None})
        assert_error(b, {"a": "x"}, "wrong_type", "/a")

    def test_simple_array(self):
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.array()))
        assert_golden(b, {"a": [1, "2", [3]]}, {"a": [1, "2", [3]]})
        assert_error(b, {"a": {}}, "wrong_type", "/a")
        assert_error(b, {"a": "test"}, "wrong_type", "/a")

    def test_typed_array(self):
        b = dsl.Builder.build(
            lambda p: p.req_typed("a", dsl.array_of(dsl.string())))
        assert_golden(b, {"a": [1, "2", 3.1]}, {"a": ["1", "2", "3.1"]})
        assert_error(b, {"a": {}}, "wrong_type", "/a")
        assert_error(b, {"a": [1, 2, {}]}, "wrong_type", "/a/2")

    def test_object_require(self):
        # tests/dsl/mod.rs:152-164
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.object_()))
        assert_golden(b, {"a": {}}, {"a": {}})
        assert_error(b, {"a": []}, "wrong_type", "/a")
        assert_error(b, {"a": ""}, "wrong_type", "/a")

    def test_object_with_nested(self):
        # tests/dsl/mod.rs:167-186
        def nest(p):
            p.req_typed("b", dsl.f64())
            p.req_typed("c", dsl.array_of(dsl.string()))
        b = dsl.Builder.build(
            lambda p: p.req_nested("a", dsl.object_(), nest))
        assert_golden(b, {"a": {"b": "1.22", "c": [1.112, ""]}},
                      {"a": {"b": 1.22, "c": ["1.112", ""]}})
        assert_error(b, {"a": {"b": "not-f64", "c": [1.112, ""]}},
                     "wrong_type", "/a/b")
        assert_error(b, {"a": {"b": "1.22", "c": [1.112, {}]}},
                     "wrong_type", "/a/c/1")

    def test_opt_typed(self):
        # tests/dsl/mod.rs:294-303
        def build(p):
            p.req_defined("a")
            p.opt_typed("b", dsl.u64())
        b = dsl.Builder.build(build)
        assert_golden(b, {"a": "test"}, {"a": "test"})
        assert_golden(b, {"a": "test", "b": "1"}, {"a": "test", "b": 1})

    def test_array_with_nested(self):
        def nest(p):
            p.req_typed("b", dsl.string())
            p.req_typed("c", dsl.array_of(dsl.u64()))
        b = dsl.Builder.build(
            lambda p: p.req_nested("a", dsl.array(), nest))
        assert_golden(b, {"a": [{"b": 1, "c": ["1"]}]},
                      {"a": [{"b": "1", "c": [1]}]})
        assert_error(b, {"a": [{"b": {}, "c": ["1"]}]},
                     "wrong_type", "/a/0/b")
        assert_error(b, {"a": [{"b": 1, "c": [{}]}]},
                     "wrong_type", "/a/0/c/0")

    def test_encoded_array(self):
        b = dsl.Builder.build(
            lambda p: p.req_typed("a", dsl.encoded_array(",")))
        assert_golden(b, {"a": "a,b,c"}, {"a": ["a", "b", "c"]})

    def test_encoded_array_of(self):
        b = dsl.Builder.build(
            lambda p: p.req_typed("a", dsl.encoded_array_of(",", dsl.i64())))
        assert_golden(b, {"a": "1,2,3"}, {"a": [1, 2, 3]})


class TestValidators:
    def test_allow_values(self):
        b = dsl.Builder.build(
            lambda p: p.req("a", lambda q: q.allow_values(["x", "y"])))
        assert_golden(b, {"a": "x"}, {"a": "x"})
        assert_error(b, {"a": "z"}, "wrong_value", "/a")

    def test_reject_values(self):
        b = dsl.Builder.build(
            lambda p: p.req("a", lambda q: q.reject_values(["bad"])))
        assert_golden(b, {"a": "good"}, {"a": "good"})
        assert_error(b, {"a": "bad"}, "wrong_value", "/a")

    def test_regex(self):
        b = dsl.Builder.build(
            lambda p: p.req("a", lambda q: q.regex("^x")))
        assert_golden(b, {"a": "xy"}, {"a": "xy"})
        assert_error(b, {"a": "yx"}, "wrong_value", "/a")
        assert_error(b, {"a": 5}, "wrong_type", "/a")

    def test_allow_null(self):
        b = dsl.Builder.build(
            lambda p: p.req("a", lambda q: (q.coerce(dsl.string()),
                                            q.allow_null_())))
        assert_golden(b, {"a": None}, {"a": None})
        assert_golden(b, {"a": 5}, {"a": "5"})

    def test_mutually_exclusive(self):
        def build(p):
            p.opt_defined("a")
            p.opt_defined("b")
            p.mutually_exclusive(["a", "b"])
        b = dsl.Builder.build(build)
        assert_golden(b, {"a": 1}, {"a": 1})
        assert_error(b, {"a": 1, "b": 2}, "mutually_exclusive", "/")

    def test_exactly_one_of(self):
        def build(p):
            p.opt_defined("a")
            p.opt_defined("b")
            p.exactly_one_of(["a", "b"])
        b = dsl.Builder.build(build)
        assert_golden(b, {"b": 2}, {"b": 2})
        assert_error(b, {}, "exactly_one", "/")
        assert_error(b, {"a": 1, "b": 2}, "exactly_one", "/")

    def test_at_least_one_of(self):
        def build(p):
            p.opt_defined("a")
            p.opt_defined("b")
            p.at_least_one_of(["a", "b"])
        b = dsl.Builder.build(build)
        assert_golden(b, {"a": 1, "b": 2}, {"a": 1, "b": 2})
        assert_error(b, {}, "at_least_one", "/")

    def test_validate_with(self):
        from valico_spark.compiler.errors import dsl_violation

        def check(val, path):
            if val != 42:
                return [dsl_violation("wrong_value", path, "not 42")]
        b = dsl.Builder.build(
            lambda p: p.req("a", lambda q: q.validate_with(check)))
        assert_golden(b, {"a": 42}, {"a": 42})
        assert_error(b, {"a": 41}, "wrong_value", "/a")


class TestDefaultsAndSchema:
    def test_default_injected_after_validation(self):
        b = dsl.Builder.build(
            lambda p: p.opt("a", lambda q: q.default_(7)))
        assert_golden(b, {}, {"a": 7})

    def test_default_not_injected_when_invalid(self):
        def build(p):
            p.req_typed("x", dsl.i64())
            p.opt("a", lambda q: q.default_(7))
        b = dsl.Builder.build(build)
        state, out = process(b, {"x": "bad"})
        assert not state.is_valid()
        assert "a" not in out

    def test_coercion_before_schema(self):
        # README.md:230-241 — the schema sees the coerced value
        def build(p):
            p.req("a", lambda q: (q.coerce(dsl.i64()),
                                  q.schema_({"maximum": 10})))
        b = dsl.Builder.build(build)
        assert_golden(b, {"a": "5"}, {"a": 5})
        assert_error(b, {"a": "11"}, "maximum", "/a")

    def test_builder_level_schema_on_mutated(self):
        def build(p):
            p.req_typed("a", dsl.i64())
            p.schema_({"properties": {"a": {"minimum": 2}}})
        b = dsl.Builder.build(build)
        assert_golden(b, {"a": "3"}, {"a": 3})
        assert_error(b, {"a": "1"}, "minimum", "//a")

    def test_process_array_of_objects(self):
        b = dsl.Builder.build(lambda p: p.req_typed("a", dsl.i64()))
        state, out = process(b, [{"a": "1"}, {"a": "2"}])
        assert state.is_valid()
        assert out == [{"a": 1}, {"a": 2}]
        assert_error(b, [{"a": "1"}, "nope"], "wrong_type", "/1")

    def test_process_non_object(self):
        b = dsl.Builder.build(lambda p: p.req_defined("a"))
        assert_error(b, 42, "wrong_type", "")
