"""Round-5 compile-tier semantics, pinned as unit contracts (each
also has a whole-program witness in the reference corpus — these keep
the behavior from regressing independently of corpus skip accounting).

Reference semantics cited per test:
- assignment.rs: a failed `ok, err =` assigns the expression KIND's
  default value to ok ([] for arrays, {} for objects)
- query/mod.rs + length.rs: length(null) is a runtime ERROR `??`
  recovers from, not a comparable null
- rfcs/8381: del() on a closure-variable path removes the field from
  the closure value
"""

from __future__ import annotations

import json

from vector_spark.vrl_lang import eval_vrl


def test_fallible_push_on_null_gets_array_default(spark):
    got, _ = eval_vrl(
        spark,
        '.a, err = push(.a, "foo")\n.a = push(.a, "bar")\n.a',
        {},
    )
    assert got == ["bar"]


def test_fallible_merge_on_null_gets_object_default(spark):
    got, _ = eval_vrl(
        spark,
        '.m, err = merge(.m, {"x": true})\n.m = merge(.m, {"y": true})\n.m',
        {},
    )
    assert got == {"y": True}


def test_fallible_merge_assignment_folds_parse_key_value(spark):
    got, _ = eval_vrl(
        spark,
        '.res = { "foo": 2 }\n.res, _ |= parse_key_value(s\'bar=3\')\n.res',
        {},
    )
    assert got == {"foo": 2, "bar": "3"}


def test_del_on_closure_variable_path(spark):
    got, _ = eval_vrl(
        spark,
        ".answers = map_values(array!(.answers)) -> |value| "
        "{ del(value.ttl); value }\n.answers",
        {"answers": [{"class": "IN", "ttl": "264"}]},
    )
    assert got == [{"class": "IN"}]


def test_length_of_null_is_error_not_value(spark):
    # length(.unset) errors in VRL; `??` must take the fallback even
    # though our null-based model would compare null == null as true
    got, _ = eval_vrl(
        spark, "(length(.blob) == length(.bloob)) ?? 42", {"x": 1}
    )
    assert got == 42


def test_heterogeneous_final_array_keeps_native_types(spark):
    got, _ = eval_vrl(
        spark, '[.a, .b]', {"a": [1, 2], "b": {"k": True}}
    )
    assert got == [[1, 2], {"k": True}]


def test_closure_unroll_folds_parse_json_per_element(spark):
    got, _ = eval_vrl(
        spark,
        'strings = split!(.message, "|")\n'
        "compact(map_values(strings) -> |value| { parse_json(value) ?? null })",
        {"message": '{"n": 1}|bad|{"n": 2}'},
    )
    assert got == [{"n": 1}, {"n": 2}]


def test_constant_parse_common_log_skips_error_branch(spark):
    src = (
        "., err = parse_common_log(.log)\n"
        "if err != null {\n    .malformed = true\n} else {\n"
        "    .total_bytes = del(.size)\n}\n."
    )
    got, _ = eval_vrl(
        spark,
        src,
        {
            "log": '1.2.3.4 - alice [03/Feb/2021:21:13:55 -0200] '
            '"GET /x HTTP/1.0" 201 99'
        },
    )
    assert "malformed" not in got, got
    assert "size" not in got, got
    assert got["total_bytes"] == 99
    assert got["timestamp"] == "2021-02-03T23:13:55Z"
    assert got["user"] == "alice"


def test_push_built_array_variable_keeps_native_element_types(spark):
    # rfcs/8381 for_each-accumulation pattern: the accumulator is
    # heterogeneous (VRL arrays mix types), so the compiler tracks
    # per-element columns (Env.elems) and eval_vrl materializes each
    # element natively instead of coercing the array to strings
    got, _ = eval_vrl(
        spark,
        "keys = []\nvalues = []\n"
        "for_each(.) -> |key, value| {\n"
        "  keys = push(keys, key)\n"
        "  values = push(values, value)\n"
        "}\n[keys, values]",
        {"a": "x", "b": True, "c": [1, 2], "d": {"k": "v"}},
    )
    assert got == [["a", "b", "c", "d"], ["x", True, [1, 2], {"k": "v"}]]


def test_del_returns_value_and_set_builds_per_iteration_structs(spark):
    # del() RETURNS the deleted value (remove.rs), and set!(., [key],
    # value) over the event builds a distinct struct per unrolled
    # for_each iteration — each pushed element keeps its own fields
    got, _ = eval_vrl(
        spark,
        "data = del(.data)\nmetrics = []\n"
        "for_each(object!(data)) -> |key, value| {\n"
        "  metric = set!(., [key], value)\n"
        "  metrics = push(metrics, metric)\n"
        "}\nmetrics",
        {"data": {"acceleration": 10, "velocity": 20},
         "id": "booster", "timestamp": 123456},
    )
    assert got == [
        {"id": "booster", "timestamp": 123456, "acceleration": 10},
        {"id": "booster", "timestamp": 123456, "velocity": 20},
    ]


def test_element_lists_invalidated_by_dynamic_branch(spark):
    # an accumulator pushed under a NON-constant condition loses its
    # element list (branch merge can't know the element count); the
    # program still runs via the single-column array path
    got, _ = eval_vrl(
        spark,
        "xs = [1]\nif .flag == 1 { xs = push(xs, 2) }\nxs",
        {"flag": 1},
    )
    assert got == [1, 2]


def test_null_comparison_against_missing_path_folds_static(spark):
    # issues/12948: under a closed event, `.platform == "Apache2"`
    # with .platform absent folds to static false, so the guarded
    # branch (whose body is out of the compile subset when taken
    # statically-null) never compiles at all
    src = (
        'if .platform == "Apache2" || .platform == "Nginx" {\n'
        "  apache2 = del(.apache2)\n"
        "  if is_null(apache2) { apache2 = {} }\n"
        "  .http = merge(object!(apache2), {})\n"
        "}"
    )
    got, ev = eval_vrl(spark, src, {})
    assert got is None
    assert "http" not in ev


# ---- round-5 fifth pass: deep constant provenance + unnest fold ----


def test_py_set_deep_pads_arrays_with_null():
    # mirrors _set_in/_fresh_container (assignment.rs array padding)
    from vector_spark.vrl_lang import _py_set_deep

    out = _py_set_deep(None, ["nork", 2, "ning"], "x")
    assert out == {"nork": [None, None, {"ning": "x"}]}
    # setting inside an existing structure copies, never mutates
    base = {"a": [1, 2]}
    out = _py_set_deep(base, ["a", 3], 9)
    assert out == {"a": [1, 2, None, 9]}
    assert base == {"a": [1, 2]}


def test_py_resolve_and_query_coalesce_segments():
    from vector_spark.vrl_lang import _py_query_value, _py_resolve_segs

    root = {"nork": [None, None, {"ning": {"nonk": "banana"}}]}
    segs = ["nork", 2, ("|", ["ning", "nong"]), "nonk"]
    rsegs = _py_resolve_segs(root, segs)
    assert rsegs == ["nork", 2, "ning", "nonk"]
    assert _py_query_value(root, rsegs) == "banana"
    # no existing alternative -> unresolvable (query yields null)
    assert _py_resolve_segs(root, ["nork", 2, ("|", ["zap", "zip"])]) is None
    # kind-mismatched walk yields null, not an error
    assert _py_query_value(root, ["nork", "oops"]) is None


def test_deep_assignment_keeps_py_provenance(spark):
    # .a.b[1].c = literal keeps the whole field constant-foldable, so
    # a later query folds instead of compiling a getItem chain
    got, _ = eval_vrl(
        spark,
        '.a.b[1].c = "deep"\n.a.b[1].c',
        {},
    )
    assert got == "deep"


def test_unnest_folds_root_clones(spark):
    got, _ = eval_vrl(
        spark,
        '.xs = ["p", "q"]\n.out = unnest(.xs)\n.out[1].xs',
        {},
    )
    assert got == "q"


def test_typedef_abort_block_is_never(spark):
    got, _ = eval_vrl(spark, "type_def({abort})", {})
    assert got == {"never": True}


def test_typedef_branch_merged_variable_types(spark):
    src = (
        "type_def({\n"
        '   x = "string"\n'
        "   if false {\n"
        "      abort\n"
        "   } else {\n"
        "      x = 3\n"
        "   }\n"
        "   x\n"
        "})"
    )
    got, _ = eval_vrl(spark, src, {})
    assert got == {"bytes": True, "integer": True}


def test_fallible_call_error_has_span(spark):
    got, _ = eval_vrl(spark, "_, err = upcase(.thing).thing\nerr", {})
    assert got == (
        'function call error for "upcase" at (10:24): '
        "expected string, got null"
    )


def test_slice_runtime_kind_dispatch_under_coalesce(spark):
    # slice on a float errors (slice.rs wants array/string): ?? takes
    # the fallback and KEEPS its native type
    got, _ = eval_vrl(
        spark, "x = slice(.n, 1) ?? .n\nx", {"n": 10.5}
    )
    assert got == 10.5
    got, _ = eval_vrl(
        spark, 'slice!(.xs, 1)', {"xs": ["a", "b", "c"]}
    )
    assert got == ["b", "c"]


def test_and_with_non_boolean_right_errors(spark):
    got, _ = eval_vrl(spark, 'true && "foo" ?? "nope"', {})
    assert got == "nope"


# ---- round-5 sixth pass: whole-program constant folding through the
# CloudWatch parser, root-array provenance, and closure-body folds ----


def test_parse_aws_cloudwatch_constant_fold(spark):
    # a literal envelope folds at compile time with snake_case keys
    # and RFC3339-UTC millisecond timestamps
    # (parse_aws_cloudwatch_log_subscription_message.rs)
    env = (
        '{"messageType":"DATA_MESSAGE","owner":"111","logGroup":"/g",'
        '"logStream":"s","subscriptionFilters":["Dest"],'
        '"logEvents":[{"id":"1","timestamp":1600110569039,'
        '"message":"m1"}]}'
    )
    src = (
        "parsed = parse_aws_cloudwatch_log_subscription_message!"
        f"({json.dumps(env)})\nparsed.log_events[0].timestamp"
    )
    got, _ = eval_vrl(spark, src, {})
    assert got == "2020-09-14T19:09:29.039Z"


def test_merge_operator_constant_fold(spark):
    # `|` on two known objects folds right-biased, keeping
    # heterogeneous field types as struct fields
    got, _ = eval_vrl(
        spark, 'a = {"x": 1, "y": "old"}\na | {"y": 2}', {}
    )
    assert got == {"x": 1, "y": 2}


def test_varpath_del_keeps_py_provenance(spark):
    # del(var.field) returns the deleted value AND the variable's
    # remaining dict stays compile-time known
    src = (
        'v = {"keep": 1, "drop": {"deep": true}}\n'
        "taken = del(v.drop)\n"
        "[v, taken]"
    )
    got, _ = eval_vrl(spark, src, {})
    assert got == [{"keep": 1}, {"deep": True}]


def test_root_array_assign_and_map_values_fold(spark):
    # `. = <known array>` is the multi-event expansion shape; a
    # map_values over it folds per element with del/merge provenance
    src = (
        '. = [{"a": 1, "t": "x"}, {"a": 2, "t": "y"}]\n'
        ". = map_values(.) -> |value| {\n"
        "  tag = del(value.t)\n"
        '  value |= {"tag": tag}\n'
        "}\n"
        "."
    )
    got, _ = eval_vrl(spark, src, {})
    assert got == [{"a": 1, "tag": "x"}, {"a": 2, "tag": "y"}]


def test_unnest_static_typedef_flows_to_closure_arg(spark):
    # the closure argument's type_def reports the static lattice type
    # (array_unknown_exact element kinds), not the literal's shape
    env = (
        '{"messageType":"DATA_MESSAGE","owner":"111","logGroup":"/g",'
        '"logStream":"s","subscriptionFilters":["Dest"],'
        '"logEvents":[{"id":"1","timestamp":1600110569039,'
        '"message":"m1"}]}'
    )
    src = (
        "parsed = parse_aws_cloudwatch_log_subscription_message!"
        f"({json.dumps(env)})\n"
        ". = unnest(parsed.log_events)\n"
        "types = map_values(.) -> |value| { type_def(value) }\n"
        "types[0].object.log_events"
    )
    got, _ = eval_vrl(spark, src, {})
    assert got == {
        "object": {
            "id": {"bytes": True},
            "message": {"bytes": True},
            "timestamp": {"timestamp": True},
        }
    }


def test_no_space_inequality_tokenizes_as_compare(spark):
    from vector_spark.vrl_lang import compile_vrl

    df = spark.createDataFrame([(200,), (500,)], "status int")
    out = compile_vrl(df, '.bad = .status!=200')
    rows = sorted((r.status, r.bad) for r in out.collect())
    # '.status!=200' must be a comparison, not 'status! = 200'
    assert rows == [(200, False), (500, True)]


def test_value_or_only_false_and_null_are_falsy(spark):
    from vector_spark.vrl_lang import compile_vrl

    df = spark.createDataFrame(
        [(0, "false"), (None, None), (3, "x")],
        "count int, mode string",
    )
    out = compile_vrl(
        df, '.retries = .count || 10\n.m = .mode || "default"'
    )
    rows = {
        (r["count"], r["mode"]): (r["retries"], r["m"])
        for r in out.collect()
    }
    assert rows[(0, "false")] == (0, "false")   # 0 and 'false' truthy
    assert rows[(None, None)] == (10, "default")
    assert rows[(3, "x")] == (3, "x")


def test_exists_in_branch_keeps_sparse_and_one_sided_del(spark):
    from vector_spark.vrl_lang import vrl_condition

    df = spark.createDataFrame(
        [("x", None), ("x", "v"), ("y", None)],
        "type string, field string",
    )
    cond = vrl_condition(
        df.schema, 'if .type == "x" { exists(.field) } else { true }'
    )
    got = [(r.type, r.field) for r in df.filter(cond).collect()]
    # ('x', None) must NOT match: exists() stays per-row in branches
    assert sorted(got) == [("x", "v"), ("y", None)]


def test_one_sided_del_exists_per_row(spark):
    from vector_spark.vrl_lang import compile_vrl

    df = spark.createDataFrame(
        [(True, "a1"), (False, "a2")], "flag boolean, a string"
    )
    out = compile_vrl(df, 'if .flag { del(.a) }\n.has = exists(.a)')
    rows = {r.flag: r.has for r in out.collect()}
    assert rows[True] is False and rows[False] is True


def test_slice_on_array_column(spark):
    from vector_spark.vrl_lang import compile_vrl

    df = spark.createDataFrame(
        [(["a", "b", "c", "d"],)], "tags array<string>"
    )
    out = compile_vrl(df, ".head = slice!(.tags, 0, 2)")
    assert out.collect()[0].head == ["a", "b"]


def test_fallible_division_survives_ansi(spark):
    from vector_spark.vrl_lang import compile_vrl

    df = spark.createDataFrame([(4, 2), (5, 0)], "a int, b int")
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = compile_vrl(df, "ok, err = .a / .b\n.r = ok\n.e = err")
        rows = sorted((r.a, r.r, r.e) for r in out.collect())
        assert rows[0] == (4, 2.0, None)
        # zero divisor: ok takes the float default, err the message —
        # and crucially the JOB does not abort under ANSI
        assert rows[1][1] == 0.0 and rows[1][2] is not None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_dotted_column_ambiguity_guard(spark):
    import pytest

    from vector_spark.vrl_lang import VrlCompileError, compile_vrl

    df = spark.createDataFrame(
        [(("v",), "flat")], "a struct<b: string>, `a.b` string"
    )
    with pytest.raises(VrlCompileError, match="ambiguous"):
        compile_vrl(df, ".x = .a.b")
