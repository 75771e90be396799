"""Spec / validation / MVEL-translation unit tests (SURVEY §1.2, §2.8, §3.1)."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from cassandra_cql_streaming_db_migrator_spark.plans.mvel import referenced_columns, translate_mvel
from cassandra_cql_streaming_db_migrator_spark.plans.spec import load_spec
from cassandra_cql_streaming_db_migrator_spark.plans.validate import (
    SchemaValidationError,
    validate_migration_schema,
)


class TestMvel:
    def test_row_refs_and_boolean_ops(self):
        # migration-config.example.yaml:95 style
        assert (
            translate_mvel("row.clust_key_col_2 >= 3000 && row.clust_key_col_2 < 10000")
            == "clust_key_col_2 >= 3000 AND clust_key_col_2 < 10000"
        )

    def test_or_not_null_literals(self):
        assert translate_mvel("row.a == null || !row.b") == "a == NULL OR NOT b"

    def test_string_methods_chained(self):
        assert (
            translate_mvel("row.s.trim().toUpperCase().startsWith('AB')")
            == "startswith(upper(trim(s)), 'AB')"
        )

    def test_referenced_columns(self):
        # CassandraSchemaUtil.java:58-65 regex parity
        assert referenced_columns("row.a > 1 && row.b < row.a") == ["a", "b"]

    def test_substring_is_zero_based_like_java(self):
        assert translate_mvel("row.s.substring(3)") == "substring(s, (3) + 1)"
        assert (
            translate_mvel("row.s.substring(2, 5)")
            == "substring(s, (2) + 1, (5) - (2))"
        )

    def test_index_of_shifts_to_java_semantics(self):
        # Java: 0-based, -1 when absent; instr: 1-based, 0 when absent
        assert translate_mvel("row.s.indexOf('x')") == "(instr(s, 'x') - 1)"

    def test_replace_is_literal(self):
        assert (
            translate_mvel("row.s.replace('a', 'b')") == "replace(s, 'a', 'b')"
        )

    def test_equals_ignore_case_folds_both_sides(self):
        assert (
            translate_mvel("row.s.equalsIgnoreCase('AbC')")
            == "(lower(s) = lower('AbC'))"
        )

    def test_new_methods_execute_with_java_semantics(self, spark):
        # end-to-end: the translated SQL must agree with the JVM behavior
        from pyspark.sql import Row

        df = spark.createDataFrame([Row(s="Hello World")])
        [r] = df.selectExpr(
            f"{translate_mvel('row.s.substring(6)')} AS sub1",
            f"{translate_mvel('row.s.substring(0, 5)')} AS sub2",
            f"{translate_mvel(chr(39).join(['row.s.indexOf(', 'World', ')']))} AS idx",
            f"{translate_mvel(chr(39).join(['row.s.indexOf(', 'zzz', ')']))} AS idx_absent",
            f"{translate_mvel('row.s.replace(' + chr(39) + 'l' + chr(39) + ', ' + chr(39) + 'L' + chr(39) + ')')} AS repl",
            f"{translate_mvel('row.s.equalsIgnoreCase(' + chr(39) + 'hello world' + chr(39) + ')')} AS eqic",
        ).collect()
        # "Hello World".substring(6) == "World", .substring(0,5) == "Hello"
        assert (r.sub1, r.sub2) == ("World", "Hello")
        assert (r.idx, r.idx_absent) == (6, -1)
        assert r.repl == "HeLLo WorLd"
        assert r.eqic is True


class TestSpec:
    def test_yaml_camel_case_parity(self):
        spec = load_spec(
            """
tables:
  - tableName: lineitem
    targetTableName: lineitem_v2
    whereClause: "l_quantity >= 5"
    maxReadRowCount: 100
    continueOnRowError: true
"""
        )
        t = spec.tables[0]
        assert t.target == "lineitem_v2"
        assert t.max_read_row_count == 100
        assert t.simulate_only is True  # TMD:40-48 default

    def test_continue_on_row_error_mandatory(self):
        # MigrateTableTask.java:168-169
        with pytest.raises(ValueError, match="continue_on_row_error"):
            load_spec({"tables": [{"tableName": "x"}]})

    def test_lwt_on_counter_rejected(self):
        # TMD:112-114
        with pytest.raises(ValueError, match="not.*supported"):
            load_spec(
                {
                    "tables": [
                        {
                            "tableName": "x",
                            "continueOnRowError": True,
                            "insertOnlyIfNotExist": True,
                            "counterColumns": ["c"],
                        }
                    ]
                }
            )


class TestValidate:
    src = T.StructType([T.StructField("pk", T.LongType()), T.StructField("a", T.LongType())])

    def test_pk_missing_is_error(self):
        # DMP:249-254
        tgt = T.StructType([T.StructField("pk2", T.LongType())])
        with pytest.raises(SchemaValidationError):
            validate_migration_schema(self.src, tgt, ["pk2"])

    def test_pk_from_calculated_ok(self):
        tgt = T.StructType([T.StructField("pk2", T.LongType())])
        res = validate_migration_schema(self.src, tgt, ["pk2"], {"pk2": "pk * 2"})
        assert res.write_columns == ["pk2"]

    def test_non_pk_dropped_with_warning(self):
        # DMP:256-269
        tgt = T.StructType(
            [T.StructField("pk", T.LongType()), T.StructField("extra", T.LongType())]
        )
        res = validate_migration_schema(self.src, tgt, ["pk"])
        assert res.dropped_columns == ["extra"]
        assert len(res.warnings) == 1

    def test_calculated_must_exist_in_target(self):
        # DMP:154-158
        tgt = T.StructType([T.StructField("pk", T.LongType())])
        with pytest.raises(SchemaValidationError, match="calculated"):
            validate_migration_schema(self.src, tgt, ["pk"], {"ghost": "1"})

    def test_pk_first_ordering(self):
        # DMP:239-274 LinkedHashSet ordering
        tgt = T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("pk", T.LongType())]
        )
        res = validate_migration_schema(self.src, tgt, ["pk"])
        assert res.write_columns == ["pk", "a"]


class TestStrictTypeMode:
    """§1.3: strict mode reproduces the reference's unsupported-type
    rejection (CassandraSchemaUtil.java:153-157)."""

    def test_supported_types_pass_including_containers(self):
        from pyspark.sql import types as T

        from cassandra_cql_streaming_db_migrator_spark.plans.validate import strict_type_check

        schema = T.StructType(
            [
                T.StructField("a", T.IntegerType()),
                T.StructField("b", T.ArrayType(T.StringType())),
                T.StructField("c", T.MapType(T.StringType(), T.DoubleType())),
                T.StructField("d", T.DecimalType(10, 2)),
            ]
        )
        strict_type_check(schema)  # no raise

    def test_reference_rejected_types_raise(self):
        import pytest
        from pyspark.sql import types as T

        from cassandra_cql_streaming_db_migrator_spark.plans.validate import (
            SchemaValidationError,
            strict_type_check,
        )

        schema = T.StructType(
            [
                T.StructField("ok", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("payload", T.BinaryType()),
            ]
        )
        with pytest.raises(SchemaValidationError, match="ts.*payload|payload.*ts|not support"):
            strict_type_check(schema, "events")


class TestReferenceExampleConfigParity:
    """load_spec must parse the reference's SHIPPED example config verbatim
    (config/migration-config.example.yaml) — the strongest config-portability
    statement: a reference user's YAML is our YAML."""

    def test_verbatim_reference_example_parses(self):
        from cassandra_cql_streaming_db_migrator_spark.plans.spec import load_spec

        spec = load_spec("/root/reference/config/migration-config.example.yaml")
        assert spec.thread_count == 1
        assert spec.print_status_every_x_seconds == 10
        assert spec.source.get("keyspaceName")
        t1, t2, t3, t4, t5 = spec.tables

        assert (t1.table_name, t1.simulate_only, t1.continue_on_row_error) == (
            "my_source_table_1", False, True)

        assert t2.target_table_name == "my_source_table_2_clone"
        assert t2.page_size == 5000 and t2.continue_on_row_error is False

        assert t3.where_clause.startswith("part_key_col_1='abcd'")
        assert t3.max_write_row_count == 2000 and t3.simulate_only is True

        [flt] = t4.filters
        assert flt.language == "mvel"
        assert "clust_key_col_2 >= 3000" in flt.expression
        # the MVEL rule translates to runnable Spark SQL
        assert "AND" in flt.to_sql()

        assert t5.insert_only_if_not_exist is True
        assert "hashCode" in t5.calculated_columns["my_col_hash"]

    def test_unknown_plugin_classes_fail_at_plan_time(self):
        import pytest

        from cassandra_cql_streaming_db_migrator_spark.plans.spec import load_spec

        with pytest.raises(ValueError, match="unknown filterClass"):
            load_spec(
                """
tables:
  - tableName: t
    continueOnRowError: true
    dataFilterDefinitions:
      - filterClass: com.example.MyCustomFilter
"""
            )


class TestProceduralMvel:
    """translate_mvel_block — the shipped hashCode-bucket example
    (migration-config.example.yaml:112-120) and the statement subset around
    it fold into single Catalyst expressions."""

    SHIPPED = """
            int hash = row.my_col.hashCode();
            if (hash < 0) {
              hash *= -1;
            }
            hash %= 32;
            return (short) hash;"""

    @staticmethod
    def _jvm_hash(s: str) -> int:
        h = 0
        b = s.encode("utf-16-be")
        for i in range(0, len(b), 2):
            h = (h * 31 + int.from_bytes(b[i : i + 2], "big")) & 0xFFFFFFFF
        return h - 0x100000000 if h >= 0x80000000 else h

    def test_shipped_example_matches_jvm_bucketing(self, spark):
        sql = translate_mvel(self.SHIPPED)
        rows = ["", "a", "Hello World", "Ármin útja", "naïve café", "😀🚀 mix"]
        df = spark.createDataFrame([(s,) for s in rows], "my_col string")
        got = [r[0] for r in df.selectExpr(f"{sql} AS b").collect()]
        want = [abs(self._jvm_hash(s)) % 32 for s in rows]
        assert got == want
        # SMALLINT per the (short) cast
        assert df.selectExpr(f"{sql} AS b").schema["b"].dataType == T.ShortType()

    def test_if_else_assignment_merge(self, spark):
        block = """
            var tier = 'low';
            if (row.v >= 100) { tier = 'high'; } else if (row.v >= 10) { tier = 'mid'; }
            return tier;"""
        df = spark.createDataFrame([(5,), (50,), (500,)], "v int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == ["low", "mid", "high"]

    def test_guard_style_early_return(self, spark):
        block = """
            if (row.v < 0) { return 0; }
            return row.v * 2;"""
        df = spark.createDataFrame([(-3,), (4,)], "v int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == [0, 8]

    def test_both_branch_return_and_braceless_if(self, spark):
        block = "if (row.v % 2 == 0) return 'even'; else return 'odd';"
        df = spark.createDataFrame([(2,), (3,)], "v int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == ["even", "odd"]

    def test_compound_ops_and_math_statics(self, spark):
        block = """
            long acc = row.v;
            acc += 10;
            acc *= 3;
            acc -= Math.abs(row.w);
            return Math.max(acc, 0);"""
        df = spark.createDataFrame([(1, -5), (0, 100)], "v int, w int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == [(1 + 10) * 3 - 5, 0]

    def test_unsupported_constructs_raise(self):
        from cassandra_cql_streaming_db_migrator_spark.plans.mvel import MvelTranslationError

        with pytest.raises(MvelTranslationError):
            translate_mvel("int x = 1;")  # no return on any path
        with pytest.raises(MvelTranslationError):
            translate_mvel("y = 2; return y;")  # undeclared assignment
        with pytest.raises(MvelTranslationError):
            translate_mvel("for (i : row.xs) { s += i; } return s;")

    def test_with_computed_columns_integration(self, spark):
        from cassandra_cql_streaming_db_migrator_spark.operators.compute import (
            hash_bucket_column,
            with_computed_columns,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("alpha",), ("βeta",), ("😀",)], "my_col string"
        )
        out = with_computed_columns(df, {"my_col_hash": self.SHIPPED})
        chk = out.withColumn("ref", hash_bucket_column("my_col").cast("smallint"))
        assert chk.filter(F.col("my_col_hash") != F.col("ref")).count() == 0


class TestProceduralMvelRobustness:
    """Regressions from the round-2 review: literal masking, lambda-variable
    collision, cast precedence, integral division, quote-aware splitting."""

    def test_user_var_colliding_with_template_lambda_vars(self, spark):
        # x / acc / ch are the hashCode template's lambda variables
        block = "int x = row.a; int h = row.s.hashCode(); return h + x;"
        df = spark.createDataFrame([(5, "Hi")], "a int, s string")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        h = (ord("H") * 31 + ord("i")) % 2**32  # JVM "Hi".hashCode()
        assert got == h + 5

    def test_string_literal_containing_variable_name(self, spark):
        block = "var v = 1; if (row.b > 0) { return 'v is here'; } return 'no v'; "
        df = spark.createDataFrame([(1,), (-1,)], "b int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == ["v is here", "no v"]

    def test_semicolon_inside_declarative_literal(self):
        assert translate_mvel("row.status == 'a;b'") == "status == 'a;b'"

    def test_keyword_inside_literal_untouched(self):
        assert translate_mvel("row.s == 'true && null'") == "s == 'true && null'"

    def test_integral_compound_division(self, spark):
        block = "long acc2 = row.v; acc2 /= 2; return acc2;"
        df = spark.createDataFrame([(5,), (-5,)], "v long")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == [2, -2]  # Java truncating division, not 2.5

    def test_double_compound_division_stays_fractional(self, spark):
        block = "double d = row.v; d /= 2; return d;"
        df = spark.createDataFrame([(5,)], "v long")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        assert got == 2.5

    def test_cast_binds_to_primary_not_whole_expression(self, spark):
        block = "return (int) row.d + 1;"
        df = spark.createDataFrame([(-0.5,)], "d double")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        assert got == 1  # ((int) -0.5) + 1 = 0 + 1, not CAST(0.5 AS INT) = 0

    def test_cast_binds_over_method_chain(self, spark):
        block = "return (long) row.s.hashCode() % 32;"
        df = spark.createDataFrame([("abc",)], "s string")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        java_h = 0
        for c in "abc":
            java_h = (java_h * 31 + ord(c)) & 0xFFFFFFFF
        assert got == java_h % 32


class TestProceduralMvelRobustness2:
    def test_escaped_quote_inside_literal(self):
        out = translate_mvel(r"row.s == 'it\'s; ok'")
        assert out == r"s == 'it\'s; ok'"

    def test_literal_looking_like_placeholder(self):
        out = translate_mvel("row.a == '__lit1__' && row.b == 'x'")
        assert out == "a == '__lit1__' AND b == 'x'"

    def test_plain_assignment_integer_division(self, spark):
        block = "int x = row.a; x = x / 2; return x;"
        df = spark.createDataFrame([(5,), (-5,)], "a int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == [2, -2]

    def test_declaration_integer_division(self, spark):
        block = "int x = row.a / 2; return x;"
        df = spark.createDataFrame([(7,)], "a int")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        assert got == 3

    def test_cast_of_exponent_literal(self, spark):
        block = "return (double) 1e3 + row.a;"
        df = spark.createDataFrame([(1,)], "a int")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        assert got == 1001.0


class TestMvelTernary:
    def test_simple_ternary(self, spark):
        df = spark.createDataFrame([(5,), (-5,)], "a int")
        sql = translate_mvel("row.a > 0 ? 'pos' : 'neg'")
        got = [r[0] for r in df.selectExpr(f"{sql} AS t").collect()]
        assert got == ["pos", "neg"]

    def test_nested_and_parenthesized_ternary(self, spark):
        df = spark.createDataFrame([(95,), (55,), (10,)], "a int")
        sql = translate_mvel("row.a >= 90 ? 'A' : row.a >= 50 ? 'B' : 'C'")
        got = [r[0] for r in df.selectExpr(f"{sql} AS t").collect()]
        assert got == ["A", "B", "C"]
        sql2 = translate_mvel("1 + (row.a >= 50 ? 10 : 20)")
        got2 = [r[0] for r in df.selectExpr(f"{sql2} AS t").collect()]
        assert got2 == [11, 11, 21]

    def test_ternary_in_block(self, spark):
        block = "var tier = row.a > 0 ? 'p' : 'n'; return tier;"
        df = spark.createDataFrame([(1,), (-1,)], "a int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == ["p", "n"]

    def test_question_mark_inside_literal_ignored(self):
        assert translate_mvel("row.s == 'what?'") == "s == 'what?'"


class TestMvelStringConcat:
    def test_plus_with_string_literal_concatenates(self, spark):
        df = spark.createDataFrame([(7, "x")], "k int, s string")
        sql = translate_mvel("'id-' + row.k")
        assert df.selectExpr(f"{sql} AS t").collect()[0]["t"] == "id-7"
        sql2 = translate_mvel("row.s + '-' + row.k")
        assert df.selectExpr(f"{sql2} AS t").collect()[0]["t"] == "x-7"

    def test_numeric_plus_untouched(self, spark):
        df = spark.createDataFrame([(7,)], "k int")
        sql = translate_mvel("row.k + 1")
        got = df.selectExpr(f"{sql} AS t").collect()[0]["t"]
        assert got == 8 and sql == "k + 1"

    def test_concat_respects_comparison_boundaries(self, spark):
        df = spark.createDataFrame([(7, "x")], "k int, s string")
        sql = translate_mvel("row.s + '!' == 'x!' && row.k + 1 > 7")
        assert df.selectExpr(f"{sql} AS t").collect()[0]["t"] is True

    def test_concat_in_block_and_ternary(self, spark):
        block = "var tag = 'k=' + row.k; return row.k > 0 ? tag : 'none';"
        df = spark.createDataFrame([(3,), (-3,)], "k int")
        got = [r[0] for r in df.selectExpr(f"{translate_mvel(block)} AS t").collect()]
        assert got == ["k=3", "none"]


class TestMvelRewriteBoundaries:
    """Regression tests for the round-2 review findings on the ternary /
    concat / cast rewrite passes."""

    def test_ternary_as_non_first_function_argument(self):
        # a ternary never swallows preceding arguments into its condition
        sql = translate_mvel("Math.max(row.x, row.y > 0 ? row.y : 0)")
        assert sql == "greatest(x,IF(y > 0, y, 0))"

    def test_ternary_in_method_argument_translates_method(self, spark):
        sql = translate_mvel("row.s.substring(0, row.k > 2 ? 2 : row.k)")
        df = spark.createDataFrame([("hello", 3), ("hello", 1)], "s string, k int")
        got = [r[0] for r in df.selectExpr(f"{sql} AS t").collect()]
        assert got == ["he", "h"]

    def test_ternary_inside_brackets(self):
        assert translate_mvel("row.m[row.f ? 0 : 1]") == "m[IF(f, 0, 1)]"

    def test_scientific_exponent_plus_is_not_an_operator(self):
        sql = translate_mvel("row.a * 1e+6 + ' suffix'")
        assert sql == "concat(a * 1e+6, ' suffix')"
        # identifiers merely ending in <digit>e do not trigger the guard
        assert translate_mvel("row.x1e + 6") == "x1e + 6"

    def test_parenthesized_and_method_chain_stringness(self, spark):
        df = spark.createDataFrame([(7,)], "k int")
        for mvel, want in [
            ("('id-') + row.k", "id-7"),
            ("'a '.trim() + row.k", "a7"),
        ]:
            sql = translate_mvel(mvel)
            assert df.selectExpr(f"{sql} AS t").collect()[0]["t"] == want
        # int-returning method chains stay arithmetic
        assert translate_mvel("row.s.length() + row.k") == "length(s) + k"

    def test_cast_headed_concat_in_block(self, spark):
        block = "var x = (long) row.d + '-s'; return x;"
        df = spark.createDataFrame([(2.9,)], "d double")
        got = df.selectExpr(f"{translate_mvel(block)} AS t").collect()[0]["t"]
        assert got == "2-s"

    def test_cast_in_bare_expression_and_stacked_casts(self, spark):
        assert translate_mvel("(int) row.d + 1") == "CAST(d AS INT) + 1"
        assert translate_mvel("(int)(long) row.x") == "CAST(CAST(x AS BIGINT) AS INT)"
        sql = translate_mvel("(String) row.k + '!'")
        df = spark.createDataFrame([(7,)], "k int")
        assert df.selectExpr(f"{sql} AS t").collect()[0]["t"] == "7!"

    def test_unbalanced_paren_raises_at_plan_time(self):
        from cassandra_cql_streaming_db_migrator_spark.plans.mvel import MvelTranslationError

        with pytest.raises(MvelTranslationError):
            translate_mvel("(row.a ? 1 : 2")
