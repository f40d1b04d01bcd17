"""Dialect rewriter tests: unit cases for each quirk plus a
hypothesis property — random arithmetic with ``^`` must equal Python's
right-associative ``**`` evaluation (the reference's backing op)."""

import pytest
from hypothesis import given, settings, strategies as st

from dfsql_spark.dialect import rewrite


def rw(sql: str) -> str:
    """rewrite() preserves original whitespace tokens; collapse for
    layout-insensitive assertions."""
    return " ".join(rewrite(sql).split())


class TestRewriteUnits:
    def test_like_anchored(self):
        assert rw("SELECT a FROM t WHERE a LIKE '.*x'") == (
            "SELECT a FROM t WHERE a RLIKE '^(?:.*x)'"
        )

    def test_not_like(self):
        out = rw("SELECT a FROM t WHERE a NOT LIKE 'x.*'")
        assert "NOT RLIKE '^(?:x.*)'" in out

    def test_like_in_string_untouched(self):
        # the word LIKE inside a string literal is not an operator
        out = rw("SELECT 'I LIKE cake' AS s FROM t")
        assert out == "SELECT 'I LIKE cake' AS s FROM t"

    def test_like_dquote_unescapes_doubled_quote(self):
        # "a""b" means the 3-char pattern a"b — the doubled-quote escape
        # must collapse before the regex is built
        out = rw('SELECT a FROM t WHERE a LIKE "x""y"')
        assert "RLIKE '^(?:x\"y)'" in out

    def test_like_non_literal_pattern_anchored_at_runtime(self):
        # column / expression patterns anchor via CONCAT so re.match
        # semantics hold for every pattern source
        out = rw("SELECT a FROM t WHERE a LIKE b")
        assert out.endswith("WHERE a RLIKE CONCAT('^(?:', b, ')')")

    def test_like_non_literal_function_pattern(self):
        out = rw("SELECT a FROM t WHERE a LIKE concat(p, '.*')")
        assert "RLIKE CONCAT('^(?:', concat(p, '.*'), ')')" in out

    def test_like_compound_concat_pattern_anchors_whole_expr(self):
        # `b || x` is ONE pattern — anchoring only `b` would mis-match
        # when the tail contains alternation
        out = rw("SELECT a FROM t WHERE a LIKE b || x AND c = 1")
        assert "RLIKE CONCAT('^(?:', b || x, ')') AND c = 1" in out

    def test_like_power_pattern_rewrites_inside_anchor(self):
        # the power rewrite must apply INSIDE the runtime anchor, not
        # wrap the CONCAT
        out = rw("SELECT a FROM t WHERE a LIKE b ^ 2")
        assert "RLIKE CONCAT('^(?:', POWER(b" in out
        assert "POWER(CONCAT" not in out

    def test_like_pattern_stops_at_clause_keywords(self):
        out = rw("SELECT CASE WHEN a LIKE b THEN 1 ELSE 0 END FROM t")
        assert "a RLIKE CONCAT('^(?:', b, ')') THEN 1" in out

    def test_like_pattern_stops_at_depth0_paren_and_comma(self):
        out = rw("SELECT f(x LIKE b, 2) FROM t")
        assert "f(x RLIKE CONCAT('^(?:', b, ')'), 2)" in out

    def test_like_pattern_stops_before_bare_alias(self):
        # a second adjacent identifier after the pattern can only be a
        # bare (no-AS) output alias — it must NOT be swallowed into the
        # anchored CONCAT
        out = rw("SELECT a LIKE b c FROM t")
        assert "CONCAT('^(?:', b, ')') c FROM t" in out

    def test_like_pattern_function_call_then_alias(self):
        out = rw("SELECT a LIKE upper(b) c FROM t")
        assert "CONCAT('^(?:', upper(b), ')') c FROM t" in out

    def test_like_compound_pattern_then_alias(self):
        out = rw("SELECT a LIKE b || x c FROM t")
        assert "CONCAT('^(?:', b || x, ')') c FROM t" in out

    def test_power_simple(self):
        assert rw("SELECT 2 ^ 3") == "SELECT POWER(2 , 3)"

    def test_power_right_assoc(self):
        assert rw("SELECT 2 ^ 3 ^ 2") == "SELECT POWER(2 , POWER(3 , 2))"

    def test_power_function_operand(self):
        out = rw("SELECT abs(x) ^ 2 FROM t")
        assert "POWER(abs(x) , 2)" in out

    def test_power_paren_operand_keeps_keyword(self):
        # regression: the operand walker must not swallow keywords
        # before '(' (SELECT (age-28) ^ 2 once became POWER(SELECT ...))
        out = rw("SELECT (x-1) ^ 2 FROM t")
        assert "SELECT POWER((x-1) , 2) FROM t" == out

    def test_cast_dtype_names(self):
        assert "CAST(x AS STRING)" in rw("SELECT CAST(x AS str) FROM t")
        assert "CAST(x AS BIGINT)" in rw("SELECT CAST(x AS int) FROM t")
        assert "CAST(x AS DOUBLE)" in rw("SELECT CAST(x AS float) FROM t")

    def test_cast_inside_expression_only(self):
        # a bare alias `AS str` outside CAST is untouched
        out = rw("SELECT x AS str FROM t")
        assert out == "SELECT x AS str FROM t"


@st.composite
def arith_expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return str(draw(st.integers(min_value=1, max_value=4)))
    op = draw(st.sampled_from(["+", "*", "^"]))
    left = draw(arith_expr(depth=depth + 1))
    if op == "^":
        # small literal exponents keep values inside double range
        right = str(draw(st.integers(min_value=1, max_value=2)))
    else:
        right = draw(arith_expr(depth=depth + 1))
    expr = f"{left} {op} {right}"
    return f"({expr})" if draw(st.booleans()) else expr


class TestPowerProperty:
    @settings(max_examples=60, deadline=None)
    @given(arith_expr())
    def test_rewrite_matches_python_pow(self, expr):
        """dfsql ``^`` == Python ``**`` (right-assoc, precedence above
        ``*``): rewritten SQL evaluated by Spark must equal Python."""
        sql = rewrite(f"SELECT {expr} AS v")
        expected = eval(expr.replace("^", "**"))
        # collected lazily once per test session via module fixture
        got = TestPowerProperty._spark.sql(sql).collect()[0]["v"]
        assert float(got) == pytest.approx(float(expected))

    @pytest.fixture(autouse=True)
    def _attach_spark(self, spark):
        TestPowerProperty._spark = spark


# ---------------------------------------------------------------------------
# end-to-end generative fuzz: random typed expression ASTs rendered
# twice — dfsql dialect (through the FULL sql_query public path,
# dialect rewrite + Arrow + reduce_output included) and ANSI for
# DuckDB — evaluated over the same frame and compared.  Covers the
# composition space the unit quirks can't: ^ inside comparisons,
# string ops under WHERE, CAST chains feeding arithmetic.
# NULLs are deliberately absent from the data: the engine's non-3VL
# AND/OR divergence is a documented choice (COVERAGE.md §2.8), not a
# fuzz target.
# ---------------------------------------------------------------------------


def _render(node, dialect):
    kind = node[0]
    if kind == "lit":
        v = node[1]
        return f"'{v}'" if isinstance(v, str) else str(v)
    if kind == "col":
        return node[1]
    if kind == "bin":
        _, op, l, r = node
        return f"({_render(l, dialect)} {op} {_render(r, dialect)})"
    if kind == "pow":
        _, l, r = node
        if dialect == "dfsql":
            return f"({_render(l, dialect)} ^ {_render(r, dialect)})"
        return f"power({_render(l, dialect)}, {_render(r, dialect)})"
    if kind == "fn":
        _, name, arg = node
        return f"{name}({_render(arg, dialect)})"
    if kind == "concat":
        _, l, r = node
        return f"({_render(l, dialect)} || {_render(r, dialect)})"
    if kind == "cast_float":
        if dialect == "dfsql":
            return f"CAST({_render(node[1], dialect)} AS float)"
        return f"CAST({_render(node[1], dialect)} AS DOUBLE)"
    if kind == "cmp":
        _, op, l, r = node
        return f"({_render(l, dialect)} {op} {_render(r, dialect)})"
    if kind == "bool":
        _, op, l, r = node
        return f"({_render(l, dialect)} {op} {_render(r, dialect)})"
    if kind == "not":
        return f"(NOT {_render(node[1], dialect)})"
    raise AssertionError(node)


@st.composite
def _num_node(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(
            st.sampled_from(
                [("col", "a"), ("col", "b"), ("lit", 2), ("lit", 3)]
            )
        )
    kind = draw(st.sampled_from(["bin", "bin", "pow", "cast_float"]))
    if kind == "bin":
        op = draw(st.sampled_from(["+", "-", "*"]))
        return ("bin", op, draw(_num_node(depth=depth + 1)),
                draw(_num_node(depth=depth + 1)))
    if kind == "pow":
        # small literal exponent keeps magnitudes sane
        return ("pow", draw(_num_node(depth=depth + 1)),
                ("lit", draw(st.integers(min_value=1, max_value=2))))
    return ("cast_float", draw(_num_node(depth=depth + 1)))


@st.composite
def _str_node(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(
            st.sampled_from([("col", "s"), ("lit", "x"), ("lit", "Yz")])
        )
    kind = draw(st.sampled_from(["fn", "concat"]))
    if kind == "fn":
        return ("fn", draw(st.sampled_from(["lower", "upper"])),
                draw(_str_node(depth=depth + 1)))
    return ("concat", draw(_str_node(depth=depth + 1)),
            draw(_str_node(depth=depth + 1)))


@st.composite
def _bool_node(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "!="]))
        return ("cmp", op, draw(_num_node(depth=2)), draw(_num_node(depth=2)))
    kind = draw(st.sampled_from(["bool", "bool", "not"]))
    if kind == "not":
        return ("not", draw(_bool_node(depth=depth + 1)))
    return ("bool", draw(st.sampled_from(["AND", "OR"])),
            draw(_bool_node(depth=depth + 1)),
            draw(_bool_node(depth=depth + 1)))


class TestEndToEndDialectFuzz:
    @settings(max_examples=25, deadline=None)
    @given(_num_node(), _str_node(), _bool_node())
    def test_select_where_matches_duckdb(self, num, sn, bn):
        import duckdb
        import pandas as pd

        from dfsql_spark import sql_query

        pdf = TestEndToEndDialectFuzz._pdf
        d_sql = (
            f"SELECT id, {_render(num, 'dfsql')} AS v,"
            f" {_render(sn, 'dfsql')} AS w FROM t"
            f" WHERE {_render(bn, 'dfsql')}"
        )
        a_sql = (
            f"SELECT id, {_render(num, 'duck')} AS v,"
            f" {_render(sn, 'duck')} AS w FROM t"
            f" WHERE {_render(bn, 'duck')}"
        )
        got = sql_query(d_sql, t=pdf, reduce_output=False)
        con = duckdb.connect()
        con.register("t", pdf)
        want = con.sql(a_sql).df()
        con.close()
        got = got.sort_values("id").reset_index(drop=True)
        want = want.sort_values("id").reset_index(drop=True)
        assert list(got["id"]) == list(want["id"]), (d_sql, a_sql)
        for gv, wv in zip(got["v"], want["v"]):
            assert float(gv) == pytest.approx(float(wv), rel=1e-12), d_sql
        assert list(got["w"].astype(str)) == list(want["w"].astype(str)), d_sql

    @pytest.fixture(autouse=True)
    def _attach(self, spark):
        import pandas as pd

        TestEndToEndDialectFuzz._pdf = pd.DataFrame(
            {
                "id": range(8),
                "a": [1, 2, 3, 4, 5, 2, 3, 1],
                "b": [0.5, 1.25, 2.0, 3.5, 1.0, 2.75, 0.25, 4.0],
                "s": ["ab", "cD", "x", "", "yz", "Ab", "q", "zz"],
            }
        )


# ---------------------------------------------------------------------------
# window functions through the FULL sql_query path vs DuckDB.  The
# reference dialect (pandas eval) has no window surface at all; Spark
# gives it to us natively, but the dfsql rewrites (LIKE anchoring,
# ^ -> power) tokenize the query text, so OVER (...) clauses crossing
# those rewrites need parity proof, not assumption.  Every ORDER BY
# inside a window spec carries an `id` tiebreak making the order
# TOTAL, so row_number/lag/frame sums are deterministic and
# bit-comparable against DuckDB.
# ---------------------------------------------------------------------------


class TestWindowFunctionsParity:
    _CASES = [
        # (dfsql text, duck text) — identical unless a rewrite is in play
        ("ROW_NUMBER() OVER (PARTITION BY g ORDER BY a, id)",) * 2,
        ("RANK() OVER (ORDER BY a)",) * 2,
        ("DENSE_RANK() OVER (ORDER BY a)",) * 2,
        ("SUM(a) OVER (PARTITION BY g ORDER BY a, id"
         " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",) * 2,
        ("SUM(a) OVER (PARTITION BY g ORDER BY a, id"
         " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)",) * 2,
        ("AVG(b) OVER (PARTITION BY g)",) * 2,
        ("LAG(a, 1, -1) OVER (PARTITION BY g ORDER BY a, id)",) * 2,
        ("LEAD(a, 1, -1) OVER (ORDER BY a, id)",) * 2,
        ("MIN(b) OVER (ORDER BY a, id"
         " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)",) * 2,
        ("NTILE(3) OVER (ORDER BY a, id)",) * 2,
        # RANGE frames: peers (ties on the sort key) enter together,
        # so NO id tiebreak here — the tie-handling IS the semantics
        # under parity test; integer sums keep values exact
        ("SUM(a) OVER (PARTITION BY g ORDER BY a"
         " RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",) * 2,
        ("COUNT(*) OVER (ORDER BY a"
         " RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING)",) * 2,
        ("MAX(a) OVER (PARTITION BY g ORDER BY a"
         " RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)",) * 2,
        # ^ -> power rewrite INSIDE a window argument and frame order
        ("SUM(a ^ 2) OVER (PARTITION BY g ORDER BY a, id)",
         "SUM(power(a, 2)) OVER (PARTITION BY g ORDER BY a, id)"),
    ]

    @staticmethod
    def _pdf():
        import pandas as pd

        return pd.DataFrame(
            {
                "id": range(10),
                "g": ["x", "y", "x", "y", "x", "y", "x", "y", "x", "y"],
                "a": [1, 2, 2, 3, 1, 1, 4, 2, 3, 3],
                "b": [0.5, 1.25, 2.0, 3.5, 1.0, 2.75, 0.25, 4.0, 1.5, 0.75],
                "s": ["ab", "cD", "ax", "", "yz", "Ab", "aq", "zz", "a", "b"],
            }
        )

    @pytest.mark.parametrize("dfsql_expr,duck_expr", _CASES)
    def test_window_expr_matches_duckdb(self, spark, dfsql_expr, duck_expr):
        import duckdb

        from dfsql_spark import sql_query

        pdf = self._pdf()
        got = sql_query(
            f"SELECT id, {dfsql_expr} AS v FROM t", t=pdf,
            reduce_output=False,
        ).sort_values("id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", pdf)
        want = (
            con.sql(f"SELECT id, {duck_expr} AS v FROM t")
            .df().sort_values("id").reset_index(drop=True)
        )
        con.close()
        assert list(got["id"]) == list(want["id"])
        for gv, wv in zip(got["v"], want["v"]):
            assert float(gv) == pytest.approx(float(wv), rel=1e-12), dfsql_expr

    def test_window_with_like_filter_and_qualify_shape(self, spark):
        """A window expr COEXISTING with a LIKE rewrite in the same
        query: the anchored-regex rewrite must not eat the OVER
        clause, and filtering on the windowed value via a subquery
        (Spark has no QUALIFY) must match DuckDB's QUALIFY.  The
        dfsql side writes the F19 regex-LIKE ('a.*'), the DuckDB
        side the ANSI wildcard LIKE ('a%') — same selected rows."""
        import duckdb

        from dfsql_spark import sql_query

        pdf = self._pdf()
        got = sql_query(
            "SELECT id, r FROM (SELECT id,"
            " ROW_NUMBER() OVER (PARTITION BY g ORDER BY a, id) AS r"
            " FROM t WHERE s LIKE 'a.*') q WHERE r <= 2",
            t=pdf, reduce_output=False,
        ).sort_values("id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", pdf)
        want = (
            con.sql(
                "SELECT id,"
                " ROW_NUMBER() OVER (PARTITION BY g ORDER BY a, id) AS r"
                " FROM t WHERE s LIKE 'a%'"
                " QUALIFY r <= 2"
            ).df().sort_values("id").reset_index(drop=True)
        )
        con.close()
        assert list(got["id"]) == list(want["id"])
        assert list(got["r"].astype(int)) == list(want["r"].astype(int))


# generative window-spec fuzz: function x partition x frame sampled,
# rendered once (the window surface is ANSI-identical on both
# engines), evaluated through the full sql_query path vs DuckDB.
@st.composite
def _window_expr(draw):
    fn = draw(st.sampled_from(
        ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "SUM(a)", "AVG(a)",
         "MIN(b)", "MAX(b)", "COUNT(*)", "LAG(a, 1, 0)", "LEAD(a, 1, 0)",
         "PERCENT_RANK()", "CUME_DIST()", "NTILE(3)",
         "FIRST_VALUE(b)", "LAST_VALUE(b)"]
    ))
    part = draw(st.sampled_from(["", "PARTITION BY g "]))
    # FIRST/LAST_VALUE take a frame; with the id tiebreak the default
    # RANGE frame is deterministic too, so they ride the agg branch
    ranking = (
        fn.endswith("()") and not fn.startswith(("FIRST_VALUE", "LAST_VALUE"))
    ) or fn.startswith(("LAG", "LEAD", "NTILE"))
    positional = fn.startswith(("FIRST_VALUE", "LAST_VALUE"))
    if ranking:
        frame = ""
        order = "ORDER BY a, id"
    else:
        frame = draw(st.sampled_from(
            ["", " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
             " ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
             " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"]
        ))
        # frameless aggregate + ORDER BY means the default RANGE frame
        # (standard on both engines); keep it in the pool deliberately
        order = draw(st.sampled_from(["", "ORDER BY a, id"]))
        if not order:
            # FIRST/LAST_VALUE read a POSITION, not a commutative
            # aggregate: an unordered partition/frame is
            # nondeterministic, so they always carry the total order
            if positional:
                order = "ORDER BY a, id"
            else:
                frame = ""
    spec = f"{part}{order}{frame}".strip()
    return f"{fn} OVER ({spec})"


class TestWindowFuzz:
    from hypothesis import HealthCheck, given, settings

    @settings(
        max_examples=30, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(_window_expr(), _window_expr())
    def test_window_fuzz_matches_duckdb(self, e1, e2):
        import duckdb

        from dfsql_spark import sql_query

        pdf = TestWindowFunctionsParity._pdf()
        sql = f"SELECT id, {e1} AS v, {e2} AS w FROM t"
        got = (
            sql_query(sql, t=pdf, reduce_output=False)
            .sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pdf)
        want = con.sql(sql).df().sort_values("id").reset_index(drop=True)
        con.close()
        for c in ("v", "w"):
            for gv, wv in zip(got[c], want[c]):
                assert float(gv) == pytest.approx(float(wv), rel=1e-12), sql


# generative aggregation fuzz: random aggregate sets x grouping x
# HAVING through the full sql_query path vs DuckDB — the GROUP BY
# side of the surface the expression fuzz (SELECT/WHERE) doesn't
# reach.  Aggregates and HAVING predicates render identically for
# both engines; results compare keyed by group.
@st.composite
def _agg_expr(draw):
    return draw(st.sampled_from(
        ["SUM(a)", "COUNT(*)", "COUNT(DISTINCT a)", "AVG(b)",
         "MIN(a + b)", "MAX(a * 2)", "SUM(a + a)", "MIN(b)", "MAX(b)"]
    ))


class TestGroupByFuzz:
    from hypothesis import HealthCheck, given, settings

    @settings(
        max_examples=25, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        _agg_expr(), _agg_expr(),
        st.sampled_from(["g", "g2", "g, g2"]),
        st.sampled_from([None, "COUNT(*) >= 1", "COUNT(*) >= 2",
                         "SUM(a) > 5", "MIN(b) < 2.0"]),
    )
    def test_groupby_having_matches_duckdb(self, e1, e2, keys, having):
        import duckdb
        import pandas as pd

        from dfsql_spark import sql_query

        pdf = pd.DataFrame(
            {
                "g": ["x", "y", "x", "z", "y", "x", "z", "y"],
                "g2": ["p", "p", "q", "q", "p", "q", "p", "q"],
                "a": [1, 2, 3, 4, 5, 2, 3, 1],
                "b": [0.5, 1.25, 2.0, 3.5, 1.0, 2.75, 0.25, 4.0],
            }
        )
        sql = f"SELECT {keys}, {e1} AS x, {e2} AS y FROM t GROUP BY {keys}"
        if having:
            sql += f" HAVING {having}"
        got = sql_query(sql, t=pdf, reduce_output=False)
        con = duckdb.connect()
        con.register("t", pdf)
        want = con.sql(sql).df()
        con.close()
        kcols = [k.strip() for k in keys.split(",")]
        got = got.sort_values(kcols).reset_index(drop=True)
        want = want.sort_values(kcols).reset_index(drop=True)
        assert len(got) == len(want), sql
        for k in kcols:
            assert list(got[k]) == list(want[k]), sql
        for c in ("x", "y"):
            for gv, wv in zip(got[c], want[c]):
                assert float(gv) == pytest.approx(float(wv), rel=1e-12), sql


class TestJoinAndSetOpFuzz:
    from hypothesis import HealthCheck, given, settings

    @staticmethod
    def _frames():
        import pandas as pd

        # object dtype keeps NULL keys as real SQL NULLs through
        # Arrow (float NaN keys would change join semantics)
        l = pd.DataFrame(
            {
                "k": pd.array([1, 2, 2, None, 5, 3], dtype="Int64"),
                "lv": [10, 20, 21, 30, 50, 33],
            }
        )
        r = pd.DataFrame(
            {
                "k": pd.array([2, 3, 3, None, 7], dtype="Int64"),
                "rv": [200, 300, 301, 400, 700],
            }
        )
        return l, r

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.sampled_from(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]),
        st.sampled_from([None, "l.lv > 15", "r.rv < 350", "l.lv + 0 > 15"]),
    )
    def test_join_fuzz_matches_duckdb(self, how, where):
        """All four join kinds over keysets with duplicates and NULL
        keys (which must never match), with and without post-join
        filters — through the full sql_query path vs DuckDB."""
        import duckdb

        from dfsql_spark import sql_query

        l, r = self._frames()
        sql = (
            f"SELECT l.lv AS lv, r.rv AS rv FROM l {how} r ON l.k = r.k"
            + (f" WHERE {where}" if where else "")
        )
        got = sql_query(sql, l=l, r=r, reduce_output=False)
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        want = con.sql(sql).df()
        con.close()
        norm = lambda df: sorted(
            tuple((v != v, 0.0 if v != v else float(v)) for v in row)
            for row in df[["lv", "rv"]].astype("float64").itertuples(index=False)
        )
        assert norm(got) == norm(want), sql

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.sampled_from(
            ["UNION", "UNION ALL", "EXCEPT", "EXCEPT ALL",
             "INTERSECT", "INTERSECT ALL"]
        ),
        st.sampled_from(["k", "k + 1", "k * 2"]),
    )
    def test_setop_fuzz_matches_duckdb(self, op, expr):
        """Every set operation (incl. the ALL multiplicity variants)
        over overlapping multisets with NULLs — NULL equality in set
        ops (group semantics) differs from join equality, so this is
        its own surface."""
        import duckdb

        from dfsql_spark import sql_query

        l, r = self._frames()
        sql = f"SELECT {expr} AS v FROM l {op} SELECT k AS v FROM r"
        got = sql_query(sql, l=l, r=r, reduce_output=False)
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        want = con.sql(sql).df()
        con.close()
        norm = lambda df: sorted(
            ((None if v != v else float(v)) for v in df["v"]),
            key=lambda x: (x is None, x),
        )
        assert norm(got) == norm(want), sql


class TestSubqueryAndOrderFuzz:
    from hypothesis import HealthCheck, given, settings

    @staticmethod
    def _frames():
        import pandas as pd

        # no NULL keys: NOT IN under NULL is the documented non-3VL
        # divergence (COVERAGE.md §2.8), not a fuzz target
        l = pd.DataFrame(
            {"k": [1, 2, 2, 5, 3, 7], "lv": [10, 20, 21, 50, 33, 70]}
        )
        r = pd.DataFrame({"k": [2, 3, 3, 9], "rv": [200, 300, 301, 900]})
        return l, r

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.sampled_from([
            "k IN (SELECT k FROM r)",
            "k NOT IN (SELECT k FROM r)",
            "EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
            "NOT EXISTS (SELECT 1 FROM r WHERE r.k = l.k)",
            "k > (SELECT MIN(k) FROM r)",
            "lv >= (SELECT AVG(rv) FROM r) / 10",
        ]),
        st.sampled_from([None, "lv > 15"]),
    )
    def test_subquery_fuzz_matches_duckdb(self, pred, extra):
        """IN / NOT IN / correlated EXISTS / scalar subqueries under
        WHERE, optionally conjoined with a plain predicate — the
        q16/q17/q29 composition space, via the full sql_query path."""
        import duckdb

        from dfsql_spark import sql_query

        l, r = self._frames()
        sql = f"SELECT lv FROM l WHERE {pred}"
        if extra:
            sql += f" AND {extra}"
        got = sql_query(sql, l=l, r=r, reduce_output=False)
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        want = con.sql(sql).df()
        con.close()
        assert sorted(map(int, got["lv"])) == sorted(map(int, want["lv"])), sql

    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.sampled_from(["lv", "lv DESC", "k, lv DESC", "k DESC, lv"]),
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=0, max_value=3),
    )
    def test_order_limit_offset_fuzz_matches_duckdb(self, order, lim, off):
        """ORDER BY (multi-key, mixed directions — made total by
        construction: lv is unique) + LIMIT + OFFSET must return the
        identical SEQUENCE, not just the same set."""
        import duckdb

        from dfsql_spark import sql_query

        l, _ = self._frames()
        sql = f"SELECT lv FROM l ORDER BY {order} LIMIT {lim} OFFSET {off}"
        got = sql_query(sql, l=l, reduce_output=False)
        con = duckdb.connect()
        con.register("l", l)
        want = con.sql(sql).df()
        con.close()
        assert list(map(int, got["lv"])) == list(map(int, want["lv"])), sql


# conditional + wider-string extension of the AST fuzz: CASE WHEN /
# COALESCE / NULLIF (NULLs INTRODUCED deterministically by NULLIF and
# consumed by CASE/COALESCE — the documented non-3VL AND/OR divergence
# never enters because no NULL reaches a boolean connective) and the
# substring/trim/replace/length string pool.
def _render2(node):
    kind = node[0]
    if kind == "lit":
        v = node[1]
        return f"'{v}'" if isinstance(v, str) else str(v)
    if kind == "col":
        return node[1]
    if kind == "bin":
        _, op, l, r = node
        return f"({_render2(l)} {op} {_render2(r)})"
    if kind == "nullif":
        _, l, r = node
        return f"NULLIF({_render2(l)}, {_render2(r)})"
    if kind == "coalesce":
        _, l, r = node
        return f"COALESCE({_render2(l)}, {_render2(r)})"
    if kind == "case":
        _, c, t, e = node
        op, cl, cr = c
        return (
            f"(CASE WHEN {_render2(cl)} {op} {_render2(cr)}"
            f" THEN {_render2(t)} ELSE {_render2(e)} END)"
        )
    if kind == "sfn":
        _, name, arg = node
        if name == "substr2":
            return f"SUBSTRING({_render2(arg)}, 2)"
        if name == "substr13":
            return f"SUBSTRING({_render2(arg)}, 1, 3)"
        if name == "replace":
            return f"REPLACE({_render2(arg)}, 'a', 'z')"
        if name == "trim":
            return f"TRIM({_render2(arg)})"
        return f"{name}({_render2(arg)})"
    if kind == "slen":
        return f"LENGTH({_render2(node[1])})"
    raise AssertionError(node)


@st.composite
def _cond_num_node(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(st.sampled_from(
            [("col", "a"), ("col", "b"), ("lit", 2), ("lit", 3),
             ("slen", ("col", "s"))]
        ))
    kind = draw(st.sampled_from(["bin", "nullif", "coalesce", "case"]))
    if kind == "bin":
        op = draw(st.sampled_from(["+", "-", "*"]))
        return ("bin", op, draw(_cond_num_node(depth=depth + 1)),
                draw(_cond_num_node(depth=depth + 1)))
    if kind == "nullif":
        return ("nullif", draw(_cond_num_node(depth=depth + 1)),
                draw(st.sampled_from([("lit", 2), ("col", "a")])))
    if kind == "coalesce":
        return ("coalesce",
                ("nullif", draw(_cond_num_node(depth=depth + 1)), ("lit", 3)),
                draw(_cond_num_node(depth=depth + 1)))
    cmp_op = draw(st.sampled_from(["<", "<=", ">", "="]))
    return ("case",
            (cmp_op, draw(_cond_num_node(depth=depth + 1)),
             draw(_cond_num_node(depth=depth + 1))),
            draw(_cond_num_node(depth=depth + 1)),
            draw(_cond_num_node(depth=depth + 1)))


@st.composite
def _wide_str_node(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(st.sampled_from(
            [("col", "s"), ("lit", "abc"), ("lit", " aXa ")]
        ))
    name = draw(st.sampled_from(
        ["lower", "upper", "substr2", "substr13", "replace", "trim"]
    ))
    return ("sfn", name, draw(_wide_str_node(depth=depth + 1)))


class TestConditionalAndStringFuzz:
    from hypothesis import HealthCheck, given, settings

    @settings(
        max_examples=30, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(_cond_num_node(), _wide_str_node())
    def test_conditional_and_string_exprs_match_duckdb(self, num, sn):
        import duckdb
        import pandas as pd

        from dfsql_spark import sql_query

        pdf = pd.DataFrame(
            {
                "id": range(6),
                "a": [1, 2, 3, 2, 5, 3],
                "b": [2, 2, 4, 1, 3, 3],
                "s": ["ab", " cD ", "xa", "", "aaa", "zb"],
            }
        )
        sql = (
            f"SELECT id, {_render2(num)} AS v, {_render2(sn)} AS w FROM t"
        )
        got = (
            sql_query(sql, t=pdf, reduce_output=False)
            .sort_values("id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", pdf)
        want = con.sql(sql).df().sort_values("id").reset_index(drop=True)
        con.close()
        import math

        for gv, wv in zip(got["v"], want["v"]):
            g_null = gv is None or (isinstance(gv, float) and math.isnan(gv))
            w_null = wv is None or (isinstance(wv, float) and math.isnan(wv))
            assert g_null == w_null, sql
            if not g_null:
                assert float(gv) == pytest.approx(float(wv), rel=1e-12), sql
        assert list(got["w"].astype(str)) == list(want["w"].astype(str)), sql
