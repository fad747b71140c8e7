"""Data-quality operators (operators/quality.py): profiling counts and
expectation violations pinned on deliberately dirty fixtures."""

from lazy_frame_spark.operators import quality as dq


def _dirty(spark):
    rows = [
        (1, "a@x.io", 10.0, "O"),
        (2, None,     -5.0, "O"),    # null email, below range
        (2, "b@y.io", 20.0, "Q"),    # duplicate id, bad status
        (3, "c@z.io", 999.0, "F"),   # above range
        (4, "not-an-email", 15.0, "P"),
    ]
    return spark.createDataFrame(rows, "id long, email string, amt double, st string")


def test_profile_columns_counts(spark):
    df = _dirty(spark)
    got = {r["column"]: r for r in dq.profile_columns(df, ["id", "email"]).collect()}
    assert got["id"]["n"] == 5
    assert got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 4
    assert (got["id"]["min_str"], got["id"]["max_str"]) == ("1", "4")
    assert got["email"]["n_null"] == 1
    assert got["email"]["n_distinct"] == 4


def test_profile_approx_mode_runs(spark):
    df = _dirty(spark)
    got = {r["column"]: r for r in dq.profile_columns(df, ["id"], approx=True).collect()}
    assert abs(got["id"]["n_distinct"] - 4) <= 1


def test_expectations_count_violations(spark):
    df = _dirty(spark)
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    got = {
        r["rule"]: r["n_violations"]
        for r in dq.check_expectations(
            df,
            row_rules=[
                dq.expect_not_null("email"),
                dq.expect_in_range("amt", 0.0, 100.0),
                dq.expect_in_set("st", ["O", "F", "P"]),
                dq.expect_matches("email", r"[a-z]+@[a-z]+\.[a-z]+"),
            ],
            unique=[["id"]],
            references=[("id", dim, "pk")],
        ).collect()
    }
    assert got["not_null(email)"] == 1
    assert got["in_range(amt,0.0,100.0)"] == 2          # -5 and 999
    assert got["in_set(st)"] == 1                        # 'Q'
    assert got["matches(email)"] == 2                    # null + not-an-email
    assert got["unique(id)"] == 1                        # one extra row for id=2
    assert got["ref(id->pk)"] == 1                       # id=4 unmatched


def test_expectations_clean_table_all_zero(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["rule"]: r["n_violations"]
        for r in dq.check_expectations(
            o,
            row_rules=[dq.expect_not_null("o_orderkey")],
            unique=[["o_orderkey"]],
        ).collect()
    }
    assert all(v == 0 for v in got.values())


def test_expect_matches_requires_full_match(spark):
    """Pins the anchoring fix: a value that merely CONTAINS a match must
    still count as a violation (Spark's rlike is find-anywhere; the rule
    demands full-match like the DuckDB mirror)."""
    df = spark.createDataFrame([("ab",), ("xabx",), ("b",)], "v string")
    got = {
        r["rule"]: r["n_violations"]
        for r in dq.check_expectations(
            df, row_rules=[dq.expect_matches("v", "a+b")]
        ).collect()
    }
    assert got["matches(v)"] == 2  # 'xabx' (partial) and 'b' (no match)


def test_compression_ratio_values_and_edges(spark):
    """Exact zlib ratios for fixed inputs (deterministic per level —
    RFC 1950 fixed algorithm), NULL for empty/None text, and the
    spam-vs-prose-vs-noise ordering the gate relies on."""
    import zlib

    from lazy_frame_spark.operators.quality import compression_ratio

    texts = {
        0: "a" * 200,
        1: "the quick brown fox jumps over the lazy dog. " * 6,
        2: "k9$Gz!qPw@3vXr8&TbNm^2cJd7*LhYf4",
        3: "",
        4: None,
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    got = {r["doc_id"]: r["ratio_bp"]
           for r in compression_ratio(df).collect()}
    for i in (0, 1, 2):
        raw = texts[i].encode("utf-8")
        want = len(zlib.compress(raw, 6)) * 10000 // len(raw)
        assert got[i] == want, i
    assert got[3] is None and got[4] is None
    assert got[0] < got[1] < got[2]      # spam < prose < noise
