"""PII scan/redact fixture tests: the driver corpus is synthetic word
salad (zero expected matches), so the operators' behavior on text that
DOES contain emails/IPs/phone numbers is pinned here on a hand-built
fixture, cross-checked against the DuckDB twin of each pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatamlteamrepo_spark.operators.pii import (
    PII_PATTERNS,
    pii_counts,
    pii_counts_sql,
    redact_pii,
)

ROWS = [
    ("plain", "the quick brown fox jumps over the lazy dog", 0, 0, 0),
    ("email", "contact Bob.Smith+spam@Example.co.uk for details", 1, 0, 0),
    ("two_emails", "a@b.io and c.d@e-f.org wrote in", 2, 0, 0),
    ("ipv4", "server at 192.168.0.1 timed out", 0, 1, 0),
    ("ip_not_phone", "10.0.0.1 10.0.0.2", 0, 2, 0),
    ("phone_intl", "call +1 555-867-5309 now", 0, 0, 1),
    ("phone_plain", "fax 02079460000 please", 0, 0, 1),
    ("short_digits", "room 12345 floor 6", 0, 0, 0),
    ("mixed", "Al <al@x.ai> at 8.8.8.8, tel +44 20 7946 0958", 1, 1, 1),
    ("empty", "", 0, 0, 0),
]


def _fixture(spark):
    return spark.createDataFrame(
        ROWS, "case: string, text: string, e: int, i: int, p: int"
    )


def test_counts_match_fixture(spark):
    counts = pii_counts("text")
    df = _fixture(spark).select(
        "case", "e", "i", "p", *[c.alias(k) for k, c in counts.items()]
    )
    for r in df.collect():
        assert (r.n_email, r.n_ipv4, r.n_phone) == (r.e, r.i, r.p), r.case


def test_counts_match_duckdb(spark, duck):
    """Every pattern stays inside the Java∩RE2 regex subset: DuckDB's
    count of the same pattern over the same text must agree."""
    df = _fixture(spark)
    spark_rows = {
        r.case: (r.n_email, r.n_ipv4, r.n_phone)
        for r in df.select(
            "case", *[c.alias(k) for k, c in pii_counts("text").items()]
        ).collect()
    }
    for case, text, *_ in ROWS:
        exprs = pii_counts_sql(f"lower({text!r})")
        duck_row = tuple(
            duck.execute(f"SELECT {exprs[k]}").fetchone()[0]
            for k in ("n_email", "n_ipv4", "n_phone")
        )
        assert duck_row == spark_rows[case], case


def test_redact_removes_all_matches(spark):
    df = _fixture(spark).select("case", redact_pii("text").alias("red"))
    red = df.withColumn(
        "counts", F.struct(*[c.alias(k) for k, c in pii_counts("red").items()])
    )
    for r in red.collect():
        assert r.counts.n_email == 0, r.case
        assert r.counts.n_ipv4 == 0, r.case
        # redaction tokens like [PHONE] contain no digits, so the phone
        # pattern cannot re-match either
        assert r.counts.n_phone == 0, r.case


def test_redact_tokens_present(spark):
    out = {
        r.case: r.red
        for r in _fixture(spark).select("case", redact_pii("text").alias("red")).collect()
    }
    assert "[EMAIL]" in out["email"]
    assert "[IPV4]" in out["ipv4"]
    assert "[PHONE]" in out["phone_intl"]
    # IP redacted before the phone pattern can half-eat the dotted quad
    assert out["ip_not_phone"].count("[IPV4]") == 2
    assert "[PHONE]" not in out["ip_not_phone"]
    assert out["plain"] == ROWS[0][1]


def test_patterns_have_no_engine_specific_syntax():
    for pat in PII_PATTERNS.values():
        for bad in ("(?=", "(?!", "(?<", "\\1", "(?i)"):
            assert bad not in pat
