import duckdb
import pyspark.sql.functions as F

from linkgraph.functions.text import (
    doc_fingerprint_col,
    lang_id_col,
    md5int_col,
    quality_score_col,
    shingle_fingerprint_col,
    token_count_col,
)


def test_token_count(spark):
    df = spark.createDataFrame([("Hello,  world! x",), ("",), ("a b c d",)], "t string")
    got = [r[0] for r in df.select(token_count_col(F.col("t"))).collect()]
    assert got == [3, 0, 4]


def test_md5int_matches_duckdb(spark):
    vals = ["token", "a b", "", "Ünïcode"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r[0] for r in df.select(md5int_col(F.col("s"))).collect()]
    want = [
        duckdb.sql(f"SELECT ('0x'||substr(md5(?),1,15))::BIGINT", params=[v]).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_lang_id(spark):
    rows = [
        ("the cat and the dog is in a tree", "en"),
        ("der hund und die katze ist nicht ein tier", "de"),
        ("le chat et les chiens est pour la maison", "fr"),
        ("xyzzy qwerty", "en"),  # no hits → tie → en
    ]
    df = spark.createDataFrame(rows, "t string, want string")
    out = df.select("want", lang_id_col(F.col("t")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["want"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [("the cat is on the mat and it is a fine day for all of us to see",),
         ("!!! ### $$$",), ("",)],
        "t string",
    )
    got = [r[0] for r in df.select(quality_score_col(F.col("t"))).collect()]
    assert got[0] > 0.3
    assert got[1] <= 0.0 + 1e-9
    assert got[2] == 0.0


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "The  quick brown fox"), (2, "the quick  BROWN fox"), (3, "other text here")],
        "id long, t string",
    )
    fp = {r["id"]: r["f"] for r in df.select("id", doc_fingerprint_col(F.col("t")).alias("f")).collect()}
    assert fp[1] == fp[2]  # whitespace/case-insensitive
    assert fp[1] != fp[3]
    # shingle fingerprint: short docs fall back to doc fingerprint
    sf = {r["id"]: r["f"] for r in df.select("id", shingle_fingerprint_col(F.col("t"), k=5).alias("f")).collect()}
    assert sf[1] == fp[1]


def test_shingle_fingerprint_shift_tolerant(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, "PREFIX " + base)], "id long, t string"
    )
    sf = {r["id"]: r["f"] for r in df.select("id", shingle_fingerprint_col(F.col("t"), k=5).alias("f")).collect()}
    assert sf[1] == sf[2]  # min-shingle survives a prefix insertion


def test_repetition_stats_known_values(spark):
    from linkgraph.functions.text import dup_trigram_frac_col, type_token_ratio_col

    rows = [
        # 9 tokens, 3 distinct → ttr 1/3; 7 trigrams, 3 distinct → 4/7
        ("a b c a b c a b c", 0.333333, 0.571429),
        ("a", 1.0, 0.0),          # too short for trigrams
        ("", 0.0, 0.0),           # empty doc
        ("x y", 1.0, 0.0),
        ("a a a a a", 0.2, 0.666667),
        (None, 0.0, 0.0),         # null text
    ]
    df = spark.createDataFrame(rows, "t string, ttr double, dup3 double")
    out = df.select(
        "ttr",
        "dup3",
        type_token_ratio_col(F.col("t")).alias("got_ttr"),
        dup_trigram_frac_col(F.col("t")).alias("got_dup3"),
    ).collect()
    for r in out:
        assert r["got_ttr"] == r["ttr"]
        assert r["got_dup3"] == r["dup3"]


def test_pii_counts_and_redaction_vs_python_re(spark):
    """Counts and redacted text byte-match Python re on texts with
    multiple/zero hits per type; pattern order (email → IP → phone)
    keeps dotted/dashed digit runs from double-matching."""
    import re

    from pyspark.sql import functions as F

    from linkgraph.functions.text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_email_count_col,
        pii_ipv4_count_col,
        pii_phone_count_col,
        redact_pii_col,
    )

    rows = [
        (1, "mail me at john.doe+x@sub.example.org or call 555-0123 now"),
        (2, "server 10.0.255.3 and 192.168.1.1 no contact"),
        (3, "clean text with numbers 12345 and dash 12-34 only"),
        (4, "two mails a@b.co c.d@e-f.io ip 1.2.3.4 phone 999-1234"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_email_count_col(F.col("text")).alias("e"),
            pii_ipv4_count_col(F.col("text")).alias("i"),
            pii_phone_count_col(F.col("text")).alias("p"),
            redact_pii_col(F.col("text")).alias("red"),
        ).collect()
    }
    for i, t in rows:
        red = re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        red = re.sub(PII_IPV4_RE, "<IP>", red)
        red = re.sub(PII_PHONE_RE, "<PHONE>", red)
        r = got[i]
        assert (r["e"], r["i"], r["p"]) == (
            len(re.findall(PII_EMAIL_RE, t)),
            len(re.findall(PII_IPV4_RE, t)),
            len(re.findall(PII_PHONE_RE, t)),
        )
        assert r["red"] == red
