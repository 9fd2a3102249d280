"""canon_url_native (JVM) vs kernels.normalize_url (Python oracle): the
frontier's alias-collapse step must canonicalize byte-for-byte with the
reference kernel on every URL shape the crawl emits (P1 twin contract)."""

from pyspark.sql import functions as F

from web2llmstxt_spark.functions import kernels, native

CASES = [
    "https://ex.example/docs/word-3",
    "https://ex.example/docs/word-3/",
    "https://ex.example/docs/word-3//",
    "https://ex.example/docs/word-3?utm_source=news&ref=sidebar",
    "https://ex.example/docs/word-3?utm_source=news&page=2",
    "https://ex.example/docs/word-3?page=2&UTM_Source=news",
    "HTTPS://EX.EXAMPLE/docs/word-3#frag",
    "http://ex.example/",
    "http://ex.example",
    "https://ex.example/docs/word-3?id=12345678901",
    "https://ex.example/docs/word-3/logo.png",
    "https://bh7.example/blog/alpha-9?page=2#middle",
]


def test_canon_native_matches_kernel(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["raw"])
    got = {
        r["raw"]: r["canon"]
        for r in df.select(
            "raw", native.canon_url_native(F.col("raw")).alias("canon")
        ).collect()
    }
    for u in CASES:
        assert got[u] == kernels.normalize_url(u), u


def test_canon_sql_matches_kernel():
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS raw", [CASES])
    rows = con.execute(
        f"SELECT raw, {native.canon_url_sql('raw')} AS canon FROM t"
    ).fetchall()
    for raw, canon in rows:
        assert canon == kernels.normalize_url(raw), raw
