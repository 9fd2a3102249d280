"""PII scrubbing: sequential redaction chain, engine-parity regex subset."""

import duckdb
import pytest

from web2llmstxt_spark.operators import scrub


@pytest.fixture(scope="module")
def pii_rows():
    return [
        (0, "mail me at jane.doe+x@sub.example.org thanks"),
        (1, "server at 10.0.0.5 and 192.168.001.244 responded"),
        (2, "call +1 555 012 0199 or +49-301-555-0133 now"),
        # user@IP is NOT an email (alphabetic TLD required): both IPs redact
        (3, "root@127.0.0.1 logged in from 127.0.0.1"),
        # but an IP-shaped string inside a real email's local part is eaten
        # by the email redaction (sequential chain, no double count)
        (5, "ping 10.9.8.7.bot@spam.example.com first"),
        (4, "nothing sensitive here at all"),
    ]


def test_counts_and_redaction(spark, pii_rows):
    docs = spark.createDataFrame(pii_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in scrub.scrub_pii(docs).collect()}
    assert (out[0].n_email, out[0].n_phone, out[0].n_ipv4) == (1, 0, 0)
    assert "<EMAIL>" in out[0].text_clean and "jane" not in out[0].text_clean
    assert out[1].n_ipv4 == 2 and "<IP> and <IP>" in out[1].text_clean
    assert out[2].n_phone == 2 and out[2].text_clean.count("<PHONE>") == 2
    assert (out[3].n_email, out[3].n_ipv4) == (0, 2)
    assert out[3].text_clean == "root@<IP> logged in from <IP>"
    # sequential chain: email redaction runs first and eats the IP-shaped
    # local part, so n_ipv4 stays 0 — no double counting
    assert (out[5].n_email, out[5].n_ipv4) == (1, 0)
    assert out[5].text_clean == "ping <EMAIL> first"
    assert not out[4].has_pii
    assert out[4].text_clean == "nothing sensitive here at all"
    assert all(out[i].has_pii for i in (0, 1, 2, 3, 5))


def test_keep_cols_passthrough(spark, pii_rows):
    docs = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in pii_rows],
        "doc_id long, text string, src string",
    )
    out = scrub.scrub_pii(docs, keep_cols=("src",))
    assert out.columns == [
        "doc_id", "src", "n_email", "n_phone", "n_ipv4", "text_clean", "has_pii",
    ]
    assert {r.src for r in out.collect()} == {"s0", "s1"}


def test_duckdb_twin_bit_parity(spark, pii_rows):
    """The SQL emitter runs the identical chain: every count and the fully
    redacted text agree byte-for-byte across engines."""
    docs = spark.createDataFrame(pii_rows, "doc_id long, text string")
    got = sorted(map(tuple, scrub.scrub_pii(docs).collect()))

    counts, clean = scrub.scrub_sql("text")
    con = duckdb.connect()
    con.execute("create table t(doc_id bigint, text varchar)")
    con.executemany("insert into t values (?, ?)", pii_rows)
    want = sorted(
        map(
            tuple,
            con.execute(
                f"select doc_id, {', '.join(counts)}, {clean} as text_clean, "
                f"(n_email + n_phone + n_ipv4) > 0 as has_pii from t"
            ).fetchall(),
        )
    )
    assert got == want
