"""robots.txt text parser (operators/robots.py): RFC 9309 group selection,
Crawl-delay extraction, cap derivation, and the wiring into the frontier's
structured-rules contract."""

from web2llmstxt_spark.operators import robots

BODY = """
# comments everywhere   # nested
User-agent: googlebot
Disallow: /google-only

User-agent: special-bot
User-agent: other-bot
Disallow: /special
Crawl-delay: 0.5

USER-AGENT: *
disallow: /search
Allow: /search/docs
Disallow:
Crawl-Delay: 2
Sitemap: https://h.example/sitemap.xml
Noindex: /ignored-unknown-field
"""


def test_star_group_selected_for_unknown_agent():
    got = robots.parse_robots_text(BODY, agent="mycrawler")
    assert got["rules"] == [("disallow", "/search"), ("allow", "/search/docs")]
    assert got["crawl_delay_ms"] == 2000
    assert got["sitemaps"] == ["https://h.example/sitemap.xml"]


def test_longest_agent_match_beats_star():
    got = robots.parse_robots_text(BODY, agent="special-bot/1.0")
    assert got["rules"] == [("disallow", "/special")]
    assert got["crawl_delay_ms"] == 500


def test_multi_agent_group_shares_directives():
    got = robots.parse_robots_text(BODY, agent="other-bot")
    assert got["rules"] == [("disallow", "/special")]


def test_empty_and_directive_before_group():
    assert robots.parse_robots_text("", agent="*") == {
        "rules": [], "crawl_delay_ms": None, "sitemaps": [],
    }
    # directives before any User-agent line are ignored (RFC 9309)
    got = robots.parse_robots_text("Disallow: /x\nUser-agent: *\nDisallow: /y\n")
    assert got["rules"] == [("disallow", "/y")]


def test_df_parse_and_caps(spark):
    bodies = spark.createDataFrame(
        [
            ("a.example", BODY),
            ("b.example", "User-agent: *\nCrawl-delay: 10\n"),
            ("c.example", "User-agent: *\nDisallow: /p\n"),
        ],
        "host string, robots_txt string",
    )
    pol = robots.parse_robots_df(bodies)
    rows = {(r["host"], r["rule"], r["path_prefix"]) for r in pol.collect()}
    assert ("a.example", "disallow", "/search") in rows
    assert ("b.example", "allow", "/") in rows  # delay carrier row
    assert ("c.example", "disallow", "/p") in rows
    caps = robots.crawl_delay_to_caps(pol, superstep_seconds=30)
    assert caps == {"a.example": 15, "b.example": 3}  # 30/2s, 30/10s
    # structured-rules handoff shape for FrontierCrawler(robots_rules=...)
    rl = robots.rules_list(pol)
    assert ("c.example", "*", "disallow", "/p") in rl


def test_caps_floor_at_one(spark):
    bodies = spark.createDataFrame(
        [("slow.example", "User-agent: *\nCrawl-delay: 9999\n")],
        "host string, robots_txt string",
    )
    caps = robots.crawl_delay_to_caps(
        robots.parse_robots_df(bodies), superstep_seconds=1
    )
    assert caps == {"slow.example": 1}  # progress never starves


def test_zero_delay_means_no_cap(spark):
    bodies = spark.createDataFrame(
        [("z.example", "User-agent: *\nCrawl-delay: 0\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    pol = robots.parse_robots_df(bodies)
    assert robots.crawl_delay_to_caps(pol, superstep_seconds=30) == {}


def test_duplicate_star_groups_combine():
    # RFC 9309: all groups at the winning specificity merge, file order
    body = (
        "User-agent: *\nDisallow: /a\n\n"
        "User-agent: *\nDisallow: /b\nCrawl-delay: 3\n"
    )
    got = robots.parse_robots_text(body)
    assert got["rules"] == [("disallow", "/a"), ("disallow", "/b")]
    assert got["crawl_delay_ms"] == 3000


def test_garbage_delay_ignored():
    for bad in ("inf", "1e400", "-inf", "fast", "nan"):
        got = robots.parse_robots_text(f"User-agent: *\nCrawl-delay: {bad}\n")
        assert got["crawl_delay_ms"] is None, bad


def test_wild_crawl_delay_clamped_int32_safe(spark):
    # ADVICE r4: 'Crawl-delay: 99999999999' -> would overflow int32 at the
    # Arrow conversion; the parser clamps to 1 day.
    parsed = robots.parse_robots_text(
        "User-agent: *\nDisallow: /x\nCrawl-delay: 99999999999\n"
    )
    assert parsed["crawl_delay_ms"] == 86_400_000
    df = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /x\nCrawl-delay: 99999999999\n")],
        "host string, robots_txt string",
    )
    rows = robots.parse_robots_df(df).collect()
    assert rows and all(r["crawl_delay_ms"] == 86_400_000 for r in rows)
