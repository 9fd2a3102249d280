"""L2 pagination discovery — kernel branch coverage + Spark UDF plumbing.

Reference semantics under test: crawler/web_crawler.py:524-632 (five
pattern groups, per-group href guards, base_domain substring keep test).
"""

from web2llmstxt_spark.functions.pagination import discover_pagination_links

BASE = "https://ex.com/blog"
DOM = "ex.com"


def disc(html, url=BASE + "?page=3", dom=DOM):
    # default url carries ?page=3 so group 3 synthesizes a known set we can
    # subtract when a test targets the HTML-driven groups only
    return discover_pagination_links(html, url, dom)


def seq_only(url=BASE + "?page=3", dom=DOM):
    return discover_pagination_links("<p></p>", url, dom)


def html_only(html, url=BASE + "?page=3", dom=DOM):
    return disc(html, url, dom) - seq_only(url, dom)


# --------------------------------------------------------------- group 1

def test_rel_next_and_class_tokens():
    h = (
        '<a rel="next" href="/a">x</a>'
        '<a class="big next" href="/b">x</a>'
        '<a class="next-page" href="/c">x</a>'
        '<a class="page-next" href="/d">x</a>'
    )
    assert html_only(h) == {
        "https://ex.com/a", "https://ex.com/b",
        "https://ex.com/c", "https://ex.com/d",
    }


def test_rel_exact_value_not_token():
    # CSS [rel="next"] is an exact attribute match: "next nofollow" misses
    assert html_only('<a rel="next nofollow" href="/a">x</a>') == set()


def test_aria_title_case_insensitive_and_text_contains():
    h = (
        '<a aria-label="Go NEXT page" href="/a">x</a>'
        '<a title="NeXt" href="/b">x</a>'
        '<a href="/c">see Next items</a>'
        '<a href="/d">&gt;</a>'
        '<a href="/e">→</a>'
        '<a href="/f">next (lowercase text does not match)</a>'
    )
    assert html_only(h) == {f"https://ex.com/{p}" for p in "abcde"}


def test_group1_guards_hash_and_javascript():
    h = '<a href="#">Next</a><a href="javascript:void(0)">Next</a>'
    assert html_only(h) == set()


def test_off_domain_rejected():
    assert html_only('<a rel="next" href="https://other.org/a">x</a>') == set()


# --------------------------------------------------------------- group 2

def test_numbered_pager_ancestors():
    h = (
        '<div class="pagination"><a href="/l?page=2">2</a></div>'
        '<div class="pager"><span><a href="/l?page=4">4</a></span></div>'
        '<ul class="page-numbers"><li><a href="/five">5</a></li></ul>'
        '<nav><a href="/l?pagex">n</a></nav>'
        '<div class="pagination-list"><a href="/six">6</a></div>'
    )
    assert html_only(h) == {
        "https://ex.com/l?page=2", "https://ex.com/l?page=4",
        "https://ex.com/five", "https://ex.com/l?pagex",
        "https://ex.com/six",
    }


def test_pager_class_on_self_is_not_ancestor_match():
    # ".page-numbers a" needs a PROPER ancestor with the class
    assert html_only('<a class="page-numbers" href="/x">7</a>') == set()


def test_href_substring_selectors_with_suffix_exclusions():
    h = (
        '<a href="/archive/page/7">7</a>'      # page/ .. not ending /page/
        '<a href="/archive/page/">t</a>'        # ends with /page/ -> excluded
        '<a href="/q?p=9">9</a>'                # p= .. not ending p=
        '<a href="/q?p=">t</a>'                 # ends with p= -> excluded
    )
    assert html_only(h) == {
        "https://ex.com/archive/page/7", "https://ex.com/q?p=9",
    }


# --------------------------------------------------------------- group 3

def test_sequential_from_current_url():
    got = seq_only("https://ex.com/list?page=3", DOM)
    assert got == {
        f"https://ex.com/list?page={n}" for n in (1, 2, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    }


def test_probe_branch_when_no_pattern_and_no_query():
    got = seq_only("https://ex.com/blog", DOM)
    assert got == {
        f"https://ex.com/blog?{p}={n}" for p in ("page", "p") for n in (2, 3, 4, 5)
    }


# --------------------------------------------------------------- group 4

def test_load_more_variants():
    h = (
        '<a href="/load-items">x</a>'
        '<a href="/show-more">x</a>'
        '<button data-url="/ajax/next-batch">Load</button>'
        '<a data-page="2" data-url="/dp">x</a>'
        '<div class="load-more" href="/lm">x</div>'
        '<span class="show-more" href="/sm">x</span>'
        '<button>no data-url</button>'
    )
    assert html_only(h) == {
        "https://ex.com/load-items", "https://ex.com/show-more",
        "https://ex.com/ajax/next-batch", "https://ex.com/dp",
        "https://ex.com/lm", "https://ex.com/sm",
    }


# --------------------------------------------------------------- group 5

def test_form_actions():
    h = (
        '<form action="/search?q=a"></form>'
        '<form action="/Page/2"></form>'
        '<form action="/contact"></form>'
        '<form></form>'
    )
    assert html_only(h) == {
        "https://ex.com/search?q=a", "https://ex.com/Page/2",
    }


# ------------------------------------------------------- robustness / spark

def test_malformed_html_and_empty():
    assert disc("", BASE, DOM) - seq_only(BASE, DOM) == set()
    # unclosed tags / stray end tags must not raise
    html_only("<div><a href='/a'>Next<p></span></div>")


def test_spark_udf_matches_kernel(spark):
    from pyspark.sql import functions as F

    from web2llmstxt_spark.functions.pagination import discover_pagination_udf

    rows = [
        ("https://ex.com/blog", '<a rel="next" href="/n">x</a>'),
        ("https://ex.com/list?page=3", '<div class="pagination"><a href="/l?page=4">4</a></div>'),
        ("https://ex.com/p", ""),
    ]
    df = spark.createDataFrame(rows, "url string, html string").withColumn(
        "dom", F.lit(DOM)
    )
    got = {
        r["url"]: r["out"]
        for r in df.select(
            "url", discover_pagination_udf("html", "url", "dom").alias("out")
        ).collect()
    }
    for url, html in rows:
        assert got[url] == sorted(discover_pagination_links(html, url, DOM))
