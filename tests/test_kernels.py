"""Unit tests for the pure-Python kernels (FIXTURES.md §7).

Mirrors the reference's own unit suite (/root/reference/tests/test_text_utils.py)
plus one case per branch of the v2 URL scorer (C1) and the normalizer (P1).
"""

from web2llmstxt_spark.functions import kernels as K


class TestCleanTitle:
    def test_reference_suite(self):
        # same asserts as reference tests/test_text_utils.py:19-30
        assert K.clean_title("  My Awesome Page | SiteName  ") == "My Awesome Page"
        assert K.clean_title("my awesome page - site name") == "My Awesome Page"
        assert K.clean_title("Untitled Page") == "Untitled Page"
        assert K.clean_title("PAGE IN CAPS") == "Page In Caps"
        assert K.clean_title("page with &amp; entity") == "Page With Entity"
        assert K.clean_title("") == "Untitled Page"
        assert K.clean_title(None) == "Untitled Page"
        assert K.clean_title("Simple Title") == "Simple Title"
        assert K.clean_title("Title - Suffix") == "Title"
        assert K.clean_title("Prefix - Title") == "Prefix"


class TestExtractDomain:
    def test_reference_suite(self):
        # reference tests/test_text_utils.py:33-38
        assert K.extract_domain_from_url("https://www.example.com/path?query=1") == "example.com"
        assert K.extract_domain_from_url("http://sub.example.co.uk/path") == "sub.example.co.uk"
        assert K.extract_domain_from_url("ftp://example.com") == "example.com"
        assert K.extract_domain_from_url("example.com/path") == "example.com"
        assert K.extract_domain_from_url("invalid_url") == "unknown_domain"
        assert K.extract_domain_from_url("https://www.test-site.com") == "test-site.com"


class TestIsNavigationText:
    def test_reference_suite(self):
        # reference tests/test_text_utils.py:41-48
        assert not K.is_navigation_text("click here to read more about our services")
        assert K.is_navigation_text("menu navigation sidebar footer")
        assert not K.is_navigation_text(
            "Learn more about our privacy policy and terms of service."
        )
        assert not K.is_navigation_text(
            "This is a regular sentence about the main content of the page."
        )
        assert not K.is_navigation_text("An important heading for a section.")
        assert K.is_navigation_text("Search filter sort by view all", threshold_ratio=0.2)
        assert not K.is_navigation_text("Short", threshold_ratio=0.5)
        assert not K.is_navigation_text("")


class TestNormalizeUrl:
    def test_tracking_params_dropped(self):
        assert (
            K.normalize_url("https://Ex.COM/a/?utm_source=x&utm_medium=y&q=1#frag")
            == "https://ex.com/a?q=1"
        )

    def test_trailing_slash_and_root(self):
        assert K.normalize_url("https://ex.com/") == "https://ex.com/"
        assert K.normalize_url("https://ex.com") == "https://ex.com/"
        assert K.normalize_url("https://ex.com/a/") == "https://ex.com/a"

    def test_fragment_dropped(self):
        assert K.normalize_url("https://ex.com/a#sec") == "https://ex.com/a"

    def test_all_15_tracking_params(self):
        q = "&".join(f"{p}=v" for p in sorted(K.TRACKING_PARAMS))
        assert K.normalize_url(f"https://ex.com/a?{q}") == "https://ex.com/a"

    def test_kept_params_reencoded_in_order(self):
        assert K.normalize_url("https://ex.com/a?b=2&a=1") == "https://ex.com/a?b=2&a=1"


BASE = "https://ex.com"


class TestScoreUrl:
    # one case per branch of llmsgen/crawler/web_crawler.py:147-167 (pyc)
    def test_asset_returns_zero(self):
        assert K.score_url_importance(f"{BASE}/logo.png", BASE) == 0.0
        assert K.score_url_importance(f"{BASE}/app.JS", BASE) == 0.0  # lowercased check

    def test_root_like(self):
        # base 1.0 + shallow 2.0 = 3.0 ('ex' segment not >3 chars)
        assert K.score_url_importance(f"{BASE}/shop", BASE) == 1.0 + 2.0 + 1.0

    def test_high_value_keyword(self):
        # 1.0 + 3.0 (docs) + 2.0 (1 seg) + 1.0 (alpha seg) = 7.0
        assert K.score_url_importance(f"{BASE}/docs", BASE) == 7.0

    def test_high_wins_over_medium(self):
        # 'docs' high + 'download' medium -> elif means only +3.0
        s = K.score_url_importance(f"{BASE}/docs/download", BASE)
        assert s == 1.0 + 3.0 + 1.5 + 1.0  # 2 segs -> +1.5

    def test_medium_value_keyword(self):
        assert K.score_url_importance(f"{BASE}/download", BASE) == 1.0 + 1.5 + 2.0 + 1.0

    def test_low_value_penalty(self):
        # 1.0 - 5.0 + 2.0 + 1.0 = -1.0 -> floor 0.1
        assert K.score_url_importance(f"{BASE}/login", BASE) == 0.1

    def test_two_segment_bonus(self):
        assert K.score_url_importance(f"{BASE}/x/y", BASE) == 1.0 + 1.5

    def test_deep_path_penalty(self):
        s = K.score_url_importance(f"{BASE}/a/b/c/d/e", BASE)
        assert s == 0.1  # 1.0 - 1.0 (5 segs), no alpha bonus -> floored to 0.1

    def test_trailing_empty_second_segment(self):
        # '/shop/' -> segments ['shop'] after strip; use replace-quirk case:
        s = K.score_url_importance(f"{BASE}/wordy/", BASE)
        assert s == 1.0 + 2.0 + 1.0

    def test_pagination_penalty(self):
        s = K.score_url_importance(f"{BASE}/list?page=2", BASE)
        # 1.0 + 2.0 (1 seg: 'list?page=2'... replace/strip/split on full url tail)
        # pagination -3.0; query len 6 -> no -2.0; 'list?page=2' not isalpha
        assert s == max(0.1, 1.0 + 2.0 - 3.0)

    def test_long_query_penalty(self):
        s = K.score_url_importance(f"{BASE}/p?verylongquery=12345", BASE)
        assert s == max(0.1, 1.0 + 2.0 - 2.0)

    def test_case_sensitive_page_check(self):
        # '?PAGE=' must NOT trigger the raw-url pagination penalty
        s_upper = K.score_url_importance(f"{BASE}/list?PAGE=2", BASE)
        s_lower = K.score_url_importance(f"{BASE}/list?page=2", BASE)
        assert s_upper == 3.0  # no pagination penalty on uppercase PAGE
        assert s_lower == 0.1  # 1.0+2.0-3.0=0.0 -> floor

    def test_floor(self):
        s = K.score_url_importance(f"{BASE}/login/a/b/c/d/e?page=2&verylongparam=x", BASE)
        assert s == 0.1


class TestExtractLinks:
    def test_resolution_and_filtering(self):
        raw = [
            "/about",                       # root-relative
            "contact",                      # relative (resolved vs site root)
            "https://ex.com/docs/",         # absolute, in-domain, trailing slash
            "https://other.com/x",          # absolute, out-of-domain -> dropped
            "#frag", "mailto:a@b.c", "tel:123", "javascript:void(0)", "",
            "/a?utm_source=tw",             # tracking param stripped
        ]
        out = K.extract_links(raw, "https://ex.com", "ex.com")
        assert out == sorted(
            ["https://ex.com/about", "https://ex.com/contact", "https://ex.com/docs", "https://ex.com/a"]
        )

    def test_self_link_exclusion_quirk(self):
        # The reference compares the NORMALIZED link against the RAW base_url
        # (crawler/web_crawler.py:497-499): with a slashless base_url the root
        # link survives as 'https://ex.com/'; with a slashed base_url it is
        # excluded. Both replicated exactly.
        assert K.extract_links(["https://ex.com"], "https://ex.com", "ex.com") == [
            "https://ex.com/"
        ]
        assert K.extract_links(["https://ex.com/"], "https://ex.com/", "ex.com") == []


class TestDescriptions:
    def test_golden_mock_page(self):
        # reproduces /root/reference/output/example.com-llms.txt:9
        desc = K.create_smart_fallback_description(
            "Mock Page 1 Title",
            "This is mock content for page 1. It has enough words.",
            "https://example.com/test_mock_crawl/page1",
        )
        assert desc == "Content related to Mock Page 1 Title. From example.com."

    def test_template_chain(self):
        assert K.create_initial_content_description("T", "api documentation here") == (
            "API documentation for T."
        )
        assert K.create_initial_content_description("T", "a tutorial") == "Tutorial and guide for T."
        assert K.create_initial_content_description("T", "our pricing") == "Pricing information for T."
        assert K.create_initial_content_description("T", "features!") == "Features and capabilities of T."
        assert K.create_initial_content_description("T", "blog post") == "Blog post or article about T."
        assert K.create_initial_content_description("T", "about our company") == "Information about T."
        assert K.create_initial_content_description("T", "xyz") == "Content related to T."

    def test_domain_not_appended_when_present(self):
        d = K.create_smart_fallback_description("ex.com docs", "xyz", "https://ex.com/")
        assert d == "Content related to Ex.Com Docs."


class TestCategorize:
    def test_priority_order(self):
        assert K.categorize_entry("https://e.c/api/v1", "t", "") == "API & Technical Reference"
        assert K.categorize_entry("https://e.c/docs", "t", "") == "Key Documentation"
        assert K.categorize_entry("https://e.c/guide", "t", "") == "Guides & Tutorials"
        assert K.categorize_entry("https://e.c/product", "t", "") == "Products & Services"
        assert K.categorize_entry("https://e.c/blog", "t", "") == "Blog & Resources"
        assert K.categorize_entry("https://e.c/x", "about us", "") == "General Information"
        assert K.categorize_entry("https://e.c/x?page=2", "t", "") == "Other Pages"
        assert K.categorize_entry("https://e.c/x", "t", "") == "General Information"

    def test_content_sample_used_except_general(self):
        assert K.categorize_entry("https://e.c/x", "t", "see the manual") == "Key Documentation"
        # 'about' in content alone must NOT route to General Information
        assert K.categorize_entry("https://e.c/x", "t", "about stuff") == "General Information"

    def test_general_info_not_from_content(self):
        # content mentions 'mission' but General tests url/title only -> falls through
        assert K.categorize_entry("https://e.c/x?page=2", "t", "our mission") == "Other Pages"


class TestSiteLevel:
    def test_site_name_falls_back_to_domain(self):
        assert K.extract_site_name("https://example.com/test_mock_crawl", []) == "Example.Com"

    def test_site_name_from_main_page(self):
        pages = [{"url": "https://ex.com", "title": "Acme Widgets | Home"}]
        assert K.extract_site_name("https://ex.com", pages) == "Acme Widgets"

    def test_summary_default(self):
        pages = [{"content": "This is mock content for page 1. It has enough words."}]
        assert (
            K.generate_site_summary(pages)
            == "A comprehensive website offering information and resources on various topics."
        )

    def test_summary_docs(self):
        pages = [{"content": "api documentation for devs"}]
        assert (
            K.generate_site_summary(pages)
            == "Software documentation, API references, and developer resources."
        )


class TestSummarizer:
    def test_short_content_returns_title(self):
        assert K.extract_key_sentences_from_content("My Page", "too short") == "My Page"

    def test_extracts_good_sentences(self):
        content = (
            "This product provides a robust engine for data processing at scale.\n\n"
            "It offers strong consistency guarantees and has wide adoption."
        )
        out = K.extract_key_sentences_from_content("T", content)
        assert "This product provides a robust engine" in out

    def test_word_helpers(self):
        assert K.truncate_text("abcdef", 5) == "ab..."
        assert K.truncate_text("abc", 5) == "abc"
        assert K.extract_words("The quick brown fox is fast!") == ["quick", "brown", "fox", "fast"]
        assert K.calculate_text_similarity("quick brown fox", "quick brown dog") == 0.5


class TestHashing:
    def test_stable_hash_is_deterministic(self):
        assert K.stable_hash64("ex.com") == K.stable_hash64("ex.com")
        assert 0 <= K.host_bucket("ex.com", 32) < 32


class TestScoreUrlV1:
    # one case per branch of the v1 source scorer, crawler/web_crawler.py:150-189
    def test_asset_returns_zero(self):
        assert K.score_url_importance_v1(f"{BASE}/logo.PNG") == 0.0

    def test_base_case(self):
        # no keywords, depth 3 ('https:','','ex.com','x') -> just base 1.0
        assert K.score_url_importance_v1(f"{BASE}/x") == 1.0

    def test_high_value(self):
        assert K.score_url_importance_v1(f"{BASE}/docs") == 3.0

    def test_high_and_medium_both_add(self):
        # v1 uses independent ifs (NOT elif like v2): docs +2.0 AND faq +1.0
        assert K.score_url_importance_v1(f"{BASE}/docs/faq") == 4.0

    def test_medium_only(self):
        assert K.score_url_importance_v1(f"{BASE}/faq") == 2.0

    def test_deep_path_penalty(self):
        # 7 slashes -> depth 5 -> -(5-3)*0.5 = -1.0
        assert K.score_url_importance_v1(f"{BASE}/a/b/c/d/e") == 0.1  # floored: 1.0-1.0=0 -> 0.1

    def test_deep_path_partial(self):
        # depth 4 -> -0.5; with a high keyword: 1+2-0.5
        assert K.score_url_importance_v1(f"{BASE}/docs/a/b/c") == 2.5

    def test_long_query_penalty(self):
        s = K.score_url_importance_v1(f"{BASE}/x?verylongquery=1")
        assert s == 0.1  # 1.0 - 2.0 floored

    def test_double_question_mark_quirk(self):
        # split('?')[1] is BETWEEN the two '?'s: 'ab' (len 2) -> no penalty
        assert K.score_url_importance_v1(f"{BASE}/x?ab?longtailsegment") == 1.0

    def test_floor(self):
        assert K.score_url_importance_v1(f"{BASE}/a/b/c/d/e/f/g/h/i/j") >= 0.1
