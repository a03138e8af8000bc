"""RFC 9309 robots.txt evaluation (operators/robots.py)."""

from connapse_spark.operators.robots import is_allowed, parse_robots, robots_filter


def _allowed(body, path, ua="*"):
    return is_allowed(parse_robots(body, ua), path)


def test_groups_and_ua_selection():
    body = (
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: a\nUser-agent: b\nDisallow: /ab\n\n"
        "User-agent: *\nDisallow: /all\n"
    )
    # exact UA match picks its group only
    assert not _allowed(body, "/g", "googlebot")
    assert _allowed(body, "/all", "googlebot")  # not the * group
    # shared group (two UA lines)
    assert not _allowed(body, "/ab", "b")
    # unknown UA falls back to *
    assert not _allowed(body, "/all", "nobody")
    assert _allowed(body, "/g", "nobody")
    # case-insensitive UA
    assert not _allowed(body, "/g", "GoogleBot")


def test_longest_match_precedence():
    # the RFC 9309 / Google documentation examples
    assert _allowed("User-agent: *\nAllow: /p\nDisallow: /", "/page")
    assert _allowed("User-agent: *\nAllow: /folder\nDisallow: /folder", "/folder/page")
    assert not _allowed("User-agent: *\nAllow: /page\nDisallow: /*.htm", "/page.htm")
    assert _allowed("User-agent: *\nAllow: /$\nDisallow: /", "/")
    assert not _allowed("User-agent: *\nAllow: /$\nDisallow: /", "/page.htm")


def test_wildcards_and_anchor():
    body = "User-agent: *\nDisallow: /*.gif$\nDisallow: /tmp/*\n"
    assert not _allowed(body, "/pics/cat.gif")
    assert _allowed(body, "/pics/cat.gif?v=1")  # $ anchors the end
    assert not _allowed(body, "/tmp/x/y")
    assert _allowed(body, "/tmpfile")


def test_empty_disallow_comments_unknown_directives():
    body = (
        "# politeness file\nUser-agent: *\nDisallow:\n"
        "Crawl-delay: 10\nSitemap: https://x/s.xml\n"
    )
    assert _allowed(body, "/anything")
    assert _allowed("", "/x")
    # rules before any user-agent line are ignored
    assert _allowed("Disallow: /\nUser-agent: *\nAllow: /", "/x")


def test_new_group_after_rules():
    body = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert not _allowed(body, "/x", "a")
    assert _allowed(body, "/y", "a")
    assert not _allowed(body, "/y", "b")
    assert _allowed(body, "/x", "b")


def test_robots_filter_spark(spark):
    robots = {
        "a.com": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
        "b.com": "User-agent: *\nDisallow: /\n",
    }
    df = spark.createDataFrame(
        [("https://a.com/public",), ("https://a.com/private/x",),
         ("https://a.com/private/ok/y",), ("https://b.com/anything",),
         ("https://c.com/no-robots",), ("https://A.COM/private/z",)],
        "url string",
    )
    rows = {r.url: r.allowed for r in robots_filter(df, robots).collect()}
    assert rows == {
        "https://a.com/public": True,
        "https://a.com/private/x": False,
        "https://a.com/private/ok/y": True,
        "https://b.com/anything": False,
        "https://c.com/no-robots": True,
        "https://A.COM/private/z": False,  # host matching is case-insensitive
    }


def test_robots_filter_query_string_matches():
    body = "User-agent: *\nDisallow: /search?*q=\n"
    assert not _allowed(body, "/search?lang=en&q=x")
    assert _allowed(body, "/search")


# --- regressions from the second round-6 review ----------------------------


def test_matching_empty_group_is_allow_all_not_star_fallback():
    body = "User-agent: *\nDisallow: /private\nUser-agent: special\n"
    # RFC 9309: the matching (empty) group governs — allow everything
    assert _allowed(body, "/private/x", "special")
    # everyone else still gets the * rules
    assert not _allowed(body, "/private/x", "other")


def test_robots_filter_malformed_url_does_not_crash(spark):
    df = spark.createDataFrame(
        [("https://[x",), ("https://ok.com/a",), (None,)], "url string"
    )
    rows = {r.url: r.allowed for r in robots_filter(df, {"b.com": ""}).collect()}
    assert rows["https://[x"] is False  # unevaluable → not crawled
    assert rows["https://ok.com/a"] is True
    assert rows[None] is True  # empty URL parses to no host → no robots


def test_robots_filter_compiles_lazily(spark):
    # a rule body for a host the frame never touches must not be parsed
    robots = {"seen.com": "User-agent: *\nDisallow: /x\n",
              "unseen.com": "User-agent: *\nDisallow: ["}  # [ would compile fine,
    # but the point is laziness: a huge dict shouldn't cost per-task parse time;
    # semantics checked via the seen host only
    df = spark.createDataFrame([("https://seen.com/x",)], "url string")
    rows = robots_filter(df, robots).collect()
    assert rows[0].allowed is False


def test_robots_sitemaps_lines():
    from connapse_spark.operators.robots import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a/sitemap.xml\n"
        "sitemap:https://a/s2.xml   # comment\n"
        "Sitemap:\n"
    )
    assert robots_sitemaps(body) == ["https://a/sitemap.xml", "https://a/s2.xml"]
    assert robots_sitemaps("") == []


def test_robots_filter_join_tier_matches_dict_tier(spark):
    from connapse_spark.operators.robots import robots_filter_join

    robots = {
        "a.com": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
        "b.com": "User-agent: *\nDisallow: /\n",
    }
    urls = [("https://a.com/public",), ("https://a.com/private/x",),
            ("https://a.com/private/ok/y",), ("https://b.com/anything",),
            ("https://c.com/no-robots",), ("https://[x",)]
    df = spark.createDataFrame(urls, "url string")
    rdf = spark.createDataFrame(list(robots.items()), "host string, robots_txt string")
    dict_tier = {r.url: r.allowed for r in robots_filter(df, robots).collect()}
    join_tier = {r.url: r.allowed
                 for r in robots_filter_join(df, rdf).collect()}
    assert join_tier == dict_tier


def test_robots_filter_cogroup_tier_matches_dict_tier(spark):
    from connapse_spark.operators.robots import (
        robots_filter_cogroup, robots_filter_join,
    )

    robots = {
        "a.com": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
        "b.com": "User-agent: *\nDisallow: /\n",
    }
    urls = [("https://a.com/public",), ("https://a.com/private/x",),
            ("https://a.com/private/ok/y",), ("https://b.com/anything",),
            ("https://c.com/no-robots",), ("https://[x",),
            ("https://user@a.com/private/z",)]
    df = spark.createDataFrame(urls, "url string")
    rdf = spark.createDataFrame(list(robots.items()), "host string, robots_txt string")
    dict_tier = {r.url: r.allowed for r in robots_filter(df, robots).collect()}
    join_tier = {r.url: r.allowed for r in robots_filter_join(df, rdf).collect()}
    cg_tier = {r.url: r.allowed for r in robots_filter_cogroup(df, rdf).collect()}
    assert cg_tier == dict_tier == join_tier
    # the userinfo form resolves to a.com on every tier (the wave-4 fix)
    assert dict_tier["https://user@a.com/private/z"] is False


def test_crawl_delay():
    from connapse_spark.operators.robots import crawl_delay

    body = (
        "User-agent: fast-bot\nCrawl-delay: 0.5\nDisallow: /x\n"
        "User-agent: *\nCrawl-delay: 10\n"
        "User-agent: broken\nCrawl-delay: soon\n"
    )
    assert crawl_delay(body, "fast-bot") == 0.5
    assert crawl_delay(body, "anyone") == 10.0
    # a malformed value is ignored; the * group's delay then applies
    assert crawl_delay(body, "broken") == 10.0
    assert crawl_delay("User-agent: *\nDisallow: /x\n", "bot") is None
    assert crawl_delay("", "bot") is None


def test_percent_encoding_normalization():
    # unreserved escapes decode on both sides before matching (§2.2.2)
    assert not _allowed("User-agent: *\nDisallow: /a%2Db\n", "/a-b")
    assert not _allowed("User-agent: *\nDisallow: /a-b\n", "/a%2Db")
    # reserved escapes stay distinct octets: %2F is not a path slash...
    assert _allowed("User-agent: *\nDisallow: /x%2Fy\n", "/x/y")
    # ...but matches itself case-insensitively in the hex digits
    assert not _allowed("User-agent: *\nDisallow: /x%2Fy\n", "/x%2fy")


def test_precedence_counts_normalized_octets():
    # '/a%2Db' normalizes to '/a-b' (4 octets) — the 5-octet disallow is
    # more specific, so the verdict is disallowed (review finding)
    assert not _allowed("User-agent: *\nAllow: /a%2Db\nDisallow: /a-bc\n", "/a-bc")
    # byte-equivalent decoded body agrees
    assert not _allowed("User-agent: *\nAllow: /a-b\nDisallow: /a-bc\n", "/a-bc")


def test_crawl_delay_group_semantics_match_parse_robots():
    from connapse_spark.operators.robots import crawl_delay

    # a transparent Sitemap line does not split the UA run — both agents
    # share the group and BOTH get the delay and the rule
    body = ("User-agent: a\nSitemap: https://x/s.xml\nUser-agent: b\n"
            "Crawl-delay: 5\nDisallow: /x\n")
    assert crawl_delay(body, "a") == 5.0
    assert crawl_delay(body, "b") == 5.0
    assert not _allowed(body, "/x", "a")
    # non-finite / negative values are ignored (then * fallback applies)
    assert crawl_delay("User-agent: *\nCrawl-delay: nan\n", "bot") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: inf\n", "bot") is None
    assert crawl_delay("User-agent: *\nCrawl-delay: -5\n", "bot") is None
    assert crawl_delay(
        "User-agent: b\nCrawl-delay: nan\nUser-agent: *\nCrawl-delay: 3\n", "b"
    ) == 3.0


def test_crawl_delay_is_transparent_for_rule_grouping():
    from connapse_spark.operators.robots import crawl_delay

    # a crawl-delay between UA lines does NOT split the run: a and b share
    # one group, so BOTH get the rule and the delay (RFC: unknown lines
    # are transparent; only rule lines end a user-agent run)
    body = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /x\n"
    assert not _allowed(body, "/x", "a")
    assert not _allowed(body, "/x", "b")
    assert crawl_delay(body, "a") == 2.0
    assert crawl_delay(body, "b") == 2.0


def test_robots_sitemaps_pure():
    from connapse_spark.operators.robots import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /q\n"
        "Sitemap: https://e.com/sm1.xml  # primary\n"
        "  sitemap: https://e.com/sm2.xml\n"
        "SITEMAP:\n"             # empty value drops
        "Crawl-delay: 2\n"
        "# Sitemap: https://e.com/commented.xml\n"
    )
    assert robots_sitemaps(body) == [
        "https://e.com/sm1.xml", "https://e.com/sm2.xml"
    ]
    assert robots_sitemaps("") == [] and robots_sitemaps(None) == []


def test_sitemap_declarations_df(spark):
    from connapse_spark.operators.robots import sitemap_declarations

    df = spark.createDataFrame(
        [
            ("a.com", "Sitemap: https://a.com/s.xml\nsitemap: https://a.com/t.xml"),
            ("b.com", "User-agent: *\nDisallow: /"),
        ],
        "host string, robots_txt string",
    )
    rows = [(r.host, r.sitemap_url, r.decl_idx)
            for r in sitemap_declarations(df).orderBy("host", "decl_idx").collect()]
    assert rows == [
        ("a.com", "https://a.com/s.xml", 0),
        ("a.com", "https://a.com/t.xml", 1),
    ]
