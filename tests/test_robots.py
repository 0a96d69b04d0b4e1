"""robots.txt parsing + RFC-9309 admission vs a pure-Python replica
(longest-match, allow-on-tie, exact-agent group precedence, ``*`` and
``$`` patterns, multi-agent groups, comments, allow-all defaults)."""

import re

from linkgraph.operators.robots import parse_robots, robots_allowed

BODIES = {
    "a.test": """
# crawl policy
User-agent: *
Disallow: /private/
Allow: /private/pub
Disallow: /tmp$

User-agent: linkbot
User-agent: otherbot
Disallow: /only-for-star/   # applies to linkbot+otherbot, not *
Allow:
""",
    "b.test": """
User-agent: *
Disallow: /
Allow: /open/
""",
    "c.test": """
User-agent: megabot
Disallow: /m/
""",
    "d.test": """
User-agent: *
Disallow: /img*large$
Disallow: /cgi*bin
""",
}

URLS = [
    "http://a.test/",
    "http://a.test/private/x",
    "http://a.test/private/pub/ok",
    "http://a.test/tmp",
    "http://a.test/tmp/inner",
    "http://a.test/only-for-star/x",
    "http://b.test/open/doc",
    "http://b.test/closed/doc",
    "http://c.test/m/page",
    "http://d.test/img-very-large",
    "http://d.test/img-very-large-not",
    "http://d.test/cgi/deep/bin/x",
    "http://d.test/cgint",
    "http://nobots.test/anything",
]


def _py_parse(body):
    groups, cur_agents, cur_rules, in_rules = [], [], [], False
    for line in body.split("\n"):
        line = re.sub("#.*$", "", line).strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if in_rules:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val and cur_agents:
                cur_rules.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    return groups


def _py_allowed(url, agent="linkbot"):
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/]+)(/.*)?$", url)
    host, path = m.group(1), m.group(2) or "/"
    if host not in BODIES:
        return True, None
    groups = _py_parse(BODIES[host])
    exact = [g for g in groups if agent in g[0]]
    tier = exact if exact else [g for g in groups if "*" in g[0]]
    best = None
    for _, rules in tier:
        for rule, pat in rules:
            anchored = pat.endswith("$")
            core = pat[:-1] if anchored else pat
            rx = "^" + ".*".join(re.escape(s) for s in core.split("*"))
            if anchored:
                rx += "$"
            if re.match(rx, path):
                key = (-len(pat), rule)
                if best is None or key < best[0]:
                    best = (key, rule)
    return (True, None) if best is None else (best[1] != "disallow", best[1])


def test_parse_rules_structure(spark):
    df = spark.createDataFrame(list(BODIES.items()), "host string, body string")
    rules = {
        (r["host"], r["agent"], r["rule"], r["path"])
        for r in parse_robots(df).collect()
    }
    # multi-agent group: BOTH agents inherit the group's rule
    assert ("a.test", "linkbot", "disallow", "/only-for-star/") in rules
    assert ("a.test", "otherbot", "disallow", "/only-for-star/") in rules
    # star group rules never leak into the named group
    assert ("a.test", "linkbot", "disallow", "/private/") not in rules
    # empty Disallow/Allow values are dropped (allow-all, not a rule)
    assert not any(p == "" for _, _, _, p in rules)
    # comments stripped before value parsing
    assert all("#" not in p for _, _, _, p in rules)


def test_admission_matches_python_replica(spark):
    robots = spark.createDataFrame(list(BODIES.items()), "host string, body string")
    urls = spark.createDataFrame([(u,) for u in URLS], "url string")
    rules = parse_robots(robots)
    for agent in ("linkbot", "megabot", "unknownbot"):
        got = {
            r["url"]: (r["allowed"], r["matched_rule"])
            for r in robots_allowed(urls, rules, agent=agent).collect()
        }
        assert set(got) == set(URLS)
        for u in URLS:
            want = _py_allowed(u, agent)
            assert got[u] == want, (agent, u, got[u], want)


def test_spot_semantics(spark):
    """Hand-checked RFC cases: longest-match, allow-on-tie-ish
    precedence, $ anchor, exact-agent tier isolation."""
    robots = spark.createDataFrame(list(BODIES.items()), "host string, body string")
    urls = spark.createDataFrame([(u,) for u in URLS], "url string")
    rules = parse_robots(robots)
    link = {
        r["url"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent="linkbot").collect()
    }
    # a.test names linkbot exactly → ONLY that group applies (RFC
    # group selection): the star group's /private//tmp rules do NOT
    assert link["http://a.test/private/x"] is True
    assert link["http://a.test/tmp"] is True
    assert link["http://a.test/only-for-star/x"] is False
    assert link["http://b.test/closed/doc"] is False
    assert link["http://b.test/open/doc"] is True
    assert link["http://c.test/m/page"] is True           # megabot-only rule
    assert link["http://d.test/img-very-large"] is False  # * plus $ anchor
    assert link["http://d.test/img-very-large-not"] is True
    assert link["http://d.test/cgi/deep/bin/x"] is False  # * wildcard
    assert link["http://d.test/cgint"] is True
    assert link["http://nobots.test/anything"] is True    # no robots → allow
    # an agent no group names falls back to the star tier
    star = {
        r["url"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent="unknownbot").collect()
    }
    assert star["http://a.test/private/x"] is False       # Disallow /private/
    assert star["http://a.test/private/pub/ok"] is True   # longer Allow wins
    assert star["http://a.test/tmp"] is False             # $ anchor hits
    assert star["http://a.test/tmp/inner"] is True        # $ anchor misses
    assert star["http://a.test/only-for-star/x"] is True  # named group only
    assert star["http://c.test/m/page"] is True           # no star group at all
