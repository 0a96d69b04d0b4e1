"""robots.txt politeness rules (RFC 9309) as dataflow.

A crawl pipeline's fetch frontier must be filtered against each
host's robots.txt before scheduling (the reference has no crawl
layer; this extends the engine's crawl stack — OPIC priorities,
politeness budgets, URL-seen — with the missing admission test).
Both stages are pure Catalyst: parsing is a per-host line explode +
two windows (robots bodies are KBs — a per-host window partition is
bounded by the file, never the corpus), and the admission test is a
host-keyed equi-join + longest-match argmax. Nothing collects; hosts
with no robots.txt default to allow-all, per the RFC.

Semantics implemented (RFC 9309 / the documented Googlebot rules):

- group = consecutive ``User-agent`` lines followed by their rules;
  every agent named in the group's header gets ALL the group's rules;
- group selection: if any group names the caller's agent exactly
  (case-insensitive token match), only those groups apply; otherwise
  the ``*`` groups; otherwise allow-all;
- rule match: case-sensitive path PREFIX, ``$`` anchors the end;
  ``*`` matches any substring (compiled to a quoted regex Spark-side);
- decision: the longest matched rule wins; at equal length ``allow``
  wins; no matched rule ⇒ allowed.

Comments (``#``), blank lines and unknown directives are ignored;
``Disallow:`` with an empty path matches nothing (allow-all group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

RULES_SCHEMA = "host string, agent string, rule string, path string, rule_len int"


def parse_robots(robots: DataFrame, host_col: str = "host", body_col: str = "body") -> DataFrame:
    """robots.txt bodies → DataFrame(host, agent, rule, path,
    rule_len); ``rule`` ∈ {'allow','disallow'}. One row per
    (group-agent × group-rule) pair, so downstream admission is a
    plain join — no group bookkeeping leaves this function."""
    lines = (
        robots.select(
            F.col(host_col).alias("host"),
            F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "line"),
        )
        # strip comments + whitespace; robots directives are `key: value`
        .withColumn("line", F.trim(F.regexp_replace("line", "#.*$", "")))
        .withColumn("key", F.lower(F.trim(F.substring_index("line", ":", 1))))
        .withColumn(
            "val",
            F.trim(F.expr("substring(line, instr(line, ':') + 1)")),
        )
        .filter(F.col("line").contains(":"))
        .filter(F.col("key").isin("user-agent", "allow", "disallow"))
    )
    w = Window.partitionBy("host").orderBy("pos")
    # a group starts at a user-agent line whose predecessor (among
    # recognized lines) is NOT a user-agent line
    grouped = (
        lines.withColumn("is_ua", F.col("key") == "user-agent")
        .withColumn(
            "grp_start",
            F.col("is_ua") & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False)),
        )
        .withColumn("grp", F.sum(F.col("grp_start").cast("int")).over(w))
        .filter(F.col("grp") > 0)  # rules before any user-agent line: ignored
    )
    agents = grouped.filter("is_ua").select(
        "host", "grp", F.lower(F.col("val")).alias("agent")
    ).distinct()
    rules = grouped.filter(~F.col("is_ua")).filter(F.length("val") > 0).select(
        "host",
        "grp",
        F.col("key").alias("rule"),
        F.col("val").alias("path"),
    )
    return (
        agents.join(rules, ["host", "grp"])
        .select(
            "host",
            "agent",
            "rule",
            "path",
            F.length("path").cast("int").alias("rule_len"),
        )
        .distinct()
    )


def _rule_regex(path: Column) -> Column:
    """robots path pattern → anchored Java regex: literal segments
    quoted with \\Q..\\E (so every metachar is inert), ``*`` → ``.*``,
    trailing ``$`` → end anchor."""
    anchored = path.endswith("$")
    body = F.when(anchored, F.expr("substring(path, 1, length(path) - 1)")).otherwise(
        path
    )
    quoted = F.concat(
        F.lit("^\\Q"),
        F.regexp_replace(body, r"\*", "\\\\E.*\\\\Q"),
        F.lit("\\E"),
    )
    return F.when(anchored, F.concat(quoted, F.lit("$"))).otherwise(quoted)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "linkbot",
    url_col: str = "url",
) -> DataFrame:
    """DataFrame(url, host, allowed, matched_rule, matched_path):
    RFC-9309 admission for every url under the parsed ``rules``.

    Plan: derive (host, path) from the url; per host decide which
    agent tier applies (exact agent if any group names it, else
    ``*``) with one tiny per-host aggregate; equi-join urls⋈rules on
    host (robots tables are hosts-sized — AQE broadcasts when small);
    keep matching rules (regex compiled from the path pattern);
    longest-match/allow-wins argmax per url via ``min_by``; urls with
    no matching rule — or no robots at all — are allowed."""
    a = F.lit(agent.lower())
    u = urls.select(
        F.col(url_col).alias("url"),
        F.regexp_extract(url_col, r"^[a-z][a-z0-9+.\-]*://([^/]+)", 1).alias("host"),
        F.coalesce(
            F.nullif(F.regexp_extract(url_col, r"^[a-z][a-z0-9+.\-]*://[^/]+(/.*)$", 1), F.lit("")),
            F.lit("/"),
        ).alias("path"),
    )
    tier = rules.groupBy("host").agg(
        F.max(F.when(F.col("agent") == a, 1).otherwise(0)).alias("has_exact")
    )
    applicable = (
        rules.join(tier, "host")
        .filter(
            F.when(F.col("has_exact") == 1, F.col("agent") == a).otherwise(
                F.col("agent") == "*"
            )
        )
        .select("host", "rule", "path", "rule_len", _rule_regex(F.col("path")).alias("rx"))
        .withColumnRenamed("path", "rule_path")
    )
    matched = (
        u.join(applicable, "host")
        .filter(F.expr("path rlike rx"))
        .groupBy("url", "host")
        .agg(
            # longest rule wins; tie → allow; min_by over (-len, rule)
            # works because 'allow' < 'disallow' lexicographically
            F.min_by(
                F.struct("rule", F.col("rule_path")),
                F.struct(-F.col("rule_len"), "rule"),
            ).alias("m")
        )
    )
    # re-attach urls whose host has no robots or no matching rule —
    # both are allowed (the inner match above would drop them)
    return u.select("url", "host").join(matched, ["url", "host"], "left").select(
        "url",
        "host",
        F.coalesce(F.col("m.rule") != "disallow", F.lit(True)).alias("allowed"),
        F.col("m.rule").alias("matched_rule"),
        F.col("m.rule_path").alias("matched_path"),
    )
