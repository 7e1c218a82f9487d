"""robots.txt → host-policy table (A13 completion).

The reference disables robots everywhere (weibo/settings.py:21
``ROBOTSTXT_OBEY = False``) and our engine's A13 enforcement therefore
took a pre-built ``host_policy`` table as input. This module closes the
loop: parse fetched ``robots.txt`` BODIES into that table, so a crawl can
bootstrap its politeness policy from the crawl itself.

Semantics (Robots Exclusion Protocol, RFC 9309 subset — public spec):

- groups = one or more consecutive ``User-agent`` lines followed by rules;
  a rule line belongs to every agent of its group;
- the group matching the crawler's agent token (case-insensitive substring
  per RFC 9309 §2.2.1 product-token match, simplified to exact/prefix)
  wins over the ``*`` group; multiple matching groups merge (§2.2.1);
- ``Allow:`` / ``Disallow:`` values are path patterns: literal prefixes,
  plus the RFC 9309 §2.2.3 special characters ``*`` (matches any octet
  sequence) and a terminal ``$`` (anchors the end of the path). Empty
  Disallow = allow all — emitted as no rule. ``Crawl-delay`` (the
  de-facto extension) is taken from the winning group;
- rule PRECEDENCE is §2.2.2 longest-match: the matching rule with the
  most octets wins; an Allow and Disallow of equal length → Allow wins.
  No matching rule → allowed. (``compile_rule`` / ``denied_col`` below
  implement this; the engine's per-round enforcement in round.run_round
  evaluates it JVM-side over the broadcast policy.)
- comments (#) stripped, keys case-insensitive, unknown keys ignored,
  broken lines skipped — crawl-wild robots files are as messy as
  crawl-wild HTML.

The parser is pure python (one source of truth, heavily unit-tested) and
runs Arrow-batched in ``policy_from_robots`` — robots bodies are tiny and
parsed once per host per crawl (a broadcast-sized table), so this is
explicitly NOT a hot path; the per-round enforcement stays the JVM prefix
filter in round.run_round.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, StringType, StructField, StructType,
)

DEFAULT_CRAWL_DELAY = 5.0  # the reference's CRAWL_DELAY (client_crawler.py:293)


def parse_robots(body: str | None, agent: str = "spider") -> dict:
    """Parse one robots.txt body for ``agent``. Returns
    {"robots_allow": [...], "robots_deny": [...], "crawl_delay": float,
    "sitemaps": [...]}."""
    star: dict = {"allow": [], "deny": [], "delay": None}
    mine: dict = {"allow": [], "deny": [], "delay": None}
    sitemaps: list[str] = []
    matched_any = False
    if isinstance(body, (bytes, bytearray)):
        # fetched bodies arrive binary in this engine (pages.html is
        # BinaryType); RFC 9309 says UTF-8, replace on the crawl-wild rest
        body = bytes(body).decode("utf-8", errors="replace")
    if body:
        agent_lc = agent.lower()
        cur: list[dict] = []          # groups the current rules apply to
        in_rules = False              # False while collecting UA lines
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if in_rules:          # a new group starts
                    cur = []
                    in_rules = False
                ua = val.lower()
                if ua == "*":
                    cur.append(star)
                elif ua and (agent_lc == ua or agent_lc.startswith(ua)):
                    cur.append(mine)
                    matched_any = True
            elif key == "sitemap":
                # global directive (RFC 9309 §2.3 "other records"): not
                # group-scoped, feeds sitemap.seeds_from_sitemaps
                if val:
                    sitemaps.append(val)
            elif key in ("allow", "disallow", "crawl-delay"):
                in_rules = True
                for g in cur:
                    if key == "allow" and val:
                        g["allow"].append(val)
                    elif key == "disallow" and val:
                        g["deny"].append(val)
                    elif key == "crawl-delay":
                        try:
                            g["delay"] = float(val)
                        except ValueError:
                            pass
    # RFC 9309: the most specific matching group wins; '*' only applies
    # when no agent-specific group matched anywhere in the file
    g = mine if matched_any else star
    delay = g["delay"] if g["delay"] is not None else DEFAULT_CRAWL_DELAY
    # No implicit Allow rule: under §2.2.2 longest-match, "no rule matches"
    # already means allowed, and injecting '/' would wrongly tie (and beat)
    # a 'Disallow: /' deny-all rule.
    return {"robots_allow": g["allow"], "robots_deny": g["deny"],
            "crawl_delay": delay, "sitemaps": sitemaps}


# -- RFC 9309 §2.2.2-2.2.3 rule matching (wildcards + longest-match) ---------

_RE_SPECIALS = ".[]{}()+?^$|\\"


def compile_rule(rule: str) -> dict:
    """Compile one Allow/Disallow value into a match form.

    - no ``*`` and no terminal ``$`` → plain prefix match (the common
      case; stays a codegen'd ``startswith`` in the engine);
    - otherwise an anchored Java/RE2-common regex: ``*`` → ``.*``, a
      TERMINAL ``$`` → end anchor, every other regex metacharacter
      escaped (a mid-rule ``$`` is literal per the RFC).

    ``ln`` is the rule's octet length — §2.2.2 specificity (Google's
    open-sourced matcher counts the raw rule bytes, wildcards included).
    Octets means utf-8 BYTES, not characters: a raw-CJK rule like '/中'
    is 4 octets, and the byte count can flip a longest-match tie that
    character count gets wrong (round-4 review fix).
    """
    ln = len(rule.encode("utf-8"))
    if "*" not in rule and not rule.endswith("$"):
        return {"prefix": rule, "re": None, "ln": ln}
    body, anchor = (rule[:-1], "$") if rule.endswith("$") else (rule, "")
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_SPECIALS:
            out.append("\\" + ch)
        else:
            out.append(ch)
    return {"prefix": None, "re": "^" + "".join(out) + anchor, "ln": ln}


def match_len(path: str, rules: list[str]) -> int:
    """Pure-python model: octet length of the most specific rule matching
    ``path`` (0 = no match). One source of truth for tests/parity."""
    import re as _re

    best = 0
    for rule in rules:
        c = compile_rule(rule)
        hit = (
            path.startswith(c["prefix"]) if c["re"] is None
            else _re.search(c["re"], path) is not None
        )
        if hit and c["ln"] > best:
            best = c["ln"]
    return best


def robots_denied(path: str, allow: list[str], deny: list[str]) -> bool:
    """Pure-python verdict model: deny wins only when its most specific
    matching rule is LONGER than allow's (§2.2.2; equal length → allow)."""
    return match_len(path, deny) > match_len(path, allow)


RULES_TYPE = ArrayType(StructType([
    StructField("prefix", StringType(), True),
    StructField("re", StringType(), True),
    StructField("ln", IntegerType(), True),
]))


def compile_rules_udf():
    @pandas_udf(RULES_TYPE)
    def compile_(rules: pd.Series) -> pd.Series:
        return pd.Series([
            [compile_rule(r) for r in (rs if rs is not None else [])]
            for rs in rules
        ])

    return compile_


def compile_policy(policy: DataFrame) -> DataFrame:
    """Add ``allow_rules`` / ``deny_rules`` (RULES_TYPE) to a host-policy
    table. Idempotent; runs Arrow-batched on the broadcast-sized policy
    table (never the frontier), so compilation cost is per-host-per-crawl,
    not per-URL. crawl() compiles once before the round loop."""
    if "allow_rules" in policy.columns:
        return policy
    c = compile_rules_udf()
    return policy.withColumn("allow_rules", c(F.col("robots_allow"))).withColumn(
        "deny_rules", c(F.col("robots_deny"))
    )


def _best_match_len(path, rules) -> "F.Column":
    matched = F.filter(
        rules,
        lambda s: F.when(
            s["re"].isNull(), path.startswith(s["prefix"])
        ).otherwise(F.regexp_like(path, s["re"])),
    )
    return F.coalesce(
        F.aggregate(matched, F.lit(0), lambda acc, s: F.greatest(acc, s["ln"])),
        F.lit(0),  # null rules array (host absent from policy) → no match
    )


def denied_col(path, allow_rules, deny_rules) -> "F.Column":
    """JVM-side §2.2.2 verdict over compiled rule arrays: denied iff the
    most specific matching deny rule is strictly longer than the most
    specific matching allow rule. Prefix rules stay codegen'd
    ``startswith``; only rules that actually contain wildcards pay the
    regex path (``regexp_like`` with a per-rule column pattern)."""
    return _best_match_len(path, deny_rules) > _best_match_len(path, allow_rules)


_POLICY_SCHEMA = StructType([
    StructField("robots_allow", ArrayType(StringType()), True),
    StructField("robots_deny", ArrayType(StringType()), True),
    StructField("crawl_delay", DoubleType(), True),
    StructField("sitemaps", ArrayType(StringType()), True),
])


def robots_policy_udf(agent: str = "spider"):
    @pandas_udf(_POLICY_SCHEMA)
    def parse(body: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_robots(b, agent) for b in body],
            columns=["robots_allow", "robots_deny", "crawl_delay", "sitemaps"],
        )

    return parse


def policy_from_robots(
    robots: DataFrame,
    agent: str = "spider",
    host_col: str = "host",
    body_col: str = "robots_txt",
    host_budget: int = -1,
) -> DataFrame:
    """(host, robots_txt) → the host_policy table crawl() consumes:
    (host, crawl_delay, robots_allow, robots_deny, sitemaps, host_budget).
    ``sitemaps`` carries the file's global Sitemap: URLs (RFC 9309 §2.3) —
    the discovery input for sitemap.seeds_from_sitemaps; parse_robots
    always extracted them, but earlier versions dropped them here, leaving
    no DataFrame surface to reach them."""
    p = robots_policy_udf(agent)(F.col(body_col))
    return robots.select(
        F.col(host_col).alias("host"), p.alias("_p")
    ).select(
        "host",
        F.col("_p.crawl_delay").alias("crawl_delay"),
        F.col("_p.robots_allow").alias("robots_allow"),
        F.col("_p.robots_deny").alias("robots_deny"),
        F.col("_p.sitemaps").alias("sitemaps"),
        F.lit(host_budget).alias("host_budget"),
    )
