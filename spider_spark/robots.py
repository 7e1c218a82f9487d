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
- ``Allow:`` / ``Disallow:`` values are path prefixes (empty Disallow =
  allow all — emitted as no rule); ``Crawl-delay`` (the de-facto
  extension) is taken from the winning group;
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
    ArrayType, DoubleType, StringType, StructField, StructType,
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
    allow = g["allow"] if g["allow"] else ["/"]
    return {"robots_allow": allow, "robots_deny": g["deny"], "crawl_delay": delay,
            "sitemaps": sitemaps}


_POLICY_SCHEMA = StructType([
    StructField("robots_allow", ArrayType(StringType()), True),
    StructField("robots_deny", ArrayType(StringType()), True),
    StructField("crawl_delay", DoubleType(), True),
])


def robots_policy_udf(agent: str = "spider"):
    @pandas_udf(_POLICY_SCHEMA)
    def parse(body: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_robots(b, agent) for b in body],
            columns=["robots_allow", "robots_deny", "crawl_delay"],
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
    (host, crawl_delay, robots_allow, robots_deny, host_budget)."""
    p = robots_policy_udf(agent)(F.col(body_col))
    return robots.select(
        F.col(host_col).alias("host"), p.alias("_p")
    ).select(
        "host",
        F.col("_p.crawl_delay").alias("crawl_delay"),
        F.col("_p.robots_allow").alias("robots_allow"),
        F.col("_p.robots_deny").alias("robots_deny"),
        F.lit(host_budget).alias("host_budget"),
    )
