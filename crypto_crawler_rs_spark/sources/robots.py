"""robots.txt → host-policy rows.

The north rule requires "per-host politeness budgets and robots.txt
rules as a broadcast-joined policy table".  The engine consumes that
table (``host_policy.robots_disallow: array<string>`` path prefixes,
plans/frontier.py:515); this module produces it from RAW robots.txt
text, completing the chain crawler-side instead of assuming someone
else parsed robots.

Semantics (RFC 9309 subset, matching the engine's prefix filter):

* directives are case-insensitive (``User-agent`` / ``Disallow`` /
  ``Allow``); values keep their case (paths are case-sensitive);
* ``#`` starts a comment; blank lines end nothing by themselves —
  a group is one or more User-agent lines followed by rules;
* group selection: the group whose agent token is the LONGEST
  case-insensitive substring-prefix of the product token wins;
  ``*`` matches anything with length 0 (the fallback group).  Rules
  of ALL winning groups merge (multiple groups may name the same
  agent);
* only Disallow prefixes are emitted (the engine models disallow
  prefixes; Allow lines are recorded separately for callers that
  want them).  ``Disallow:`` with an empty value allows everything
  and emits nothing.

Scale shape: one robots.txt per HOST — the input is dimension-sized
(millions of rows at worst, ~KB each), so a batch-vectorized pandas
parse over ``mapInPandas`` is the right tool; the output joins the
frontier broadcast, exactly like the rest of host_policy.

Reference analog: none (the reference crawls APIs, not the open web);
this is web-graft surface, same family as sources/warc.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_POLICY_SCHEMA = (
    "host string, robots_disallow array<string>, robots_allow array<string>, "
    "robots_crawl_delay double"
)


def parse_robots_txt(
    content: str, user_agent: str = "*"
) -> tuple[list[str], list[str], float | None]:
    """(disallow_prefixes, allow_prefixes, crawl_delay_seconds) for
    ``user_agent`` — pure-python single-document parser (the executor
    kernel, also the test twin).  Crawl-delay is the de-facto
    extension most crawlers honor; the engine's per-host
    ``crawl_delay_rounds`` knob is its round-cadence analog (the
    seconds→rounds mapping is a deployment choice)."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    in_group_header = True
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                groups.append((agents, rules))
                agents, rules = [], []
            agents.append(val.lower())
            in_group_header = True
        elif key in ("disallow", "allow", "crawl-delay"):
            if agents:
                rules.append((key, val))
                in_group_header = False
        # other directives (sitemap, host, ...) are ignored here
    if agents:
        groups.append((agents, rules))

    ua = user_agent.lower()
    best_len = -1
    for ags, _ in groups:
        for a in ags:
            if a == "*":
                best_len = max(best_len, 0)
            elif a and a in ua:
                best_len = max(best_len, len(a))
    dis: list[str] = []
    allow: list[str] = []
    delay: float | None = None
    if best_len < 0:
        return dis, allow, delay
    for ags, rls in groups:
        match = any(
            (a == "*" and best_len == 0) or (a != "*" and a in ua and len(a) == best_len)
            for a in ags
        )
        if not match:
            continue
        for key, val in rls:
            if not val:
                continue  # empty Disallow/Allow = no rule
            if key == "crawl-delay":
                try:
                    delay = float(val)
                except ValueError:
                    pass
                continue
            (dis if key == "disallow" else allow).append(val)
    return dis, allow, delay


def robots_policy(
    robots: DataFrame,
    user_agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) rows → (host, robots_disallow, robots_allow)
    — join onto the rest of host_policy and hand to the engine.
    Batch-vectorized ``mapInPandas``; dimension-sized input (one row
    per host)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            parsed = [
                parse_robots_txt(t if isinstance(t, str) else "", user_agent)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    "host": pdf[host_col].to_numpy(),
                    "robots_disallow": [p[0] for p in parsed],
                    "robots_allow": [p[1] for p in parsed],
                    "robots_crawl_delay": [p[2] for p in parsed],
                }
            )

    return robots.mapInPandas(parse, schema=ROBOTS_POLICY_SCHEMA)
