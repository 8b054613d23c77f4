"""Sequential oracle crawler — the executable specification.

Plain single-threaded Python, deliberately naive, mirroring how the
reference's crawl loop actually behaves: a priority-sorted fetch loop
(crypto-crawler/src/crawlers/utils.rs:106-203) with per-endpoint
cooldowns (utils.rs:76-103), exponential backoff with success reset
(utils.rs:141-199), an anti-join discovery tick (utils.rs:543-555)
and a grow-only subscribed set (utils.rs:528).

The Spark engine (plans/frontier.py) must reproduce this oracle's
output EXACTLY for any corpus: same (round, rank_in_round, url)
sequence strictly ordered by (round, priority, url), same final
seen-set, byte-identical text per fetched url (BASELINE.json).

Semantics contract (both implementations):

* priority = depth + host_rank (unknown host -> UNKNOWN_RANK).
* Each round: robots-denied candidates are logged + marked seen +
  dropped; hosts whose ``next_eligible_round > round`` sit out;
  each remaining host schedules its best ``budget_per_round``
  candidates by (priority, url); the overflow is logged
  ``over_budget`` and stays in the frontier.
* Scheduled URLs are fetched (page exists -> ``ok`` + text, else
  ``missing``), marked seen either way.
* Host state after a round it scheduled in: any ok -> backoff
  resets to 1, next_eligible = round + crawl_delay_rounds; all
  failed -> backoff = min(backoff*2, MAX_BACKOFF), next_eligible =
  round + backoff.
* Outlinks of ok pages are canonicalized; unseen, non-frontier ones
  enter the frontier at depth+1 (an existing entry keeps its
  minimum depth).
* Terminate when the frontier is empty or max_rounds is hit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from ..functions.text import extract_outlinks_py, extract_text_py
from ..functions.urls import canonicalize_url, host_of_url

UNKNOWN_RANK = 1_000_000_000
DEFAULT_BUDGET = 2
DEFAULT_DELAY = 1
MAX_BACKOFF = 32


@dataclass
class HostState:
    next_eligible: int = 0
    backoff: int = 1


@dataclass
class OracleResult:
    fetched: pd.DataFrame  # round, rank_in_round, url, status, text
    seen: set[str] = field(default_factory=set)
    rounds_run: int = 0


class OracleCrawler:
    def __init__(self, pages: pd.DataFrame, host_policy: pd.DataFrame):
        self.pages = {
            r.url: (r.html, r.text) for r in pages.itertuples(index=False)
        }
        self.policy = {
            r.host: r._asdict() if hasattr(r, "_asdict") else dict(r)
            for r in host_policy.itertuples(index=False)
        }

    def _pol(self, host: str) -> dict:
        p = self.policy.get(host)
        if p is None:
            return {
                "host_rank": UNKNOWN_RANK,
                "budget_per_round": DEFAULT_BUDGET,
                "robots_disallow": [],
                "crawl_delay_rounds": DEFAULT_DELAY,
            }
        return p

    @staticmethod
    def _path(url: str) -> str:
        rest = url.split("://", 1)[1]
        slash = rest.find("/")
        return rest[slash:] if slash >= 0 else "/"

    def run(self, seeds: pd.DataFrame, max_rounds: int = 64) -> OracleResult:
        frontier: dict[str, int] = {}  # canonical url -> depth
        for r in seeds.itertuples(index=False):
            cu = canonicalize_url(r.url)
            if cu is not None:
                d = int(r.depth)
                frontier[cu] = min(frontier.get(cu, d), d)
        seen: set[str] = set()
        hosts: dict[str, HostState] = {}
        log: list[dict] = []
        rnd = 0
        while frontier and rnd < max_rounds:
            # 1. robots
            denied = []
            for url in list(frontier):
                host = host_of_url(url)
                pol = self._pol(host)
                path = self._path(url)
                if any(path.startswith(p) for p in (pol["robots_disallow"] or [])):
                    denied.append(url)
            for url in sorted(denied):
                log.append(
                    dict(round=rnd, rank_in_round=None, url=url,
                         status="robots_denied", text=None)
                )
                seen.add(url)
                del frontier[url]

            # 2. eligibility + per-host pop
            by_host: dict[str, list[tuple[int, str]]] = {}
            for url, depth in frontier.items():
                host = host_of_url(url)
                st = hosts.get(host, HostState())
                if st.next_eligible > rnd:
                    continue
                prio = depth + self._pol(host)["host_rank"]
                by_host.setdefault(host, []).append((prio, url))

            scheduled: list[tuple[int, str]] = []
            for host, cands in by_host.items():
                cands.sort()
                budget = int(self._pol(host)["budget_per_round"])
                scheduled.extend(cands[:budget])
                for prio, url in cands[budget:]:
                    log.append(
                        dict(round=rnd, rank_in_round=None, url=url,
                             status="over_budget", text=None)
                    )

            # 3. global pop order + fetch
            scheduled.sort()  # (priority, url) total order
            host_ok: dict[str, bool] = {}
            host_any: set[str] = set()
            for rank, (prio, url) in enumerate(scheduled, start=1):
                host = host_of_url(url)
                host_any.add(host)
                page = self.pages.get(url)
                if page is not None:
                    text = extract_text_py(page[0])
                    log.append(
                        dict(round=rnd, rank_in_round=rank, url=url,
                             status="ok", text=text)
                    )
                    host_ok[host] = True
                else:
                    log.append(
                        dict(round=rnd, rank_in_round=rank, url=url,
                             status="missing", text=None)
                    )
                    host_ok.setdefault(host, False)
                seen.add(url)
                del frontier[url]

            # 4. host state update
            for host in host_any:
                st = hosts.setdefault(host, HostState())
                pol = self._pol(host)
                if host_ok.get(host, False):
                    st.backoff = 1
                    st.next_eligible = rnd + int(pol["crawl_delay_rounds"])
                else:
                    st.backoff = min(st.backoff * 2, MAX_BACKOFF)
                    st.next_eligible = rnd + st.backoff

            # 5. discovery
            for prio, url in scheduled:
                page = self.pages.get(url)
                if page is None:
                    continue
                depth = prio - self._pol(host_of_url(url))["host_rank"]
                for link in extract_outlinks_py(page[0]):
                    cu = canonicalize_url(link)
                    if cu is None or cu in seen:
                        continue
                    nd = depth + 1
                    frontier[cu] = min(frontier.get(cu, nd), nd)
            rnd += 1

        fetched = pd.DataFrame(
            log, columns=["round", "rank_in_round", "url", "status", "text"]
        )
        return OracleResult(fetched=fetched, seen=seen, rounds_run=rnd)
