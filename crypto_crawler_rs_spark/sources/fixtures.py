"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md).

Seed=42, no wall clock, no network — mirrors how the reference pins
exact golden strings for its pure-function tests
(crypto-ws-client/src/clients/binance.rs:379-409) instead of relying
on live data.  The generator produces:

* ``pages``       — (url, warc_ts, html, text, lang): the fetchable
  universe.  ``html`` embeds the ground-truth ``text`` plus outlink
  anchors; ``extract_text`` must invert it byte-identically.
* ``seeds``       — crawl roots (subset of pages + a few dead links),
  analog of the initial symbol catalog
  (crypto-markets/src/lib.rs:25-49).
* ``host_policy`` — per-host rank / budget / robots / crawl-delay,
  analog of the CMC rank table + per-exchange cooldown constants
  (crypto-crawler/src/utils/cmc_rank.rs:8-273,
  crypto-crawler/src/crawlers/utils.rs:76-103).

Skew is built in: ``hot.example.com`` holds ~30% of all pages, the
fixture for salted-window and AQE skew handling.
"""

from __future__ import annotations

import datetime as _dt
import os

import numpy as np
import pandas as pd

SEED = 42
EPOCH = _dt.datetime(2020, 1, 1)

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt"]
_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega market "
    "orderbook trade ticker candle funding interest ratio volume depth"
).split()

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _render_html(title: str, paras: list[str], links: list[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paras) + "".join(
        f'<a href="{u}">l{i}</a>' for i, u in enumerate(links)
    )
    return f"<html><head><title>{title}</title></head><body>{body}</body></html>".encode()


def _messy(url: str, kind: int) -> str:
    """Un-canonical variants that must canonicalize back to ``url``."""
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if kind == 0:
        return f"{scheme.upper()}://{host.upper()}/{path}"
    if kind == 1:
        port = "443" if scheme == "https" else "80"
        return f"{scheme}://{host}:{port}/{path}"
    if kind == 2:
        return f"{url}#frag{kind}"
    return f"{scheme}://{host.title()}/{path}#x"


def gen_corpus(
    n_pages: int = 1000,
    n_hosts: int = 20,
    n_seeds: int = 20,
    links_per_page: int = 4,
    hot_share: float = 0.30,
    private_share: float = 0.08,
    dead_link_share: float = 0.03,
    messy_link_share: float = 0.15,
    seed: int = SEED,
) -> dict[str, pd.DataFrame]:
    """Build the corpus as pandas DataFrames (engine-independent so
    the sequential oracle can consume it without a SparkSession)."""
    rng = np.random.default_rng(seed)

    hosts = [f"host{i:03d}.example.com" for i in range(n_hosts - 1)] + [
        "hot.example.com"
    ]
    hosts_arr = np.array(hosts, dtype=object)
    hot_idx = n_hosts - 1
    # page -> host assignment with the hot host taking hot_share
    probs = np.full(n_hosts, (1.0 - hot_share) / (n_hosts - 1))
    probs[hot_idx] = hot_share
    page_host = rng.choice(n_hosts, size=n_pages, p=probs)

    # per-host page counters -> stable paths (vectorized cumcount)
    order = np.argsort(page_host, kind="stable")
    within = np.empty(n_pages, dtype=np.int64)
    sorted_hosts = page_host[order]
    grp_start = np.r_[0, np.flatnonzero(np.diff(sorted_hosts)) + 1]
    seq = np.arange(n_pages)
    starts = np.repeat(seq[grp_start], np.diff(np.r_[grp_start, n_pages]))
    within[order] = seq - starts
    is_private = rng.random(n_pages) < private_share
    prefix = np.where(is_private, "private", "p")
    urls = [
        f"https://{hosts_arr[h]}/{p}/{j}"
        for h, p, j in zip(page_host, prefix, within)
    ]
    url_arr = np.array(urls, dtype=object)

    # outlink graph (vectorized): mix of same-host-biased and global
    # picks over the hot-skewed page distribution itself
    k = links_per_page
    r = rng.random((n_pages, k))
    cand = rng.integers(0, n_pages, (n_pages, k))
    alt = rng.integers(0, n_pages, (n_pages, k))
    own = page_host[:, None]
    # same-host bias: where r<0.5 and cand is off-host but alt is
    # on-host, take alt (one retry, as before)
    take_alt = (r >= dead_link_share) & (r < 0.5) & (
        page_host[cand] != own
    ) & (page_host[alt] == own)
    cand = np.where(take_alt, alt, cand)
    dead = r < dead_link_share
    messy_flag = (~dead) & (rng.random((n_pages, k)) < messy_link_share)
    messy_kind = rng.integers(0, 4, (n_pages, k))
    targets = url_arr[cand]
    dead_ids = np.cumsum(dead.ravel()).reshape(dead.shape)
    link_lists: list[list[str]] = []
    for i in range(n_pages):
        row = []
        for j in range(k):
            if dead[i, j]:
                row.append(f"https://{hosts_arr[page_host[i]]}/p/dead{dead_ids[i, j]}")
            elif messy_flag[i, j]:
                row.append(_messy(targets[i, j], int(messy_kind[i, j])))
            else:
                row.append(targets[i, j])
        link_lists.append(row)

    # titles + paragraphs from pre-drawn word index matrices
    words_arr = np.array(_WORDS, dtype=object)
    title_idx = rng.integers(0, len(_WORDS), (n_pages, 3))
    titles = [" ".join(words_arr[ix]).title() for ix in title_idx]
    n_paras = rng.integers(1, 4, n_pages)
    para_lens = rng.integers(5, 15, (n_pages, 3))
    para_words = words_arr[rng.integers(0, len(_WORDS), (n_pages, 3, 14))]
    paras = [
        [
            " ".join(para_words[i, p, : para_lens[i, p]])
            for p in range(n_paras[i])
        ]
        for i in range(n_pages)
    ]
    texts = [t + "\n" + "\n".join(ps) for t, ps in zip(titles, paras)]
    htmls = [
        _render_html(t, ps, ls) for t, ps, ls in zip(titles, paras, link_lists)
    ]
    ts_off = rng.integers(0, 86400 * 365, n_pages)
    warc_ts = [EPOCH + _dt.timedelta(seconds=int(x)) for x in ts_off]
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), n_pages)]

    pages = pd.DataFrame(
        {
            "url": url_arr,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )

    # seeds: first page of several hosts + a couple of dead + messy forms
    seed_idx = rng.choice(n_pages, size=min(n_seeds, n_pages), replace=False)
    seed_urls = [urls[i] for i in seed_idx]
    seed_urls = [
        _messy(u, k % 4) if k % 3 == 0 else u for k, u in enumerate(seed_urls)
    ]
    seed_urls.append(f"https://{hosts[0]}/p/dead-seed")
    seeds = pd.DataFrame({"url": seed_urls, "depth": 0})

    perm = rng.permutation(n_hosts)
    host_policy = pd.DataFrame(
        {
            "host": hosts,
            "host_rank": perm.astype(np.int64) * 10,
            "budget_per_round": (2 + (perm % 5) * 2).astype(np.int32),
            "robots_disallow": [
                ["/private"] if perm[i] % 3 == 0 else [] for i in range(n_hosts)
            ],
            "crawl_delay_rounds": np.where(perm % 7 == 0, 2, 1).astype(np.int32),
            "is_hot": [i == hot_idx for i in range(n_hosts)],
        }
    )
    # the hot host gets a generous budget but still far below its share
    host_policy.loc[host_policy.is_hot, "budget_per_round"] = 8
    return {"pages": pages, "seeds": seeds, "host_policy": host_policy}


def corpus_to_parquet(corpus: dict[str, pd.DataFrame], out_dir: str) -> dict[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, df in corpus.items():
        p = os.path.join(out_dir, f"{name}.parquet")
        # Spark cannot read TIMESTAMP(NANOS) parquet — write micros
        df.to_parquet(
            p, index=False, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        paths[name] = p
    return paths


def corpus_to_spark(spark, corpus: dict[str, pd.DataFrame]):
    """Register the corpus as Spark DataFrames (via Arrow)."""
    out = {}
    out["pages"] = spark.createDataFrame(corpus["pages"], schema=PAGES_SCHEMA)
    out["seeds"] = spark.createDataFrame(corpus["seeds"], schema="url string, depth int")
    out["host_policy"] = spark.createDataFrame(
        corpus["host_policy"],
        schema=(
            "host string, host_rank long, budget_per_round int, "
            "robots_disallow array<string>, crawl_delay_rounds int, is_hot boolean"
        ),
    )
    return out
