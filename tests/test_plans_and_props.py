"""Physical-plan invariants (the scale contract) + property-based
tests for the canonicalizer (hypothesis)."""

import io
import re
from contextlib import redirect_stdout

from hypothesis import given, settings
from hypothesis import strategies as st

from crypto_crawler_rs_spark.functions.urls import canonicalize_url, host_of_url

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_dim_join_is_broadcast(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["j3_broadcast_rank"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["a2_pricing_summary"](spark, SF))
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan)


def test_no_single_partition_exchange_in_pop(spark):
    """The salted per-host pop must never collapse to one partition."""
    from pyspark.sql import functions as F

    from crypto_crawler_rs_spark.operators.pop import pop_per_host

    df = spark.range(1000).select(
        F.concat(F.lit("h"), F.pmod("id", F.lit(7))).alias("host"),
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit(0).alias("depth"),
        F.pmod("id", F.lit(100)).alias("priority"),
        F.lit(5).alias("budget_per_round"),
        (F.pmod("id", F.lit(7)) == 0).alias("is_hot"),
    )
    plan = _plan(pop_per_host(df))
    assert "Exchange SinglePartition" not in plan


# -- hypothesis: canonicalizer algebraic properties ---------------------

url_strategy = st.builds(
    lambda scheme, host, port, path, q, frag: (
        f"{scheme}://{host}{port}{path}{q}{frag}"
    ),
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=st.from_regex(r"[A-Za-z0-9][A-Za-z0-9.-]{0,20}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}", fullmatch=True),
    q=st.sampled_from(["", "?a=1", "?b=2&a=1", "?z=9&a=1&a=0", "?x"]),
    frag=st.sampled_from(["", "#f", "#frag/with/slash"]),
)


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_canonicalize_idempotent(url):
    c = canonicalize_url(url)
    if c is not None:
        assert canonicalize_url(c) == c


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_canonicalize_invariants(url):
    c = canonicalize_url(url)
    if c is None:
        return
    assert "#" not in c  # fragments stripped
    host = host_of_url(c)
    assert host == host.lower()
    scheme = c.split("://", 1)[0]
    assert scheme == scheme.lower()
    # default ports never survive
    assert not (scheme == "http" and f"{host}:80/" in c)
    assert not (scheme == "https" and f"{host}:443/" in c)
    # query params sorted
    if "?" in c:
        params = c.split("?", 1)[1].split("&")
        keys = [p.split("=", 1)[0] for p in params]
        assert keys == sorted(keys)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_canonicalize_never_crashes(s):
    r = canonicalize_url(s)
    assert r is None or isinstance(r, str)
