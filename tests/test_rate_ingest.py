"""Live rate-source ingest (S1 realtime mode): an unbounded
micro-batch stream drives the SAME per-host budget gate as the batch
pop path, and a restart from the checkpoint RESUMES the gate's state
— a saturated host admits nothing after restart (the reference's
reconnect-with-replay T3, in streaming form).
"""

import time

import pandas as pd


def _drain(q, min_rows_fn, timeout=60.0):
    """Let the live query run until the sink has some output (or
    timeout), then stop it cleanly."""
    t0 = time.time()
    while time.time() - t0 < timeout:
        if q.lastProgress and min_rows_fn():
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()


def test_rate_ingest_budget_and_checkpoint_resume(spark, tmp_path):
    from crypto_crawler_rs_spark.streaming.stream import run_rate_ingest

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    budget, n_hosts = 3, 2

    def rows():
        # read THROUGH spark: the parquet sink's _spark_metadata
        # commit log excludes part files from a micro-batch that
        # q.stop() interrupted before commit (run 2 replays it, and a
        # raw pandas read would double-count those rows)
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(out).toPandas()
        except AnalysisException:
            return pd.DataFrame()

    # run 1: admit until every host saturates its lifetime budget
    q = run_rate_ingest(
        spark, out, ckpt, budget=budget, rows_per_second=400, n_hosts=n_hosts
    )
    _drain(
        q,
        lambda: (df := rows()).shape[0] > 0
        and df[df.admitted].groupby("host").size().min() >= budget
        and df.host.nunique() == n_hosts,
    )
    df1 = rows()
    assert len(df1) > 0
    adm1 = df1[df1.admitted].groupby("host").size()
    assert set(df1.host.unique()) == {f"host{i}.example.com" for i in range(n_hosts)}
    assert (adm1 == budget).all(), adm1  # budget enforced per host
    assert df1.admitted_so_far.max() <= budget
    # the canonicalizer really ran on the messy rate-source urls
    assert df1.url.str.startswith("https://host").all()
    assert df1.url.str.contains(r"\?a=1&b=2").all()

    # run 2: same checkpoint -> gate state AND rate offsets resume;
    # saturated hosts admit ZERO new urls, values continue (no replay)
    q2 = run_rate_ingest(
        spark, out, ckpt, budget=budget, rows_per_second=400, n_hosts=n_hosts
    )
    _drain(q2, lambda: len(rows()) > len(df1))
    df2 = rows()
    assert len(df2) > len(df1)  # new micro-batches landed
    assert not df2[~df2.url.isin(df1.url)].admitted.any()
    assert df2[df2.admitted].groupby("host").size().eq(budget).all()
    # no value replayed across the restart (offset resume)
    assert df2.url.is_unique
