"""Independent references for the session-21 fold/resolution gates:
the CUSUM packed fold vs a plain-python recursion, and the Avro
schema-resolution rules incl. the rejection arms."""

from __future__ import annotations

import datetime as dt

import pytest

from goto_eater_crawler_spark.functions import miniavro


def _python_cusum(xs, k=0.25, h=2.0):
    s, alarms = 0.0, 0
    for x in xs:
        s = max(0.0, s + x - k)
        if s >= h:
            alarms += 1
            s = 0.0
    return alarms, s


def test_cusum_fold_matches_python_reference(spark, tmp_path):
    rows = []
    eid = 0
    # host 0: steady trickle (no alarm); host 1: change burst
    # (alarms); host 2: alternating (boundary exercise)
    for host, pattern in [
        (0, [0, 0, 1, 0, 0, 0, 1, 0, 0, 0]),
        (1, [1] * 12),
        (2, [1, 0] * 10),
    ]:
        for i, x in enumerate(pattern):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=eid),
                 host, "update" if x else "view", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from goto_eater_crawler_spark.plans import queries as q

    out = {
        r.user_id: r
        for r in q._QUERIES["recrawl_cusum_change"](
            spark, str(tmp_path)
        ).collect()
    }
    for host, pattern in [(0, [0, 0, 1, 0, 0, 0, 1, 0, 0, 0]),
                          (1, [1] * 12), (2, [1, 0] * 10)]:
        alarms, s = _python_cusum(pattern)
        assert out[host].n_alarms == alarms, (host, out[host])
        assert out[host].s_final == pytest.approx(round(s, 2)), host
    assert out[1].n_alarms > 0 and out[0].n_alarms == 0


# --- avro resolution -------------------------------------------------------

W = {"type": "record", "name": "w", "fields": [
    {"name": "a", "type": "int"},
    {"name": "old_name", "type": "int"},
    {"name": "s", "type": "string"},
    {"name": "gone", "type": "long"},
]}


def test_resolution_rules():
    rec = {"a": 7, "old_name": 404, "s": "hi", "gone": 9}
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "double"},
        {"name": "new_name", "type": "int", "aliases": ["old_name"]},
        {"name": "s", "type": "bytes"},
        {"name": "fresh", "type": "double", "default": 1.5},
    ]}
    out = miniavro.resolve_record(rec, W, reader)
    assert out == {"a": 7.0, "new_name": 404, "s": b"hi", "fresh": 1.5}
    assert isinstance(out["a"], float)
    assert "gone" not in out


def test_illegal_promotion_rejected():
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "string"},  # int -> string: not in lattice
    ]}
    with pytest.raises(ValueError, match="cannot resolve"):
        miniavro.resolve_record({"a": 1, "old_name": 0, "s": "",
                                 "gone": 0}, W, reader)
    # double -> int (narrowing) equally illegal
    w2 = {"type": "record", "name": "w2",
          "fields": [{"name": "a", "type": "double"}]}
    reader2 = {"type": "record", "name": "r2",
               "fields": [{"name": "a", "type": "int"}]}
    with pytest.raises(ValueError, match="cannot resolve"):
        miniavro.resolve_record({"a": 1.0}, w2, reader2)


def test_missing_field_without_default_rejected():
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "nope", "type": "int"},
    ]}
    with pytest.raises(ValueError, match="no default"):
        miniavro.resolve_record({"a": 1, "old_name": 0, "s": "",
                                 "gone": 0}, W, reader)


def test_container_roundtrip_resolved():
    recs = [{"a": i, "old_name": i * 2, "s": f"x{i}", "gone": 0}
            for i in range(5)]
    blob = miniavro.write_ocf(recs, W, sync=b"\x01" * 16)
    reader = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "long"},
        {"name": "new_name", "type": "long", "aliases": ["old_name"]},
    ]}
    _, out = miniavro.read_ocf_resolved(blob, reader)
    assert out == [{"a": i, "new_name": i * 2} for i in range(5)]


def _python_token_bucket(ts_ms, cap=3000, refill_per_ms=0.1, cost=1000):
    """Plain reference: millitokens, refill dt_ms // 10."""
    tokens = cap
    granted = 0
    prev = ts_ms[0]
    for i, t in enumerate(ts_ms):
        if i > 0:
            tokens = min(cap, tokens + (t - prev) // 10)
        if tokens >= cost:
            tokens -= cost
            granted += 1
        prev = t
    return granted, tokens


def test_token_bucket_fold_matches_python_reference(spark, tmp_path):
    import datetime as dt

    rows = []
    eid = 0
    # host 0: rapid-fire (drains the bucket); host 1: spaced 15 s
    # (refills 1.5 tokens between events); host 2: single event
    plans = {
        0: [0, 1, 2, 3, 4, 5],                       # seconds apart
        1: [0, 15, 30, 45, 60, 75],
        2: [0],
    }
    for host, secs in plans.items():
        for s in secs:
            rows.append(
                (eid, dt.datetime(2024, 1, 2) + dt.timedelta(seconds=s),
                 host, "view", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    from goto_eater_crawler_spark.plans import queries as q

    out = {
        r.user_id: r
        for r in q._QUERIES["politeness_token_bucket"](
            spark, str(tmp_path)
        ).collect()
    }
    base = dt.datetime(2024, 1, 2) - dt.datetime(2024, 1, 1)
    base_ms = int(base.total_seconds() * 1000)
    for host, secs in plans.items():
        granted, tokens = _python_token_bucket(
            [base_ms + s * 1000 for s in secs]
        )
        assert out[host].n_granted == granted, (host, out[host])
        assert out[host].tokens_end == tokens, (host, out[host])
    # rapid-fire host must hit denials; spaced host must not
    assert out[0].n_denied > 0 and out[1].n_denied == 0
