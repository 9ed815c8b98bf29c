"""Wire-format parse semantics (reference ParseMessageAsLogElement.java:35-49):
snake_case JSON → typed record; malformed or incomplete messages dropped."""

from __future__ import annotations

from redis_dataflow_realtime_analytics_spark.sources import parse_wire_events

WIRE_ROWS = [
    '{"uid": 4711, "experiment_id": 42, "variant": "default", "timestamp": "2024-01-01T00:09:58Z"}',
    '{"uid": 1, "experiment_id": 2, "variant": "1", "timestamp": "2024-01-01T00:10:05Z"}',
    '{"uid": "not an object -> must be dropped',          # malformed JSON
    "plain garbage",                                        # not JSON at all
    '{"uid": 7, "variant": "2", "timestamp": "2024-01-01T00:11:00Z"}',  # missing experiment_id
    '{"experiment_id": 9, "variant": "3", "timestamp": "2024-01-01T00:12:00Z"}',  # missing uid
    "",                                                     # empty message
]


def test_parse_drops_malformed(spark):
    raw = spark.createDataFrame([(r,) for r in WIRE_ROWS], ["value"])
    out = parse_wire_events(raw).collect()
    assert len(out) == 2
    by_uid = {r.uid: r for r in out}
    assert by_uid["4711"].experiment_id == "42"
    assert by_uid["4711"].variant == "default"
    assert by_uid["4711"].timestamp.isoformat().startswith("2024-01-01T00:09:58")
    assert by_uid["1"].variant == "1"


def test_parse_types(spark):
    raw = spark.createDataFrame([(WIRE_ROWS[0],)], ["value"])
    schema = dict(parse_wire_events(raw).dtypes)
    assert schema == {
        "uid": "string",
        "experiment_id": "string",
        "variant": "string",
        "timestamp": "timestamp",
    }


def test_parse_with_corrupt_retains_bad_payloads(spark):
    from redis_dataflow_realtime_analytics_spark.sources.events import (
        parse_wire_events_with_corrupt,
    )

    raw = spark.createDataFrame([(r,) for r in WIRE_ROWS], ["value"])
    out = parse_wire_events_with_corrupt(raw).collect()
    assert len(out) == len(WIRE_ROWS)  # nothing dropped
    good = [r for r in out if r._corrupt is None]
    bad = [r for r in out if r._corrupt is not None]
    assert len(good) == 2
    assert len(bad) == len(WIRE_ROWS) - 2
    # the dead-letter column holds the original wire payload verbatim
    assert "plain garbage" in {r._corrupt for r in bad}
    # valid rows parse identically to the dropping variant
    assert {r.uid for r in good} == {"4711", "1"}
