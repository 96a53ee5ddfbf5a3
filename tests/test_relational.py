

def test_sessionization_hand_case(spark, tmp_path):
    """Gap sessionization on a hand-built nanos-timestamp table:
    user 1 has two sessions (31-min gap), user 2 one session."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_rust_archive_spark.operators.relational import (
        events_sessionization,
    )
    m = 60 * 1_000_000_000  # one minute in ns
    rows = [  # (user_id, event_id, ts_ns)
        (1, 1, 0 * m), (1, 2, 10 * m),        # session A: 2 events, 600s
        (1, 3, 41 * m),                       # 31-min gap -> session B
        (2, 4, 0 * m), (2, 5, 29 * m), (2, 6, 58 * m),  # one session
    ]
    t = pa.table({
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {r.n_events: (r.n_sessions, r.min_dur, r.max_dur)
           for r in events_sessionization(spark, str(tmp_path)).collect()}
    assert got == {
        1: (1, 0.0, 0.0),          # user 1 session B
        2: (1, 600.0, 600.0),      # user 1 session A
        3: (1, 3480.0, 3480.0),    # user 2: 58 min
    }
