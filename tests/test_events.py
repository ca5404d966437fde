"""Sessionization and tumbling-window aggregates over event streams,
against hand-computed goldens (gap boundaries, timestamp ties)."""

import datetime as dt

import numpy as np
import pytest


def _ev(eid, user, sec, value, etype="view"):
    base = dt.datetime(2024, 1, 1)
    return {"event_id": eid, "user_id": user,
            "ts": base + dt.timedelta(seconds=sec),
            "event_type": etype, "value": value}


def test_sessionize_goldens(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.events import sessionize
    rows = [
        _ev(0, 1, 0, 1.0),
        _ev(1, 1, 1800, 2.0),     # gap == 1800s → SAME session (strict >)
        _ev(2, 1, 3601, 4.0),     # gap 1801s → new session
        _ev(3, 2, 0, 8.0),        # other user, own sessions
        _ev(5, 2, 0, 16.0),       # tie on ts → ordered by event_id
        _ev(4, 2, 0, 32.0),
    ]
    ds = rd.from_items(rows, override_num_blocks=3)
    out = sessionize(ds, gap_seconds=1800).to_pandas() \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_id"].tolist() == [0, 1, 0]
    assert out["n_events"].tolist() == [2, 1, 3]
    assert out["total_value"].tolist() == [3.0, 4.0, 56.0]
    base_us = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    assert out["start_us"].tolist() == [base_us, base_us + 3601 * 10**6,
                                        base_us]
    assert out["end_us"].tolist() == [base_us + 1800 * 10**6,
                                      base_us + 3601 * 10**6, base_us]


def test_asof_join_goldens(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.events import asof_join
    clicks = rd.from_items([
        _ev(10, 1, 100, 0, "click"),   # after views 0,1 → latest is 1
        _ev(11, 1, 5, 0, "click"),     # exact-match ts with view 0 → view 0
        _ev(12, 2, 50, 0, "click"),    # user 2 has no views → null
    ], override_num_blocks=2)
    views = rd.from_items([
        _ev(0, 1, 5, 0, "view"),
        _ev(1, 1, 60, 0, "view"),
    ], override_num_blocks=1)
    out = asof_join(clicks, views, by_col="user_id", ts_col="ts",
                    right_cols={"event_id": "view_event"},
                    left_cols=["event_id"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == [10, 11, 12]
    got = out["view_event"].tolist()
    assert got[0] == 1 and got[1] == 0 and pd_isna(got[2])


def pd_isna(x):
    import pandas as pd
    return pd.isna(x)


def test_windowed_agg_goldens(ray_session):
    import ray.data as rd

    from lucene_msmarco_ray.ops.events import windowed_agg
    rows = [
        _ev(0, 1, 10, 1.5, "click"),
        _ev(1, 1, 3599, 2.5, "click"),     # same hour window
        _ev(2, 1, 3600, 4.0, "click"),     # next window boundary
        _ev(3, 2, 20, 8.0, "view"),
    ]
    ds = rd.from_items(rows, override_num_blocks=2)
    out = windowed_agg(ds, window_seconds=3600).to_pandas() \
        .sort_values(["event_type", "window_id"]).reset_index(drop=True)
    got = list(zip(out["event_type"], out["n_events"], out["total_value"]))
    assert got == [("click", 2, 4.0), ("click", 1, 4.0), ("view", 1, 8.0)]
    assert out["window_id"].iloc[1] == out["window_id"].iloc[0] + 1

def test_sessionize_forced_skew(ray_session):
    """One hot user with 100x everyone else's events: output stays correct
    and the hot-user detector flags exactly that user."""
    import pandas as pd
    import ray.data as rd

    from lucene_msmarco_ray.ops.events import check_hot_users, sessionize
    rows = []
    eid = 0
    # hot user 7: 500 events 1s apart (one session), then a 1h gap + 3 more
    for i in range(500):
        rows.append({"user_id": 7, "ts": 1_000_000 + i, "event_id": eid,
                     "value": 1.0, "event_type": "x"})
        eid += 1
    for i in range(3):
        rows.append({"user_id": 7, "ts": 1_000_000 + 500 + 3600 + i,
                     "event_id": eid, "value": 1.0, "event_type": "x"})
        eid += 1
    for u in range(8, 13):                       # cold users: 5 events each
        for i in range(5):
            rows.append({"user_id": u, "ts": 2_000_000 + i, "event_id": eid,
                         "value": 0.5, "event_type": "x"})
            eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    out = sessionize(rd.from_pandas(df), gap_seconds=1800,
                     hot_user_events=100).to_pandas()
    hot = out[out["user_id"] == 7].sort_values("session_id")
    assert list(hot["n_events"]) == [500, 3]
    assert (out[out["user_id"] != 7]["n_events"] == 5).all()
    # detector: exactly the hot user crosses the bound
    import numpy as np
    flagged = check_hot_users(np.array([7, 8]), np.array([503, 5]), 100)
    assert flagged == [(7, 503)]
