"""Stream-shaped ops over the ``events`` table.

Ray Data is a (streaming-)batch engine with no event-time watermarks; the
stream-shaped semantics are expressed as sorted-group computations
(ray_guide: windows = ``groupby(key).map_groups`` over ts-sorted groups).
"""

from __future__ import annotations

import pandas as pd

import ray.data as rd

from .common import merge_partials, read_table


def events_window_counts(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per event_type: (event_type, window_start,
    n_events).  Partial-agg per batch → groupby over partials (the
    shuffle carries one row per (type, hour, batch))."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = batch["ts"].dt.floor("h")
        g = (
            batch.assign(window_start=w)
            .groupby(["event_type", "window_start"])
            .size()
            .rename("n_events")
            .reset_index()
        )
        return g

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384),
        keys=["event_type", "window_start"],
        agg={"n_events": "sum"},
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out


def sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Per-user sessionization with a 30-minute inactivity gap:
    (user_id, n_sessions, n_events).  The ordering assumption — events of
    one user are sorted by (ts, event_id) inside the group — is
    established by the per-group sort; user_id is the (only) shuffle key.
    """
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new_session = g["ts"].diff().isna() | (g["ts"].diff() > gap)
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_sessions": [int(new_session.sum())],
                "n_events": [int(len(g))],
            }
        )

    return (
        ds.groupby("user_id")
        .map_groups(per_user, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def events_hopping_counts(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) windows: width 1 h, hop 30 min — each event lands
    in exactly two windows.  The window explosion happens inside
    ``map_batches`` (vectorized: floor + one shifted copy), then the same
    partial-agg → coalesce-merge as the tumbling variant, so the shuffle
    carries one row per (type, window, batch).  Output: (event_type,
    window_start, n_events)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "ts"])
    hop = pd.Timedelta(minutes=30)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w1 = batch["ts"].dt.floor("30min")
        exploded = pd.concat(
            [
                batch.assign(window_start=w1),
                batch.assign(window_start=w1 - hop),
            ]
        )
        return (
            exploded.groupby(["event_type", "window_start"])
            .size()
            .rename("n_events")
            .reset_index()
        )

    out = merge_partials(
        ds.map_batches(partial, batch_format="pandas", batch_size=16384),
        keys=["event_type", "window_start"],
        agg={"n_events": "sum"},
    )
    out["n_events"] = out["n_events"].astype("int64")
    return out
