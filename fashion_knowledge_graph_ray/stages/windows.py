"""Windowed aggregates over an event-time column.

The reference has no streaming semantics (SURVEY.md §2.10) — these are
training-data-pipeline additions: the three window shapes a batch engine
needs when re-processing event logs at scale.

All are deterministic batch re-expressions:

- ``tumbling_window`` — fixed-width windows = pure key derivation
  (``floor(ts)``), so it is a partial-combine + bucketed merge with NO
  per-row Python: each input batch pre-aggregates to at most one row per
  (key, window) before the shuffle, which is what keeps the exchange tiny
  at 10^12-event scale.
- ``hopping_window`` — overlapping windows; the per-event ``width/slide``
  expansion happens INSIDE the partial combiner so the exchange still
  moves at most one row per (key, window) per block.
- ``session_windows`` — gap-based windows cannot pre-combine (a session
  boundary depends on neighboring rows), so ALL rows of one key must
  co-locate: one bucketed shuffle on the key, then a vectorized
  sort + gap-cumsum per bucket. Hot users are bounded by the per-key data
  volume itself (a key's sessions cannot be split across tasks by
  definition); the bucket count only bounds fan-in.

Aggregates exposed are order-independent exact ones (count, max) — no
float accumulation whose value would depend on shuffle order.
"""

from __future__ import annotations

import pyarrow as pa

from .bucketed import bucketed_group_apply


def tumbling_window(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", width: str = "h",
                    num_buckets: int = 64):
    """Per (key, window_start) count + max over fixed windows.

    ``width`` is a pandas floor frequency ("h", "15min", "d").
    Returns (key, window_start, n_events, max_value).
    """

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({key_col: t[key_col].to_pandas(),
                           "window_start": t[ts_col].to_pandas().dt.floor(width),
                           value_col: t[value_col].to_pandas()})
        g = df.groupby([key_col, "window_start"], sort=True).agg(
            n_events=(value_col, "size"), max_value=(value_col, "max"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        g = df.groupby([key_col, "window_start"], sort=True).agg(
            n_events=("n_events", "sum"), max_value=("max_value", "max"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_group_apply(partials, [key_col], merge,
                                num_buckets=num_buckets)


def hopping_window(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                   value_col: str = "value", width_sec: int = 3600,
                   slide_sec: int = 900, num_buckets: int = 64):
    """Per (key, window_start) count + max over OVERLAPPING windows of
    ``width_sec`` sliding every ``slide_sec`` (``slide_sec`` must divide
    ``width_sec``): each event lands in ``width/slide`` windows.

    Same scale shape as tumbling: the per-event expansion happens INSIDE
    the per-batch partial combiner, so the shuffle still moves at most one
    row per (key, window) per input block — the expansion factor never
    crosses the exchange. Window starts are integer epoch seconds
    (timezone-free, engine-portable). Returns (key, ws_sec, n_events,
    max_value)."""
    if width_sec % slide_sec:
        raise ValueError("slide_sec must divide width_sec")
    hops = width_sec // slide_sec

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        # epoch conversion in Arrow, not pandas: cast(int64) yields epoch
        # ticks in the column's own unit for BOTH naive and tz-aware
        # timestamps (Arrow stores UTC epoch internally), where the pandas
        # .astype('datetime64[ns]') route raises on tz-aware columns
        ty = t.schema.field(ts_col).type
        div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ty.unit]
        ticks = t[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({key_col: t[key_col].to_pandas(),
                           "g": (ticks // div) // slide_sec,
                           value_col: t[value_col].to_pandas()})
        frames = []
        for k in range(hops):
            d = df[[key_col, value_col]].copy()
            d["ws_sec"] = (df["g"] - k) * slide_sec
            frames.append(d)
        allw = pd.concat(frames, ignore_index=True)
        g = allw.groupby([key_col, "ws_sec"], sort=True).agg(
            n_events=(value_col, "size"), max_value=(value_col, "max"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby([key_col, "ws_sec"], sort=True).agg(
            n_events=("n_events", "sum"), max_value=("max_value", "max"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return bucketed_group_apply(partials, [key_col], merge,
                                num_buckets=num_buckets)


def session_windows(ds, *, key_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", gap_minutes: int = 30,
                    num_buckets: int = 64):
    """Gap-based sessions per key: a new session starts when the gap to the
    previous event of the same key exceeds ``gap_minutes``.

    Ordering inside a key is pinned to (ts, id) so ties are deterministic.
    Returns (key, session_start, session_end, n_events).
    """

    def sessions(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        df = pd.DataFrame({key_col: t[key_col].to_pandas(),
                           id_col: t[id_col].to_pandas(),
                           "ts": t[ts_col].to_pandas()})
        df = df.sort_values([key_col, "ts", id_col], kind="mergesort")
        gap = pd.Timedelta(minutes=gap_minutes)
        new_key = df[key_col].ne(df[key_col].shift())
        new_gap = df["ts"].diff() > gap
        sess = np.cumsum(new_key | new_gap)
        g = df.groupby([df[key_col], sess], sort=True).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("ts", "size"))
        g = g.reset_index(level=0).reset_index(drop=True)
        return pa.Table.from_pandas(g, preserve_index=False)

    return bucketed_group_apply(ds, [key_col], sessions,
                                num_buckets=num_buckets)
