"""Relational glue operators (SURVEY.md §2.3/2.6/2.7/2.8).

Each maps a reference ETL step onto a vectorized Ray Data shape:

- ``filter_in``       — M1 category predicate filter
  (`/root/reference/src/engine/data_preprocessing.py:34-37`);
- ``anti_join_keys``  — M2 anti-join on existing ids (broadcast key set +
  ``pc.is_in(invert)``; data_preprocessing.py:39-49);
- ``semi_join_keys``  — the complementary semi-join;
- ``grouped_sample``  — G6 seeded per-group downsample
  (data_preprocessing.py:51-54, ``random_state=42``): deterministic re-
  expression = order each group by ``md5(id)`` and keep the first n (the
  md5 ordering is the cross-engine-reproducible 'seed'; DuckDB mirrors it
  exactly);
- ``topk``            — O1 global top-k = sort + limit;
- ``dedup_keep_first``— G7/G8 keyed dedup with pinned order.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .bucketed import bucketed_group_apply


def filter_in(ds, col: str, values):
    vals = pa.array(sorted(values))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[col], value_set=vals))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def filter_valid(ds, col: str, *, min_len: int = 1):
    """M4 existence/validity filter
    (`/root/reference/src/engine/data_preprocessing.py:61-64` file-exists
    check, re-expressed as payload validity at web scale): keep rows whose
    ``col`` is non-null and at least ``min_len`` characters (bytes for a
    binary column)."""

    def f(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        ln = (pc.binary_length(c) if pa.types.is_binary(c.type)
              else pc.utf8_length(c))
        ok = pc.and_kleene(c.is_valid(), pc.greater_equal(ln, min_len))
        return t.filter(pc.fill_null(ok, False))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def anti_join_keys(ds, col: str, keys):
    """Drop rows whose ``col`` is in ``keys`` (broadcast hash anti-join —
    the small side travels once; no shuffle)."""
    import ray

    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr) if ray.is_initialized() else key_arr

    def f(t: pa.Table) -> pa.Table:
        ks = ray.get(ref) if not isinstance(ref, pa.Array) else ref
        return t.filter(pc.invert(pc.is_in(t[col], value_set=ks)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def anti_join_shuffle(left_ds, left_key: str, right_ds, right_key: str, *,
                      num_buckets: int = 64):
    """Shuffle anti-join for a LARGE key side (SURVEY.md §2.3 M2: "large
    side -> groupby anti"): rows of ``left_ds`` whose ``left_key`` has no
    match in ``right_ds[right_key]``.

    Both sides shuffle on the key bucket; within a bucket the right side
    reduces to a key set and the left rows filter against it — no driver
    materialization of either side. The right side pre-dedups per batch so
    a hot key ships one row per block."""
    s = left_ds.schema()  # ray.data Schema wrapper: .names + arrow .types
    left_names = list(s.names)
    left_types = dict(zip(s.names, s.types))

    def tag_left(t: pa.Table) -> pa.Table:
        return t.append_column("__side", pa.array([0] * t.num_rows,
                                                  type=pa.int64()))

    def tag_right(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[right_key].combine_chunks())
        n = len(keys)
        cols = {}
        for name in left_names:
            typ = left_types[name]
            if name == left_key:
                cols[name] = keys.cast(typ)
            else:
                cols[name] = pa.nulls(n, type=typ)
        cols["__side"] = pa.array([1] * n, type=pa.int64())
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow",
                             zero_copy_batch=True))

    def anti_bucket(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        right_keys = pc.unique(t.filter(pa.array(side == 1))[left_key])
        left = t.filter(pa.array(side == 0))
        keep = pc.invert(pc.is_in(left[left_key], value_set=right_keys))
        return left.filter(keep).drop_columns(["__side"])

    return bucketed_group_apply(both, [left_key], anti_bucket,
                                num_buckets=num_buckets)


def anti_join_auto(left_ds, left_key: str, right_ds, right_key: str, *,
                   max_broadcast_keys: int = 5_000_000,
                   num_buckets: int = 64):
    """M2 anti-join routed by key-side size: a key side small enough to
    broadcast uses the shuffle-free ``anti_join_keys`` path; a larger one
    routes to ``anti_join_shuffle``. The key side is materialized once so
    the routing ``count()`` and the chosen branch share one execution
    (callers routinely pass derived datasets, not bare parquet reads)."""
    right_ds = right_ds.materialize()
    if right_ds.count() <= max_broadcast_keys:
        keys = [r[right_key] for r in
                right_ds.select_columns([right_key]).take_all()]
        return anti_join_keys(left_ds, left_key, keys)
    return anti_join_shuffle(left_ds, left_key, right_ds, right_key,
                             num_buckets=num_buckets)


def semi_join_keys(ds, col: str, keys):
    import ray

    key_arr = pa.array(sorted(set(keys)))
    ref = ray.put(key_arr) if ray.is_initialized() else key_arr

    def f(t: pa.Table) -> pa.Table:
        ks = ray.get(ref) if not isinstance(ref, pa.Array) else ref
        return t.filter(pc.is_in(t[col], value_set=ks))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_join(ds, col: str, lookup: dict, new_cols: list[str], *,
                   how: str = "inner"):
    """Enrich ``ds`` with columns from a small lookup table (J2/J3,
    `/root/reference/src/inference/recommender.py:160-178` /
    `process_social_media_images.py:122-131`): the small side is shipped
    ONCE via ``ray.put`` and applied per batch — no shuffle, the only sane
    join shape when one side is O(catalog) and the other is O(web).

    ``lookup`` maps key -> tuple of values (one per ``new_cols``).
    ``how="inner"`` drops rows with no match (the reference's drop-on-miss
    rule, recommender.py:167); ``how="left"`` keeps them with nulls
    (the reference's null-tolerant J3).

    Appended-column types are derived ONCE from the lookup values on the
    driver, so an all-miss batch under ``how="left"`` still emits the same
    schema as every other block (an inferred all-null column would be
    null-typed and break downstream union/write schema unification).

    The lookup ships as PARALLEL ARROW ARRAYS (keys + one value array per
    appended column) and each batch resolves with one hash probe
    (``pc.index_in``) + one ``pc.take`` per value column — no per-row
    Python dict gets on the big side's hot path."""
    import ray

    def _infer(j: int) -> pa.DataType:
        for v in lookup.values():
            if v[j] is not None:
                return pa.array([v[j]]).type
        return pa.string()

    col_types = [_infer(j) for j in range(len(new_cols))]
    keys_arr = pa.array(list(lookup.keys()))
    val_arrs = [pa.array([v[j] for v in lookup.values()], type=col_types[j])
                for j in range(len(new_cols))]
    payload = (keys_arr, val_arrs)
    ref = ray.put(payload) if ray.is_initialized() else payload

    def f(t: pa.Table) -> pa.Table:
        ks, vals = ray.get(ref) if not isinstance(ref, tuple) else ref
        c = t[col].combine_chunks()
        if len(ks) == 0:  # empty lookup: every row is a miss
            idx = pa.nulls(len(c), type=pa.int32())
        else:
            if c.type != ks.type:
                ks = ks.cast(c.type)
            idx = pc.index_in(c, value_set=ks)  # null index = miss
        if how == "inner":
            hit = pc.is_valid(idx)
            t = t.filter(hit)
            idx = idx.filter(hit)
        for j, name in enumerate(new_cols):
            # take with a null index yields null — exactly the left-join
            # null-fill; inner already filtered the misses out
            t = t.append_column(name, pc.take(vals[j], idx))
        return t

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _pandas_to_arrow(m, names, out_types) -> pa.Table:
    """Typed pandas→Arrow conversion for bucket-join outputs: one C++
    ``pa.Array.from_pandas`` per column (NaN/NaT → null; int columns that
    pandas float-ized on a null-filling merge cast back losslessly, a
    fractional value raises instead of corrupting) — replaces the former
    per-row ``astype(object).where(...).tolist()`` round-trip, which was
    the widest kernel of the large×large joins."""
    return pa.table(
        {n: pa.Array.from_pandas(m[n], type=out_types[n]) for n in names})


def shuffle_join(left_ds, right_ds, left_key: str, right_key: str, *,
                 how: str = "inner", suffix: str = "_r",
                 num_buckets: int = 64):
    """Hash-shuffle equi-join for two LARGE sides — the exchange shape
    ``broadcast_join`` cannot take when neither side fits a broadcast.

    Both sides shuffle on the key bucket (the right side's key values ride
    in the LEFT key column so one bucket column covers both); within a
    bucket the two sides merge with a vectorized pandas join. Output
    columns = left columns + right non-key columns (renamed with
    ``suffix`` on collision). ``how``: "inner" (drop-on-miss) or "left"
    (null-fill; an all-miss bucket keeps the declared right-column types).
    """
    ls, rs = left_ds.schema(), right_ds.schema()
    l_names = list(ls.names)
    l_types = dict(zip(ls.names, ls.types))
    r_names = [n for n in rs.names if n != right_key]
    r_types = dict(zip(rs.names, rs.types))
    out_r = {n: (n + suffix if n in l_names else n) for n in r_names}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in l_names}
        for n in r_names:
            cols[out_r[n]] = pa.nulls(t.num_rows, type=r_types[n])
        cols["__side"] = pa.array([0] * t.num_rows, type=pa.int64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            cols[n] = (t[right_key].cast(l_types[left_key])
                       if n == left_key
                       else pa.nulls(t.num_rows, type=l_types[n]))
        for n in r_names:
            cols[out_r[n]] = t[n]
        cols["__side"] = pa.array([1] * t.num_rows, type=pa.int64())
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow",
                             zero_copy_batch=True))
    r_out_names = [out_r[n] for n in r_names]
    out_types = {**{n: l_types[n] for n in l_names},
                 **{out_r[n]: r_types[n] for n in r_names}}

    def join_bucket(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(l_names)
        rt = t.filter(pa.array(side == 1)).select([left_key] + r_out_names)
        ldf, rdf = lt.to_pandas(), rt.to_pandas()
        m = ldf.merge(rdf, on=left_key, how=how)
        return _pandas_to_arrow(m, l_names + r_out_names, out_types)

    return bucketed_group_apply(both, [left_key], join_bucket,
                                num_buckets=num_buckets)


def union_upsert(base_ds, new_ds, key_col: str, *, num_buckets: int = 64):
    """The reference's combined-catalog upsert (K1+G7,
    `/root/reference/src/engine/data_preprocessing.py:75-87`): append the
    new table to the base table, then keep ONE row per key with base rows
    winning over new rows (``pd.concat([combined, new]).drop_duplicates``
    keeps the first occurrence = the base row).

    Re-expressed shuffle-style: tag a priority column (0 = base, 1 = new),
    union, keyed dedup keeping min priority. Adds a ``src`` column
    ('base'/'new') recording which side survived."""

    def tag(prio: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__prio", pa.array([prio] * t.num_rows, type=pa.int64()))
        return f

    both = base_ds.map_batches(tag(0), batch_format="pyarrow",
                               zero_copy_batch=True).union(
        new_ds.map_batches(tag(1), batch_format="pyarrow",
                           zero_copy_batch=True))
    out = dedup_keep_first(both, key_col, ["__prio"],
                           num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        src = pc.if_else(pc.equal(t["__prio"], 0),
                         pa.scalar("base"), pa.scalar("new"))
        return t.drop_columns(["__prio"]).append_column("src", src)

    return out.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def md5_of_id(values) -> list[str]:
    """The deterministic 'random' order key: md5 of the id rendered as a
    string — identical in DuckDB as ``md5(CAST(id AS VARCHAR))``."""
    return [hashlib.md5(str(v).encode("utf-8")).hexdigest() for v in values]


def grouped_sample(ds, group_col: str, n: int, id_col: str, *,
                   num_buckets: int = 64):
    """Keep the n rows of each group that sort first by md5(id) —
    deterministic seeded-sample analog of G6 (random_state=42)."""

    def sample_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        df["_h"] = md5_of_id(df[id_col])
        df = df.sort_values([group_col, "_h", id_col])
        df = df.groupby(group_col, sort=True).head(n).drop(columns="_h")
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_group_apply(ds, [group_col], sample_bucket,
                                num_buckets=num_buckets)


def topk(ds, col: str, k: int, *, descending: bool = True,
         tie_col: str | None = None):
    """Global top-k: per-batch partial top-k (combine) then one sort+limit
    over the partials — never a full global sort of the input."""

    def local(t: pa.Table) -> pa.Table:
        keys = [(col, "descending" if descending else "ascending")]
        if tie_col:
            keys.append((tie_col, "ascending"))
        idx = pc.sort_indices(t, sort_keys=keys)
        return t.take(idx[:k])

    partials = ds.map_batches(local, batch_format="pyarrow",
                              zero_copy_batch=True)
    out = partials.sort([col] + ([tie_col] if tie_col else []),
                        descending=[descending] + ([False] if tie_col else []))
    return out.limit(k)


def dedup_keep_first(ds, key_col: str, order_cols: list[str], *,
                     ascending: list[bool] | None = None,
                     num_buckets: int = 64):
    """G7/G8: one row per key, keeping the first row in ``order_cols``
    order (``ascending`` per column; default all ascending). With
    descending order this is the last-writer-wins merge (G4)."""
    asc = ascending if ascending is not None else [True] * len(order_cols)

    def bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.to_pandas()
        df = df.sort_values([key_col] + order_cols,
                            ascending=[True] + list(asc))
        df = df.groupby(key_col, sort=True).head(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_group_apply(ds, [key_col], bucket,
                                num_buckets=num_buckets)


def asof_join(left_ds, right_ds, *, key: str, right_key: str,
              left_time: str, right_time: str, tie_col: str | None = None,
              num_buckets: int = 64):
    """As-of (backward) join: for each left row, attach the right row with
    the same key and the LARGEST ``right_time`` <= ``left_time``; left
    rows with no prior right row are dropped (inner semantics).

    Ray Data has no native as-of join; this composes it from the engine's
    shuffle primitives: both sides hash-shuffle ONCE on the key (the
    ``shuffle_join`` side-tag trick — the right key rides in the left key
    column so one bucket column covers both), and each bucket resolves
    locally with pandas ``merge_asof`` — a vectorized O(n log n) sorted
    merge. No driver materialization; the only exchange is the one
    bucketed shuffle both equi-join variants already pay.

    ``tie_col``: when several right rows share (key, right_time), keep the
    one with the max ``tie_col`` (bucket-local dedup, free — the rows are
    already co-located). Without it, (key, right_time) must be unique or
    the surviving row is partition-dependent.

    Output columns: all left columns + right columns except ``right_key``
    (suffixed ``_r`` on collision). DuckDB mirror:
    ``FROM l ASOF JOIN r ON l.key = r.key AND l.t >= r.t``.
    """
    ls, rs = left_ds.schema(), right_ds.schema()
    l_names = list(ls.names)
    l_types = dict(zip(ls.names, ls.types))
    r_names = [n for n in rs.names if n != right_key]
    r_types = dict(zip(rs.names, rs.types))
    out_r = {n: (n + "_r" if n in l_names else n) for n in r_names}

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {n: t[n] for n in l_names}
        for n in r_names:
            cols[out_r[n]] = pa.nulls(t.num_rows, type=r_types[n])
        cols["__side"] = pa.array([0] * t.num_rows, type=pa.int64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {}
        for n in l_names:
            cols[n] = (t[right_key].cast(l_types[key]) if n == key
                       else pa.nulls(t.num_rows, type=l_types[n]))
        for n in r_names:
            cols[out_r[n]] = t[n]
        cols["__side"] = pa.array([1] * t.num_rows, type=pa.int64())
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow",
                             zero_copy_batch=True))
    r_out_names = [out_r[n] for n in r_names]
    rt_out = out_r[right_time]
    out_types = {**{n: l_types[n] for n in l_names},
                 **{out_r[n]: r_types[n] for n in r_names}}

    def join_bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(l_names)
        rt = t.filter(pa.array(side == 1)).select([key] + r_out_names)
        ldf, rdf = lt.to_pandas(), rt.to_pandas()
        if tie_col is not None and len(rdf):
            rdf = (rdf.sort_values([key, rt_out, out_r[tie_col]])
                   .drop_duplicates([key, rt_out], keep="last"))
        ldf = ldf.sort_values(left_time, kind="mergesort")
        rdf = rdf.sort_values(rt_out, kind="mergesort")
        m = pd.merge_asof(ldf, rdf, left_on=left_time, right_on=rt_out,
                          by=key, direction="backward",
                          allow_exact_matches=True)
        m = m[m[rt_out].notna()]  # inner: drop left rows with no match
        return _pandas_to_arrow(m, l_names + r_out_names, out_types)

    return bucketed_group_apply(both, [key], join_bucket,
                                num_buckets=num_buckets)


def band_join(left_ds, right_ds, *, left_val: str, right_val: str,
              eps: float, key: list[str] | None = None,
              right_keys: list[str] | None = None, suffix: str = "_r",
              num_buckets: int = 64):
    """Range (band) join: left row L matches right row R when
    ``|L.left_val - R.right_val| <= eps`` (and the optional equi ``key``
    columns agree). Inner semantics; rows with a null value are dropped.

    Ray Data has no inequality join; the scale shape is a VALUE-GRID
    shuffle: cells of width ``2*eps`` on a fixed grid, the LEFT side
    replicated to the (at most two) cells its band overlaps, the right
    side landing in its own cell only — so a qualifying pair meets in
    EXACTLY one cell (the right row's) and needs no post-dedup. The
    exchange is one bucketed shuffle on (key..., cell); each cell
    resolves with a vectorized pandas equi-merge + band mask. Candidate
    volume per cell is bounded by the data's density within ``2*eps``,
    which is exactly the selectivity the caller chose via ``eps``.

    Output columns: all left columns + right columns (suffixed on
    collision). DuckDB mirror: a plain inequality join
    ``ON l.k = r.k AND r.v BETWEEN l.v - eps AND l.v + eps``.
    """
    import numpy as np

    if eps <= 0:
        raise ValueError("eps must be positive")
    key = list(key or [])
    rkey = list(right_keys or key)
    if len(rkey) != len(key):
        raise ValueError("right_keys must match key length")
    w = 2.0 * float(eps)

    ls, rs = left_ds.schema(), right_ds.schema()
    l_names = list(ls.names)
    l_types = dict(zip(ls.names, ls.types))
    r_names = list(rs.names)
    r_types = dict(zip(rs.names, rs.types))
    out_r = {n: (n + suffix if n in l_names else n) for n in r_names}
    rk_map = dict(zip(rkey, key))  # right key col -> left key col name
    CELL = "__vcell"

    def tag_left(t: pa.Table) -> pa.Table:
        v = t[left_val].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v)
        t = t.filter(pa.array(ok))
        v = v[ok]
        lo = np.floor((v - eps) / w).astype(np.int64)
        hi = np.floor((v + eps) / w).astype(np.int64)
        reps = (hi - lo + 1).astype(np.int64)  # 1 or 2 cells
        idx = np.repeat(np.arange(len(v)), reps)
        # within-row offset 0..rep-1, flattened without a Python loop
        offs = (np.arange(len(idx), dtype=np.int64)
                - np.repeat(np.cumsum(reps) - reps, reps))
        cells = lo[idx] + offs
        rep = t.take(pa.array(idx))
        cols = {n: rep[n] for n in l_names}
        for n in r_names:
            cols[out_r[n]] = pa.nulls(rep.num_rows, type=r_types[n])
        cols[CELL] = pa.array(cells, type=pa.int64())
        cols["__side"] = pa.array([0] * rep.num_rows, type=pa.int64())
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        v = t[right_val].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = np.isfinite(v)
        t = t.filter(pa.array(ok))
        v = v[ok]
        cols = {}
        for n in l_names:
            cols[n] = pa.nulls(t.num_rows, type=l_types[n])
        for rk in rkey:  # right key values ride in the left key columns
            cols[rk_map[rk]] = t[rk].cast(l_types[rk_map[rk]])
        for n in r_names:
            cols[out_r[n]] = t[n]
        cols[CELL] = pa.array(np.floor(v / w).astype(np.int64),
                              type=pa.int64())
        cols["__side"] = pa.array([1] * t.num_rows, type=pa.int64())
        return pa.table(cols)

    both = left_ds.map_batches(tag_left, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        right_ds.map_batches(tag_right, batch_format="pyarrow",
                             zero_copy_batch=True))
    r_out_names = [out_r[n] for n in r_names]
    rv_out = out_r[right_val]
    out_types = {**{n: l_types[n] for n in l_names},
                 **{out_r[n]: r_types[n] for n in r_names}}

    def join_cell(t: pa.Table) -> pa.Table:
        side = t["__side"].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(l_names + [CELL])
        rt = t.filter(pa.array(side == 1)).select(key + r_out_names
                                                  + [CELL])
        ldf, rdf = lt.to_pandas(), rt.to_pandas()
        m = ldf.merge(rdf, on=key + [CELL], how="inner") \
            if key else ldf.merge(rdf, on=CELL, how="inner")
        if len(m):
            lv = m[left_val].to_numpy(dtype=np.float64)
            rv = m[rv_out].to_numpy(dtype=np.float64)
            m = m[(rv >= lv - eps) & (rv <= lv + eps)]
        return _pandas_to_arrow(m, l_names + r_out_names, out_types)

    return bucketed_group_apply(both, key + [CELL], join_cell,
                                num_buckets=num_buckets)
