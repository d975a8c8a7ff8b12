"""Funnel / cohort-retention analytics (`stages/funnel.py`)."""

import numpy as np
import pyarrow as pa
import pytest

US = 1_000_000


def _events(rows):
    """rows: (user, ts_us, type)"""
    return pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _run_funnel(t, steps=("view", "click", "purchase")):
    import ray.data

    from fs_schema_validator_ray.stages.funnel import funnel_steps

    ds = ray.data.from_arrow(t)
    out = funnel_steps(ds, "user_id", "ts", "event_type", list(steps), n_buckets=4)
    tab = pa.Table.from_pylist(out.take_all())
    return {r["user_id"]: r for r in tab.to_pylist()}


def test_funnel_basic_chain(ray_session):
    rows = [
        # user 1: full chain
        (1, 10 * US, "view"),
        (1, 20 * US, "click"),
        (1, 30 * US, "purchase"),
        # user 2: click before view → only step 1 counted from the later view
        (2, 10 * US, "click"),
        (2, 20 * US, "view"),
        # user 3: no first-step event → excluded entirely
        (3, 10 * US, "click"),
        (3, 20 * US, "purchase"),
        # user 4: purchase without click → stops at 1
        (4, 10 * US, "view"),
        (4, 20 * US, "purchase"),
        # noise types are pruned
        (1, 5 * US, "error"),
    ]
    got = _run_funnel(_events(rows))
    assert set(got) == {1, 2, 4}
    assert got[1] == {
        "user_id": 1,
        "steps_completed": 3,
        "t1": 10 * US,
        "t2": 20 * US,
        "t3": 30 * US,
    }
    assert got[2]["steps_completed"] == 1 and got[2]["t1"] == 20 * US
    assert got[2]["t2"] is None and got[2]["t3"] is None
    assert got[4]["steps_completed"] == 1


def test_funnel_strict_inequality_and_earliest_chain(ray_session):
    rows = [
        # click at exactly the view timestamp does NOT count; later one does
        (1, 10 * US, "view"),
        (1, 10 * US, "click"),
        (1, 40 * US, "click"),
        # chain is earliest-first: t2 is the first click AFTER t1, even if a
        # purchase between them would have allowed a later faster chain
        (1, 50 * US, "purchase"),
        (2, 10 * US, "view"),
        (2, 20 * US, "click"),
        (2, 15 * US, "purchase"),  # before t2 → not counted
    ]
    got = _run_funnel(_events(rows))
    assert got[1]["t2"] == 40 * US and got[1]["t3"] == 50 * US
    assert got[2]["steps_completed"] == 2 and got[2]["t3"] is None


def test_funnel_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    users = rng.integers(0, 80, n)
    ts = rng.integers(0, 10_000, n) * US
    types = rng.choice(["view", "click", "purchase", "error"], n)
    t = _events(list(zip(users.tolist(), ts.tolist(), types.tolist())))
    got = _run_funnel(t)

    # brute force per user
    import collections

    by_user = collections.defaultdict(list)
    for u, s, ty in zip(users, ts, types):
        by_user[int(u)].append((int(s), ty))
    for u, evs in by_user.items():
        t1 = min((s for s, ty in evs if ty == "view"), default=None)
        if t1 is None:
            assert u not in got
            continue
        t2 = min((s for s, ty in evs if ty == "click" and s > t1), default=None)
        t3 = (
            min((s for s, ty in evs if ty == "purchase" and s > t2), default=None)
            if t2 is not None
            else None
        )
        assert got[u]["t1"] == t1 and got[u]["t2"] == t2 and got[u]["t3"] == t3
        assert got[u]["steps_completed"] == sum(
            x is not None for x in (t1, t2, t3)
        )


def test_funnel_requires_two_steps(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.funnel import funnel_steps

    with pytest.raises(ValueError):
        funnel_steps(
            ray.data.from_arrow(_events([])), "user_id", "ts", "event_type", ["x"]
        )


def test_cohort_retention_grid(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.funnel import cohort_retention

    WEEK = 7 * 86_400 * US
    rows = [
        # user 1: weeks 0, 1, 3 → cohort 0, offsets {0, 1, 3}
        (1, 0, "x"),
        (1, WEEK + 5, "x"),
        (1, 3 * WEEK, "x"),
        (1, 3 * WEEK + 9, "x"),  # duplicate (user, week) → once
        # user 2: weeks 1, 2 → cohort 1, offsets {0, 1}
        (2, WEEK, "x"),
        (2, 2 * WEEK, "x"),
        # user 3: week 1 only → cohort 1, offset 0
        (3, WEEK + 1, "x"),
    ]
    t = _events(rows)
    out = cohort_retention(
        ray.data.from_arrow(t), "user_id", "ts", n_buckets=4
    ).take_all()
    grid = {(r["cohort"], r["week_offset"]): r["n_users"] for r in out}
    assert grid == {
        (0, 0): 1,
        (0, 1): 1,
        (0, 3): 1,
        (1, 0): 2,
        (1, 1): 1,
    }


def test_gapfill_dense_grid(ray_session):
    import ray.data

    from fs_schema_validator_ray.stages.reshape import gapfill

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b"], pa.string()),
            "day": pa.array([2, 5, 3], pa.int64()),
            "n": pa.array([7, 1, 4], pa.int64()),
        }
    )
    out = gapfill(
        ray.data.from_arrow(t), "k", "day", ["n"], n_buckets=4
    ).take_all()
    got = {(r["k"], r["day"]): r["n"] for r in out}
    # global range [2, 5] → 4 dense rows per key
    assert len(out) == 8
    assert got[("a", 2)] == 7 and got[("a", 5)] == 1
    assert got[("a", 3)] == 0 and got[("a", 4)] == 0
    assert got[("b", 3)] == 4 and got[("b", 2)] == 0
    # explicit bounds widen the grid
    out2 = gapfill(
        ray.data.from_arrow(t), "k", "day", ["n"], lo=1, hi=6, n_buckets=4
    ).take_all()
    assert len(out2) == 12
    # out-of-range rows raise rather than silently truncate
    with pytest.raises(Exception):
        gapfill(
            ray.data.from_arrow(t), "k", "day", ["n"], lo=3, hi=5, n_buckets=4
        ).take_all()
