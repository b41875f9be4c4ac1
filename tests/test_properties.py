"""Hypothesis property tests for the warehouse-lifecycle operators
(E12 merge_upsert, E13 scd2_history) against exact Python replay
models — randomized inputs cover the key-domain edge cases (empty
base, empty batch, all-deletes, delete-of-absent-key, attribute
runs) that the fixture-derived oracle queries exercise only at the
shapes the fixtures happen to contain.

derandomize=True: the shrinker seed is fixed, so the suite stays
deterministic in CI; deadline=None because each example pays Spark
job latency, not compute.
"""

from hypothesis import given, settings, strategies as st

from fts_analysis_datalake_spark.operators.cdc import merge_upsert, scd2_history

KEYS = st.integers(min_value=0, max_value=7)
VALS = st.integers(min_value=-5, max_value=5)


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    base=st.dictionaries(KEYS, VALS, max_size=8),
    changes=st.dictionaries(
        KEYS, st.tuples(st.sampled_from("UD"), VALS), max_size=8
    ),
)
def test_merge_upsert_matches_dict_replay(spark, base, changes):
    """change-wins-per-key + delete-tombstones == dict replay, for
    every combination of overlapping/disjoint key sets, including
    deletes of keys absent from the base (must be a no-op, not a
    resurrected row)."""
    base_df = spark.createDataFrame(
        list(base.items()), "k BIGINT, v BIGINT"
    )
    ch_df = spark.createDataFrame(
        [(k, v, op) for k, (op, v) in changes.items()],
        "k BIGINT, v BIGINT, _op STRING",
    )
    expected = dict(base)
    for k, (op, v) in changes.items():
        if op == "U":
            expected[k] = v
        else:
            expected.pop(k, None)
    got = {(r.k, r.v) for r in merge_upsert(base_df, ch_df, ["k"]).collect()}
    assert got == set(expected.items())


@settings(max_examples=15, deadline=None, derandomize=True)
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=3), st.sampled_from("abc")),
        min_size=1,
        max_size=16,
    )
)
def test_scd2_matches_run_replay(spark, events):
    """Interval-per-attribute-run == per-key sequential replay:
    consecutive duplicates collapse into the open interval, each
    change closes the previous interval at its own ts, and exactly
    the last interval per key is current."""
    rows = [(k, i, a, i) for i, (k, a) in enumerate(events)]
    df = spark.createDataFrame(rows, "k BIGINT, ts BIGINT, attr STRING, tb BIGINT")

    per_key: dict = {}
    for k, ts, a, _tb in rows:
        per_key.setdefault(k, []).append((ts, a))
    expected = set()
    for k, evs in per_key.items():
        evs.sort()
        runs = [(ts, a) for i, (ts, a) in enumerate(evs) if i == 0 or evs[i - 1][1] != a]
        for i, (ts, a) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            expected.add((k, a, ts, nxt, nxt is None))

    got = {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, ["k"], "ts", "attr", "tb").collect()
    }
    assert got == expected
