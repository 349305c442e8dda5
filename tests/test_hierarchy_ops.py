"""Property test for operators/hierarchy.py: on seeded random forests,
pointer_jump with a log-depth round bound must match a pure-Python
root/depth walk exactly, and must agree with the naive walk given
enough rounds."""

from __future__ import annotations

import random

from cam_location_addressing_feature_service_etl_spark.operators.hierarchy import (
    naive_parent_walk,
    pointer_jump,
)


def _random_forest(rng, n_nodes):
    """Random parent pointers: node i's parent is a smaller id (or a
    root with probability 1/8) — acyclic by construction, arbitrary
    depth/branching."""
    rows = []
    for i in range(n_nodes):
        if i == 0 or rng.random() < 0.125:
            rows.append((i, None))
        else:
            rows.append((i, rng.randrange(i)))
    return rows


def _truth(rows):
    parent = {n: p for n, p in rows}
    out = {}
    for n in parent:
        d, cur = 0, n
        while parent[cur] is not None:
            cur = parent[cur]
            d += 1
        out[n] = (cur, d)
    return out


def test_pointer_jump_matches_python_walk_on_random_forests(spark):
    rng = random.Random(0x9A11)
    for trial in range(3):
        rows = _random_forest(rng, 400)
        truth = _truth(rows)
        max_depth = max(d for _, d in truth.values())
        rounds = max(1, (max_depth - 1).bit_length())  # 2^rounds >= depth
        parents = spark.createDataFrame(rows, "node bigint, parent bigint")
        got = {
            r["node"]: (r["root"], r["depth"])
            for r in pointer_jump(parents, rounds).collect()
        }
        assert got == truth, f"trial {trial}, depth {max_depth}, rounds {rounds}"
        naive = {
            r["node"]: (r["root"], r["depth"])
            for r in naive_parent_walk(parents, max_depth).collect()
        }
        assert naive == truth, f"naive walk trial {trial}"


def test_dangling_parent_keeps_row_with_stale_pointer(spark):
    """ADVICE r11: a non-null parent id absent from the node column
    (malformed forest) must not silently shrink the output. Both
    traversals keep the row; its root surfaces as the dangling id so
    callers can detect the malformation, and well-formed rows still
    resolve exactly."""
    rows = [
        (1, None),   # root
        (2, 1),      # child of root
        (3, 99),     # dangling: 99 is not a node
        (4, 3),      # descends through the dangling row
    ]
    parents = spark.createDataFrame(rows, "node bigint, parent bigint")
    for fn in (pointer_jump, naive_parent_walk):
        got = {
            r["node"]: (r["root"], r["depth"]) for r in fn(parents, 4).collect()
        }
        assert set(got) == {1, 2, 3, 4}, fn.__name__  # no row loss
        assert got[1] == (1, 0)
        assert got[2] == (1, 1)
        assert got[3][0] == 99, fn.__name__  # stale pointer surfaced
        assert got[4][0] == 99, fn.__name__
