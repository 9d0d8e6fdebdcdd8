#!/usr/bin/env python
"""Deterministic scale-up of a fixture sf directory for PERF evidence.

Replicates every table K times with per-shard key shifts (shard i adds
``i * (max_key + 1)`` to every key/id column), so referential joins
behave like K independent shards: join fan-outs, group counts, and
filter selectivities scale linearly, and no artificial cross-shard hot
key appears.  Non-key columns are copied verbatim — EXCEPT
``documents.text`` (r7, VERDICT r6 item 4): verbatim replication made
every document an exact member of a K-sized clique, so any exact
near-dup pair set (x02/x43's certified generators — and their DuckDB
oracles) was Θ(K²) BY FIXTURE CONSTRUCTION, OOMing at sf10 regardless
of plan quality.  Shard i>0 now rewrites each whitespace token ``w``
to ``w x{i}`` (concatenated — the fixture texts are pure
``[A-Za-z0-9 ]``, so the map is a token BIJECTION per shard): n-gram
shingle sets map bijectively, every within-shard Jaccard is IDENTICAL
to the base corpus (planted near-dup structure preserved per shard),
and cross-shard similarity is exactly 0 PROVIDED no base-corpus token
already ends in the ``x<digits>`` image pattern (ADVICE r7: a literal
base token like ``foxx2`` would collide with shard 2's image of
``fox``) — the tool now ASSERTS that precondition against the source
corpus and aborts with the degraded claim ("cross-shard similarity
~0, not exactly 0") if it ever fails.  Near-dup pair counts therefore
scale LINEARLY with K — the realistic crawl shape the second-decade
dedup growth evidence needs.

This data is ONLY for the floor-amortization bench (BASELINE.md §4):
correctness is still gated on the driver's own sf0.001/0.01/0.1
fixtures.  Output goes inside the repo (gitignored), never to
/root/testdata.

Usage: python tools/make_scale.py [K] [src_dir] [dst_dir]
Defaults: K=10, src=/root/testdata/sf0.1, dst=.bench_data/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

# key/id columns per table -> shifted per shard; everything else verbatim
KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# the stride for a foreign key must equal the stride of the table it
# references, so shard i's facts point at shard i's dims
FK_SOURCE: dict[tuple[str, str], tuple[str, str]] = {
    ("nation", "n_regionkey"): ("region", "r_regionkey"),
    ("customer", "c_nationkey"): ("nation", "n_nationkey"),
    ("supplier", "s_nationkey"): ("nation", "n_nationkey"),
    ("orders", "o_custkey"): ("customer", "c_custkey"),
    ("lineitem", "l_orderkey"): ("orders", "o_orderkey"),
    ("lineitem", "l_partkey"): ("part", "p_partkey"),
    ("lineitem", "l_suppkey"): ("supplier", "s_suppkey"),
    # events.user_id joins customer/order keys (q17b/q17c asof+interval
    # joins); its stride must match customer's or shard i's events land
    # on shard 0's customers — the cross-shard hot key this tool exists
    # to avoid
    ("events", "user_id"): ("customer", "c_custkey"),
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data", "sf1")
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    # the bijection's cross-shard-disjointness precondition (module
    # docstring / ADVICE r7): no BASE token may already match the
    # shard-image pattern .*x<digits>, or base shard 0 collides with a
    # later shard's image of the stem
    hits = con.execute(
        f"SELECT COUNT(*) FROM (SELECT UNNEST(string_split(text, ' ')) "
        f"AS tok FROM '{src}/documents.parquet') "
        "WHERE regexp_matches(tok, '.x[0-9]+$')").fetchone()[0]
    if hits:
        raise SystemExit(
            f"make_scale: {hits} base-corpus tokens already end in the "
            "x<digits> image pattern — the cross-shard-similarity-is-"
            "exactly-0 claim would not hold (it degrades to ~0); "
            "pick a different bijection suffix for this corpus")

    strides: dict[tuple[str, str], int] = {}
    for t, cols in KEYS.items():
        for c in cols:
            if (t, c) in FK_SOURCE:
                continue
            m = con.execute(
                f"SELECT MAX({c}) FROM '{src}/{t}.parquet'").fetchone()[0]
            strides[(t, c)] = int(m) + 1
    for (t, c), (rt, rc) in FK_SOURCE.items():
        strides[(t, c)] = strides[(rt, rc)]

    # per-shard token bijection (see module docstring): w -> w || 'x' || i
    TEXT_BIJECTION = (
        "CASE WHEN shard.i = 0 THEN text ELSE array_to_string("
        "list_transform(string_split(text, ' '), "
        "t -> CASE WHEN t = '' THEN t ELSE t || 'x' || shard.i END), "
        "' ') END")

    for t, keycols in KEYS.items():
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + shard.i * {strides[(t, c)]} AS {c}"
            if c in keycols else
            (f"{TEXT_BIJECTION} AS text"
             if t == "documents" and c == "text" else c)
            for c in cols)
        out = os.path.join(dst, f"{t}.parquet")
        # Row-group sizing (r11, guide §2.5/§6 "fix input skew at the
        # source"): DuckDB's default 122880-row groups left small
        # tables with 1-5 row groups, and a Spark scan cannot split
        # below row-group granularity — every split beyond the group
        # count is EMPTY, so document/embedding compute serialized
        # onto 1-5 of 32 cores.  Target >= 64 groups per table
        # (capped at the default so big facts keep their layout);
        # at 100 TB this is ordinary file/row-group sizing on write.
        n_src = con.execute(
            f"SELECT COUNT(*) FROM '{src}/{t}.parquet'").fetchone()[0]
        rg = min(122880, max(1024, (n_src * k) // 64))
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet', "
            f"range({k}) AS shard(i) ORDER BY shard.i) "
            f"TO '{out}' (FORMAT PARQUET, OVERWRITE_OR_IGNORE, "
            f"ROW_GROUP_SIZE {rg})")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
