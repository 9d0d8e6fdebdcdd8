"""Property-based tests (SURVEY.md §5.4): algebraic invariants on
randomized small tables.  Example counts are kept low — every example
costs Spark jobs — but the generators cover nulls, duplicates, empty
tables, and adversarial key overlaps that point examples miss."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators import cdc
from bi_etl_and_integration_spark.operators.aggregate import (
    merge_states, partial_states)
from bi_etl_and_integration_spark.operators.dedup import exact_dedup
from bi_etl_and_integration_spark.operators.relational import (
    conditional_split, union_all)
from bi_etl_and_integration_spark.operators.windows import scd2_windows

SETTINGS = settings(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])

kv_rows = st.lists(
    st.tuples(st.integers(0, 5),
              st.one_of(st.none(), st.integers(-100, 100))),
    min_size=0, max_size=30)


@SETTINGS
@given(data=kv_rows)
def test_conditional_split_partitions_input(spark, data):
    df = spark.createDataFrame(data, "k int, v int") \
        if data else spark.createDataFrame([], "k int, v int")
    streams = conditional_split(
        df, {"neg": F.col("v") < 0, "small": F.col("v") < 50},
        default="rest")
    assert sum(s.count() for s in streams.values()) == len(data)


@SETTINGS
@given(a=kv_rows, b=kv_rows)
def test_union_count_additivity(spark, a, b):
    schema = "k int, v int"
    da = spark.createDataFrame(a, schema) if a \
        else spark.createDataFrame([], schema)
    db = spark.createDataFrame(b, schema) if b \
        else spark.createDataFrame([], schema)
    assert union_all(da, db).count() == len(a) + len(b)


@SETTINGS
@given(left=kv_rows, right_keys=st.lists(st.integers(0, 5), max_size=6,
                                         unique=True))
def test_left_join_unique_right_preserves_count(spark, left, right_keys):
    schema = "k int, v int"
    dl = spark.createDataFrame(left, schema) if left \
        else spark.createDataFrame([], schema)
    dr = spark.createDataFrame([(k, str(k)) for k in right_keys],
                               "k int, s string") if right_keys \
        else spark.createDataFrame([], "k int, s string")
    assert dl.join(dr, "k", "left").count() == len(left)
    semi = dl.join(dr, "k", "left_semi").count()
    anti = dl.join(dr, "k", "left_anti").count()
    assert semi + anti == len(left)


@SETTINGS
@given(data=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                     min_size=1, max_size=25))
def test_scd2_windows_partition_the_timeline(spark, data):
    # unique (k, eff) pairs — version axis must be unique per key
    data = list({(k, e) for k, e in data})
    df = spark.createDataFrame(data, "k int, eff int")
    out = scd2_windows(df, ["k"], "eff").collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, rows_ in by_key.items():
        rows_.sort(key=lambda r: r["eff"])
        # exactly one open/current version per key, and it is the last
        currents = [r for r in rows_ if r["is_current"]]
        assert len(currents) == 1 and currents[0] is rows_[-1]
        # each version ends where the next begins
        for cur, nxt in zip(rows_, rows_[1:]):
            assert cur["end_ts"] == nxt["eff"]
        assert rows_[-1]["end_ts"] is None


@SETTINGS
@given(a=st.lists(st.tuples(st.integers(0, 3), st.floats(-100, 100)),
                  max_size=20),
       b=st.lists(st.tuples(st.integers(0, 3), st.floats(-100, 100)),
                  max_size=20))
def test_partial_state_merge_equals_direct_agg(spark, a, b):
    schema = "k int, v double"
    da = spark.createDataFrame(a, schema) if a \
        else spark.createDataFrame([], schema)
    db = spark.createDataFrame(b, schema) if b \
        else spark.createDataFrame([], schema)
    both = union_all(da, db)
    direct = {r["k"]: r["s"] for r in both.groupBy("k")
              .agg(F.sum("v").alias("s")).collect()}
    s1 = partial_states(da, ["k"], {"m": F.col("v")})
    s2 = partial_states(db, ["k"], {"m": F.col("v")})
    merged = {r["k"]: r["m"] for r in
              merge_states(union_all(s1, s2), ["k"], ["m"],
                           {"m": "sum"}).collect()}
    assert set(direct) == set(merged)
    for k in direct:
        assert abs(direct[k] - merged[k]) < 1e-9


@SETTINGS
@given(changes=st.lists(
    st.tuples(st.integers(0, 4), st.text("ab", max_size=2),
              st.sampled_from([cdc.OP_INSERT, cdc.OP_UPDATE,
                               cdc.OP_DELETE])),
    min_size=1, max_size=20))
def test_apply_changes_idempotent_and_keyed_unique(spark, changes):
    """Random change logs: applying twice == applying once, and the
    result never holds two rows for one key."""
    log = spark.createDataFrame(
        [(k, v, i, op) for i, (k, v, op) in enumerate(changes)],
        "k int, v string, lsn int, op int")
    target = spark.createDataFrame([(0, "t0"), (1, "t1")], "k int, v string")
    once = cdc.apply_changes(target, log, ["k"], "lsn", "op")
    twice = cdc.apply_changes(once.select("k", "v"), log, ["k"], "lsn", "op")
    r_once = sorted(map(tuple, once.collect()))
    assert r_once == sorted(map(tuple, twice.collect()))
    keys = [t[0] for t in r_once]
    assert len(keys) == len(set(keys))


@SETTINGS
@given(texts=st.lists(st.sampled_from(
    ["alpha beta", "alpha  beta", "gamma", "delta epsilon zeta", ""]),
    min_size=1, max_size=15))
def test_exact_dedup_conserves_rows(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id int, text string")
    out = exact_dedup(df, "text", "doc_id")
    assert out.agg(F.sum("n_dups")).collect()[0][0] == len(texts)
    # canonical ids are members, and member lists cover all ids
    members = [i for r in out.collect() for i in r["member_ids"]]
    assert sorted(members) == list(range(len(texts)))


doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=60).map(str.strip)
    .filter(bool),
    min_size=1, max_size=8)


@SETTINGS
@given(texts=doc_texts, chunk=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunking_covers_every_token_and_packing_conserves(spark, texts,
                                                           chunk, overlap):
    """Invariants: (1) each doc's chunks cover all its tokens — the
    concatenation of non-overlap tails reconstructs the token stream;
    (2) packing assigns every chunk exactly once and never overfills
    a pack (budget >= chunk size here)."""
    from bi_etl_and_integration_spark.operators.text import (
        chunk_documents, pack_sequences)
    if overlap >= chunk:
        overlap = chunk - 1
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    chunks = chunk_documents(df, chunk_tokens=chunk,
                             overlap_tokens=overlap)
    rows = sorted(chunks.collect(),
                  key=lambda r: (r["id"], r["chunk_start"]))
    by_doc: dict = {}
    for r in rows:
        prev_end = by_doc.get(r["id"], 0)
        # chunks abut or overlap — no token gap between consecutive ones
        assert r["chunk_start"] <= prev_end + 1
        by_doc[r["id"]] = r["chunk_start"] + r["n_tokens"] - 1
    for i, t in enumerate(texts):
        assert by_doc[i] == len(t.split())   # last chunk reaches the end
    packed = pack_sequences(chunks, "n_tokens", budget=chunk).collect()
    assert len(packed) == len(rows)
    sums: dict = {}
    for r in packed:
        sums[r["pack_id"]] = sums.get(r["pack_id"], 0) + r["n_tokens"]
    assert all(v <= chunk for v in sums.values())


# Excel round-trip: arbitrary text survives write->parse (XML escaping,
# unicode, sparse Nones).  Driver-side only — no Spark jobs per example.
xlsx_cell = st.one_of(
    st.none(),
    st.integers(-10**9, 10**9),
    st.text(min_size=0, max_size=20).filter(
        # xlsx cannot represent control chars or lone surrogates in
        # inline strings without numeric-entity escaping (out of scope)
        lambda s: all(ch >= " " or ch in "\t\n" for ch in s)))


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(st.lists(xlsx_cell, min_size=1, max_size=5),
                     min_size=0, max_size=8))
def test_xlsx_bytes_parse_roundtrip(rows):
    from bi_etl_and_integration_spark.sources.excel import (
        parse_xlsx, xlsx_bytes)
    width = max((len(r) for r in rows), default=1)
    norm = [list(r) + [None] * (width - len(r)) for r in rows]
    cols = [f"c{i}" for i in range(width)]
    data = xlsx_bytes(norm, columns=cols)
    parsed = parse_xlsx(data)
    assert parsed[0] == cols
    for orig, got in zip(norm, parsed[1:]):
        padded = list(got) + [None] * (width - len(got))
        for o, g in zip(orig, padded):
            if o is None:
                assert g is None
            else:
                assert g == str(o)
    assert len(parsed) == len(norm) + 1


@SETTINGS
@given(commits=st.lists(
    st.tuples(st.sampled_from(["overwrite", "append"]),
              st.lists(st.integers(0, 99), min_size=0, max_size=5)),
    min_size=1, max_size=5))
def test_snapshot_table_matches_reference_model(spark, commits, tmp_path_factory):
    """The table's latest content must equal a trivial in-memory model
    of the same overwrite/append sequence, whatever the mix."""
    import uuid as _uuid
    from bi_etl_and_integration_spark.sources.snapshots import (
        SnapshotTable)
    base = tmp_path_factory.mktemp("snapprop")
    t = SnapshotTable(spark, str(base / _uuid.uuid4().hex[:8]))
    model: list[int] = []
    for mode, vals in commits:
        df = (spark.createDataFrame([(v,) for v in vals], "k int")
              if vals else spark.createDataFrame([], "k int"))
        t.write(df, mode)
        model = (model + vals) if mode == "append" else list(vals)
    assert sorted(r["k"] for r in t.read().collect()) == sorted(model)
    assert t.row_count() == len(model)


@SETTINGS
@given(terms=st.lists(st.sampled_from(["alpha", "beta", "gamma"]),
                      min_size=1, max_size=3, unique=True),
       docs=st.lists(st.lists(
           st.sampled_from(["alpha", "beta", "gamma", "delta", "x"]),
           min_size=1, max_size=8), min_size=1, max_size=6))
def test_bm25_scores_positive_and_only_for_matches(spark, terms, docs):
    from bi_etl_and_integration_spark.operators.text import bm25_rank
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id int, text string")
    out = {r["doc_id"]: r["bm25_score"]
           for r in bm25_rank(df, list(terms)).collect()}
    expect = {i for i, toks in enumerate(docs)
              if set(toks) & set(terms)}
    assert set(out) == expect
    assert all(s > 0 for s in out.values())


event_streams = st.lists(
    st.tuples(st.integers(1, 3),                 # user
              st.sampled_from(["a", "b", "c"])),  # event type
    min_size=0, max_size=25)


@SETTINGS
@given(data=event_streams,
       pattern=st.lists(st.sampled_from(["a", "b", "c"]),
                        min_size=1, max_size=3))
def test_sequence_ops_match_reference_automaton(spark, data, pattern):
    """sequence_match == subsequence test; sequence_count == greedy
    non-overlapping restart-after-match count (the ClickHouse
    semantics), both re-derived in pure Python."""
    import datetime as dt
    from bi_etl_and_integration_spark.operators.windows import (
        sequence_count, sequence_match)
    t0 = dt.datetime(2024, 1, 1)
    rows_ = [(u, i, t0 + dt.timedelta(minutes=i), t)
             for i, (u, t) in enumerate(data)]
    df = spark.createDataFrame(
        rows_, "user_id long, event_id long, ts timestamp, "
               "event_type string")
    got_m = {r["user_id"]: r["matched"] for r in sequence_match(
        df, pattern, tiebreak=["event_id"]).collect()}
    got_c = {r["user_id"]: r["n_matches"] for r in sequence_count(
        df, pattern, tiebreak=["event_id"]).collect()}

    per_user: dict[int, list[str]] = {}
    for i, (u, t) in enumerate(data):
        if t in pattern:
            per_user.setdefault(u, []).append(t)
    for u, types in per_user.items():
        pos = cnt = 0
        best = 0
        for t in types:
            if t == pattern[pos]:
                pos += 1
                best = max(best, pos)
                if pos == len(pattern):
                    cnt, pos = cnt + 1, 0
        assert got_m[u] is (best >= len(pattern) or cnt > 0)
        assert got_c[u] == cnt
    assert set(got_m) == set(per_user)


@SETTINGS
@given(edges=st.lists(st.tuples(st.integers(1, 12), st.integers(1, 12)),
                      min_size=0, max_size=15))
def test_dedup_canonicalize_matches_union_find(spark, edges):
    from bi_etl_and_integration_spark.operators.dedup import (
        dedup_canonicalize)
    docs = spark.createDataFrame([(i,) for i in range(1, 13)],
                                 "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long") \
        if edges else spark.createDataFrame([], "id_a long, id_b long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in dedup_canonicalize(docs, pairs).collect()}

    parent = {i: i for i in range(1, 13)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: min(j for j in range(1, 13) if find(j) == find(i))
            for i in range(1, 13)}
    assert got == want


@SETTINGS
@given(texts=st.lists(
    st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                   max_codepoint=0x2FFF),
            max_size=30),
    min_size=0, max_size=10))
def test_normalize_text_matches_unicodedata(spark, texts):
    import re
    import unicodedata
    from bi_etl_and_integration_spark.operators.text import (
        normalize_text)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["text"]
           for r in normalize_text(df, "text", form="NFKC").collect()}
    ctrl = re.compile(
        "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f\\u0080-\\u009f]")
    for i, t in enumerate(texts):
        want = unicodedata.normalize("NFKC", t)
        want = ctrl.sub("", want)
        # Java \s is ASCII-only and Spark trim() strips 0x20 only —
        # mirror those semantics, not Python's Unicode-aware ones
        want = re.sub("[ \t\n\x0b\x0c\r]+", " ", want).strip(" ")
        assert got[i] == want, (t,)


@SETTINGS
@given(vals=st.lists(st.integers(-50, 50), min_size=0, max_size=20),
       width=st.integers(1, 5))
def test_moving_matches_bruteforce_window(spark, vals, width):
    from bi_etl_and_integration_spark.operators.windows import moving
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)],
        "k long, seq long, v long")
    got = {r["seq"]: r["ms"] for r in moving(
        df, ["k"], [F.col("seq").asc()], width,
        ms=F.sum("v")).collect()}
    want = {i: sum(vals[max(0, i - width + 1):i + 1])
            for i in range(len(vals))}
    assert got == want


@SETTINGS
@given(pts=st.lists(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                    min_size=0, max_size=18),
       directions=st.tuples(st.sampled_from(["min", "max"]),
                            st.sampled_from(["min", "max"])))
def test_skyline_matches_bruteforce(spark, pts, directions):
    from bi_etl_and_integration_spark.operators.relational import (
        skyline)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
        "id long, a double, b double")
    got = sorted(r["id"] for r in skyline(
        df, {"a": directions[0], "b": directions[1]}).collect())

    def norm(p):
        return tuple((-v if d == "max" else v)
                     for v, d in zip(p, directions))

    npts = [norm(p) for p in pts]

    def dominated(i):
        pi = npts[i]
        return any(all(x <= y for x, y in zip(pj, pi))
                   and any(x < y for x, y in zip(pj, pi))
                   for j, pj in enumerate(npts) if j != i)

    want = sorted(i for i in range(len(pts)) if not dominated(i))
    assert got == want


@SETTINGS
@given(pts=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                    min_size=0, max_size=15),
       k=st.integers(1, 4))
def test_skyband_matches_bruteforce_dominator_count(spark, pts, k):
    from bi_etl_and_integration_spark.operators.relational import (
        skyline)
    df = spark.createDataFrame(
        [(i, float(a), float(b)) for i, (a, b) in enumerate(pts)],
        "id long, a double, b double")
    got = sorted(r["id"] for r in skyline(
        df, {"a": "min", "b": "min"}, k_band=k).collect())

    def n_dominators(i):
        pi = pts[i]
        return sum(1 for j, pj in enumerate(pts) if j != i
                   and all(x <= y for x, y in zip(pj, pi))
                   and any(x < y for x, y in zip(pj, pi)))

    want = sorted(i for i in range(len(pts)) if n_dominators(i) < k)
    assert got == want


@SETTINGS
@given(data=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 2),
                               st.integers(-50, 50)),
                     min_size=0, max_size=20))
def test_with_totals_equals_detail_plus_grand_total(spark, data):
    from bi_etl_and_integration_spark.operators.aggregate import (
        with_totals)
    if not data:
        return
    df = spark.createDataFrame(data, "k1 int, k2 int, v long")
    out = with_totals(df, ["k1", "k2"], {"s": F.sum("v")}).collect()
    detail = {(r["k1"], r["k2"]): r["s"] for r in out
              if not r["is_total"]}
    totals = [r["s"] for r in out if r["is_total"]]
    want = {}
    for k1, k2, v in data:
        want[(k1, k2)] = want.get((k1, k2), 0) + v
    assert detail == want
    assert totals == [sum(v for _, _, v in data)]


@SETTINGS
@given(data=st.lists(st.tuples(st.integers(0, 2),
                               st.sampled_from(["a", "b", "c"]),
                               st.integers(-20, 20)),
                     min_size=0, max_size=20))
def test_sum_map_matches_dict_fold(spark, data):
    from bi_etl_and_integration_spark.operators.aggregate import (
        sum_map)
    if not data:
        return
    df = spark.createDataFrame(data, "g int, k string, v long")
    got = {r["g"]: r["summed_map"] for r in sum_map(
        df, ["g"], "k", F.sum("v")).collect()}
    want: dict = {}
    for g, k, v in data:
        want.setdefault(g, {})
        want[g][k] = want[g].get(k, 0) + v
    assert got == want


@SETTINGS
@given(data=st.lists(st.tuples(st.integers(1, 3),
                               st.sampled_from(["v", "c", "p", "x"])),
                     min_size=0, max_size=20))
def test_retention_flags_match_set_logic(spark, data):
    from bi_etl_and_integration_spark.operators.aggregate import (
        retention)
    if not data:
        return
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, t0 + dt.timedelta(minutes=i), t)
         for i, (u, t) in enumerate(data)],
        "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: (r["r_v"], r["r_c"], r["r_p"])
           for r in retention(
               df, [("v", F.col("event_type") == "v"),
                    ("c", F.col("event_type") == "c"),
                    ("p", F.col("event_type") == "p")]).collect()}
    seen: dict = {}
    for u, t in data:
        seen.setdefault(u, set()).add(t)
    for u, types in seen.items():
        anchor = "v" in types
        assert got[u] == (anchor, anchor and "c" in types,
                          anchor and "p" in types)
    assert set(got) == set(seen)


@SETTINGS
@given(data=st.lists(st.tuples(st.integers(1, 3),
                               st.sampled_from(["a", "b", "c"])),
                     min_size=0, max_size=15))
def test_transitions_match_pairwise_fold(spark, data):
    from bi_etl_and_integration_spark.operators.windows import (
        transitions)
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, i, t0 + dt.timedelta(minutes=i), t)
         for i, (u, t) in enumerate(data)],
        "user_id long, event_id long, ts timestamp, event_type string")
    got = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in transitions(df, tiebreak=["event_id"]).collect()}
    per_user: dict = {}
    for i, (u, t) in enumerate(data):
        per_user.setdefault(u, []).append(t)
    want: dict = {}
    for types in per_user.values():
        for a, b in zip(types, types[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


@SETTINGS
@given(
    offs=st.lists(st.integers(0, 120), min_size=2, max_size=4),
    tail=st.integers(0, 60),
    seed=st.integers(0, 10_000),
)
def test_substring_dedup_excises_planted_block_everywhere(
        spark, offs, tail, seed):
    """Plant one shared 150-char block at RANDOM offsets inside
    otherwise-unique docs: after dedup at window 50 / stride 25, the
    block's interior (which aligned windows always cover, wherever
    the block sits) must survive ONLY in the owner doc, and docs
    without the block are byte-identical untouched."""
    from bi_etl_and_integration_spark.operators.dedup import (
        substring_dedup)
    import random
    rng = random.Random(seed)
    block = "#" * 150
    alpha = "abcdefghij"
    docs = []
    for i, off in enumerate(offs):
        uniq = "".join(rng.choice(alpha) for _ in range(off + 170 + tail))
        docs.append((i, uniq[:off] + block + uniq[off:]))
    n_clean = len(offs) + 2
    for i in range(len(offs), n_clean):
        docs.append((i, "".join(rng.choice(alpha) for _ in range(150))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup(
        df, "text", "doc_id", window=50, stride=25).collect()}
    interior = "#" * 52   # window + stride slop margin inside the block
    assert interior in out[0]["text"]            # owner keeps
    for i in range(1, len(offs)):
        assert interior not in out[i]["text"], (i, offs)
        assert out[i]["n_removed_chars"] >= 50
    for i in range(len(offs), n_clean):          # clean docs: untouched
        assert out[i]["text"] == dict(docs)[i]
        assert out[i]["n_removed_chars"] == 0


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_exact_jaccard_join_complete_vs_brute_force(spark, data):
    """Prefix-filter completeness as a property: on random corpora over
    a TINY vocabulary (maximally-shared shingles — the regime where a
    rare-first prefix is most tempted to skip a pair) the exact join
    must equal brute-force all-pairs Jaccard, at a randomized
    threshold.  Short docs exercise the whole-text shingle fallback."""
    import itertools

    from bi_etl_and_integration_spark.operators.dedup import (
        exact_jaccard_join, hashed_shingles)
    vocab = ["a", "b", "c", "d"]
    n_docs = data.draw(st.integers(2, 12))
    docs = [(i, " ".join(data.draw(st.sampled_from(vocab))
                         for _ in range(data.draw(st.integers(1, 12)))))
            for i in range(n_docs)]
    t = data.draw(st.sampled_from([0.34, 0.5, 0.75, 1.0]))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard_sim"]
           for r in exact_jaccard_join(df, "text", "doc_id",
                                       n=3, threshold=t).collect()}
    sh = {r["doc_id"]: set(r["sh"]) for r in df.select(
        "doc_id", hashed_shingles(F.col("text"), 3).alias("sh")).collect()}
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        j = len(sh[a] & sh[b]) / max(len(sh[a] | sh[b]), 1)
        if j >= t:
            want[(a, b)] = round(j, 4)
    assert got == want, (t, got.keys() ^ want.keys())
