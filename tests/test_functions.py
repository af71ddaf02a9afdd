"""Scalar function edge cases mined from the reference (SURVEY.md §5.2)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mc_ns_data_pipeline_spark.functions import scalar as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_format_eastern_dst_boundary(spark):
    # 2024 DST starts Mar 10 07:00 UTC: 06:59 UTC is EST (-5), 07:01 is EDT (-4)
    before = _one(spark, S.format_eastern(F.to_timestamp(F.lit("2024-03-10 06:59:00"))))
    after = _one(spark, S.format_eastern(F.to_timestamp(F.lit("2024-03-10 07:01:00"))))
    assert before == "3/10/2024 1:59"
    assert after == "3/10/2024 3:01"  # 2 AM local never happens


def test_format_non_padded(spark):
    v = _one(spark, S.format_eastern(F.to_timestamp(F.lit("2024-11-05 14:05:00"))))
    assert v == "11/5/2024 9:05"  # EST, non-padded day/hour, padded minutes


def test_parse_report_ts_coerce(spark):
    ok = _one(spark, S.parse_report_ts(F.lit("7/1/2024 8:00")))
    bad = _one(spark, S.parse_report_ts(F.lit("garbage")))
    assert ok is not None and bad is None


def test_conditional_concat_guards(spark):
    c = S.conditional_concat(F.lit("5"), F.lit(3))
    assert _one(spark, c) == "5 - 3"
    zero = S.conditional_concat(F.lit("0"), F.lit(3))
    assert _one(spark, zero) == "0"
    sentinel = S.conditional_concat(F.lit("5"), F.lit(S.ITERATION_SENTINEL))
    assert _one(spark, sentinel) == "5"


def test_sentinel_fill(spark):
    assert _one(spark, S.sentinel_fill_int(F.lit(None).cast("int"))) == -99999
    assert _one(spark, S.sentinel_fill_int(F.lit(7))) == 7


def test_md5_null_contract(spark):
    """NULL and '' hash identically (SURVEY.md §7.3 F6 decision)."""
    with_null = _one(spark, S.md5_row_hash(F.lit("a"), F.lit(None).cast("string")))
    with_empty = _one(spark, S.md5_row_hash(F.lit("a"), F.lit("")))
    assert with_null == with_empty == hashlib.md5(b"a|").hexdigest()


def test_strip_suffix(spark):
    assert _one(spark, S.strip_suffix(F.lit("Acme - NE"), " - NE")) == "Acme"
    assert _one(spark, S.strip_suffix(F.lit("Acme"), " - NE")) == "Acme"


def test_window_start_6h_alignment(spark):
    v = _one(spark, S.window_start_6h(F.to_timestamp(F.lit("2024-01-01 07:30:00"))))
    assert str(v) == "2024-01-01 06:00:00"


def test_asof_join_semantics(spark):
    """As-of join: latest right row at-or-before each left ts per key;
    strict mode excludes same-ts matches; keys with no prior right row
    carry NULLs."""
    from datetime import datetime

    from mc_ns_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, "u1", datetime(2024, 1, 1, 10)),
            (2, "u1", datetime(2024, 1, 1, 12)),
            (3, "u2", datetime(2024, 1, 1, 9)),   # before any right row
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", datetime(2024, 1, 1, 10), 100),  # same-ts as event 1
            ("u1", datetime(2024, 1, 1, 11), 101),
            ("u2", datetime(2024, 1, 1, 9, 30), 102),
        ],
        "user_id string, ts timestamp, rid long",
    )
    out = {
        r["event_id"]: r["rid"]
        for r in asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols={"rid": "rid"},
        ).collect()
    }
    assert out == {1: 100, 2: 101, 3: None}

    strict = {
        r["event_id"]: r["rid"]
        for r in asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols={"rid": "rid"}, strict=True,
        ).collect()
    }
    assert strict == {1: None, 2: 101, 3: None}


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change join results, only key distribution."""
    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_name"
    )
    salted = salted_join(li, part, "l_partkey", salt_buckets=4)
    plain = li.join(part, "l_partkey")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # left join equivalence (unmatched big-side rows appear exactly once)
    salted_l = salted_join(li, part, "l_partkey", salt_buckets=4, how="left")
    plain_l = li.join(part, "l_partkey", "left")
    assert salted_l.count() == plain_l.count()
    assert salted_l.exceptAll(plain_l).count() == 0
    # outer joins would duplicate replicated small-side rows: fail fast
    import pytest

    with pytest.raises(ValueError, match="salted_join"):
        salted_join(li, part, "l_partkey", how="full")


def test_decontaminate_semantics(spark):
    """A corpus doc sharing a 4-gram with the benchmark is flagged with
    the right gram counts; an unrelated doc survives with zero hits;
    benchmark docs themselves are excluded from the output."""
    from mc_ns_data_pipeline_spark.operators.dedup import (
        decontaminate_against,
    )

    rows = [
        # doc 0 -> benchmark (id % 17 == 0)
        (0, "alpha beta gamma delta epsilon"),
        # doc 1 copies a 4-gram run from doc 0
        (1, "x alpha beta gamma delta y"),
        # doc 2 shares words but no 4-gram
        (2, "alpha beta zeta gamma delta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = decontaminate_against(df, F.col("doc_id") % 17 == 0, k=4)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {1, 2}
    # doc 1: 3 grams total, 1 contaminated ("alpha beta gamma delta")
    assert got[1]["n_ngrams"] == 3
    assert got[1]["n_contaminated"] == 1
    assert got[1]["is_contaminated"] is True
    assert abs(got[1]["contamination_frac"] - 1 / 3) < 1e-12
    assert got[2]["n_contaminated"] == 0
    assert got[2]["is_contaminated"] is False


def test_predict_lang_priority_and_unknown(spark):
    """zh beats marker counts when CJK is present; en>es>de>fr priority
    breaks score ties; all-zero scores give 'unknown'; and the
    convenience wrapper equals the bound-array form it delegates to."""
    import pyspark.sql.functions as F

    from mc_ns_data_pipeline_spark.functions.text import (
        predict_lang,
        predict_lang_from,
        words,
    )

    rows = [
        (1, "the cat and the dog are friends"),
        (2, "el perro y la casa de los gatos"),
        (3, "der hund und die katze sind hier"),
        (4, "中文 text with the and of markers"),
        (5, "zzz qqq xxx 123"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["p"]
        for r in df.select(
            "id", predict_lang(F.col("text")).alias("p")
        ).collect()
    }
    assert got == {1: "en", 2: "es", 3: "de", 4: "zh",
                   5: "unknown", 6: "unknown"}
    bound = df.select("id", "text", words(F.col("text")).alias("ws"))
    got_bound = {
        r["id"]: r["p"]
        for r in bound.select(
            "id",
            predict_lang_from(F.col("ws"), F.col("text")).alias("p"),
        ).collect()
    }
    assert got_bound == got


def test_ngrams_or_empty_short_doc(spark):
    """Docs shorter than k yield ZERO grams (no whole-text fallback)."""
    from mc_ns_data_pipeline_spark.functions.text import (
        ngrams_or_empty,
        words,
    )

    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two three")], ["i", "text"]
    )
    bound = df.select("i", words(F.col("text")).alias("_ws"))
    out = {
        r["i"]: r["g"]
        for r in bound.select(
            "i", ngrams_or_empty(F.col("_ws"), 3).alias("g")
        ).collect()
    }
    assert out[1] == []
    assert out[2] == ["one two three"]


def test_top_k_tokens_tie_break(spark):
    """Equal counts rank alphabetically; doc frequency counts each doc
    once regardless of in-doc multiplicity."""
    from mc_ns_data_pipeline_spark.operators.frequency import top_k_tokens

    df = spark.createDataFrame(
        [
            (1, "en", "b b a"),
            (2, "en", "a c"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = [r.asDict() for r in top_k_tokens(df, k=2).collect()]
    # a and b both occur twice -> 'a' wins rank 1 alphabetically
    assert [(r["word"], r["rnk"]) for r in out] == [("a", 1), ("b", 2)]
    a = next(r for r in out if r["word"] == "a")
    b = next(r for r in out if r["word"] == "b")
    assert a["n_occ"] == 2 and a["n_docs"] == 2
    assert b["n_occ"] == 2 and b["n_docs"] == 1


def test_chunk_documents_windows(spark):
    """Sliding windows: stride-spaced starts, final partial chunk kept,
    short docs yield exactly one full-length chunk."""
    import pytest

    from mc_ns_data_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [
            (1, "t0 t1 t2 t3 t4 t5 t6"),  # 7 tokens
            (2, "a b"),                    # shorter than chunk_size
        ],
        ["doc_id", "text"],
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): r.asDict()
        for r in chunk_documents(
            df, chunk_size=4, stride=3
        ).collect()
    }
    # doc 1: starts 0,3,6 -> chunks [t0..t3], [t3..t6], [t6]
    assert out[(1, 0)]["chunk_text"] == "t0 t1 t2 t3"
    assert out[(1, 1)]["chunk_text"] == "t3 t4 t5 t6"
    assert out[(1, 2)]["chunk_text"] == "t6"
    assert out[(1, 2)]["n_chunk_tokens"] == 1
    assert out[(1, 0)]["n_tokens"] == 7
    # doc 2: one chunk, both tokens
    assert out[(2, 0)]["chunk_text"] == "a b"
    assert len(out) == 4
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, stride=0)


def test_chunk_documents_coverage_property(spark):
    """Every token index is covered by at least one chunk and chunks
    overlap by exactly chunk_size - stride inside the document."""
    from mc_ns_data_pipeline_spark.operators.chunking import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_size=8, stride=5).collect(),
        key=lambda r: r["chunk_idx"],
    )
    seen = set()
    for r in rows:
        toks = r["chunk_text"].split(" ")
        start = r["chunk_idx"] * 5
        assert toks == [f"w{i}" for i in range(start, min(start + 8, 50))]
        seen.update(range(start, start + len(toks)))
    assert seen == set(range(50))


def test_unigram_lm_vocab_and_oov(spark):
    """Vocab cut is deterministic (cnt desc, token asc); OOV tokens are
    counted but excluded from the surprisal average."""
    import math

    from mc_ns_data_pipeline_spark.operators.lm import (
        score_documents,
        train_unigram_lm,
    )

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "c z")],
        ["doc_id", "text"],
    )
    # corpus counts: a=3, b=2, c=2, z=1; N=8
    lm = train_unigram_lm(df, vocab_size=3)
    vocab = {r["token"]: r for r in lm.collect()}
    # tie at cnt=2 between b and c -> both beat z; vocab = {a, b, c}
    assert set(vocab) == {"a", "b", "c"}
    assert vocab["a"]["surprisal"] == round(-math.log(3 / 8), 6)
    scores = {r["doc_id"]: r for r in score_documents(df, lm).collect()}
    assert scores[2]["n_tokens"] == 2 and scores[2]["n_oov"] == 1
    assert scores[2]["oov_ratio"] == 0.5
    # doc 2 average is over the single in-vocab token 'c'
    assert scores[2]["avg_surprisal"] == round(-math.log(2 / 8), 6)
    assert scores[1]["n_oov"] == 0


def test_parse_json_col_contract(spark):
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from mc_ns_data_pipeline_spark.functions.semistructured import parse_json_col

    schema = StructType(
        [StructField("k", IntegerType()), StructField("tag", StringType())]
    )
    df = spark.createDataFrame(
        [
            ("a", '{"k": 7, "tag": "x"}'),  # full document
            ("b", '{"k": 3}'),  # valid, missing field -> NULL tag
            ("c", "{not json"),  # malformed -> invalid, all fields NULL
            ("d", None),  # NULL input -> invalid
        ],
        ["id", "props"],
    )
    rows = {
        r["id"]: r
        for r in parse_json_col(df, "props", schema).collect()
    }
    assert rows["a"]["props_valid"] and rows["a"]["k"] == 7 and rows["a"]["tag"] == "x"
    assert rows["b"]["props_valid"] and rows["b"]["k"] == 3 and rows["b"]["tag"] is None
    assert not rows["c"]["props_valid"] and rows["c"]["k"] is None
    assert not rows["d"]["props_valid"] and rows["d"]["k"] is None
    assert "props" not in rows["a"].asDict()  # raw dropped by default
    kept = parse_json_col(df, "props", schema, keep_raw=True)
    assert "props" in kept.columns


def test_interval_join_boundaries(spark):
    import datetime as dt

    from mc_ns_data_pipeline_spark.operators.joins import interval_join

    T = dt.datetime
    points = spark.createDataFrame(
        [
            ("at_start", T(2024, 1, 1, 10, 0, 0)),
            ("mid", T(2024, 1, 1, 11, 30, 0)),
            ("at_end", T(2024, 1, 1, 12, 0, 0)),  # end is exclusive
            ("outside", T(2024, 1, 1, 9, 59, 59)),
            ("in_short", T(2024, 1, 1, 14, 10, 0)),  # mid-bucket interval end
            ("past_short", T(2024, 1, 1, 14, 20, 0)),
        ],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            ("w1", T(2024, 1, 1, 10, 0, 0), T(2024, 1, 1, 12, 0, 0)),
            ("w2", T(2024, 1, 1, 14, 0, 0), T(2024, 1, 1, 14, 15, 0)),
        ],
        ["wid", "win_start", "win_end"],
    )
    got = {
        (r["pid"], r["wid"])
        for r in interval_join(
            points, intervals, "ts", "win_start", "win_end"
        ).collect()
    }
    assert got == {("at_start", "w1"), ("mid", "w1"), ("in_short", "w2")}
    # a point meets an interval at most once (no bucket-induced dups)
    rows = interval_join(
        points, intervals, "ts", "win_start", "win_end", bucket_seconds=60
    ).collect()
    assert len(rows) == 3


def test_bloom_no_false_negatives_and_exact_semi_join(spark):
    from mc_ns_data_pipeline_spark.operators.bloom import (
        bloom_semi_join,
        build_bloom,
        might_contain,
    )

    keys = spark.range(0, 500).select(
        (F.col("id") * 7919 + 13).alias("k")  # scattered key space
    )
    bloom = build_bloom(keys, "k", num_bits=4096, num_hashes=5)
    # every inserted key must test positive
    n_neg = (
        keys.filter(~might_contain(F.col("k"), bloom, 5)).count()
    )
    assert n_neg == 0
    big = spark.range(0, 20000).select(F.col("id").alias("k"))
    got = bloom_semi_join(big, keys, "k", "k", num_bits=4096)
    expected = big.join(keys.distinct(), "k", "left_semi")
    assert sorted(r["k"] for r in got.collect()) == sorted(
        r["k"] for r in expected.collect()
    )


def test_line_dedup_drops_boilerplate_keeps_order_and_tail(spark):
    from mc_ns_data_pipeline_spark.operators.dedup import line_dedup

    boiler = "all rights reserved"
    docs = spark.createDataFrame(
        [(i, f"unique{i} words here {boiler} tail{i} bit") for i in range(5)]
        + [(99, "solo document text untouched by any dedup at all ok")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            docs, words_per_line=3, max_line_df=3
        ).collect()
    }
    # the shared 3-word segment sits at word offset 3..5 in every doc,
    # so it hashes identically and its df (5) exceeds the threshold
    for i in range(5):
        assert out[i]["clean_text"] == f"unique{i} words here tail{i} bit"
        assert out[i]["n_dropped"] == 1 and out[i]["n_kept"] == 2
    # the 11-word solo doc: 3 full segments + 2-word tail, all kept
    assert out[99]["n_dropped"] == 0 and out[99]["n_kept"] == 4
    assert out[99]["clean_text"] == (
        "solo document text untouched by any dedup at all ok"
    )


def test_udtf_segments_match_relational_path(spark, sf_dir):
    """The Python UDTF escape hatch must produce exactly what the JVM
    split+posexplode path produces (x50's segmenter contract) — pinned
    so the slow path and the fast path cannot drift apart."""
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.functions.text import norm_text
    from mc_ns_data_pipeline_spark.functions.udtf_fns import register_udtfs
    from mc_ns_data_pipeline_spark.testing import canonicalize

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents")
    # Edge rows the fixture corpus lacks: non-ASCII whitespace (Java \s
    # is ASCII-only; Python str.split() is not), tabs/CRLF runs, and
    # untrimmed space — the cases where a naive Python re-segmenter
    # silently diverges from norm_text.
    edges = spark.createDataFrame(
        [
            (900001, "a\u00a0b c d e f"),
            (900002, "\tlead tab  and\r\ncrlf run "),
            (900003, "MiXeD Case words HERE now ok"),
        ],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(edges)
    both.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql("""
        SELECT d.doc_id, s.seg_idx, s.segment, s.n_chars
        FROM udtf_docs d, LATERAL split_segments(d.text) s
    """)

    ws = F.split(norm_text(F.col("text")), " ")
    bound = both.select("doc_id", ws.alias("_ws"))
    n_segs = F.ceil(F.size("_ws") / F.lit(3.0)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice("_ws", i * 3 + 1, 3)),
    )
    relational = bound.select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "segment")
    ).select(
        "doc_id", "seg_idx", "segment",
        F.length("segment").alias("n_chars"),
    )

    got = canonicalize(
        via_udtf.columns, [tuple(r) for r in via_udtf.collect()]
    )
    exp = canonicalize(
        relational.columns, [tuple(r) for r in relational.collect()]
    )
    assert got == exp


def test_cdc_chunks_partition_and_edit_stability(spark):
    """Chunks tile each document exactly; an edit at the front re-cuts
    only the chunk it lands in (the content-defined property fixed-size
    chunking lacks)."""
    from mc_ns_data_pipeline_spark.operators.chunking import cdc_chunks

    text = " ".join(f"w{i * 7919 % 100003}" for i in range(400))
    edited = "zzz " + text
    df = spark.createDataFrame(
        [(1, text), (2, edited)], ["doc_id", "text"]
    )
    rows = cdc_chunks(df, divisor=17).collect()
    by_doc: dict[int, list] = {1: [], 2: []}
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n_words = 400 if doc_id == 1 else 401
        assert sum(r["chunk_len"] for r in chunks) == n_words
        assert chunks[0]["start"] == 0
        for a, b in zip(chunks, chunks[1:]):
            assert b["start"] == a["start"] + a["chunk_len"]
    h1 = {r["chunk_hash"] for r in by_doc[1]}
    h2 = {r["chunk_hash"] for r in by_doc[2]}
    assert len(h1) > 5, "expect multiple chunks at divisor=17"
    # all but the first boundary's chunk(s) survive the front edit
    shared = len(h1 & h2)
    assert shared >= len(h1) - 2, (shared, len(h1))


def test_percentiles_by_counts_matches_builtin(spark, sf_dir):
    """The order-statistics percentile (no per-group value buffer) must
    agree with F.percentile's percentile_cont semantics to float
    precision, including interpolated (frac != 0) and tied-value
    cases (l_quantity has few distinct values, so bracketing ranks
    routinely fall inside tied runs)."""
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.catalog import load_table
    from mc_ns_data_pipeline_spark.operators.percentiles import (
        percentiles_by_counts,
    )

    li = load_table(spark, sf_dir, "lineitem")
    targets = {"p01": 0.01, "p50": 0.5, "p99": 0.99}
    for col in ("l_extendedprice", "l_quantity"):
        got = {
            r["l_returnflag"]: r.asDict()
            for r in percentiles_by_counts(
                li, "l_returnflag", col, targets
            ).collect()
        }
        want = {
            r["l_returnflag"]: r.asDict()
            for r in li.groupBy("l_returnflag")
            .agg(*[
                F.percentile(col, p).alias(name)
                for name, p in targets.items()
            ])
            .collect()
        }
        assert got.keys() == want.keys()
        for flag in want:
            for name in targets:
                assert abs(got[flag][name] - want[flag][name]) <= (
                    1e-9 * max(1.0, abs(want[flag][name]))
                ), (col, flag, name, got[flag][name], want[flag][name])


def test_percentiles_by_counts_ignores_nulls(spark):
    """NULL values must not enter _n or shift ranks (percentile_cont
    contract — ADVICE r3). A mixed group matches F.percentile over the
    same data; an all-NULL group is absent from the output (documented
    contract)."""
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.operators.percentiles import (
        percentiles_by_counts,
    )

    rows = [("a", v) for v in [1.0, None, 2.0, None, 3.0, 4.0]] + [
        ("b", None),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r.asDict()
        for r in percentiles_by_counts(
            df, "g", "v", {"p50": 0.5, "p75": 0.75}
        ).collect()
    }
    want = df.filter(F.col("v").isNotNull()).groupBy("g").agg(
        F.percentile("v", 0.5).alias("p50"),
        F.percentile("v", 0.75).alias("p75"),
    ).collect()[0].asDict()
    assert set(got) == {"a"}, "all-NULL group must be absent"
    assert got["a"]["p50"] == want["p50"] == 2.5
    assert got["a"]["p75"] == want["p75"] == 3.25


def test_linkage_hot_slot_cap_observable_and_auto_scaled(spark):
    """ADVICE r3: the segment-df cap must be observable (which slots
    were dropped, at what df, under what cap) and must scale with
    corpus size instead of silently activating at larger data. At a
    small corpus the auto cap bottoms out at the floor and drops
    nothing; a deliberately tiny fixed cap drops exactly the templated
    opening, and hot_segment_slots reports it."""
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.operators.linkage import (
        MAX_SEGMENT_DF_FLOOR,
        blocked_near_pairs,
        hot_segment_slots,
    )

    template = "INVOICE 2024 STANDARD FORM SECTION A FIELD 00 ROW"
    rows = []
    for i in range(40):  # templated family: identical 48-char opening
        rows.append((i, "en", template + f" body {i}"))
    rows.append((100, "en", "a unique document opening nobody shares x1"))
    rows.append((101, "en", "a unique document opening nobody shares x2"))
    docs = spark.createDataFrame(
        rows, "doc_id int, lang string, text string"
    ).withColumn("n_chars", F.length("text"))

    # auto cap at 42 docs == the floor -> inactive, equals uncapped
    hot_auto = hot_segment_slots(docs, max_segment_df="auto")
    assert hot_auto.count() == 0
    uncapped = blocked_near_pairs(docs, max_segment_df=None)
    auto = blocked_near_pairs(docs, max_segment_df="auto")
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, uncapped.collect())
    )
    assert uncapped.count() > 0  # templated family pairs + unique pair

    # tiny fixed cap: the templated slots (df=40) are hot and reported
    hot = hot_segment_slots(docs, max_segment_df=10)
    hot_rows = hot.collect()
    assert hot_rows and all(r["df"] == 40 and r["cap"] == 10
                            for r in hot_rows)
    capped = blocked_near_pairs(docs, max_segment_df=10)
    # capping only removes pairs, never invents them
    assert set(map(tuple, capped.collect())) <= set(
        map(tuple, uncapped.collect())
    )
    assert MAX_SEGMENT_DF_FLOOR == 300


def test_ngram_cap_filtered_universe_semantics(spark):
    """r4 recall fix: with a df cap, Jaccard is computed EXACTLY on the
    filtered shingle universe (sizes recounted over survivors). The
    pre-fix behavior kept full-set sizes, so on a templated corpus
    where boilerplate shingles exceed the cap, every true pair's
    estimate collapsed below threshold (measured recall 0.0 at 10x).
    Here: 30 docs share a boilerplate opening (df > cap); two docs
    additionally share a distinctive tail. Under the cap, only the
    tail shingles survive, and the true pair MUST still be found."""
    from pyspark.sql import functions as F

    from mc_ns_data_pipeline_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    template = ("terms and conditions apply to every order placed "
                "through this portal subject to review")
    tail = "quantum flux capacitor alignment procedure revision seven"
    rows = [(1, f"{template} {tail} alpha"),
            (2, f"{template} {tail} beta")]
    rows += [
        (10 + i, f"{template} unique{i}a unique{i}b unique{i}c "
                 f"unique{i}d unique{i}e unique{i}f")
        for i in range(28)
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")

    capped = ngram_jaccard_pairs(docs, max_shingle_df=10, threshold=0.4)
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert (1, 2) in pairs, (
        "true near-pair lost under the cap: filtered-universe sizes "
        "not applied"
    )
    # boilerplate-only overlaps must NOT pair up under the cap
    assert all(a == 1 and b == 2 for a, b in pairs), pairs
    # the uncapped path is untouched: exact Jaccard over full sets
    uncapped = ngram_jaccard_pairs(docs, max_shingle_df=None)
    full = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in uncapped.collect()}
    assert full[(1, 2)] > 0.4
