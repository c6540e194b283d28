"""Invariant tests for the training-prep operators (operators/trainprep.py):
chunk coverage/overlap arithmetic, packing conservation, repetition bounds on
a planted degenerate doc, PII plant/redact agreement, and contamination
ground truth recomputed in Python at smoke scale."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_chunks_cover_and_overlap(spark):
    from weather_database_system_spark.operators.trainprep import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunk_windows,
    )
    from weather_database_system_spark.sources.star import load_table
    from pyspark.sql import functions as F

    n_tokens = {
        r.doc_id: r.n
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in doc_chunk_windows(spark, SF_SMOKE).collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, chunks in by_doc.items():
        n = n_tokens[doc_id]
        chunks.sort(key=lambda r: r.chunk_no)
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        # every token is covered: last chunk's window reaches the end
        last_start = (len(chunks) - 1) * CHUNK_STRIDE + 1
        assert last_start + CHUNK_TOKENS - 1 >= n
        # no spurious trailing chunk: the last one holds >0 fresh tokens
        assert chunks[-1].n_chunk_tokens == n - last_start + 1 or len(chunks) == 1
        for c in chunks[:-1]:
            assert c.n_chunk_tokens == CHUNK_TOKENS


def test_packing_conserves_tokens_and_orders_bins(spark):
    from weather_database_system_spark.operators.trainprep import (
        PACK_BUDGET,
        sequence_pack_bins,
    )
    from weather_database_system_spark.sources.star import load_table
    from pyspark.sql import functions as F

    totals = {
        r.lang: r.total
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("total"))
        .collect()
    }
    by_lang: dict[str, list] = {}
    for r in sequence_pack_bins(spark, SF_SMOKE).collect():
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == set(totals)
    for lang, bins in by_lang.items():
        bins.sort(key=lambda r: r.bin_id)
        # bins are contiguous from 0 and conserve every token exactly
        assert [b.bin_id for b in bins] == list(range(len(bins)))
        assert sum(b.n_tokens for b in bins) == totals[lang]
        # every bin a doc STARTED in was below budget at its start: a bin
        # can only overflow by its last doc's tail, so any bin except the
        # last must have begun under budget
        for b in bins[:-1]:
            assert b.n_tokens > 0


def test_repetition_flags_planted_degenerate_doc(spark, tmp_path):
    from weather_database_system_spark.operators.trainprep import (
        repetition_ngram_stats,
    )

    rows = [
        (1, "en", "src", 20, "spam " * 19 + "spam"),  # one token repeated 20x
        (2, "en", "src", 20, " ".join(f"w{i}" for i in range(20))),  # all unique
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars int, text string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in repetition_ngram_stats(spark, str(tmp_path)).collect()}
    assert got[1].top_2gram_frac == 1.0 and got[1].dup_3gram_frac == 1.0
    assert got[2].top_2gram_frac < 0.1 and got[2].dup_3gram_frac == 0.0


def test_pii_redaction_counts_and_digest_stability(spark):
    from weather_database_system_spark.operators.trainprep import pii_redaction

    rows = pii_redaction(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.doc_id % 3 == 0:
            # the planted contact line carries one of each PII kind
            assert r.n_emails >= 1 and r.n_phones >= 1 and r.n_ips >= 1
        else:
            assert (r.n_emails, r.n_phones, r.n_ips) == (0, 0, 0)
        assert len(r.redacted_digest) == 32


def test_contamination_matches_python_ground_truth(spark):
    from weather_database_system_spark.operators.trainprep import (
        CONTAM_NGRAM,
        EVAL_SET_MAX_DOC,
        contamination_eval_overlap,
    )
    from weather_database_system_spark.sources.star import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }

    def grams(toks):
        return {
            " ".join(toks[i : i + CONTAM_NGRAM])
            for i in range(len(toks) - CONTAM_NGRAM + 1)
        }

    eval_grams: dict[int, set] = {
        d: grams(t) for d, t in docs.items() if d < EVAL_SET_MAX_DOC
    }
    expected = {}
    for d, t in docs.items():
        if d < EVAL_SET_MAX_DOC:
            continue
        shared = set()
        hit_docs = set()
        for ed, eg in eval_grams.items():
            inter = grams(t) & eg
            if inter:
                shared |= inter
                hit_docs.add(ed)
        if shared:
            expected[d] = (len(shared), len(hit_docs), min(hit_docs))
    got = {
        r.doc_id: (r.n_shared_ngrams, r.n_eval_docs_hit, r.first_eval_doc)
        for r in contamination_eval_overlap(spark, SF_SMOKE).collect()
    }
    assert got == expected and got, "contamination result != python ground truth"


def test_chunking_plan_is_map_only(spark):
    """Chunk expansion must be generator work over the scan — the only
    exchange is the presentation sort; a shuffle before the explode would
    move the full corpus to produce per-row output."""
    from weather_database_system_spark.operators.trainprep import doc_chunk_windows
    from weather_database_system_spark.plans import shuffle_count

    assert shuffle_count(doc_chunk_windows(spark, SF_SMOKE)) <= 1


def test_contamination_plan_broadcasts_eval_side(spark):
    """The bounded eval-gram side must broadcast: a shuffled join here would
    move every training document's n-grams for a benchmark-sized probe."""
    from weather_database_system_spark.operators.trainprep import (
        contamination_eval_overlap,
    )
    from weather_database_system_spark.plans import broadcast_join_count, formatted_plan

    df = contamination_eval_overlap(spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in formatted_plan(df)


def test_repetition_plan_has_partial_aggregation(spark):
    """Both gram-order aggregations must map-side combine (partial_count
    before the doc_id exchange) — at 100 TB the (doc, gram) stream is the
    corpus × ~n_tokens and must shrink before shuffling."""
    from weather_database_system_spark.operators.trainprep import (
        repetition_ngram_stats,
    )
    from weather_database_system_spark.plans import formatted_plan

    plan = formatted_plan(repetition_ngram_stats(spark, SF_SMOKE))
    assert plan.count("partial_count") >= 2


def test_duplicate_span_extraction_finds_planted_span_boundaries(spark, tmp_path):
    """Two docs sharing one exact 12-token run inside otherwise-unique text
    must each yield EXACTLY one duplicated span with the correct maximal
    token boundaries (start at the run's first token, end at its last+1);
    a doc with no shared run yields nothing."""
    from weather_database_system_spark.operators.trainprep import (
        SPAN_L,
        duplicate_span_extraction,
    )

    run = " ".join(f"dup{i}" for i in range(12))
    docs = [
        (0, f"alpha beta gamma {run} delta epsilon"),          # run at tok 3..15
        (1, f"one two {run} three four five six"),             # run at tok 2..14
        (2, "totally unique text with no repeated region at all"),
    ]
    import pandas as pd  # noqa: F401

    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = duplicate_span_extraction(spark, str(tmp_path)).collect()
    got = {(r.doc_id, r.start_tok, r.end_tok) for r in rows}
    # the duplicated L-grams cover run positions only; maximal span =
    # [first run token, last run token + 1)
    assert got == {(0, 3, 15), (1, 2, 14)}, got
    assert all(r.span_len == 12 for r in rows)
    assert SPAN_L <= 12


def test_duplicate_span_extraction_matches_python_replay(spark, tmp_path):
    """Brute-force grounding on a randomized-ish corpus: spans must equal a
    pure-Python replay (explicit gram sets, position marking, interval
    merge) — pinning the gaps-and-islands merge against first principles."""
    import random

    from weather_database_system_spark.operators.trainprep import (
        SPAN_L,
        duplicate_span_extraction,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for d in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(4, 40))]
        texts.append(toks)
    # plant a few shared runs
    shared = [rng.choice(vocab) for _ in range(SPAN_L + 3)]
    texts[3][2:2] = shared
    texts[11][0:0] = shared
    texts[17][5:5] = shared[: SPAN_L + 1]
    spark.createDataFrame(
        [(i, " ".join(t), "en", "s", 0) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        (r.doc_id, r.start_tok, r.end_tok)
        for r in duplicate_span_extraction(spark, str(tmp_path)).collect()
    }

    from collections import Counter

    counts: Counter = Counter()
    for toks in texts:
        for p in range(len(toks) - SPAN_L + 1):
            counts[tuple(toks[p : p + SPAN_L])] += 1
    want = set()
    for d, toks in enumerate(texts):
        ps = [
            p
            for p in range(len(toks) - SPAN_L + 1)
            if counts[tuple(toks[p : p + SPAN_L])] >= 2
        ]
        spans, cur = [], None
        for p in ps:
            if cur is not None and p <= cur[1]:
                cur = (cur[0], max(cur[1], p + SPAN_L))
            else:
                if cur:
                    spans.append(cur)
                cur = (p, p + SPAN_L)
        if cur:
            spans.append(cur)
        want |= {(d, a, b) for a, b in spans}
    assert got == want


def test_weighted_reservoir_fixed_size_and_boundary_gap(spark):
    """A-ES reservoir invariants: the sample is EXACTLY RESERVOIR_K rows,
    weights sit in [QUALITY_P_FLOOR, 1], membership is deterministic across
    runs, and the top-K boundary gap (key_K − key_{K+1}) is ≥ 1e-4 — the
    measured floor is ~1e-3 at sf0.001..0.1, ~12 orders above any libm ulp
    divergence in ln, which is what makes the selected SET engine-exact
    (the ann_bruteforce_pandas precedent)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.relational import _fr
    from weather_database_system_spark.operators.textan import _quality_score
    from weather_database_system_spark.operators.trainprep import (
        QUALITY_P_FLOOR,
        RESERVOIR_K,
        _HI_DIV,
        _ID_MOD,
        _KNUTH,
        _U_BUCKETS,
        weighted_reservoir_sample,
    )
    from weather_database_system_spark.operators.dedup import _tokens
    from weather_database_system_spark.sources.star import load_table

    a = weighted_reservoir_sample(spark, SF_SMOKE).collect()
    b = weighted_reservoir_sample(spark, SF_SMOKE).collect()
    assert len(a) == RESERVOIR_K
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # deterministic
    assert all(QUALITY_P_FLOOR <= r.weight <= 1.0 for r in a)

    docs = load_table(spark, SF_SMOKE, "documents")
    toks = _tokens(F.col("text"))
    w = _fr(
        F.least(F.lit(1.0), F.greatest(F.lit(QUALITY_P_FLOOR), _quality_score(toks))),
        4,
    )
    u_int = F.expr(
        f"pmod((pmod(doc_id, {_ID_MOD}) * {_KNUTH}) div {_HI_DIV}, {_U_BUCKETS})"
    )
    u = (u_int + F.lit(0.5)) / F.lit(float(_U_BUCKETS))
    keys = [
        r.k
        for r in docs.select((F.log(u) / w).alias("k"))
        .orderBy(F.col("k").desc())
        .limit(RESERVOIR_K + 1)
        .collect()
    ]
    gap = keys[RESERVOIR_K - 1] - keys[RESERVOIR_K]
    assert gap >= 1e-4, f"top-K boundary gap {gap} too small for set determinism"

    # the EMITTED sample_key floor-rounds k at 6 dp: a selected key whose
    # k·1e6+0.5 sits within ~1 ulp of an integer would round differently
    # across libm ln implementations and hash-mismatch even though the
    # selected SET is stable — pin every selected key's distance from the
    # rounding grid at ≥1e-7 (ulp at this magnitude is ~4e-9, so 25×)
    import math

    for k in keys[:RESERVOIR_K]:
        x = k * 1e6 + 0.5
        dist = min(x - math.floor(x), math.ceil(x) - x)
        assert dist >= 1e-7, f"key {k} within {dist} of the 6-dp floor boundary"


def test_weighted_reservoir_plan_is_take_ordered(spark):
    """The reservoir must plan as one map-only scan into TakeOrdered —
    per-partition top-K heaps, NO full shuffle and no global sort (the
    whole point of the distributed-reservoir shape at 100 TB)."""
    from weather_database_system_spark.operators.trainprep import (
        weighted_reservoir_sample,
    )
    from weather_database_system_spark.plans import formatted_plan, shuffle_count

    df = weighted_reservoir_sample(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(df) == 0, "reservoir selection must not shuffle the corpus"


def test_dsir_weights_separate_target_from_offtarget(spark, tmp_path):
    """DSIR semantic grounding (the property the oracle hash cannot
    check): on a corpus with two cleanly separated vocabularies, every
    target-language doc must score a POSITIVE log importance weight and
    every off-target doc a NEGATIVE one — its features live in buckets
    the target distribution barely touches. Also pins the aggregate
    direction on the real smoke corpus (mean target weight strictly
    above mean off-target weight — the inequality importance resampling
    exists to create)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.trainprep import (
        dsir_importance_weights,
    )

    # synthetic: disjoint vocabularies, several docs per side
    rows = []
    for i in range(8):
        rows.append((i, "en", " ".join(f"alpha{j % 5}" for j in range(i + 3)), "s0", 1))
    for i in range(8, 16):
        rows.append((i, "zh", " ".join(f"omega{j % 5}" for j in range(i - 4)), "s1", 1))
    sf_syn = str(tmp_path / "sf_syn")
    import os

    os.makedirs(sf_syn)
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    ).write.parquet(f"{sf_syn}/documents.parquet")

    got = {r.doc_id: r for r in dsir_importance_weights(spark, sf_syn).collect()}
    assert len(got) == 16
    for i in range(8):
        assert got[i].log_weight > 0 and got[i].keep, got[i]
    for i in range(8, 16):
        assert got[i].log_weight < 0 and not got[i].keep, got[i]

    # real smoke corpus: aggregate separation
    real = dsir_importance_weights(spark, SF_SMOKE).join(
        __import__(
            "weather_database_system_spark.sources.star", fromlist=["load_table"]
        ).load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang"),
        "doc_id",
    )
    means = {
        r["is_t"]: r["m"]
        for r in real.groupBy((F.col("lang") == "en").alias("is_t"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False]


def test_temperature_mix_flattens_toward_uniform(spark):
    """The defining property of temperature sampling with α < 1: the
    tempered distribution sits strictly BETWEEN the natural mixture and
    uniform — every below-average source is upsampled (factor > 1),
    every above-average source damped (factor < 1), shares still sum to
    1, and the ordering of sources by share is preserved (flattening
    never reorders)."""
    from weather_database_system_spark.operators.trainprep import (
        source_temperature_mix,
    )

    rows = source_temperature_mix(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    uniform = 1.0 / len(rows)
    assert abs(sum(r.tempered_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        if r.natural_share < uniform - 1e-6:
            assert r.upsample_factor > 1.0, r
        elif r.natural_share > uniform + 1e-6:
            assert r.upsample_factor < 1.0, r
    by_nat = sorted(rows, key=lambda r: (r.natural_share, r.source))
    by_temp = sorted(rows, key=lambda r: (r.tempered_share, r.source))
    assert [r.source for r in by_nat] == [r.source for r in by_temp]


def test_vocab_growth_curve_exact_on_constructed_corpus(spark, tmp_path):
    """Grounding on a corpus with a KNOWN growth curve: 100 docs, doc i
    holds tokens {t0 .. t_{i//10}} — one brand-new type appears every 10
    docs, everything else is re-treading. With 50 buckets of 2 docs
    each, the curve must show cum_vocab == 1 + bucket//5 at every bucket
    (a new type lands exactly every 5th bucket) and new_types == 0
    everywhere else; cumulative tokens must equal the exact running
    token count. All-integer output — any drift is a real bug, not
    float noise."""
    import os

    from weather_database_system_spark.operators.trainprep import (
        VOCAB_CURVE_BUCKETS,
        vocab_growth_curve,
    )

    assert VOCAB_CURVE_BUCKETS == 50  # the arithmetic below assumes it
    rows = []
    for i in range(100):
        toks = [f"t{j}" for j in range(i // 10 + 1)]
        rows.append((i, "en", " ".join(toks), "s0", 1))
    sf_syn = str(tmp_path / "sf_syn")
    os.makedirs(sf_syn)
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    ).write.parquet(f"{sf_syn}/documents.parquet")

    got = {r.bucket: r for r in vocab_growth_curve(spark, sf_syn).collect()}
    assert len(got) == 50  # 2 docs per bucket, every bucket occupied
    run_tokens = 0
    for b in range(50):
        run_tokens += sum(i // 10 + 1 for i in (2 * b, 2 * b + 1))
        r = got[b]
        assert r.cum_tokens == run_tokens, (b, r)
        assert r.cum_vocab == 1 + b // 5, (b, r)
        assert r.new_types == (1 if b % 5 == 0 else 0), (b, r)


def test_tokenizer_fertility_grounds_against_python_replay(spark):
    """Per-language fertility must equal a pure-Python replay of the
    greedy closed-vocab segmenter: top-FERT_VOCAB words (count desc,
    term asc) are single pieces, OOV words split into ceil(len/P)
    character pieces. Also pins the metric's defining properties:
    fertility >= 1 and oov_rate in [0, 1] per language."""
    import math
    from collections import Counter

    from tests.conftest import SF_SMOKE
    from weather_database_system_spark.operators.trainprep import (
        FERT_PIECE_LEN,
        FERT_VOCAB,
        tokenizer_fertility,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = (
        load_table(spark, SF_SMOKE, "documents")
        .select("lang", "text")
        .collect()
    )
    counts = Counter()
    for r in rows:
        counts.update(r.text.split(" "))
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :FERT_VOCAB
        ]
    }
    exp = {}
    for r in rows:
        st = exp.setdefault(r.lang, [0, 0, 0])  # words, subwords, oov
        for t in r.text.split(" "):
            st[0] += 1
            if t in vocab:
                st[1] += 1
            else:
                st[1] += math.ceil(len(t) / FERT_PIECE_LEN)
                st[2] += 1

    got = {r.lang: r for r in tokenizer_fertility(spark, SF_SMOKE).collect()}
    assert set(got) == set(exp)
    for lang, (w, s, o) in exp.items():
        g = got[lang]
        assert (g.n_words, g.n_subwords) == (w, s), lang
        assert abs(g.fertility - s / w) < 2e-6, lang
        assert abs(g.oov_rate - o / w) < 2e-6, lang
        assert g.fertility >= 1.0 and 0.0 <= g.oov_rate <= 1.0, lang
