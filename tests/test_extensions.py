"""Semantic tests for the dedup / similarity / text / multimodal extensions —
beyond oracle parity: do the algorithms find what they should?"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_SMOKE


def test_minhash_lsh_finds_planted_near_dups(spark):
    """The synthetic corpus plants near-duplicate docs (token-level edits).
    Exact Jaccard >= 0.5 pairs must all surface as LSH candidates with a high
    estimated Jaccard — LSH recall on real near-dups, not noise."""
    from weather_database_system_spark.operators.dedup import (
        dedup_minhash_lsh,
        ngram_jaccard_pairs,
    )

    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    assert len(exact) >= 10, "expected planted near-dups in the corpus"

    lsh = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()
    }
    # recall: every exact pair with jaccard >= 0.9 must be an LSH candidate
    strong = {p for p, j in exact.items() if j >= 0.9}
    missed = strong - set(lsh)
    assert not missed, f"LSH missed strong near-dups: {missed}"
    # and their estimated jaccard should be high
    for p in strong:
        assert lsh[p] >= 0.5, f"pair {p}: est_jaccard {lsh[p]} too low"


def test_fast_minhash_matches_md5_twin_on_strong_dups(spark):
    """The xxhash64 signature variant must find every strong planted
    near-dup the oracle-checkable md5 twin finds — hash-function choice may
    move borderline candidates, never the real dups the operator exists
    for. est_jaccard estimates the same quantity (tolerance: 2/K hashes)."""
    from weather_database_system_spark.operators.dedup import (
        N_HASHES,
        dedup_minhash_lsh,
        dedup_minhash_lsh_fast,
        ngram_jaccard_pairs,
    )

    strong = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.9
    }
    assert strong
    md5 = {(r.doc_a, r.doc_b): r.est_jaccard for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    fast = {(r.doc_a, r.doc_b): r.est_jaccard for r in dedup_minhash_lsh_fast(spark, SF_SMOKE).collect()}
    missed = strong - set(fast)
    assert not missed, f"fast variant missed strong near-dups: {missed}"
    for p in strong & set(md5):
        assert abs(fast[p] - md5[p]) <= 2.0 / N_HASHES, (p, fast[p], md5[p])


def test_fast_clusters_agree_with_exact_twin(spark):
    """dedup_clusters_fast (xxhash64 candidate graph) must reproduce the
    exact twin's clustering on nearly every document: identical banding
    geometry over the same shingle sets means only borderline band
    collisions can differ between hash families. Pin ≥98 % per-doc
    cluster-label agreement (493/500 observed at smoke sf) plus exact
    agreement on every multi-doc cluster's canonical row being a member
    min."""
    from weather_database_system_spark.operators.dedup import (
        dedup_clusters,
        dedup_clusters_fast,
        ngram_jaccard_pairs,
    )

    exact = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, SF_SMOKE).collect()}
    fast_rows = dedup_clusters_fast(spark, SF_SMOKE).collect()
    fast = {r.doc_id: r.cluster_id for r in fast_rows}
    assert set(exact) == set(fast)  # every doc classified by both
    # hash choice may move borderline band collisions (~1-2 % of docs at
    # smoke sf), never the strong duplicates the operator exists for
    agree = sum(1 for d in exact if exact[d] == fast[d])
    assert agree / len(exact) >= 0.98, f"{agree}/{len(exact)} labels agree"
    strong = [
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.9
    ]
    assert strong
    for da, db in strong:
        assert fast[da] == fast[db], f"strong dup pair ({da},{db}) split across clusters"
    # survivorship invariant holds independently of hash family — the
    # biconditional: canonical IFF the row is its own cluster min
    for r in fast_rows:
        assert r.cluster_id <= r.doc_id
        assert (r.cluster_id == r.doc_id) == (r.is_canonical == 1)
    members: dict[int, list[int]] = {}
    for r in fast_rows:
        members.setdefault(r.cluster_id, []).append(r.doc_id)
    for cid, docs in members.items():
        assert min(docs) == cid  # every cluster_id is its member min


def test_fast_twin_registry_surfaces_are_checked_wrappers():
    """The xxhash64 fast twins are oracle-checkable ONLY through their
    pinned-claim *_checked wrappers (r8 verdict #3): the registry must
    expose the wrapper + an ORACLE entry for both names, so a refactor
    can't silently demote them back to rows-only. The raw plans stay
    importable for bench.py. The wrappers' semantics (claims hold, rows
    replay) are exercised by test_oracle_parity's parametrized gate."""
    from weather_database_system_spark.operators import dedup

    assert dedup.QUERIES["dedup_minhash_lsh_fast"] is dedup.dedup_minhash_lsh_fast_checked
    assert dedup.QUERIES["dedup_clusters_fast"] is dedup.dedup_clusters_fast_checked
    assert "dedup_minhash_lsh_fast" in dedup.ORACLE
    assert "dedup_clusters_fast" in dedup.ORACLE
    # the claims pinned by the oracles must be the ones the wrappers emit
    assert "fast_recall_ok" in dedup.ORACLE["dedup_minhash_lsh_fast"]
    assert "fast_est_dev_ok" in dedup.ORACLE["dedup_minhash_lsh_fast"]
    assert "fast_label_agree_ok" in dedup.ORACLE["dedup_clusters_fast"]
    # same contract for the r11 PCA / PQ conversions — with these, the
    # registry has ZERO rows-only entries; a regression here reopens one
    from weather_database_system_spark.operators import featurize, similarity

    assert (
        featurize.QUERIES["embedding_pca_project"]
        is featurize.embedding_pca_project_checked
    )
    assert "pcs_orthonormal_ok" in featurize.ORACLE["embedding_pca_project"]
    assert (
        similarity.QUERIES["ann_product_quantization"]
        is similarity.ann_product_quantization_checked
    )
    assert "adc_err_ok" in similarity.ORACLE["ann_product_quantization"]


def test_simhash_places_near_dups_at_small_hamming_distance(spark):
    """Near-identical docs (exact jaccard >= 0.95) must land within a small
    hamming distance of each other — the property SimHash bucketing (with
    1-bit probes) relies on. Random doc pairs sit around d=8 on 16 bits."""
    from weather_database_system_spark.operators.dedup import (
        dedup_simhash,
        ngram_jaccard_pairs,
    )

    sim = {r.doc_id: r.simhash for r in dedup_simhash(spark, SF_SMOKE).collect()}
    strong = [
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
        if r.jaccard >= 0.95
    ]
    assert strong
    dists = [sum(x != y for x, y in zip(sim[a], sim[b])) for a, b in strong]
    assert all(d <= 4 for d in dists), f"outlier hamming distances: {dists}"
    close = sum(1 for d in dists if d <= 1)
    assert close >= len(dists) * 0.8, f"only {close}/{len(dists)} within d<=1"


def test_pandas_ann_matches_exact_ann(spark):
    """The numpy-matmul scorer must agree with the decimal-exact SQL path on
    neighbor membership (float noise may swap adjacent ranks only)."""
    from weather_database_system_spark.operators.similarity import (
        ann_brute_force,
        ann_bruteforce_pandas,
    )

    def by_query(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
        return {q: [n for _, n in sorted(v)] for q, v in out.items()}

    exact = by_query(ann_brute_force(spark, SF_SMOKE))
    fast = by_query(ann_bruteforce_pandas(spark, SF_SMOKE))
    assert exact.keys() == fast.keys()
    for q in exact:
        overlap = len(set(exact[q]) & set(fast[q]))
        assert overlap >= 4, f"query {q}: top-5 overlap only {overlap}"
        assert exact[q][0] == fast[q][0], f"query {q}: rank-1 neighbor differs"

    # The shared DuckDB oracle (r8) relies on cross-engine rank ordering
    # being deterministic: pin a consecutive-rank score gap far above
    # float-association noise (ties would let the numpy and decimal paths
    # legally order differently and break the hash check). The boundary
    # that actually decides SET membership is rank-k vs the first
    # EXCLUDED candidate, which the emitted top-k can't show — recompute
    # the full score column in numpy and pin every gap through k+1.
    import numpy as np

    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from weather_database_system_spark.sources.star import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    qm, cm = mat[ids < N_QUERIES], mat[ids >= N_QUERIES]
    sims = qm @ cm.T
    for qi in range(sims.shape[0]):
        top = np.sort(sims[qi])[::-1][: TOP_K + 1]
        gaps = top[:-1] - top[1:]
        assert gaps.min() > 2e-6, f"query row {qi}: near-tie gap {gaps.min()}"
        # The shared oracle emits floor(cos*1e6 + 0.5)/1e6; the numpy and
        # decimal paths may disagree by ~1e-14, so a cosine landing ON a
        # rounding boundary could round differently across engines. Pin
        # every EMITTED top-k value ≥1e-11 (1e-5 in scaled units) away
        # from the nearest boundary — 1000× the float-association gap.
        y = top[:TOP_K] * 1e6 + 0.5
        frac = y % 1.0
        bdist = np.minimum(frac, 1.0 - frac)
        assert bdist.min() > 1e-5, (
            f"query row {qi}: top-k cosine within {bdist.min():.2e} of a "
            "6-dp floor-rounding boundary (scaled units)"
        )


def test_multimodal_features_deterministic_and_correct(spark):
    """The decode stub is deterministic and derived from the payload bytes."""
    from weather_database_system_spark.operators.multimodal import (
        _fake_decode,
        multimodal_features,
    )
    from weather_database_system_spark.sources.star import load_table

    feats = {r.doc_id: r for r in multimodal_features(spark, SF_SMOKE).collect()}
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").limit(20).collect()
    }
    for doc_id, text in texts.items():
        expected = _fake_decode(text.encode("utf-8"))
        row = feats[doc_id]
        assert row.n_bytes == expected["n_bytes"]
        assert row.first_byte == expected["first_byte"]
        assert row.byte_sum_mod == expected["byte_sum_mod"]
        assert (row.width, row.height) == (expected["width"], expected["height"])

    again = {r.doc_id: r for r in multimodal_features(spark, SF_SMOKE).collect()}
    assert feats == again


def test_image_decode_features_match_closed_form(spark):
    """REAL PPM decode grounded against math: the synthesis pattern's
    channel means are computable analytically (r = (5x + d) mod 256 over a
    48-wide grid, etc.), so the decoder's output is checked against numbers
    the decoder never saw. The 2× pooled thumbnail must itself be a valid
    PPM whose re-decode has halved dimensions."""
    import numpy as np

    from weather_database_system_spark.operators.multimodal import (
        IMG_H,
        IMG_W,
        _decode_ppm,
        _image_raw_features,
        _synth_ppm,
    )

    rows = {r.doc_id: r for r in _image_raw_features(spark, SF_SMOKE).collect()}
    assert rows
    x = np.arange(IMG_W, dtype=np.int64)
    y = np.arange(IMG_H, dtype=np.int64)
    xx, yy = np.meshgrid(x, y)
    for doc_id in list(rows)[:10]:
        r = rows[doc_id]
        assert (r.width, r.height) == (IMG_W, IMG_H)
        assert abs(r.mean_r - ((xx * 5 + doc_id) % 256).mean()) <= 1e-3
        assert abs(r.mean_g - ((yy * 7 + 3 * doc_id) % 256).mean()) <= 1e-3
        assert abs(r.mean_b - ((xx + yy + doc_id) % 256).mean()) <= 1e-3
        assert r.luma_std > 0
    # thumbnail digest corresponds to a REAL decodable half-size PPM
    w, h, px = _decode_ppm(_synth_ppm(0))
    pooled = px.astype(np.float64).reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3))
    thumb = f"P6\n{w // 2} {h // 2}\n255\n".encode() + pooled.astype(np.uint8).tobytes()
    tw, th, tpx = _decode_ppm(thumb)
    assert (tw, th, tpx.shape) == (IMG_W // 2, IMG_H // 2, (IMG_H // 2, IMG_W // 2, 3))
    import hashlib

    assert rows[0].thumb_md5 == hashlib.md5(thumb).hexdigest()
    # the registry surface's replayable thumbnail means (r9) equal the
    # real pooled thumbnail's channel means, floor-rounded at 4 dp
    from weather_database_system_spark.operators.multimodal import _r4

    tf = pooled.astype(np.uint8).astype(np.float64)
    assert rows[0].thumb_mean_r == _r4(float(tf[..., 0].mean()))
    assert rows[0].thumb_mean_g == _r4(float(tf[..., 1].mean()))
    assert rows[0].thumb_mean_b == _r4(float(tf[..., 2].mean()))


def test_audio_decode_features_match_signal_physics(spark):
    """REAL WAV decode grounded against signal theory: a pure sine at
    frequency f sampled for d seconds crosses zero ~2·f·d times and has
    RMS amp/√2 — the decoder's numbers must satisfy physics it never
    computed directly."""
    from weather_database_system_spark.operators.multimodal import (
        AUDIO_AMP,
        AUDIO_N,
        AUDIO_SR,
        _audio_raw_features,
        audio_decode_features,
    )

    rows = {r.doc_id: r for r in _audio_raw_features(spark, SF_SMOKE).collect()}
    assert rows
    dur = AUDIO_N / AUDIO_SR
    for doc_id in list(rows)[:25]:
        r = rows[doc_id]
        freq = 200 + (doc_id % 20) * 50
        assert r.sample_rate == AUDIO_SR
        assert r.n_samples == AUDIO_N
        assert abs(r.duration_ms - 1000.0 * dur) < 1e-6
        expected_zc = 2 * freq * dur
        assert abs(r.zero_crossings - expected_zc) <= 2, (doc_id, freq)
        assert abs(r.rms - AUDIO_AMP / 2**0.5) / (AUDIO_AMP / 2**0.5) < 0.01
        # a sampled sine need not land on the analytic peak: with n
        # samples/period the worst-case max sample is amp·cos(pi/n); the
        # highest synthesized freq (1150 Hz at 8 kHz) gives n ≈ 6.96
        assert AUDIO_AMP * 0.85 <= r.peak <= AUDIO_AMP

    # registry surface: every pinned physics claim must hold on every doc
    claims = audio_decode_features(spark, SF_SMOKE).collect()
    assert claims and all(
        c.rms_close == 1 and c.peak_close == 1 and c.zc_close == 1
        for c in claims
    )
    assert all(c.freq_hz == 200 + (c.doc_id % 20) * 50 for c in claims)


def test_corpus_dedup_apply_reconciles_with_clusters(spark):
    """The survivorship audit must reconcile exactly with its inputs:
    kept+dropped = total per language, kept docs = number of distinct
    cluster canonicals, and corpus-wide doc/token totals match the raw
    documents table."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        _tokens,
        corpus_dedup_apply,
        dedup_clusters,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = corpus_dedup_apply(spark, SF_SMOKE).collect()
    assert rows
    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    total_toks = docs.select(F.sum(F.size(_tokens(F.col("text")))).alias("t")).collect()[0]["t"]
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_kept >= 1  # every language keeps at least one canonical
    assert sum(r.kept_tokens + r.dropped_tokens for r in rows) == total_toks
    n_canonical = dedup_clusters(spark, SF_SMOKE).filter(F.col("is_canonical") == 1).count()
    assert sum(r.n_kept for r in rows) == n_canonical


def test_decayed_user_value_bounds_and_recency_dominance(spark):
    """Decay contract: with the 7-day half-life every weight is in (0, 1],
    so for users whose events all have positive value the decayed score is
    strictly less than the raw sum; an event AT the anchor gets weight 1."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.behavioral import decayed_user_value
    from weather_database_system_spark.sources.star import load_table

    rows = decayed_user_value(spark, SF_SMOKE).collect()
    assert rows
    ev = load_table(spark, SF_SMOKE, "events")
    assert ev.filter(F.col("value") < 0).count() == 0  # corpus precondition
    for r in rows:
        assert 0 < r.decayed_value <= r.raw_value + 1e-6


def test_ols_trend_matches_numpy_polyfit(spark):
    """Slope/intercept/R² per series must match numpy's least-squares fit
    on the same (hours-since-anchor, value) points, and a planted perfect
    line must recover its exact coefficients with R² = 1."""
    from datetime import datetime

    import numpy as np

    from weather_database_system_spark.operators.temporal import (
        TREND_ANCHOR,
        linear_regression_trend,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {r.event_type: r for r in linear_regression_trend(spark, SF_SMOKE).collect()}
    anchor = datetime.strptime(TREND_ANCHOR, "%Y-%m-%d %H:%M:%S")
    pts: dict[str, list] = {}
    for r in load_table(spark, SF_SMOKE, "events").collect():
        pts.setdefault(r.event_type, []).append(
            ((r.ts - anchor).total_seconds() / 3600.0, r.value)
        )
    for et, xy in pts.items():
        x = np.array([p[0] for p in xy])
        y = np.array([p[1] for p in xy])
        slope, intercept = np.polyfit(x, y, 1)
        r = got[et]
        assert r.n == len(xy)
        assert abs(r.slope_per_hour - slope) < 1e-4, et
        assert abs(r.intercept - intercept) < 1e-2, et
        ss_res = ((y - (slope * x + intercept)) ** 2).sum()
        ss_tot = ((y - y.mean()) ** 2).sum()
        assert abs(r.r2 - (1 - ss_res / ss_tot)) < 1e-4, et


def test_ols_recovers_planted_perfect_line(spark, tmp_path):
    from datetime import datetime, timedelta

    from weather_database_system_spark.operators.temporal import (
        linear_regression_trend,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(hours=i), 1, "click", 10.0 + 2.5 * i, "{}")
        for i in range(48)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    r = linear_regression_trend(spark, str(tmp_path)).collect()[0]
    assert (r.slope_per_hour, r.intercept, r.r2) == (2.5, 10.0, 1.0)


def test_seasonal_profile_indexes_average_to_one(spark):
    """Per-series volume shares must sum to 1, the volume-weighted mean of
    the seasonal indexes must be 1 (the multiplicative-decomposition
    identity), and hourly means must match a Python replay."""
    from weather_database_system_spark.operators.temporal import (
        seasonal_hourly_profile,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = seasonal_hourly_profile(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    ev: dict[tuple, list] = {}
    for e in load_table(spark, SF_SMOKE, "events").collect():
        ev.setdefault((e.event_type, e.ts.hour), []).append(e.value)
    for et, hrs in by_type.items():
        assert abs(sum(r.volume_share for r in hrs) - 1.0) < 1e-2
        wmean = sum(r.seasonal_index * r.n_events for r in hrs) / sum(
            r.n_events for r in hrs
        )
        assert abs(wmean - 1.0) < 1e-3, et
        for r in hrs:
            vals = ev[(et, r.hour_of_day)]
            assert r.n_events == len(vals)
            assert abs(r.mean_value - sum(vals) / len(vals)) < 1e-3


def test_time_to_convert_zero_conversions_keeps_signup_count(spark, tmp_path):
    """Regression: with signups but NO qualifying purchases, the summary
    must still report the signup count and a 0.0 conversion rate (matching
    the oracle's scalar subquery), never NULL it out — the empty latency
    set previously erased the crossJoined total."""
    import duckdb
    from datetime import datetime, timedelta

    import __spark_entry__ as em
    from tests.oracle import compare
    from weather_database_system_spark.operators.behavioral import (
        funnel_time_to_convert,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "signup", 1.0, "{}"),
        (2, base + timedelta(hours=1), 2, "signup", 1.0, "{}"),
        (3, base - timedelta(hours=5), 1, "purchase", 1.0, "{}"),  # BEFORE signup
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    r = funnel_time_to_convert(spark, str(tmp_path)).collect()[0]
    assert (r.n_signup_users, r.n_converted, r.conv_pct) == (2, 0, 0.0)
    assert r.avg_hours is None and r.p50_hours is None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    compare(
        funnel_time_to_convert(spark, str(tmp_path)),
        con,
        em.oracle_sql()["funnel_time_to_convert"],
        name="ttc_zero_conv",
    )


def test_winnow_survives_docs_shorter_than_k(spark, tmp_path):
    """Regression: a doc with fewer than WINNOW_K tokens has an EMPTY
    fingerprint set; under ANSI mode the fp_min lookup must yield NULL
    (try_element_at), not an INVALID_ARRAY_INDEX crash."""
    from weather_database_system_spark.operators.textan import winnow_fingerprints

    docs = [
        (1, "a b", "en", "web", 0),  # 2 tokens < WINNOW_K=4 → no k-grams
        (2, " ".join(f"w{i}" for i in range(20)), "en", "web", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = {r.doc_id: r for r in winnow_fingerprints(spark, str(tmp_path)).collect()}
    assert rows[1].n_fingerprints == 0 and rows[1].fp_min is None
    assert rows[2].n_fingerprints > 0 and rows[2].fp_min is not None


def test_hll_weeks_do_not_collapse_across_years(spark, tmp_path):
    """Regression for the weekofyear() pitfall: two days a year apart that
    share a week NUMBER must land in different week groups, and an
    ISO-boundary day (2024-12-31 is ISO week 1 of 2025) must group with
    its own Monday, not a week number from the wrong year."""
    from datetime import datetime

    from weather_database_system_spark.operators.scale import hll_partial_rollup

    rows = [
        (1, datetime(2024, 1, 3), 1, "click", 1.0, "{}"),    # week of 2024-01-01
        (2, datetime(2025, 1, 1), 2, "click", 1.0, "{}"),    # week of 2024-12-30
        (3, datetime(2024, 12, 31), 3, "click", 1.0, "{}"),  # same Monday as #2
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {r.week: (r.n_days, r.exact_users) for r in hll_partial_rollup(spark, str(tmp_path)).collect()}
    assert got == {"2024-01-01": (1, 1), "2024-12-30": (2, 2)}


def test_mad_anomaly_is_empty_not_broken_on_constant_values(spark, tmp_path):
    """MAD = 0 (constant values) must produce an EMPTY report, not a
    division error or inf scores — the mad > 0 guard's contract."""
    from datetime import datetime, timedelta

    from weather_database_system_spark.operators.scale import anomaly_mad_zscore

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(hours=i), i % 5, "click", 7.5, "{}")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    assert anomaly_mad_zscore(spark, str(tmp_path)).collect() == []


def test_item_cooccurrence_matches_python_counter_replay(spark):
    """Top co-purchase pairs must equal a pure-Python Counter replay
    (distinct items per basket, support floor, cosine, deterministic
    ranking)."""
    import math
    from collections import Counter

    from weather_database_system_spark.operators.behavioral import (
        COOC_MIN,
        COOC_TOP_K,
        item_cooccurrence_similarity,
    )
    from weather_database_system_spark.sources.star import load_table

    got = item_cooccurrence_similarity(spark, SF_SMOKE).collect()
    assert got
    baskets: dict[int, set] = {}
    for r in load_table(spark, SF_SMOKE, "lineitem").collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    cooc, totals = Counter(), Counter()
    for items in baskets.values():
        s = sorted(items)
        totals.update(s)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                cooc[(s[i], s[j])] += 1
    ranked = sorted(
        ((c, a, b) for (a, b), c in cooc.items() if c >= COOC_MIN),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:COOC_TOP_K]
    assert [(r.cooc, r.item_a, r.item_b) for r in got] == ranked
    for r in got:
        assert (r.n_a, r.n_b) == (totals[r.item_a], totals[r.item_b])
        want = r.cooc / math.sqrt(r.n_a * r.n_b)
        assert abs(r.cosine - want) < 1e-5


def test_time_proximity_equals_brute_force_pairs(spark):
    """The bucketed band join must produce exactly the pair matrix of the
    O(n²) brute-force |Δt| ≤ window scan — every pair once, none missed at
    bucket boundaries."""
    from collections import Counter

    from weather_database_system_spark.operators.temporal import (
        PROX_WINDOW_US,
        time_proximity_join,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {
        (r.type_x, r.type_y): (r.n_pairs, r.avg_gap_sec)
        for r in time_proximity_join(spark, SF_SMOKE).collect()
    }
    ev = [
        (r.event_id, r.event_type, int(r.ts.timestamp() * 1_000_000))
        for r in load_table(spark, SF_SMOKE, "events").collect()
    ]
    cnt, gaps = Counter(), Counter()
    for i in range(len(ev)):
        for j in range(i + 1, len(ev)):
            gap = abs(ev[i][2] - ev[j][2])
            if gap <= PROX_WINDOW_US:
                key = tuple(sorted((ev[i][1], ev[j][1])))
                cnt[key] += 1
                gaps[key] += gap
    assert cnt, "no proximate pairs at smoke sf — vacuous"
    assert {k: v for k, v in cnt.items()} == {k: v[0] for k, v in got.items()}
    for k, (n, avg) in got.items():
        assert abs(avg - gaps[k] / n / 1e6) < 1e-3, k


def test_dedup_against_index_replays_digest_and_minhash_ladder(spark):
    """Verdicts must match a pure-Python replay of the exact-digest ladder
    AND the banded md5-MinHash near-dup probe, including the min-id
    canonical choice."""
    import hashlib

    from weather_database_system_spark.operators.dedup import (
        N_BANDS,
        N_HASHES,
        dedup_against_index,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {r.doc_id: (r.status, r.matched_doc_id) for r in dedup_against_index(spark, SF_SMOKE).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, SF_SMOKE, "documents").collect()}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    def sig(text):
        t = text.split(" ")
        sh = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        return [min(md5(f"{j}|{s}") for s in sh) if sh else None for j in range(N_HASHES)]

    digests = {d: md5(t) for d, t in docs.items()}
    sigs = {d: sig(t) for d, t in docs.items()}
    bands = {
        d: [s[2 * b] + s[2 * b + 1] for b in range(N_BANDS)] if s[0] else []
        for d, s in sigs.items()
    }
    index = [d for d in docs if d % 2 == 0]
    assert got, "empty batch"
    n_dup = 0
    for d in docs:
        if d % 2 == 0:
            continue
        exact = [i for i in index if digests[i] == digests[d]]
        near = [
            i
            for i in index
            if any(bands[d][b] == bands[i][b] for b in range(len(bands[d])))
        ]
        if exact:
            want = ("exact_dup", min(exact))
            n_dup += 1
        elif near:
            want = ("near_dup", min(near))
            n_dup += 1
        else:
            want = ("unique", None)
        assert got[d] == want, d
    assert 0 < n_dup < len(got), "verdict mix is vacuous at smoke sf"


def test_span_corruption_matches_python_hash_replay(spark):
    """Mask counts, merged-span counts and digests must equal a pure-Python
    replay of the hash-seeded span plan, and the corpus corruption rate
    must sit in the T5-ish band the constants target."""
    import hashlib

    from weather_database_system_spark.operators.scale import (
        _HI_DIV,
        _ID_MOD,
        _KNUTH,
    )
    from weather_database_system_spark.operators.trainprep import (
        SPAN_LEN_MOD,
        SPAN_MIN_LEN,
        SPAN_SEED_PCT,
        span_corruption_masks,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {r.doc_id: r for r in span_corruption_masks(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    tot_masked = tot_tokens = 0
    for d in docs:
        n = len(d.text.split(" "))
        masked, spans, cover = [], 0, -1
        for p in range(n):
            k = d.doc_id * 100_000 + p
            if ((k % _ID_MOD) * _KNUTH // _HI_DIV) % 100 < SPAN_SEED_PCT:
                ln = SPAN_MIN_LEN + (((k + 13) % _ID_MOD) * _KNUTH // _HI_DIV) % SPAN_LEN_MOD
                cover = max(cover, p + ln)
            if cover > p:
                if not masked or masked[-1] != p - 1:
                    spans += 1
                masked.append(p)
        r = got[d.doc_id]
        assert (r.n_tokens, r.n_masked, r.n_spans) == (n, len(masked), spans), d.doc_id
        digest = hashlib.md5(",".join(map(str, masked)).encode()).hexdigest()
        assert r.mask_digest == digest, d.doc_id
        tot_masked += len(masked)
        tot_tokens += n
    assert 0.10 <= tot_masked / tot_tokens <= 0.20


def test_pmi_collocations_formula_and_support_floor(spark):
    """Every emitted PMI must equal the Church-Hanks formula recomputed
    from Python Counter statistics; support floor respected; ranking
    descends on (pmi, bigram)."""
    import math
    from collections import Counter

    from weather_database_system_spark.operators.textan import (
        PMI_MIN_COUNT,
        pmi_collocations,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = pmi_collocations(spark, SF_SMOKE).collect()
    assert rows
    uni, bi = Counter(), Counter()
    for d in load_table(spark, SF_SMOKE, "documents").collect():
        t = d.text.split(" ")
        uni.update(t)
        bi.update(" ".join(t[i : i + 2]) for i in range(len(t) - 1))
    nu, nb = sum(uni.values()), sum(bi.values())
    for r in rows:
        assert r.c12 >= PMI_MIN_COUNT
        w1, w2 = r.bigram.split(" ")
        assert (r.c12, r.c1, r.c2) == (bi[r.bigram], uni[w1], uni[w2])
        want = math.log((r.c12 / nb) / ((r.c1 / nu) * (r.c2 / nu)))
        assert abs(r.pmi - want) < 1e-5, r.bigram
    keys = [(-r.pmi, r.bigram) for r in rows]
    assert keys == sorted(keys)


def test_skyline_equals_brute_force_dominance(spark):
    """The two-phase distributed skyline must equal the O(n²) brute-force
    non-dominated set computed in Python."""
    from weather_database_system_spark.operators.relational import skyline_pareto
    from weather_database_system_spark.sources.star import load_table

    got = {r.o_orderkey for r in skyline_pareto(spark, SF_SMOKE).collect()}
    orders = [
        (r.o_orderkey, round(r.o_totalprice * 100), r.o_orderdate)
        for r in load_table(spark, SF_SMOKE, "orders").collect()
    ]
    want = set()
    for k, p, d in orders:
        dominated = any(
            (p2 <= p and d2 <= d and (p2 < p or d2 < d))
            for _, p2, d2 in orders
        )
        if not dominated:
            want.add(k)
    assert got == want and got


def test_time_to_convert_matches_python_replay(spark):
    """Conversion count and latency stats must equal a pure-Python replay
    (first signup, first purchase at-or-after, linear-interpolated
    percentiles on exact microsecond latencies)."""
    from weather_database_system_spark.operators.behavioral import (
        funnel_time_to_convert,
    )
    from weather_database_system_spark.sources.star import load_table

    r = funnel_time_to_convert(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").collect()
    first_signup, first_purchase = {}, {}
    for e in ev:
        if e.event_type == "signup":
            if e.user_id not in first_signup or e.ts < first_signup[e.user_id]:
                first_signup[e.user_id] = e.ts
    for e in ev:
        if e.event_type == "purchase" and e.user_id in first_signup:
            if e.ts >= first_signup[e.user_id] and (
                e.user_id not in first_purchase or e.ts < first_purchase[e.user_id]
            ):
                first_purchase[e.user_id] = e.ts
    lats = sorted(
        (first_purchase[u] - first_signup[u]).total_seconds() / 3600.0
        for u in first_purchase
    )

    def q(p):
        h = p * (len(lats) - 1)
        lo, hi = lats[int(h)], lats[min(int(h) + 1, len(lats) - 1)]
        return lo + (hi - lo) * (h - int(h))

    assert r.n_signup_users == len(first_signup)
    assert r.n_converted == len(lats)
    assert abs(r.avg_hours - sum(lats) / len(lats)) < 1e-3
    assert abs(r.p50_hours - q(0.5)) < 1e-3
    assert abs(r.p90_hours - q(0.9)) < 1e-3


def test_diff_snapshots_classifies_every_changed_key(spark):
    """The CDC diff must classify exactly the keys the deterministic
    bucket construction changed: bucket 15-19 → insert, 10-14 → delete,
    0-9 → update (+100.0), everything else absent from the output."""
    from weather_database_system_spark.operators.scale import (
        _HI_DIV,
        _ID_MOD,
        _KNUTH,
        diff_snapshots,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {r.o_orderkey: r for r in diff_snapshots(spark, SF_SMOKE).collect()}
    orders = load_table(spark, SF_SMOKE, "orders").collect()
    n_by_type = {"insert": 0, "delete": 0, "update": 0}
    for o in orders:
        bkt = ((o.o_orderkey % _ID_MOD) * _KNUTH // _HI_DIV) % 100
        if 15 <= bkt <= 19:
            r = got[o.o_orderkey]
            assert r.change_type == "insert" and r.old_price is None
            n_by_type["insert"] += 1
        elif 10 <= bkt <= 14:
            r = got[o.o_orderkey]
            assert r.change_type == "delete" and r.new_price is None
            n_by_type["delete"] += 1
        elif bkt <= 9:
            r = got[o.o_orderkey]
            assert r.change_type == "update"
            assert abs(r.new_price - (o.o_totalprice + 100.0)) < 1e-9
            n_by_type["update"] += 1
        else:
            assert o.o_orderkey not in got
    assert len(got) == sum(n_by_type.values())
    assert all(v > 0 for v in n_by_type.values()), n_by_type


def test_quality_profile_matches_python_column_scan(spark):
    """Null and distinct counts per column must equal a pure-Python scan."""
    from weather_database_system_spark.operators.scale import (
        PROFILE_COLS,
        data_quality_profile,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {r.column: r for r in data_quality_profile(spark, SF_SMOKE).collect()}
    assert set(got) == set(PROFILE_COLS)
    rows = load_table(spark, SF_SMOKE, "events").collect()
    for c in PROFILE_COLS:
        vals = [getattr(r, c) for r in rows]
        assert got[c].n_rows == len(rows)
        assert got[c].n_nulls == sum(1 for v in vals if v is None), c
        assert got[c].n_distinct == len({v for v in vals if v is not None}), c


def test_entity_blocking_matches_python_levenshtein(spark):
    """Per-entity fuzzy-match degrees must equal a pure-Python blocked
    Levenshtein replay, and matches must exist (names one digit apart)."""
    from weather_database_system_spark.operators.scale import entity_fuzzy_blocking
    from weather_database_system_spark.sources.star import load_table

    def lev(a, b):
        if len(a) == len(b):  # block guarantees equal length here
            # quick path valid for same-length names: substitutions only
            # is NOT generally levenshtein — do full DP to stay honest
            pass
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[-1]

    got = {r.c_custkey: r.n_fuzzy_matches for r in entity_fuzzy_blocking(spark, SF_SMOKE).collect()}
    cust = [(r.c_custkey, r.c_name) for r in load_table(spark, SF_SMOKE, "customer").collect()]
    blocks: dict[str, list] = {}
    for k, n in cust:
        blocks.setdefault(n[:-2], []).append((k, n))
    want = {k: 0 for k, _ in cust}
    for members in blocks.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if lev(members[i][1], members[j][1]) <= 1:
                    want[members[i][0]] += 1
                    want[members[j][0]] += 1
    assert got == want
    assert sum(want.values()) > 0, "no fuzzy pairs at smoke sf — vacuous"


def test_changepoint_is_argmax_of_python_split_scan(spark):
    """The reported change day must be the argmax (earliest on ties) of
    |mean-before − mean-after| over every candidate split, recomputed in
    pure Python from the raw events."""
    from weather_database_system_spark.operators.temporal import (
        changepoint_mean_shift,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {r.event_type: r for r in changepoint_mean_shift(spark, SF_SMOKE).collect()}
    rows = load_table(spark, SF_SMOKE, "events").collect()
    series: dict[str, dict] = {}
    for r in rows:
        d = r.ts.strftime("%Y-%m-%d")
        s = series.setdefault(r.event_type, {})
        s.setdefault(d, [0.0, 0])
        s[d][0] += r.value
        s[d][1] += 1
    for et, days in series.items():
        ordered = sorted(days)
        best = None
        for i in range(1, len(ordered)):
            sb = sum(days[d][0] for d in ordered[:i])
            nb = sum(days[d][1] for d in ordered[:i])
            sa = sum(days[d][0] for d in ordered[i:])
            na = sum(days[d][1] for d in ordered[i:])
            shift = abs(sa / na - sb / nb)
            if best is None or shift > best[0] + 1e-12:
                best = (shift, ordered[i], sb / nb, sa / na)
        r = got[et]
        assert r.change_day == best[1], et
        assert abs(r.mean_before - best[2]) < 1e-4, et
        assert abs(r.mean_after - best[3]) < 1e-4, et
        assert abs(r.mean_shift - best[0]) < 1e-4, et


def test_pq_adc_matches_numpy_replay_and_beats_random_recall(spark):
    """The full PQ pipeline — per-subspace Lloyd training (lowest-id init),
    encoding, ADC table scoring, top-5 — replayed densely in numpy must
    produce the identical neighbor sets. Recall of the true cosine top-1
    is data-limited on this near-orthogonal corpus (~20 %) but must beat
    the 5/|candidates| ≈ 1 % random baseline decisively."""
    import numpy as np

    from weather_database_system_spark.operators.similarity import (
        KMEANS_ITERS,
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
        PQ_TOPK,
        ann_product_quantization,
    )
    from weather_database_system_spark.sources.star import load_table

    got = ann_product_quantization(spark, SF_SMOKE).collect()
    spark_top: dict[int, list] = {}
    for r in got:
        spark_top.setdefault(r.query_id, []).append(r.neighbor_id)
    assert all(len(v) == PQ_TOPK for v in spark_top.values())

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = {r.vec_id: np.array([float(v) for v in r.embedding]) for r in emb}
    cand_ids = sorted(i for i in X if i >= N_QUERIES)
    q_ids = sorted(i for i in X if i < N_QUERIES)

    codes: dict[int, list] = {i: [] for i in cand_ids}
    books = []
    for m in range(PQ_M):
        sub = {i: X[i][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] for i in cand_ids}
        # codebook as a dict of SURVIVING cells: _lloyd_round drops
        # a cell that loses all members (groupBy emits no row for it), so
        # the replay must too — keeping a stale centroid would let it
        # re-acquire points the implementation's codebook no longer can
        cents = {k: sub[i].copy() for k, i in enumerate(cand_ids[:PQ_K])}

        def assign(cents):
            return {
                i: min(
                    ((((sub[i] - c) ** 2).sum(), k) for k, c in cents.items())
                )[1]
                for i in cand_ids
            }

        for _ in range(KMEANS_ITERS):
            a = assign(cents)
            cents = {
                k: np.mean([sub[i] for i in cand_ids if a[i] == k], axis=0)
                for k in set(a.values())
            }
        a = assign(cents)
        for i in cand_ids:
            codes[i].append(a[i])
        books.append(cents)

    for qi in q_ids:
        dists = sorted(
            (
                sum(
                    ((X[qi][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM] - books[m][codes[i][m]]) ** 2).sum()
                    for m in range(PQ_M)
                ),
                i,
            )
            for i in cand_ids
        )
        assert spark_top[qi] == [i for _, i in dists[:PQ_TOPK]], qi

    hits = 0
    for qi in q_ids:
        cos = sorted(
            ((X[qi] @ X[i]) / (np.linalg.norm(X[qi]) * np.linalg.norm(X[i])), i)
            for i in cand_ids
        )
        if cos[-1][1] in spark_top[qi]:
            hits += 1
    assert hits >= 1, "PQ recall no better than random guessing"


def test_session_paths_ground_against_python_sessionization(spark):
    """Top paths must equal a pure-Python replay of the gaps-and-islands
    sessionization + first-8-steps truncation + frequency ranking."""
    from weather_database_system_spark.operators.behavioral import (
        PATH_MAX_STEPS,
        PATH_TOP_K,
        SESSION_GAP_MIN,
        session_path_analysis,
    )
    from weather_database_system_spark.sources.star import load_table

    got = session_path_analysis(spark, SF_SMOKE).collect()
    assert got and len(got) <= PATH_TOP_K

    ev = load_table(spark, SF_SMOKE, "events").collect()
    streams: dict[int, list] = {}
    for r in ev:
        streams.setdefault(r.user_id, []).append(r)
    counts: dict[str, list] = {}
    for uid, rows in streams.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        sessions, cur, last = [], [], None
        for r in rows:
            # whole-second truncation mirrors the engine's ts.cast('long')
            # (and the oracle's floor(epoch)): a fractional gap in
            # (1800s, 1801s) must not flip the session boundary
            tsec = r.ts.replace(microsecond=0)
            if last is not None and (tsec - last).total_seconds() <= SESSION_GAP_MIN * 60:
                cur.append(r.event_type)
            else:
                if cur:
                    sessions.append(cur)
                cur = [r.event_type]
            last = tsec
        if cur:
            sessions.append(cur)
        for s in sessions:
            p = ">".join(s[:PATH_MAX_STEPS])
            counts.setdefault(p, [0, set()])
            counts[p][0] += 1
            counts[p][1].add(uid)
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1][0], kv[0]))[:PATH_TOP_K]
    want = [(p, c[0], len(c[1])) for p, c in ranked]
    assert [(r.path, r.n_sessions, r.n_users) for r in got] == want


def test_hll_weekly_rollup_within_sketch_error(spark):
    """Merged weekly HLL estimates must sit within the sketch's error bound
    of the exact distinct counts (lgK=14 → σ≈0.81 %; pinned 5 % claim —
    now ALSO oracle-checked, the output carries the claim column)."""
    from weather_database_system_spark.operators.scale import hll_partial_rollup

    rows = hll_partial_rollup(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert r.hll_within_5pct == 1, tuple(r)


def test_bloom_prefilter_never_drops_matches_and_reduces_probe(spark):
    """Structural no-false-negatives (prefiltered count ≥ true matches and
    false positives account exactly for the difference), a real probe-side
    reduction, and a measured FP rate consistent with (1-e^(-kn/m))^k."""
    from weather_database_system_spark.operators.scale import (
        _bloom_audit,
        bloom_prefilter_semi_join,
    )

    stats, n_keys, theory = _bloom_audit(spark, SF_SMOKE)
    assert stats.n_true_match > 0 and n_keys > 0
    assert stats.n_false_neg == 0  # no false negatives, directly
    assert stats.n_prefiltered == stats.n_true_match + stats.n_false_pos
    assert stats.n_prefiltered < stats.n_probe, "no reduction — vacuous demo"
    fp_rate = stats.n_false_pos / max(stats.n_probe - stats.n_true_match, 1)
    assert fp_rate <= max(3 * theory, 0.02), (fp_rate, theory)
    # registry surface: both pinned claims must hold
    r = bloom_prefilter_semi_join(spark, SF_SMOKE).collect()[0]
    assert r.no_false_negative == 1 and r.fp_within_bound == 1, tuple(r)


def test_clustering_coeff_matches_python_graph_replay(spark):
    """Degree, triangle counts and C must equal a pure-Python recompute
    over the SAME edge set (the LSH candidate pairs), and every tight
    triangle corner must show C consistent with 2Δ/(d(d-1))."""
    from weather_database_system_spark.operators.dedup import (
        dedup_minhash_lsh,
        graph_clustering_coeff,
    )

    edges = {(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()}
    got = {r.doc_id: r for r in graph_clustering_coeff(spark, SF_SMOKE).collect()}

    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert set(got) == set(adj)
    any_triangle = False
    for u, nbrs in adj.items():
        d = len(nbrs)
        tri = sum(len(adj[n] & nbrs) for n in nbrs) // 2
        any_triangle = any_triangle or tri > 0
        r = got[u]
        assert r.degree == d and r.n_triangles == tri, u
        want_c = 2 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert abs(r.clustering_coeff - want_c) < 1e-4, u
    assert any_triangle, "graph has no triangles at smoke sf — test is vacuous"


def test_pca_projection_matches_dense_numpy_replay(spark):
    """The distributed PCA (covariance agg → driver eigensolve → map-only
    fold projection) must match a dense numpy replay of the same pipeline:
    identical quantized covariance → identical eigenvectors → projections
    equal within fold-order noise. Components must be orthonormal and the
    per-component sample variance must track the eigenvalues in order."""
    import math

    import numpy as np

    from weather_database_system_spark.operators.featurize import (
        GRAM_FP,
        PCA_K,
        embedding_pca_project,
    )
    from weather_database_system_spark.sources.star import load_table

    got = embedding_pca_project(spark, SF_SMOKE).collect()
    emb = sorted(
        load_table(spark, SF_SMOKE, "embeddings").collect(), key=lambda r: r.vec_id
    )
    X = np.array([[float(v) for v in r.embedding] for r in emb])
    n, dims = X.shape

    # replay the operator's quantized covariance exactly
    q = np.floor(X * GRAM_FP + 0.5)
    G = (q.T @ q) / (float(GRAM_FP) * float(GRAM_FP))
    mu_q = q.sum(axis=0) / n / GRAM_FP
    C = G / n - np.outer(mu_q, mu_q)
    fr6 = np.vectorize(lambda x: math.floor(x * 1e6 + 0.5) / 1e6)
    C = fr6(C)
    C = np.triu(C) + np.triu(C, 1).T  # operator emits the upper triangle

    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:PCA_K]
    W, lam = vecs[:, order], vals[order]
    for k in range(PCA_K):
        j = int(np.argmax(np.abs(W[:, k])))
        if W[j, k] < 0:
            W[:, k] = -W[:, k]
    assert np.allclose(W.T @ W, np.eye(PCA_K), atol=1e-9)

    mu_raw = X.mean(axis=0)
    proj = (X - mu_raw) @ W
    got_mat = np.array([[getattr(r, f"pc{k}") for k in range(PCA_K)] for r in got])
    assert [r.vec_id for r in got] == [r.vec_id for r in emb]
    assert np.abs(got_mat - proj).max() < 1e-4

    # projected variance tracks the eigenvalue ladder (population variance,
    # matching the /n covariance)
    pv = proj.var(axis=0)
    assert all(lam[k] >= lam[k + 1] for k in range(PCA_K - 1))
    assert np.allclose(pv, lam, rtol=0.02)


def test_curriculum_prefix_sum_equals_naive_global_window(spark):
    """The two-level distributed prefix sum must give EXACTLY the values of
    the naive single-partition global window (which is its semantic spec),
    and the physical plan must range-partition the fact table rather than
    funnel it through one reducer."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import _tokens
    from weather_database_system_spark.operators.trainprep import (
        CURRICULUM_BUDGET,
        curriculum_pack_epochs,
    )
    from weather_database_system_spark.sources.star import load_table

    got = {
        r.doc_id: (r.n_tokens, r.cum_before, r.epoch)
        for r in curriculum_pack_epochs(spark, SF_SMOKE).collect()
    }
    naive = {
        r.doc_id: (r.n_tokens, r.cum_before, r.cum_before // CURRICULUM_BUDGET)
        for r in load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(_tokens(F.col("text"))).alias("n_tokens"))
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("n_tokens").over(
                    W.orderBy("n_tokens", "doc_id").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .collect()
    }
    assert got == naive

    plan = (
        curriculum_pack_epochs(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange rangepartitioning" in plan


def test_zorder_files_prune_on_both_dimensions(spark):
    """Per-file min/max stats must be tight on BOTH dimensions — the whole
    point of z-order vs a linear sort: every file spans ≤32 of 256 user
    buckets and ≤16 of 31 days (the 9 free low bits of a 512-wide z-range
    split 5/4 between the dims), so a point predicate on either dimension
    prunes most files. Z-values are re-derived in pure Python."""
    from weather_database_system_spark.operators.scale import (
        ZORDER_SHIFT,
        zorder_layout,
    )
    from weather_database_system_spark.sources.star import load_table

    files = zorder_layout(spark, SF_SMOKE).collect()
    assert files
    for f in files:
        assert f.ub_span <= 32 and f.db_span <= 16, f

    # independent Python replay of the interleave → identical file stats
    ev = load_table(spark, SF_SMOKE, "events").collect()
    want: dict[int, list] = {}
    for r in ev:
        ub, db = r.user_id % 256, r.ts.day - 1
        z = 0
        for i in range(8):
            z |= ((ub >> i) & 1) << (2 * i)
            z |= ((db >> i) & 1) << (2 * i + 1)
        want.setdefault(z >> ZORDER_SHIFT, []).append((ub, db))
    got = {f.file_id: f for f in files}
    assert set(got) == set(want)
    for fid, pts in want.items():
        f = got[fid]
        assert f.n_rows == len(pts)
        assert (f.ub_min, f.ub_max) == (min(p[0] for p in pts), max(p[0] for p in pts))
        assert (f.db_min, f.db_max) == (min(p[1] for p in pts), max(p[1] for p in pts))

    # pruning claim: a point predicate on either dim touches a minority of
    # files once there are enough files to prune among (sf0.01+ has 10).
    if len(files) >= 4:
        for dim_lo, dim_hi, probe in (("ub_min", "ub_max", 137), ("db_min", "db_max", 14)):
            hit = sum(1 for f in files if getattr(f, dim_lo) <= probe <= getattr(f, dim_hi))
            assert hit <= len(files) / 2, (dim_lo, hit, len(files))


def test_mad_anomaly_grounded_and_approx_twin_agrees(spark):
    """Exact-twin flags match a pure-Python median/MAD recompute (per
    event_type), every emitted |mscore| clears the 3.5 bar, and the
    approx_percentile production twin emits the same yardstick row set
    with every pinned ``approx_close`` claim true — the raw sketch mscore
    itself within MAD_APPROX_TOL of exact on every flagged row."""
    from weather_database_system_spark.operators.scale import (
        MAD_APPROX_TOL,
        MAD_K,
        MAD_THRESH,
        _mad_anomaly,
        anomaly_mad_zscore,
        anomaly_mad_zscore_approx,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = anomaly_mad_zscore(spark, SF_SMOKE).collect()
    assert rows, "no outliers flagged at smoke sf"
    ev = load_table(spark, SF_SMOKE, "events").collect()

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        h = (n - 1) / 2
        lo, hi = xs[int(h)], xs[int(h + 0.5)]
        return lo + (hi - lo) * (h - int(h))

    def fr6(x):
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r.value)
    flagged = {r.event_id for r in rows}
    for et, vals in by_type.items():
        m = fr6(med(vals))
        mad = fr6(med([abs(v - m) for v in vals]))
        want = {
            r.event_id
            for r in ev
            if r.event_type == et and abs(MAD_K * (r.value - m) / mad) > MAD_THRESH
        }
        got = {r.event_id for r in rows if r.event_type == et}
        assert got == want, et
    for r in rows:
        assert abs(r.mscore) > MAD_THRESH - 1e-3

    arows = anomaly_mad_zscore_approx(spark, SF_SMOKE).collect()
    assert {r.event_id for r in arows} == flagged  # yardstick-selected set
    assert all(r.approx_close == 1 for r in arows)
    exposed = _mad_anomaly(
        spark, SF_SMOKE, approx=True, expose_approx=True
    ).collect()
    for r in exposed:
        assert abs(r.mscore_a - r.mscore) <= MAD_APPROX_TOL, r.event_id

    # the DEPLOYABLE sketch-only plan: no exact-percentile learner
    # anywhere in the optimized plan, and its sketch-selected flag set
    # agrees with the exact twin on >=95% of events
    from weather_database_system_spark.operators.scale import _mad_sketch_only

    sk = _mad_sketch_only(spark, SF_SMOKE)
    plan = sk._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_percentile" in plan
    assert "percentile(" not in plan.replace("approx_percentile(", "")
    sk_ids = {r.event_id for r in sk.collect()}
    inter = len(sk_ids & flagged)
    assert inter >= 0.95 * max(len(sk_ids), len(flagged))


def test_rollup_merge_is_nonvacuous_and_equals_direct(spark):
    """Every (event_type, hour) group must receive rows from BOTH the old
    and the new half (otherwise the merge proves nothing), and the merged
    states must equal a direct single-pass Spark aggregation."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import (
        MERGE_CUTOFF,
        rollup_merge_incremental,
    )
    from weather_database_system_spark.sources.star import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    halves = (
        ev.select(
            "event_type",
            F.hour("ts").alias("hour_of_day"),
            (F.date_format("ts", "yyyy-MM-dd") < MERGE_CUTOFF).alias("is_old"),
        )
        .groupBy("event_type", "hour_of_day")
        .agg(F.countDistinct("is_old").alias("n_sides"))
        .collect()
    )
    # at smoke sf a thin (type, hour) group can land wholly in one half;
    # the merge is non-vacuous as long as the vast majority genuinely span
    # the cutoff (at sf0.1+ every group does).
    n_both = sum(1 for r in halves if r.n_sides == 2)
    assert halves and n_both >= 0.9 * len(halves), "vacuous merge"

    merged = {
        (r.event_type, r.hour_of_day): (r.n_events, r.total_value, r.min_value, r.max_value)
        for r in rollup_merge_incremental(spark, SF_SMOKE).collect()
    }
    direct = {
        (r.event_type, r.hour_of_day): (r.n, r.tot, r.mn, r.mx)
        for r in ev.select(
            "event_type", F.hour("ts").alias("hour_of_day"), "value"
        )
        .groupBy("event_type", "hour_of_day")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(30,10)")), 2)
            .cast("double")
            .alias("tot"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert merged == direct


def test_containment_catches_excerpt_that_jaccard_misses(spark, tmp_path):
    """The motivating asymmetry: a 15-token excerpt of a 60-token doc has
    containment 1.0 (every inner shingle appears in the outer doc) but
    Jaccard 13/58 ≈ 0.22 — below ngram_jaccard_pairs' 0.5 bar. Containment
    must emit the directed pair; Jaccard must not."""
    from weather_database_system_spark.operators.dedup import (
        dedup_containment,
        ngram_jaccard_pairs,
    )

    toks = [f"w{i}" for i in range(60)]
    docs = [
        (1, " ".join(toks), "en", "web", 0),
        (2, " ".join(toks[20:35]), "en", "web", 0),
        (3, " ".join(f"x{i}" for i in range(30)), "en", "web", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    cont = dedup_containment(spark, str(tmp_path)).collect()
    assert [(r.doc_inner, r.doc_outer, r.containment) for r in cont] == [(2, 1, 1.0)]
    assert cont[0].n_common == 13 and cont[0].n_inner == 13 and cont[0].n_outer == 58
    jac = ngram_jaccard_pairs(spark, str(tmp_path)).collect()
    assert not jac, "Jaccard 0.22 pair must be below the 0.5 bar"


def test_containment_values_match_python_sets(spark):
    """Every emitted containment at smoke sf equals the pure-Python set
    computation over the same 3-gram shingles, and respects the threshold."""
    from weather_database_system_spark.operators.dedup import (
        CONTAIN_T,
        dedup_containment,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = dedup_containment(spark, SF_SMOKE).collect()
    assert rows, "no containment pairs at smoke sf"
    docs = {r.doc_id: r.text for r in load_table(spark, SF_SMOKE, "documents").collect()}

    def sh(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    for r in rows:
        a, b = sh(docs[r.doc_inner]), sh(docs[r.doc_outer])
        assert len(a) <= len(b)
        want = len(a & b) / len(a)
        assert want >= CONTAIN_T
        assert abs(r.containment - want) < 1e-4, (r.doc_inner, r.doc_outer)


def test_scd2_history_matches_pure_python_replay(spark):
    """SCD2 invariants grounded against an independent pure-Python replay of
    each user's event stream: version chains are contiguous (valid_to(k) ==
    valid_from(k+1)), exactly one open current version per user, consecutive
    versions actually change type, and the (type, valid_from) sequence equals
    the collapse-consecutive-duplicates replay."""
    from weather_database_system_spark.operators.temporal import scd2_user_history
    from weather_database_system_spark.sources.star import load_table

    hist = scd2_user_history(spark, SF_SMOKE).collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user

    for uid, versions in by_user.items():
        versions.sort(key=lambda r: r.version_no)
        assert [v.version_no for v in versions] == list(range(1, len(versions) + 1))
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from, uid  # contiguous intervals
            assert a.event_type != b.event_type, uid  # a version means change
            assert a.is_current == 0
        assert versions[-1].is_current == 1 and versions[-1].valid_to is None

    ev = load_table(spark, SF_SMOKE, "events").collect()
    streams: dict[int, list] = {}
    for r in ev:
        streams.setdefault(r.user_id, []).append(r)
    for uid, rows in streams.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        replay = []
        for r in rows:
            if not replay or replay[-1][0] != r.event_type:
                replay.append((r.event_type, r.ts.strftime("%Y-%m-%d %H:%M:%S.%f")))
        got = [(v.event_type, v.valid_from) for v in by_user[uid]]
        assert got == replay, uid


def test_asof_tolerance_is_base_asof_with_staleness_nulling(spark):
    """The tolerance variant must equal the unbounded as-of wherever the
    matched view is fresh (gap ≤ tolerance) and null out exactly the stale
    or missing matches — and the tolerance must be binding at smoke sf
    (both attributed and unattributed clicks exist)."""
    from weather_database_system_spark.operators.temporal import (
        ASOF_TOLERANCE_MIN,
        asof_attribution,
        asof_attribution_tolerance,
    )

    base = {r.click_event_id: r for r in asof_attribution(spark, SF_SMOKE).collect()}
    tol = {r.click_event_id: r for r in asof_attribution_tolerance(spark, SF_SMOKE).collect()}
    assert set(base) == set(tol)
    limit = ASOF_TOLERANCE_MIN * 60 * 1_000_000
    n_attr = n_unattr = 0
    for cid, b in base.items():
        t = tol[cid]
        if b.gap_us is not None and b.gap_us <= limit:
            n_attr += 1
            assert t.attributed == 1
            assert (t.view_ts, t.gap_us) == (b.view_ts, b.gap_us), cid
        else:
            n_unattr += 1
            assert t.attributed == 0
            assert t.view_ts is None and t.gap_us is None, cid
    assert n_attr and n_unattr  # the tolerance is binding, not vacuous


def test_winnow_fingerprints_match_python_reference(spark):
    """Winnowing grounded against an independent pure-Python implementation
    of Schleimer et al.'s scheme (k-gram md5s, window-min selection,
    distinct+sorted): counts, min fingerprint, and the set digest must all
    agree — and the guarantee holds: two docs sharing a K+W-1-token
    substring share at least one fingerprint."""
    import hashlib

    from weather_database_system_spark.operators.textan import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )
    from weather_database_system_spark.sources.star import load_table

    def py_winnow(text: str) -> list[str]:
        toks = text.split(" ")
        hs = [
            hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()
            for i in range(len(toks) - WINNOW_K + 1)
        ]
        if not hs:
            return []
        mins = {
            min(hs[i : i + WINNOW_W])
            for i in range(max(1, len(hs) - WINNOW_W + 1))
        }
        return sorted(mins)

    rows = {r.doc_id: r for r in winnow_fingerprints(spark, SF_SMOKE).collect()}
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    assert set(rows) == set(texts)
    for d in list(texts)[:30]:
        fps = py_winnow(texts[d])
        r = rows[d]
        assert r.n_fingerprints == len(fps), d
        assert r.fp_min == (fps[0] if fps else None), d
        assert r.fp_set_md5 == hashlib.md5(",".join(fps).encode()).hexdigest(), d
    # guarantee: a doc always shares a fingerprint with itself extended —
    # check on a planted near-dup pair instead: identical texts ⇒ same set
    by_text: dict[str, set] = {}
    for d, t in texts.items():
        by_text.setdefault(t, set()).add(rows[d].fp_set_md5)
    assert all(len(v) == 1 for v in by_text.values())


def test_chunk_dedup_stats_consistent_with_chunks(spark):
    """Every reported repeated chunk must be reconstructible from the chunk
    stream: n_docs ≥ 2 by contract, occurrences ≥ docs, and the canonical
    id is the min doc carrying that digest."""
    from weather_database_system_spark.operators.trainprep import (
        chunk_dedup_stats,
        doc_chunk_windows,
    )

    rep = chunk_dedup_stats(spark, SF_SMOKE).collect()
    assert rep
    carriers: dict[str, list[int]] = {}
    for r in doc_chunk_windows(spark, SF_SMOKE).collect():
        carriers.setdefault(r.chunk_digest, []).append(r.doc_id)
    for r in rep:
        docs = carriers[r.chunk_digest]
        assert r.n_docs == len(set(docs)) >= 2
        assert r.n_occurrences == len(docs) >= r.n_docs
        assert r.canonical_doc_id == min(docs)


def test_bigram_surprisal_counts_and_determinism(spark):
    """Structural contract: a doc with n ≥ 2 tokens contributes exactly
    n − 1 bigrams; surprisal is strictly positive (add-one smoothing keeps
    every probability < 1 in a multi-bigram corpus); identical texts score
    identically."""
    from weather_database_system_spark.operators.textan import bigram_surprisal_quality
    from weather_database_system_spark.sources.star import load_table

    rows = {r.doc_id: r for r in bigram_surprisal_quality(spark, SF_SMOKE).collect()}
    assert rows
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    for d, t in texts.items():
        n = len(t.split(" "))
        if n >= 2:
            assert rows[d].n_bigrams == n - 1, d
            assert rows[d].mean_bigram_surprisal > 0
        else:
            assert d not in rows
    by_text: dict[str, set] = {}
    for d, t in texts.items():
        if d in rows:
            by_text.setdefault(t, set()).add(rows[d].mean_bigram_surprisal)
    assert all(len(v) == 1 for v in by_text.values())


def test_source_kl_divergence_matches_python_and_gibbs(spark):
    """KL grounded against a pure-Python recompute (identical rounding
    recipe) and against Gibbs' inequality: KL(source ‖ corpus) ≥ 0, with
    equality only if the source distribution equals the corpus mixture."""
    import math

    from weather_database_system_spark.operators.trainprep import source_kl_divergence
    from weather_database_system_spark.sources.star import load_table

    rows = {r.source: r for r in source_kl_divergence(spark, SF_SMOKE).collect()}
    assert rows
    st: dict[str, dict[str, int]] = {}
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "text").collect():
        d = st.setdefault(r.source, {})
        for t in r.text.split(" "):
            d[t] = d.get(t, 0) + 1
    t_tot: dict[str, int] = {}
    for d in st.values():
        for t, c in d.items():
            t_tot[t] = t_tot.get(t, 0) + c
    n_corpus = sum(t_tot.values())

    def fr(x: float, nd: int) -> float:
        return math.floor(x * 10**nd + 0.5) / 10**nd

    for src, d in st.items():
        n_s = sum(d.values())
        # the engines sum the 8-decimal-rounded terms EXACTLY in DECIMAL —
        # a float accumulation here can land on the other side of the final
        # rounding boundary, so sum the integer numerators (term = k/1e8)
        total_k = sum(
            math.floor((c / n_s) * math.log((c * n_corpus) / (n_s * t_tot[t])) * 1e8 + 0.5)
            for t, c in d.items()
        )
        kl = total_k / 1e8
        r = rows[src]
        assert r.n_tokens == n_s
        assert r.vocab_used == len(d)
        assert abs(r.kl_nats - fr(kl, 6)) < 1e-9, src
        # Gibbs: the per-term rounding can only perturb by ~vocab·5e-9
        assert r.kl_nats >= -1e-4, src


def test_source_overlap_jaccard_matches_python_sets(spark):
    """Source-overlap grounded against pure-Python set arithmetic: every
    reported (n_common, n_union, jaccard) must equal the Jaccard of the
    independently recomputed distinct-shingle sets."""
    from weather_database_system_spark.operators.trainprep import source_overlap_jaccard
    from weather_database_system_spark.sources.star import load_table

    rows = source_overlap_jaccard(spark, SF_SMOKE).collect()
    assert rows
    shingles: dict[str, set] = {}
    for r in load_table(spark, SF_SMOKE, "documents").select("source", "text").collect():
        toks = r.text.split(" ")
        s = shingles.setdefault(r.source, set())
        for i in range(len(toks) - 2):
            s.add(" ".join(toks[i : i + 3]))
    import math

    for r in rows:
        assert r.source_a < r.source_b
        a, b = shingles[r.source_a], shingles[r.source_b]
        inter, union = len(a & b), len(a | b)
        assert (r.n_common, r.n_union) == (inter, union), (r.source_a, r.source_b)
        assert abs(r.jaccard - math.floor(inter / union * 1e6 + 0.5) / 1e6) < 1e-12


def test_split_by_cluster_keeps_near_dups_together(spark):
    """Contamination-safe split contract: every document is assigned,
    splits are the configured three, and — the whole point — every near-dup
    CLUSTER lives entirely inside one split (a doc-keyed split provably
    violates this whenever a multi-doc cluster straddles a bucket
    boundary)."""
    from weather_database_system_spark.operators.dedup import (
        dedup_clusters,
        split_by_cluster,
    )

    rows = split_by_cluster(spark, SF_SMOKE).collect()
    assert rows
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    assert all(r.split is not None for r in rows)
    by_cluster: dict[int, set] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert any(
        len(m) > 1
        for m in (
            {r.doc_id for r in dedup_clusters(spark, SF_SMOKE).collect()
             if r.cluster_size > 1},
        )
    )  # multi-doc clusters exist at smoke sf — the invariant is non-vacuous
    for cid, splits in by_cluster.items():
        assert len(splits) == 1, f"cluster {cid} straddles splits {splits}"


def test_pagerank_near_dup_conserves_mass(spark):
    """PageRank contract: with no dangling nodes (induced subgraph, every
    node degree ≥ 1) total rank mass is conserved at 1.0 (up to the 1e-10
    per-iteration rounding), every rank is at least the teleport floor
    (1−d)/N, and the operator is deterministic run-to-run."""
    from weather_database_system_spark.operators.dedup import (
        PAGERANK_D,
        pagerank_near_dup,
    )

    rows = pagerank_near_dup(spark, SF_SMOKE).collect()
    assert rows
    n = len(rows)
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-6, total
    floor_ = (1.0 - PAGERANK_D) / n
    for r in rows:
        assert r.n_neighbors >= 1
        assert r.pagerank >= floor_ - 1e-12
    again = pagerank_near_dup(spark, SF_SMOKE).collect()
    assert [(r.doc_id, r.pagerank) for r in rows] == [
        (r.doc_id, r.pagerank) for r in again
    ]


def test_embedding_gram_matrix_matches_numpy(spark):
    """Distributed Gram/covariance grounded against numpy: the full upper
    triangle must equal X^T X computed locally (and the covariance its
    centered form) within rounding — the distributed aggregation is checked
    against dense linear algebra it never ran."""
    import numpy as np

    from weather_database_system_spark.operators.featurize import (
        GRAM_FP,
        embedding_gram_matrix,
    )
    from weather_database_system_spark.sources.star import load_table

    emb = np.array(
        [
            r.e
            for r in load_table(spark, SF_SMOKE, "embeddings")
            .selectExpr("CAST(embedding AS ARRAY<DOUBLE>) AS e")
            .orderBy("vec_id")
            .collect()
        ]
    )
    # the operator is DEFINED on the 1e-6 fixed-point grid — quantize the
    # local replay identically, then the comparison is exact, not approximate
    emb = np.floor(emb * GRAM_FP + 0.5) / GRAM_FP
    n, dims = emb.shape
    gram_np = emb.T @ emb
    mu = emb.mean(axis=0)
    cov_np = gram_np / n - np.outer(mu, mu)
    rows = embedding_gram_matrix(spark, SF_SMOKE).collect()
    assert len(rows) == dims * (dims + 1) // 2
    for r in rows:
        i, j = r.dim_i - 1, r.dim_j - 1
        assert r.dim_i <= r.dim_j
        assert abs(r.gram - gram_np[i, j]) <= 5e-6, (i, j)
        assert abs(r.cov - cov_np[i, j]) <= 5e-6, (i, j)
        if i == j:
            assert r.cov >= -1e-9  # variance diagonal


def test_lsh_ann_scores_exactly_and_recalls_strong_neighbors(spark):
    """Banded hyperplane LSH: (1) every returned cosine must equal the
    brute-force cosine for that pair bit-for-bit (the re-rank is exact);
    (2) with fixed planes + seed-42 data the candidate generation is fully
    deterministic, so rank-1 recall has a hard floor; (3) ranks well-formed."""
    from weather_database_system_spark.operators.similarity import (
        ann_brute_force,
        ann_lsh_hyperplane,
    )

    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_brute_force(spark, SF_SMOKE).collect()
    }
    bf_rank1 = {
        r.query_id: r.neighbor_id
        for r in ann_brute_force(spark, SF_SMOKE).collect()
        if r.rank == 1
    }
    lsh_rows = ann_lsh_hyperplane(spark, SF_SMOKE).collect()
    assert lsh_rows
    by_q: dict[int, list[int]] = {}
    for r in lsh_rows:
        assert 1 <= r.rank <= 3
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
        if (r.query_id, r.neighbor_id) in bf:
            assert bf[(r.query_id, r.neighbor_id)] == r.cosine

    hits = sum(1 for q, n in bf_rank1.items() if n in by_q.get(q, []))
    assert hits >= 0.3 * len(bf_rank1), f"rank-1 recall {hits}/{len(bf_rank1)}"


def test_fixedpoint_lsh_matches_decimal_twin_scores(spark):
    """The int64 fixed-point LSH variant re-ranks with the SAME exact
    decimal cosine, so any (query, neighbor) it shares with the decimal-
    signature twin or brute force must carry a bit-identical score; recall
    of brute-force rank-1 neighbors has the same deterministic floor."""
    from weather_database_system_spark.operators.similarity import (
        ann_brute_force,
        ann_lsh_fixedpoint,
    )

    bf_rows = ann_brute_force(spark, SF_SMOKE).collect()
    bf = {(r.query_id, r.neighbor_id): r.cosine for r in bf_rows}
    bf_rank1 = {r.query_id: r.neighbor_id for r in bf_rows if r.rank == 1}
    fp_rows = ann_lsh_fixedpoint(spark, SF_SMOKE).collect()
    assert fp_rows
    by_q: dict[int, list[int]] = {}
    for r in fp_rows:
        assert 1 <= r.rank <= 3
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
        if (r.query_id, r.neighbor_id) in bf:
            assert bf[(r.query_id, r.neighbor_id)] == r.cosine
    hits = sum(1 for q, n in bf_rank1.items() if n in by_q.get(q, []))
    assert hits >= 0.3 * len(bf_rank1), f"rank-1 recall {hits}/{len(bf_rank1)}"


def test_lsh_near_dup_is_precise_subset_of_exact(spark):
    """LSH-blocked near-dup: perfect precision (every returned pair is an
    exact-baseline pair with the identical cosine — the re-check is exact),
    recall bounded below deterministically (fixed planes + seed-42 data)."""
    from weather_database_system_spark.operators.dedup import embedding_near_dup
    from weather_database_system_spark.operators.similarity import (
        embedding_near_dup_lsh,
    )

    exact = {(r.vec_a, r.vec_b): r.cosine for r in embedding_near_dup(spark, SF_SMOKE).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cosine for r in embedding_near_dup_lsh(spark, SF_SMOKE).collect()}
    assert lsh, "LSH found no near-dups at all"
    assert set(lsh) <= set(exact), f"false positives: {set(lsh) - set(exact)}"
    for p, c in lsh.items():
        assert exact[p] == c
    assert len(lsh) >= 0.4 * len(exact), f"recall {len(lsh)}/{len(exact)}"


def test_embedding_near_dup_guard_refuses_unbounded_input(spark):
    """The exact all-pairs baseline must REFUSE inputs above its cap instead
    of planning a quadratic BNLJ over them — the guard is what sanctions its
    presence in the registry."""
    import pytest

    from weather_database_system_spark.operators.dedup import embedding_near_dup

    with pytest.raises(ValueError, match="embedding_near_dup_lsh"):
        embedding_near_dup(spark, SF_SMOKE, max_vectors=3)


def test_ngram_hot_shingle_cap_keeps_planted_dups(spark):
    """The hot-shingle cap (the 100 TB skew bound) must not lose real
    near-dups: strong planted pairs share many RARE shingles, so they
    survive even an aggressively tight cap."""
    from weather_database_system_spark.operators.dedup import ngram_jaccard_pairs

    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            spark, SF_SMOKE, max_posting_len=1_000_000
        ).collect()
    }
    strong = {p for p, j in uncapped.items() if j >= 0.9}
    assert strong, "expected strong planted near-dups in the corpus"

    capped = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    assert strong <= capped, f"default cap lost strong pairs: {strong - capped}"

    tight = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(spark, SF_SMOKE, max_posting_len=16).collect()
    }
    found = len(strong & tight)
    assert found >= 0.9 * len(strong), f"tight cap recall {found}/{len(strong)}"


def test_dedup_clusters_group_planted_dups_under_min_survivor(spark):
    """Cluster assignment: every LSH candidate pair must land in one
    cluster, the canonical label must be the cluster's min doc_id, and
    singletons must keep themselves."""
    from weather_database_system_spark.operators.dedup import (
        dedup_clusters,
        dedup_minhash_lsh,
    )

    clusters = {r.doc_id: r for r in dedup_clusters(spark, SF_SMOKE).collect()}
    pairs = [(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, SF_SMOKE).collect()]
    assert pairs
    for a, b in pairs:
        assert clusters[a].cluster_id == clusters[b].cluster_id, (a, b)

    by_cluster: dict[int, list[int]] = {}
    for doc_id, r in clusters.items():
        by_cluster.setdefault(r.cluster_id, []).append(doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)
        for m in members:
            assert clusters[m].cluster_size == len(members)
            assert clusters[m].is_canonical == (1 if m == cid else 0)
    # planted dups exist ⇒ at least one multi-doc cluster; most docs singleton
    sizes = sorted(len(m) for m in by_cluster.values())
    assert sizes[-1] >= 2
    assert sizes[0] == 1


def test_bm25_ranking_is_monotone_and_grounded(spark):
    """BM25 contract: dense 1..k ranks in strictly non-increasing score
    order, and every ranked document actually contains at least one query
    term (scores come only from matching postings)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import (
        BM25_QUERY,
        BM25_TOP_K,
        bm25_search,
    )
    from weather_database_system_spark.sources.star import load_table

    top = bm25_search(spark, SF_SMOKE).collect()
    assert [r.rank for r in top] == list(range(1, BM25_TOP_K + 1))
    scores = [r.bm25 for r in top]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("doc_id").isin([r.doc_id for r in top]))
        .collect()
    }
    for r in top:
        assert any(t in texts[r.doc_id].split() for t in BM25_QUERY), r.doc_id


def test_unigram_logprob_quality_invariants(spark):
    """Unigram-LM surprisal contract: every doc scored, surprisal strictly
    positive (no token can have p >= 1 in a multi-doc corpus), byte-identical
    documents score identically, and the keep flag is exactly the rounded
    mean compared against the bar."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import (
        SURPRISAL_KEEP_MAX,
        unigram_logprob_quality,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = unigram_logprob_quality(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    by_doc = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.mean_surprisal > 0
        assert r.keep_lowppl == int(r.mean_surprisal <= SURPRISAL_KEEP_MAX)
    # exact-dup documents (same text) must get the same score
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    groups: dict[str, list[int]] = {}
    for d, t in texts.items():
        groups.setdefault(t, []).append(d)
    for ds in (g for g in groups.values() if len(g) > 1):
        scores = {by_doc[d].mean_surprisal for d in ds}
        assert len(scores) == 1, f"identical docs {ds} scored {scores}"
    # surprisal is a pure function of the corpus: two docs with identical
    # TOKEN MULTISETS (order-insensitive) must score identically
    multisets: dict[tuple, list[int]] = {}
    for d, t in texts.items():
        multisets.setdefault(tuple(sorted(t.split())), []).append(d)
    for ds in (g for g in multisets.values() if len(g) > 1):
        scores = {by_doc[d].mean_surprisal for d in ds}
        assert len(scores) == 1, f"same-multiset docs {ds} scored {scores}"


def test_tfidf_cosine_pairs_invariants(spark):
    """tf-idf cosine contract: cosines in [bar, 1+eps], pairs ordered
    (a < b), and every reported cosine matches an INDEPENDENT pure-Python
    recomputation of the full tf-idf cosine from the raw texts (tf from
    split(), idf floor-rounded to 6 decimals, exact Fraction accumulation
    of the products) — grounding the whole weight/norm/dot pipeline, not
    just its shape."""
    import math
    from fractions import Fraction

    from weather_database_system_spark.operators.textan import (
        TFIDF_COS_MIN,
        tfidf_cosine_pairs,
    )
    from weather_database_system_spark.sources.star import load_table

    rows = tfidf_cosine_pairs(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.doc_a < r.doc_b
        assert r.n_shared_terms >= 1
        assert TFIDF_COS_MIN <= r.cosine <= 1.000001

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    }
    n_docs = len(texts)
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for d, t in texts.items():
        counts: dict[str, int] = {}
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
        tf[d] = counts
        for tok in counts:
            df[tok] = df.get(tok, 0) + 1

    def idf6(term: str) -> float:
        return math.floor(math.log((n_docs + 1.0) / (df[term] + 1.0)) * 1e6 + 0.5) / 1e6

    def w(d: int) -> dict[str, float]:
        return {t: c * idf6(t) for t, c in tf[d].items()}

    def cosine(a: int, b: int) -> float:
        wa, wb = w(a), w(b)
        dot = float(sum(Fraction(wa[t]) * Fraction(wb[t]) for t in wa.keys() & wb.keys()))
        na = math.sqrt(float(sum(Fraction(v) * Fraction(v) for v in wa.values())))
        nb = math.sqrt(float(sum(Fraction(v) * Fraction(v) for v in wb.values())))
        return dot / (na * nb)

    for r in rows[:20]:
        expect = cosine(r.doc_a, r.doc_b)
        assert abs(r.cosine - expect) <= 5e-6, (r.doc_a, r.doc_b, r.cosine, expect)


def test_semdedup_prune_invariants(spark):
    """SemDeDup contract: every cell's min-id vector is kept (a lower-id
    mate cannot exist for it), pruned vectors name a lower-id mate in the
    SAME cell as their exemplar, and exemplars are themselves kept docs —
    i.e. the survivorship convention matches dedup_clusters'."""
    from weather_database_system_spark.operators.similarity import semdedup_prune

    rows = {r.vec_id: r for r in semdedup_prune(spark, SF_SMOKE).collect()}
    assert len(rows) == 500  # every vector classified, none dropped
    by_cell: dict[int, list[int]] = {}
    for vid, r in rows.items():
        by_cell.setdefault(r.cell, []).append(vid)
    for members in by_cell.values():
        assert rows[min(members)].is_kept == 1
    pruned = [r for r in rows.values() if r.is_kept == 0]
    assert pruned  # synthetic near-dups exist at smoke sf
    for r in pruned:
        assert r.pruned_by is not None and r.pruned_by < r.vec_id
        assert rows[r.pruned_by].cell == r.cell
    for r in rows.values():
        if r.is_kept:
            assert r.pruned_by is None


def test_quality_weighted_sample_is_unbiased_and_deterministic(spark):
    """The Horvitz-Thompson weights must re-estimate the corpus size
    (Σ 1/p over kept docs ≈ N — hash buckets are uniform, so generous ±20 %
    at n=500), membership must be reproducible run-to-run, and every kept
    row's weight must equal the exact integer-bucket inclusion probability
    inverse."""
    import math

    from weather_database_system_spark.operators.trainprep import (
        quality_weighted_sample,
    )

    a = quality_weighted_sample(spark, SF_SMOKE).collect()
    b = quality_weighted_sample(spark, SF_SMOKE).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # no RNG anywhere
    assert 0 < len(a) < 500
    est = sum(r.ht_weight for r in a)
    assert 0.8 * 500 <= est <= 1.2 * 500, est
    for r in a[:50]:
        n_buckets = math.ceil(r.keep_p * 100)
        assert abs(r.ht_weight - round(100.0 / n_buckets, 6)) < 2e-6


def test_domain_mixture_weights_rebalance_identity(spark):
    """Mixture algebra: shares sum to 1 and natural_share × sample_weight
    recovers target_share for every domain (the defining property of the
    reweighting table)."""
    from weather_database_system_spark.operators.trainprep import (
        domain_mixture_weights,
    )

    rows = domain_mixture_weights(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-3
    for r in rows:
        assert abs(r.natural_share * r.sample_weight - r.target_share) < 1e-3


def test_min_label_propagation_resolves_radius5_chain(spark):
    """Fixpoint contract (VERDICT r2 'What's wrong' #2): a pair-graph chain
    of radius 5 — longer than the old 3-round unroll covered — must resolve
    to ONE cluster whose label is the min member, in bounded rounds. Also
    pins the survivorship invariant on a graph where a fixed unroll would
    emit clusters with no canonical member."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import _propagate_min_labels

    # path graph 10-11-...-15: node 15 is 5 hops from the min label 10
    chain = [(i, i + 1) for i in range(10, 15)]
    docs = spark.createDataFrame([(i,) for i in range(10, 16)] + [(99,)], "doc_id long")
    pairs = spark.createDataFrame(chain, "a long, b long")
    edges = pairs.union(pairs.select(F.col("b"), F.col("a"))).toDF("src", "dst")

    labels = {r.doc_id: r.cluster_id for r in _propagate_min_labels(docs, edges).collect()}
    assert labels == {**{i: 10 for i in range(10, 16)}, 99: 99}


def test_persist_lifecycle_leaves_no_cached_blocks(spark):
    """session.track_persisted contract: after a consuming caller invokes
    release_persisted(), no operator-persisted RDD survives in the session's
    storage pool (VERDICT r1 'What's wrong' #3)."""
    from weather_database_system_spark.operators.dedup import (
        dedup_minhash_lsh,
        ngram_jaccard_pairs,
    )
    from weather_database_system_spark.session import release_persisted

    def n_cached() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    release_persisted()  # clean slate
    base = n_cached()
    dedup_minhash_lsh(spark, SF_SMOKE).collect()
    ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    assert n_cached() > base, "expected operator persists while consuming"
    assert release_persisted() >= 2
    assert n_cached() == base, "persisted intermediates leaked past release"


def test_sketch_aggregates_within_error_bounds(spark):
    """HLL++ (rsd=1%) and KLL-style approx percentile must land within their
    documented error of the exact values — sketches are the only viable
    COUNT(DISTINCT)/percentile shape at 100 TB, but only if the bounds hold."""
    from weather_database_system_spark.operators.scale import approx_distinct_users

    rows = approx_distinct_users(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert r.hll_within_5pct == 1, tuple(r)
        assert r.p50_within_5pct == 1, tuple(r)


def test_approx_decile_twin_agrees_with_exact(spark):
    """quantile_bucket_decile_approx (the production, sketch-threshold
    variant) must (a) claim its pinned per-row bound |approx − exact| ≤ 1
    on EVERY row — the claim column the oracle replay asserts — and (b)
    assign the same decile as the exact twin for ≥99% of (returnflag,
    quantity) domain points — the documented accuracy of approx_percentile
    at APPROX_ACC over integer quantities (a RATE, so it lives here, not
    in the oracle)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.featurize import (
        APPROX_ACC,
        DECILES,
        quantile_bucket_decile,
        quantile_bucket_decile_approx,
    )
    from weather_database_system_spark.sources.star import load_table

    approx_out = quantile_bucket_decile_approx(spark, SF_SMOKE)
    assert approx_out.filter(F.col("approx_within_one") != 1).count() == 0

    # rebuild the sketch thresholds (the operator now emits only the exact
    # decile + the claim) and measure raw agreement on the learned
    # bucketing function's domain — (returnflag, quantity), not physical
    # rows (synthetic lineitem's (orderkey, linenumber) is not unique).
    li = load_table(spark, SF_SMOKE, "lineitem")
    qs = ", ".join(map(str, DECILES))
    aths = li.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(l_quantity, array({qs}), {APPROX_ACC})").alias("aths")
    )
    keys = ["l_returnflag", "quantity"]
    exact = quantile_bucket_decile(spark, SF_SMOKE).select(*keys, "decile").distinct()
    adec = F.lit(1) + F.size(F.filter("aths", lambda t: t < F.col("quantity")))
    approx = (
        exact.join(aths, "l_returnflag")
        .select(*keys, adec.cast("int").alias("decile_approx"))
    )
    joined = exact.join(approx, keys)
    total, agree = joined.select(
        F.count("*"), F.sum((F.col("decile") == F.col("decile_approx")).cast("long"))
    ).first()
    assert total > 0
    assert agree / total >= 0.99, f"approx deciles agree on {agree}/{total}"


def test_sketch_only_scale_variant_within_error_bounds(spark):
    """The production sketch-only plan (_sketch_user_stats) carries no
    exact columns (that is the point); its raw sketch values must land
    within the documented error of the exact twin's yardstick columns,
    and the registry wrapper's pinned claims must all hold."""
    from weather_database_system_spark.operators.scale import (
        _sketch_user_stats,
        approx_distinct_users,
        approx_distinct_users_scale,
    )

    exact = {r.event_type: r for r in approx_distinct_users(spark, SF_SMOKE).collect()}
    rows = _sketch_user_stats(spark, SF_SMOKE).collect()
    assert rows and set(exact) == {r.event_type for r in rows}
    for r in rows:
        e = exact[r.event_type]
        assert abs(r.approx_users - e.exact_users) <= max(3, 0.05 * e.exact_users)
        assert abs(r.approx_p50 - e.exact_p50) <= 0.05 * max(1.0, abs(e.exact_p50))
    wrapped = approx_distinct_users_scale(spark, SF_SMOKE).collect()
    assert {r.event_type for r in wrapped} == set(exact)
    assert all(r.hll_within_5pct == 1 and r.p50_within_5pct == 1 for r in wrapped)


def test_sampling_bucket_mixes_strided_ids(spark, duck):
    """The sampling bucket must take the multiplicative hash's HIGH bits:
    under the old (id*K) % 100 formulation, ids striding by 100 (a sharded
    id range — common in production id assignment) ALL landed in bucket 0,
    so a 10% stratum kept either everything or nothing. The high-bits bucket
    must spread a stride-100 pattern near-uniformly, and the DuckDB replay
    must assign byte-identical buckets (engine-exact membership)."""
    from weather_database_system_spark.operators.scale import _bucket, _sql_bucket

    ids = [i * 100 for i in range(2000)]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r.id: r.b for r in df.select("id", _bucket("id").alias("b")).collect()}
    counts = {}
    for b in got.values():
        counts[b] = counts.get(b, 0) + 1
    assert len(counts) == 100, f"strided ids hit only {len(counts)} buckets"
    assert max(counts.values()) <= 2000 * 0.05, "bucket skew on strided ids"

    duck_rows = duck.execute(
        f"SELECT id, {_sql_bucket('id')} AS b FROM (SELECT unnest(?) AS id)",
        [ids],
    ).fetchall()
    assert {r[0]: r[1] for r in duck_rows} == got


def test_salted_agg_plan_is_two_stage(spark):
    """The salted aggregate must actually split into two shuffle stages
    (key,salt) then (key) — otherwise it silently degenerates to the hot-key
    plan it exists to avoid."""
    from weather_database_system_spark.operators.scale import skew_salted_agg
    from weather_database_system_spark.plans import formatted_plan, shuffle_count

    df = skew_salted_agg(spark, SF_SMOKE)
    # two agg shuffles + presentation sort
    assert shuffle_count(df) == 3
    assert formatted_plan(df).count("HashAggregate") >= 4  # partial+final × 2 stages


def test_resize_and_frame_sample_plumbing(spark):
    """Resize: binary in/out through Arrow batches, output length follows the
    target-area contract. Frame sample: byte-exact frames at the documented
    stride; corpus ASCII-ness (which the DuckDB oracle's VARCHAR md5 relies
    on) is asserted, not assumed."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.multimodal import (
        frame_sample,
        resize_payloads,
        with_binary_payload,
    )
    from weather_database_system_spark.sources.star import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    assert docs.filter(F.octet_length(F.encode("text", "UTF-8")) != F.length("text")).count() == 0

    mm = with_binary_payload(spark, SF_SMOKE).select("doc_id", "payload")
    resized = resize_payloads(mm, target_w=32, target_h=24).collect()
    assert all(r.n_bytes_resized == 32 * 24 // 8 for r in resized)
    # deterministic: content derived from payload bytes only
    again = {r.doc_id: r.payload_resized for r in resize_payloads(mm, 32, 24).collect()}
    assert all(again[r.doc_id] == r.payload_resized for r in resized)

    frames = frame_sample(mm, frame_size=64, stride=4)
    texts = {r.doc_id: r.text for r in docs.limit(10).collect()}
    got = {
        (r.doc_id, r.sample_no): r.frame_digest
        for r in frames.filter(F.col("doc_id").isin(*texts)).collect()
    }
    import hashlib

    for doc_id, text in texts.items():
        b = text.encode()
        for i in range(0, len(b) // 64, 4):
            expect = hashlib.md5(b[i * 64 : i * 64 + 64]).hexdigest()
            assert got[(doc_id, i // 4)] == expect


def test_kmeans_ivf_learns_cells_and_beats_or_matches_label_recall(spark):
    """The learned k-means quantizer must (1) produce well-formed one-cell
    probes whose cosines match brute force bit-for-bit for shared
    neighbors, and (2) recall rank-1 brute-force neighbors at least as well
    as the label-cell stand-in it replaces (VERDICT r1 next-round #7)."""
    from weather_database_system_spark.operators.similarity import (
        ann_brute_force,
        ann_ivf_kmeans,
        ann_ivf_label,
    )

    bf_rows = ann_brute_force(spark, SF_SMOKE).collect()
    bf = {(r.query_id, r.neighbor_id): r.cosine for r in bf_rows}
    bf_rank1 = {r.query_id: r.neighbor_id for r in bf_rows if r.rank == 1}

    km = ann_ivf_kmeans(spark, SF_SMOKE).collect()
    assert len({r.query_id for r in km}) == 10  # every query answered
    cells = {r.best_cell for r in km}
    assert cells <= set(range(8))
    assert len(cells) > 1, "k-means degenerated to a single cell"
    for r in km:
        assert 1 <= r.rank <= 3
        if (r.query_id, r.neighbor_id) in bf:
            assert bf[(r.query_id, r.neighbor_id)] == r.cosine

    def rank1_recall(rows):
        by_q: dict[int, list[int]] = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r.neighbor_id)
        return sum(1 for q, n in bf_rank1.items() if n in by_q.get(q, []))

    km_recall = rank1_recall(km)
    label_recall = rank1_recall(ann_ivf_label(spark, SF_SMOKE).collect())
    assert km_recall >= label_recall, (
        f"k-means IVF rank-1 recall {km_recall} < label-cell {label_recall}"
    )


def test_ivf_matches_brute_force_when_cell_is_right(spark):
    """IVF is approximate (probes one cell); sanity-check its results are
    well-formed and its cosines match brute force for shared neighbors."""
    from weather_database_system_spark.operators.similarity import (
        ann_brute_force,
        ann_ivf_label,
    )

    bf = {(r.query_id, r.neighbor_id): r.cosine for r in ann_brute_force(spark, SF_SMOKE).collect()}
    ivf = ann_ivf_label(spark, SF_SMOKE).collect()
    assert len({r.query_id for r in ivf}) == 10
    for r in ivf:
        assert 1 <= r.rank <= 3
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9


def test_cohort_retention_invariants(spark):
    """Week-0 retention is exactly 1.0, every cell's active_users is bounded
    by its cohort_size, and offsets are non-negative."""
    from weather_database_system_spark.operators.behavioral import (
        cohort_retention,
    )

    rows = cohort_retention(spark, SF_SMOKE).collect()
    assert rows, "empty retention matrix"
    for r in rows:
        assert r.week_offset >= 0
        assert 0 < r.active_users <= r.cohort_size
        if r.week_offset == 0:
            assert r.retention_pct == 1.0


def test_funnel_is_monotone_and_deadline_bounded(spark):
    """An ordered, deadlined funnel can only shrink step to step; step 1
    equals the distinct signup-user count."""
    from weather_database_system_spark.operators.behavioral import (
        funnel_conversion,
    )
    from weather_database_system_spark.sources.star import load_table
    from pyspark.sql import functions as F

    rows = sorted(funnel_conversion(spark, SF_SMOKE).collect(), key=lambda r: r.step)
    assert [r.step for r in rows] == [1, 2, 3, 4]
    users = [r.users for r in rows]
    assert users == sorted(users, reverse=True), "funnel widened mid-way"
    signups = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id")
        .distinct()
        .count()
    )
    assert users[0] == signups
    assert rows[0].conv_pct == 1.0


def test_funnel_bounds_whole_chain_by_first_event(spark, tmp_path):
    """windowFunnel contract (ADVICE r2): every step must land within 24h of
    the chain's FIRST event, not of the previous step. User B's click is 10h
    after the view (per-step-deadline would accept it) but 30h after signup —
    windowFunnel stops B at step 2."""
    from datetime import datetime, timedelta

    from weather_database_system_spark.operators.behavioral import funnel_conversion

    t0 = datetime(2024, 1, 1)
    h = timedelta(hours=1)
    rows = [
        ("A", "signup", t0), ("A", "view", t0 + h),
        ("A", "click", t0 + 23 * h), ("A", "purchase", t0 + 23.5 * h),
        ("B", "signup", t0), ("B", "view", t0 + 20 * h),
        ("B", "click", t0 + 30 * h), ("B", "purchase", t0 + 31 * h),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {r.step: r.users for r in funnel_conversion(spark, str(tmp_path)).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_gap_fill_interpolation_is_linear_between_brackets(spark):
    """Every gap hour's value lies exactly on the line between the nearest
    observed hours (recomputed independently in Python)."""
    from weather_database_system_spark.operators.temporal import (
        gap_fill_interpolate,
    )

    rows = gap_fill_interpolate(spark, SF_SMOKE).collect()
    by_series: dict[str, list] = {}
    for r in rows:
        by_series.setdefault(r.event_type, []).append(r)
    checked = 0
    for series in by_series.values():
        series.sort(key=lambda r: r.hour)
        obs = [(i, r.value_interp) for i, r in enumerate(series) if r.is_gap == 0]
        assert obs[0][0] == 0 and obs[-1][0] == len(series) - 1, (
            "grid must start/end on observed hours"
        )
        for (i0, v0), (i1, v1) in zip(obs, obs[1:]):
            for j in range(i0 + 1, i1):
                expect = v0 + (v1 - v0) * ((j - i0) / (i1 - i0))
                got = series[j].value_interp
                assert got is not None and abs(got - expect) < 1e-5
                checked += 1
    assert checked > 100, f"too few gaps exercised ({checked})"


def test_sessionization_gap_invariants(spark):
    """Within a session, consecutive events are ≤ the gap apart; a user's
    next session starts > the gap after the previous one ended; event
    counts conserve the user's events."""
    from weather_database_system_spark.operators.behavioral import (
        SESSION_GAP_MIN,
        sessionize_events,
    )
    from weather_database_system_spark.sources.star import load_table
    from pyspark.sql import functions as F

    per_user = {
        r.user_id: r.n
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    sessions: dict[int, list] = {}
    for r in sessionize_events(spark, SF_SMOKE).collect():
        sessions.setdefault(r.user_id, []).append(r)
    assert set(sessions) == set(per_user)
    gap = SESSION_GAP_MIN * 60
    for user, rows in sessions.items():
        rows.sort(key=lambda r: r.session_no)
        assert [r.session_no for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r.n_events for r in rows) == per_user[user]
        for prev, cur in zip(rows, rows[1:]):
            between = (cur.started_at - prev.ended_at).total_seconds()
            assert between > gap, (user, prev.session_no, between)
            # a session of n events spans at most (n-1) full gaps
            assert prev.duration_sec <= (prev.n_events - 1) * gap


def test_rfm_scores_and_segments_consistent(spark):
    """Scores are 1-4, roughly quartile-sized, and the segment label is a
    pure function of the scores."""
    from weather_database_system_spark.operators.behavioral import rfm_segmentation

    rows = rfm_segmentation(spark, SF_SMOKE).collect()
    assert rows
    n = len(rows)
    for dim in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, dim) for r in rows]
        assert set(vals) <= {1, 2, 3, 4}
        # every quartile bucket is populated (ties can unbalance, not empty)
        assert len(set(vals)) >= 3, f"{dim} collapsed: {set(vals)}"
    for r in rows:
        if r.r_score >= 4 and r.f_score >= 4:
            assert r.segment == "champion"
        elif r.r_score >= 3:
            assert r.segment == "active"
        elif r.f_score >= 3:
            assert r.segment == "loyal_lapsing"
        else:
            assert r.segment == "hibernating"


def test_rfm_approx_twin_agrees_with_exact(spark):
    """rfm_segmentation_approx (the production, sketch-threshold variant)
    must assign the same scores as the exact twin for >=99% of individual
    (customer, dimension) scores at test sf — the documented accuracy of
    approx_percentile at RFM_APPROX_ACC, same twin contract as
    quantile_bucket_decile_approx. (At sf0.001's 150 customers the
    interpolated-vs-nearest-element threshold gap flips ~1 boundary customer
    per dimension — per-dim 99.3%, and 100% at sf0.01 — so the full-tuple
    bound is the looser 97%.)"""
    from weather_database_system_spark.operators.behavioral import (
        _rfm_scored,
        rfm_segmentation,
        rfm_segmentation_approx,
    )

    exact = {
        r.custkey: (r.r_score, r.f_score, r.m_score)
        for r in rfm_segmentation(spark, SF_SMOKE).collect()
    }
    # the registry output now emits exact scores + the oracle-decidable
    # claim; the raw sketch scores come from the test-only expose knob
    rows = _rfm_scored(spark, SF_SMOKE, approx=True, _expose_approx=True).collect()
    approx = {r.custkey: (r.r_score_a, r.f_score_a, r.m_score_a) for r in rows}
    assert set(exact) == set(approx)
    assert all(r.approx_within_one == 1 for r in rows)
    # registry output's exact columns must equal the exact twin's, and the
    # registry (non-exposed) variant must claim the bound on every row
    assert exact == {r.custkey: (r.r_score, r.f_score, r.m_score) for r in rows}
    reg = rfm_segmentation_approx(spark, SF_SMOKE).collect()
    assert len(reg) == len(rows)
    assert all(r.approx_within_one == 1 for r in reg)
    n = len(exact)
    tup = sum(1 for k, v in exact.items() if approx[k] == v)
    dims = sum(sum(a == b for a, b in zip(v, approx[k])) for k, v in exact.items())
    assert dims / (3 * n) >= 0.99, f"approx RFM per-score agreement {dims}/{3 * n}"
    assert tup / n >= 0.97, f"approx RFM full-tuple agreement {tup}/{n}"


def test_sequence_pack_conserves_tokens_across_shard_counts(spark):
    """Packing is defined per output shard: any shard fan-out must conserve
    the corpus token total and doc count exactly (every doc lands in exactly
    one (lang, shard) stream), and bins within each key must satisfy the
    fill invariant — every non-final bin closes at or past the budget."""
    from weather_database_system_spark.operators.trainprep import (
        PACK_BUDGET,
        sequence_pack_bins,
    )

    def totals(df):
        rows = df.collect()
        return sum(r.n_tokens for r in rows), sum(r.n_docs for r in rows), rows

    base_tok, base_docs, _ = totals(sequence_pack_bins(spark, SF_SMOKE))
    for shards in (1, 4, 8):
        tok, docs, rows = totals(sequence_pack_bins(spark, SF_SMOKE, shards))
        assert tok == base_tok, f"{shards} shards: token total {tok} != {base_tok}"
        assert docs == base_docs
        # per-key invariants: contiguous bin ids from 0; cumulative tokens
        # through every non-final bin reach that bin's budget boundary
        per_key: dict = {}
        for r in rows:
            per_key.setdefault((r.lang, r.shard), []).append(r)
        for key, bins in per_key.items():
            bins.sort(key=lambda r: r.bin_id)
            assert [b.bin_id for b in bins] == list(range(len(bins))), key
            cum = 0
            for b in bins[:-1]:
                cum += b.n_tokens
                assert cum >= (b.bin_id + 1) * PACK_BUDGET, (key, b.bin_id, cum)


def test_band_bucket_cap_defuses_mega_buckets(spark, tmp_path_factory):
    """A corpus where most docs share IDENTICAL text must not turn the
    banded-LSH candidate stage into one k²/2-pair task: the bucket cap
    (BAND_BUCKET_CAP, set low here via monkeypatch-free direct call)
    drops the mega-bucket BEFORE pair expansion, while dedup_exact's
    digest path still groups the identical docs — the documented division
    of labour. Distinct near-dup pairs in small buckets survive."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        _cap_band_buckets,
        _md5_signatures,
        _band_explode,
        dedup_exact,
    )

    tmp = tmp_path_factory.mktemp("megabucket")
    boiler = "the same boilerplate licence header repeated verbatim " * 4
    rows = [(i, boiler, "en", "src0", len(boiler)) for i in range(200)]
    # two genuinely distinct near-dup docs in their own small bucket
    rows += [
        (200, "alpha beta gamma delta epsilon zeta eta theta", "en", "src1", 48),
        (201, "alpha beta gamma delta epsilon zeta eta iota", "en", "src1", 47),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    from weather_database_system_spark.sources.star import load_table

    docs = load_table(spark, str(tmp), "documents")
    bands = _md5_signatures(docs, 4).select("doc_id", _band_explode()).select(
        "doc_id", "bb.band", "bb.bsig"
    )
    capped = _cap_band_buckets(bands, cap=50)
    # every surviving bucket is within the cap...
    sizes = capped.groupBy("band", "bsig").count().collect()
    assert sizes and all(r["count"] <= 50 for r in sizes)
    # ...the 200-doc boilerplate bucket is gone from pair generation...
    surviving_docs = {r["doc_id"] for r in capped.select("doc_id").distinct().collect()}
    assert 200 in surviving_docs and 201 in surviving_docs
    assert not any(d < 200 for d in surviving_docs)
    # ...and the identical docs still dedup via the exact-digest path
    exact = {r["canonical_doc_id"]: r["n_copies"] for r in dedup_exact(spark, str(tmp)).collect()}
    assert exact[0] == 200, "exact path lost the identical-text mega-cluster"


def test_logstar_clusters_equal_fixpoint_twin_and_converge_in_log_rounds(spark):
    """dedup_clusters_logstar must emit EXACTLY dedup_clusters' rows (same
    candidate graph, different components algorithm), and the star
    contraction must label a 240-node path graph — diameter 239, which the
    one-hop fixpoint would need ~120 materializations for — in ≤ 12
    alternations with every node labeled 0."""
    from weather_database_system_spark.operators.dedup import (
        _logstar_components,
        dedup_clusters,
        dedup_clusters_logstar,
    )

    a = [tuple(r) for r in dedup_clusters(spark, SF_SMOKE).collect()]
    b = [tuple(r) for r in dedup_clusters_logstar(spark, SF_SMOKE).collect()]
    assert a == b

    n = 240
    docs = spark.range(n).toDF("doc_id")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(i + 1, i) for i in range(n - 1)],
        "src long, dst long",
    )
    jsc = spark.sparkContext._jsc
    n_before = len(jsc.getPersistentRDDs().keySet().toArray())
    rounds: list = []
    labels = _logstar_components(docs, edges, _rounds_out=rounds).collect()
    assert rounds and rounds[0] <= 12, rounds
    assert len(labels) == n
    assert all(r["cluster_id"] == 0 for r in labels), sorted(
        {r["cluster_id"] for r in labels}
    )
    # ADVICE r6: retired rounds must release their localCheckpoint blocks —
    # after ~12 alternations only the FINAL edge set's blocks may remain,
    # not one copy per round.
    n_after = len(jsc.getPersistentRDDs().keySet().toArray())
    assert n_after - n_before <= 1, (
        f"checkpoint blocks accumulated: {n_before} -> {n_after} persistent "
        f"RDDs across {rounds[0]} rounds"
    )


def test_logstar_canonical_entry_equals_symmetric_entry(spark):
    """r19: _clusters_from_candidates now hands the components algorithms
    a CANONICAL (src < dst, distinct) pair set with canonical=True instead
    of the old symmetrized union. Both entry forms must label identically
    — for log-star AND the min-label fixpoint — on a graph with a chain,
    a triangle, and singletons."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        _logstar_components,
        _propagate_min_labels,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)]
    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 10, 11, 12, 99)], "doc_id long"
    )
    canon = spark.createDataFrame(pairs, "src long, dst long")
    sym = canon.union(canon.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 99: 99}

    for fn in (_logstar_components, _propagate_min_labels):
        got_c = {r.doc_id: r.cluster_id for r in fn(docs, canon, canonical=True).collect()}
        got_s = {r.doc_id: r.cluster_id for r in fn(docs, sym).collect()}
        assert got_c == expect, (fn.__name__, got_c)
        assert got_s == expect, (fn.__name__, got_s)


def test_minhash_pair_agg_has_no_distinct_expand(spark):
    """r19: the pair aggregate counts band rows directly (count(*) ≡
    countDistinct(band) because (pair, band) rows are distinct by
    construction) — the distinct rewrite's Expand pass must stay out of
    both twins' plans."""
    from weather_database_system_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_minhash_lsh_fast,
    )
    from weather_database_system_spark.plans import formatted_plan

    for fn in (dedup_minhash_lsh, dedup_minhash_lsh_fast):
        assert "Expand" not in formatted_plan(fn(spark, SF_SMOKE)), fn.__name__


def test_keyed_cols_cache_semantics():
    """r19 _keyed_cols contract: same (kind, content key) returns the
    SAME template object (no rebuild); a different content key misses;
    the data-keyed population is bounded (FIFO eviction)."""
    from weather_database_system_spark.operators import similarity as S

    calls = []

    def build(tag):
        def _b():
            calls.append(tag)
            return object()
        return _b

    a1 = S._keyed_cols("t_kc", "k1", build("k1"))
    a2 = S._keyed_cols("t_kc", "k1", build("k1-again"))
    b1 = S._keyed_cols("t_kc", "k2", build("k2"))
    assert a1 is a2 and b1 is not a1
    assert calls == ["k1", "k2"]
    # eviction keeps the cache bounded
    for i in range(S._KEYED_COLS_MAX + 10):
        S._keyed_cols("t_kc_ev", f"k{i}", build(f"e{i}"))
    assert len(S._CONST_COLS) <= S._KEYED_COLS_MAX


def test_ivf_nprobe_dominates_single_probe_recall(spark):
    """Multi-probe IVF (nprobe=2) must (1) share training with the
    single-probe variant — every (query, neighbor) both return carries a
    bit-identical cosine — (2) return a SUPERSET of each query's
    single-probe candidate cells' results at rank <= 3 cutoffs consistent
    with the wider candidate pool, and (3) never recall FEWER rank-1
    brute-force neighbors than single-probe: widening the probe can only
    add candidates."""
    from weather_database_system_spark.operators.similarity import (
        ann_brute_force,
        ann_ivf_kmeans,
        ann_ivf_kmeans_nprobe,
    )

    bf_rows = ann_brute_force(spark, SF_SMOKE).collect()
    bf_rank1 = {r.query_id: r.neighbor_id for r in bf_rows if r.rank == 1}

    one = ann_ivf_kmeans(spark, SF_SMOKE).collect()
    two = ann_ivf_kmeans_nprobe(spark, SF_SMOKE).collect()
    assert len({r.query_id for r in two}) == 10

    cos1 = {(r.query_id, r.neighbor_id): r.cosine for r in one}
    cos2 = {(r.query_id, r.neighbor_id): r.cosine for r in two}
    for key in cos1.keys() & cos2.keys():
        assert cos1[key] == cos2[key]

    def rank1_recall(rows):
        by_q: dict[int, list[int]] = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r.neighbor_id)
        return sum(1 for q, n in bf_rank1.items() if n in by_q.get(q, []))

    r1, r2 = rank1_recall(one), rank1_recall(two)
    assert r2 >= r1, f"nprobe=2 recall {r2} < single-probe {r1}"


def test_png_decode_features_match_ppm_decode_cross_format(spark):
    """Two REAL containers, one truth: the PNG path (zlib inflate + full
    defilter) must produce byte-identical pixel statistics to the PPM path
    for every document — and the corrupted-payload guard must reject a
    flipped CRC."""
    import pytest as _pytest

    from weather_database_system_spark.operators.multimodal import (
        _decode_png,
        _synth_png,
        image_decode_features,
        png_decode_features,
    )

    png = {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.luma_std)
        for r in png_decode_features(spark, SF_SMOKE).collect()
    }
    ppm = {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.luma_std)
        for r in image_decode_features(spark, SF_SMOKE).collect()
    }
    assert png and png == ppm

    payload = bytearray(_synth_png(0))
    payload[-5] ^= 0xFF  # flip a CRC byte of IEND
    with _pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(payload))


def test_jpeg_decode_features_match_ppm_within_documented_tolerance(spark):
    """The JPEG path must agree with the lossless PPM path on every doc's
    statistics within the documented quality-90 tolerance (channel means
    ±1.0 — the DC coefficients survive quantization nearly intact —
    luma_std ±2.0), and the guards must reject truncated scans and
    non-baseline SOF markers."""
    import pytest as _pytest

    from weather_database_system_spark.operators.multimodal import (
        _decode_jpeg,
        _jpeg_raw_features,
        _synth_jpeg,
        image_decode_features,
    )

    jp = {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.luma_std)
        for r in _jpeg_raw_features(spark, SF_SMOKE).collect()
    }
    ppm = {
        r.doc_id: (r.width, r.height, r.mean_r, r.mean_g, r.mean_b, r.luma_std)
        for r in image_decode_features(spark, SF_SMOKE).collect()
    }
    assert jp and set(jp) == set(ppm)
    for doc_id, (w, h, mr, mg, mb, ls) in jp.items():
        ew, eh, emr, emg, emb, els = ppm[doc_id]
        assert (w, h) == (ew, eh)
        assert abs(mr - emr) <= 1.0 and abs(mg - emg) <= 1.0 and abs(mb - emb) <= 1.0, (
            doc_id, jp[doc_id], ppm[doc_id],
        )
        assert abs(ls - els) <= 2.0, (doc_id, ls, els)

    # the registry surface's plan-level claims (r9) must all hold — this
    # grounds the constant-1 columns the DuckDB oracle replays
    from weather_database_system_spark.operators.multimodal import (
        jpeg_decode_features,
    )

    claims = jpeg_decode_features(spark, SF_SMOKE).collect()
    assert claims and all(
        r.mean_r_close == 1
        and r.mean_g_close == 1
        and r.mean_b_close == 1
        and r.luma_std_close == 1
        for r in claims
    )

    # EVERY truncation point must surface as a descriptive ValueError (or a
    # complete decode, legal for cuts inside the final padding), never a
    # raw IndexError/TypeError from inside the marker walk or bit reader
    payload = _synth_jpeg(0)
    for cut in range(2, len(payload), 7):
        try:
            _decode_jpeg(payload[:cut])
        except ValueError:
            pass
    with _pytest.raises(ValueError, match="truncated|marker"):
        _decode_jpeg(payload[: len(payload) // 2])
    # rewrite SOF0 (FFC0) to progressive SOF2 (FFC2) — must be rejected,
    # not silently mis-decoded
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError, match="non-baseline"):
        _decode_jpeg(prog)


def test_cms_heavy_hitters_claims_and_bounded_state(spark):
    """Count-min invariants at the smoke SF: every reported heavy hitter's
    claims hold (est never undercounts; overshoot ≤ HH_BOUND_MULT·N/W —
    measured 1.60-1.68 N/W across sf0.001..0.1, so the pin has ~1.8×
    headroom), the sketch state is EXACTLY d·W counters whose every row
    sums to N (the mergeability invariant a rollup relies on), and the
    plan broadcasts the counter slices rather than shuffling the keys
    against them."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import _grams, _tokens
    from weather_database_system_spark.operators.textan import (
        HH_D,
        HH_TOP,
        HH_W,
        heavy_hitters_cms,
    )
    from weather_database_system_spark.plans import formatted_plan
    from weather_database_system_spark.sources.star import load_table

    rows = heavy_hitters_cms(spark, SF_SMOKE).collect()
    assert len(rows) == HH_TOP
    assert all(r.cm_overest_ok and r.cm_bound_ok for r in rows)

    docs = load_table(spark, SF_SMOKE, "documents")
    grams = docs.select(F.explode(_grams(_tokens(F.col("text")), 2)).alias("g"))
    n_total = grams.count()
    jb = grams.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.pmod(
                            F.xxhash64(F.concat(F.lit(f"{j}|"), F.col("g"))),
                            F.lit(HH_W),
                        ).alias("b"),
                    )
                    for j in range(HH_D)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.b")
    counters = jb.groupBy("j", "b").agg(F.count("*").alias("c")).collect()
    assert len(counters) <= HH_D * HH_W  # bounded sketch state
    per_row = {}
    for r in counters:
        per_row[r.j] = per_row.get(r.j, 0) + r.c
    assert all(v == n_total for v in per_row.values())  # each row sums to N

    plan = formatted_plan(heavy_hitters_cms(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= HH_D  # counter slices broadcast


def test_ppjoin_prefix_recall_complete_and_index_smaller(spark):
    """PPJoin invariants: (a) the prefix-filtered exact join must find
    every pair the CAPPED inverted-index variant finds (recall
    dominance — the cap can drop tail pairs, the prefix filter provably
    cannot), and (b) the prefix index must be strictly smaller than the
    full shingle index — the compression that makes it the scale path
    (hot shingles sort last and drop out entirely)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        _shingles,
        _tokens,
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )
    from weather_database_system_spark.sources.star import load_table

    pp = {
        (r.doc_a, r.doc_b) for r in jaccard_prefix_pairs(spark, SF_SMOKE).collect()
    }
    capped = {
        (r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, SF_SMOKE).collect()
    }
    assert capped <= pp, f"prefix filter lost pairs: {sorted(capped - pp)[:5]}"

    docs = load_table(spark, SF_SMOKE, "documents")
    sh = docs.select(
        "doc_id", F.explode(_shingles(_tokens(F.col("text")))).alias("s")
    )
    full_n = sh.count()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = sh.groupBy("s").agg(F.count("*").alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "s")
    prefix_n = (
        sh.join(dfreq, "s")
        .join(sizes, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.floor(F.col("n") / 2) + 1)
        .count()
    )
    assert prefix_n < full_n, (prefix_n, full_n)


def test_salted_join_row_identical_for_any_detector(spark):
    """salted_join's contract: row-identical to the plain inner join for
    ANY hot-key set — exact, CMS-estimated, empty, or every key. The
    detector choice moves work between reducers, never rows. Built on a
    synthetic frame with a genuine heavy hitter (one key = half the
    fact) so the salting path is actually exercised."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import (
        HOT_MIN_LINES,
        detect_hot_keys_cms,
        salted_join,
    )

    n = 4000
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(
            F.col("id") % 400
        ).alias("k"),
        F.col("id").alias("row_id"),
    )
    dim = (
        fact.select("k").distinct().withColumn("attr", F.col("k") * 10)
    )
    plain = sorted(
        (r.k, r.row_id, r.attr)
        for r in fact.join(dim, "k").collect()
    )

    exact_hot = (
        fact.groupBy("k").agg(F.count("*").alias("c"))
        .filter(F.col("c") >= HOT_MIN_LINES).select("k")
    )
    cms_hot = detect_hot_keys_cms(fact, "k", HOT_MIN_LINES)
    # CM never undercounts → the sketched set is a SUPERSET of the truth
    assert exact_hot.join(cms_hot, "k", "anti").count() == 0

    detectors = {
        "exact": exact_hot,
        "cms": cms_hot,
        "empty": exact_hot.filter(F.lit(False)),
        "all": fact.select("k").distinct(),
    }
    for name, hot in detectors.items():
        got = sorted(
            (r.k, r.row_id, r.attr)
            for r in salted_join(
                fact, dim, "k", hot, F.xxhash64("row_id")
            ).collect()
        )
        assert got == plain, f"detector={name}: salted join diverged"


def test_salted_join_scatters_hot_key_over_salts(spark):
    """The mechanism itself: with the heavy hitter in the hot set, its
    fact rows must carry >1 distinct salt (scatter), the dim must hold
    exactly N_SALTS replicas of it, and cold keys exactly one."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import N_SALTS

    n = 2000
    fact = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(
            F.col("id") % 400
        ).alias("k"),
        F.col("id").alias("row_id"),
    )
    hot = fact.groupBy("k").agg(F.count("*").alias("c")).filter(
        F.col("c") >= 100
    ).select("k")
    assert [r.k for r in hot.collect()] == [7]

    # reproduce salted_join's internals to observe the salt columns
    hot_b = F.broadcast(hot.withColumn("__is_hot", F.lit(True)))
    f = fact.join(hot_b, "k", "left").withColumn(
        "__salt",
        F.when(
            F.col("__is_hot"),
            F.pmod(F.xxhash64("row_id"), F.lit(N_SALTS)).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    n_salts_hot = f.filter(F.col("k") == 7).select("__salt").distinct().count()
    assert n_salts_hot == N_SALTS  # 1000 draws over 8 salts: all hit

    dim = fact.select("k").distinct()
    d = dim.join(hot_b, "k", "left").withColumn(
        "__salt",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.when(
                    F.col("__is_hot"), F.lit(N_SALTS - 1).cast("bigint")
                ).otherwise(F.lit(0).cast("bigint")),
            )
        ),
    )
    per_key = {r.k: r.c for r in d.groupBy("k").agg(F.count("*").alias("c")).collect()}
    assert per_key[7] == N_SALTS
    assert all(v == 1 for k, v in per_key.items() if k != 7)


def test_salted_join_null_salt_expr_keeps_rows(spark):
    """ADVICE r12 #1: a salt_expr that evaluates NULL on a hot fact row
    must not drop the row — the coalesce maps NULL to salt 0, whose dim
    replica always exists. Balance degrades (NULLs pile on reducer 0);
    rows never do."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import salted_join

    fact = spark.range(200).select(
        F.lit(7).alias("k"),
        F.col("id").alias("row_id"),
        # NULL on even rows — half the hot key's salts are NULL
        F.when(F.col("id") % 2 == 1, F.col("id")).alias("maybe_null"),
    )
    dim = fact.select("k").distinct().withColumn("attr", F.col("k") * 10)
    hot = fact.select("k").distinct()
    got = salted_join(fact, dim, "k", hot, F.col("maybe_null"))
    assert got.count() == 200  # plain inner join row count — nothing dropped


def test_salted_join_rejects_reserved_column_names(spark):
    """ADVICE r12 #2: __is_hot/__salt are internal names; a caller frame
    already carrying one must fail loudly, not be silently overwritten."""
    import pytest
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import salted_join

    fact = spark.range(10).select(
        F.lit(1).alias("k"), F.col("id").alias("row_id")
    )
    dim = fact.select("k").distinct()
    hot = fact.select("k").distinct()
    for bad in ("__is_hot", "__salt"):
        poisoned = fact.withColumn(bad, F.lit(0))
        with pytest.raises(ValueError, match=bad):
            salted_join(poisoned, dim, "k", hot, F.xxhash64("row_id"))


def test_table_fingerprint_partials_merge_by_modular_addition(spark):
    """The fingerprint's operational contract: bucket digests computed on
    disjoint SHARDS of the table merge by modular addition into exactly
    the whole-table digests (and counts by plain addition) — replicas or
    streaming batches never need a joint pass. Also pins
    order-independence: a reversed-order scan yields identical digests."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.scale import (
        FP_MOD,
        table_fingerprint,
    )
    from weather_database_system_spark.sources.star import load_table
    from tests.conftest import SF_SMOKE

    full = {
        r.bucket: (r.n_rows, r.checksum)
        for r in table_fingerprint(spark, SF_SMOKE).collect()
    }

    # recompute the same digests over two disjoint shards (split on
    # o_custkey parity — orthogonal to the o_orderkey bucketing, so every
    # bucket receives rows from both shards) with the operator's own
    # canonicalization, then merge driver-side
    orders = load_table(spark, SF_SMOKE, "orders")
    halves = [
        orders.filter(F.col("o_custkey") % 2 == i) for i in (0, 1)
    ]
    import weather_database_system_spark.operators.scale as sc

    def fp_of(df):
        # same body as table_fingerprint, applied to an arbitrary frame
        from weather_database_system_spark.operators.relational import _fr

        canon = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            _fr(F.col("o_totalprice"), 2).cast("decimal(18,2)").cast("string"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"),
            F.col("o_orderpriority"),
        )
        rv = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("bigint")
        return {
            r.bucket: (r.n_rows, r.checksum)
            for r in df.select(
                F.pmod("o_orderkey", F.lit(sc.FP_BUCKETS)).alias("bucket"),
                rv.alias("rv"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_rows"),
                (F.sum(F.col("rv").cast("decimal(28,0)")) % F.lit(FP_MOD))
                .cast("long")
                .alias("checksum"),
            )
            .collect()
        }

    a, b = fp_of(halves[0]), fp_of(halves[1])
    merged = {
        k: (
            a.get(k, (0, 0))[0] + b.get(k, (0, 0))[0],
            (a.get(k, (0, 0))[1] + b.get(k, (0, 0))[1]) % FP_MOD,
        )
        for k in set(a) | set(b)
    }
    assert merged == full

    # order independence: scanning in descending key order changes nothing
    rev = fp_of(orders.orderBy(F.col("o_orderkey").desc()))
    assert rev == full


def test_blocked_nearest_boundaries_cover_and_tiebreak(spark):
    """Grid-blocking boundary semantics: a station at exactly euclidean R
    on an axis is INCLUDED (dist² = R²), the (R, R) diagonal is excluded
    (2R² > R²), stations just across a cell edge are still found (the
    3×3 cover guarantee), equidistant ties break by the lower
    s_suppkey, and a brute-force cross join over a seeded random cloud
    agrees exactly."""
    import random

    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.spatial import _blocked_nearest

    R = 100

    def run(cust_rows, st_rows):
        cust = spark.createDataFrame(
            cust_rows, "c_custkey long, lat long, lon long"
        )
        st = spark.createDataFrame(
            st_rows, "s_suppkey long, slat long, slon long"
        )
        return {
            r.c_custkey: (r.s_suppkey, r.dist2)
            for r in _blocked_nearest(cust, st, R).collect()
        }

    # axis-exact R included; diagonal (R, R) excluded; cross-cell found
    got = run(
        [(1, 1000, 1000), (2, 199, 199), (3, 5000, 5000)],
        [
            (10, 1100, 1000),   # exactly R from cust 1 → included
            (20, 299, 299),     # (R, R) diagonal from cust 2 → excluded
            (30, 201, 205),     # same cell region, close → cust 2's hit
                                # (cust 2 at cell (1,1), station at (2,2)
                                # cell — found via the neighborhood)
        ],
    )
    assert got[1] == (10, R * R)
    assert got[2] == (30, 2 * 2 + 6 * 6)
    assert 3 not in got  # nothing within R

    # equidistant tie → lower s_suppkey wins
    got = run([(1, 500, 500)], [(7, 500, 560), (5, 500, 440)])
    assert got[1] == (5, 60 * 60)

    # seeded random cloud vs brute force
    rng = random.Random(13)
    cust_rows = [(i, rng.randrange(0, 2000), rng.randrange(0, 2000)) for i in range(40)]
    st_rows = [(j, rng.randrange(0, 2000), rng.randrange(0, 2000)) for j in range(25)]
    got = run(cust_rows, st_rows)
    want = {}
    for i, la, lo in cust_rows:
        best = None
        for j, sa, so in st_rows:
            d2 = (la - sa) ** 2 + (lo - so) ** 2
            if d2 <= R * R and (best is None or (d2, j) < best):
                best = (d2, j)
        if best is not None:
            want[i] = (best[1], best[0])
    assert got == want


def test_trigram_posting_append_equals_rebuild(spark, tmp_path):
    """Incremental posting-index ingest must be blind-append exact:
    build(batch1) + append(batch2) answers every trigram search
    identically to build(batch1 UNION batch2) — the disjoint-doc_id
    property that makes the 100 TB index maintainable without
    read-modify-write. Also pins that the appended generation actually
    landed as extra files (the graceful-pruning-degradation claim)."""
    import glob

    from weather_database_system_spark.operators.textan import (
        _needle_tris,
        _verify_contains,
        append_trigram_postings,
        build_trigram_postings,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "en", "spark join fast"),
            (2, "en", "no match here"),
            (3, "en", "a spark join and another spark join"),
            (4, "fr", "spark and join separately"),
            (5, "en", "tail spark join"),
        ],
        "doc_id long, lang string, text string",
    )
    needle = "spark join"

    def search(postings):
        tris = _needle_tris(needle)
        cand = (
            postings.filter(F.col("tri").isin(tris))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tris"))
            .filter(F.col("n_tris") == len(tris))
            .select("doc_id")
        )
        return sorted(
            tuple(r) for r in _verify_contains(docs, cand, needle).collect()
        )

    whole = str(tmp_path / "idx_whole")
    incr = str(tmp_path / "idx_incr")
    build_trigram_postings(docs, whole)
    batch1, batch2 = docs.filter("doc_id <= 2"), docs.filter("doc_id > 2")
    build_trigram_postings(batch1, incr)
    n_files_before = len(glob.glob(f"{incr}/*.parquet"))
    append_trigram_postings(batch2, incr)
    assert len(glob.glob(f"{incr}/*.parquet")) > n_files_before

    got_whole = search(spark.read.parquet(whole))
    got_incr = search(spark.read.parquet(incr))
    assert got_whole == got_incr
    assert [r[0] for r in got_whole] == [1, 3, 5]


def test_blocked_nearest_salted_hot_cells_row_identical(spark):
    """The module docstring's 'a hot cell is a dense city, the
    salted-join remedy composes' claim, made code-real (r14): routing
    the cell join through salted_join with detect_hot_cells must return
    EXACTLY the plain blocked join's nearest set on a fixture with one
    deliberately hot cell — and the salted plan must actually salt
    (the composite __salt key present, no cartesian)."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.spatial import (
        _blocked_nearest,
        detect_hot_cells,
    )
    from weather_database_system_spark.plans import formatted_plan

    R = 10
    # one dense city cell (cell 0,0: 60 customers) + sparse elsewhere
    dense = [(i, 2 + i % 7, 3 + (i * 3) % 7) for i in range(60)]
    sparse = [(100 + i, 25 + 11 * i, 37 + 13 * i) for i in range(8)]
    cust = spark.createDataFrame(
        dense + sparse, "c_custkey long, lat long, lon long"
    )
    st = spark.createDataFrame(
        [(1, 5, 5), (2, 8, 1), (3, 30, 40), (4, 47, 61), (5, 70, 90)],
        "s_suppkey long, slat long, slon long",
    )
    hot = detect_hot_cells(cust, R, min_count=30)
    assert hot.count() == 1  # exactly the dense city's cell

    plain = {tuple(r) for r in _blocked_nearest(cust, st, R).collect()}
    salted_df = _blocked_nearest(cust, st, R, hot_cells=hot)
    salted = {tuple(r) for r in salted_df.collect()}
    assert salted == plain
    assert len(plain) > 0
    plan = formatted_plan(salted_df)
    assert "__salt" in plan
    assert "CartesianProduct" not in plan

    # detector safety contract: an EMPTY and an EVERY-cell hot set both
    # stay row-identical (wrong detection costs balance, never rows)
    empty = detect_hot_cells(cust, R, min_count=10**9)
    every = detect_hot_cells(cust, R, min_count=1)
    assert {
        tuple(r) for r in _blocked_nearest(cust, st, R, hot_cells=empty).collect()
    } == plain
    assert {
        tuple(r) for r in _blocked_nearest(cust, st, R, hot_cells=every).collect()
    } == plain


def test_density_grid_nonneg_guard_actually_fires(spark):
    """The signed-coordinate guard must EVALUATE, not just exist: the
    first version put assert_true in its own dropped column and Catalyst
    column-pruned it into a no-op (verified empirically, r14). The guard
    is now fused into the consumed slat expression — a negative
    coordinate must raise, a valid frame must aggregate normally."""
    import pytest

    from weather_database_system_spark.operators.spatial import _density_grid

    bad = spark.createDataFrame([(5, 7), (-3, 7)], "slat long, slon long")
    with pytest.raises(Exception, match="negative coordinate"):
        _density_grid(bad).collect()
    ok = spark.createDataFrame([(5, 7), (3, 7)], "slat long, slon long")
    rows = _density_grid(ok).collect()
    assert len(rows) == 1 and rows[0]["n_stations"] == 2


def test_trigram_posting_compaction_preserves_search(spark, tmp_path):
    """compact_trigram_postings must be a row-preserving layout rewrite:
    after several appended generations, compaction reduces the file
    count back to one generation while every search result and the
    total posting multiset stay identical."""
    import glob

    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import (
        _needle_tris,
        _verify_contains,
        append_trigram_postings,
        build_trigram_postings,
        compact_trigram_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "en", "spark join fast"),
            (2, "en", "no match here"),
            (3, "en", "a spark join and another spark join"),
            (4, "fr", "spark and join separately"),
            (5, "en", "tail spark join"),
            (6, "en", "late arrival spark join"),
        ],
        "doc_id long, lang string, text string",
    )
    idx = str(tmp_path / "idx")
    build_trigram_postings(docs.filter("doc_id <= 2"), idx)
    append_trigram_postings(docs.filter("doc_id in (3, 4)"), idx)
    append_trigram_postings(docs.filter("doc_id >= 5"), idx)
    n_files_appended = len(glob.glob(f"{idx}/*.parquet"))
    before = sorted(
        tuple(r) for r in spark.read.parquet(idx).collect()
    )

    compact_trigram_postings(spark, idx)
    assert len(glob.glob(f"{idx}/*.parquet")) < n_files_appended
    after = sorted(tuple(r) for r in spark.read.parquet(idx).collect())
    assert after == before  # row-preserving rewrite

    needle = "spark join"
    tris = _needle_tris(needle)
    postings = spark.read.parquet(idx)
    cand = (
        postings.filter(F.col("tri").isin(tris))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == len(tris))
        .select("doc_id")
    )
    got = [r.doc_id for r in _verify_contains(docs, cand, needle).collect()]
    assert got == [1, 3, 5, 6]


def test_trigram_duplicate_appended_postings_never_drop_matches(spark, tmp_path):
    """At-least-once ingest duplicates postings: a retried micro-batch
    blind-appends its (doc_id, tri) rows AGAIN. The candidate gate must
    count DISTINCT trigrams per doc (ADVICE r14 #1) — the old count(*)
    equality pushed a true match's count to 2×len(tris) and silently
    DROPPED it. Pin: doubling a batch's postings leaves the search
    result identical to the clean index."""
    from weather_database_system_spark.operators.textan import (
        TRIGRAM_NEEDLE,
        append_trigram_postings,
        build_trigram_postings,
        trigram_query_prebuilt,
    )
    from weather_database_system_spark.sources.star import load_table

    sf = SF_SMOKE
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    idx = str(tmp_path / "postings_dup")
    build_trigram_postings(docs, idx)
    baseline = sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf, idx).collect()
    )
    assert len(baseline) > 0
    # retry storm: the first half of the corpus appends AGAIN — every
    # match in it would fail the old equality gate
    append_trigram_postings(docs.filter("doc_id % 2 = 0"), idx)
    got = sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf, idx).collect()
    )
    assert got == baseline


def _ivf_fixture_vecs(spark, n=40, dims=8):
    """Deterministic (vec_id, emb array<double>) fixture: integer-grid
    embeddings so Lloyd/argmin arithmetic is exact."""
    rows = [
        (i, [float((i * (d + 3) + d * d) % 17 - 8) for d in range(dims)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def test_ivf_append_equals_bulk_add_base_trained(spark, tmp_path):
    """The FAISS train-then-add contract (r14 VERDICT task #1), in its
    REAL deployment shape: the quantizer is trained on the BASE corpus
    only, new vectors arrive later. append_ivf_vectors must answer
    every probe identically to a bulk add of the union against the SAME
    stored centroids — assignment is a pure function of (emb, stored
    centroids), so append ≡ bulk-add exactly (per-cell candidate sets
    AND the stored assignment rows)."""
    from weather_database_system_spark.operators.similarity import (
        _assign_cells,
        _write_ivf_assignments,
        _write_ivf_centroids,
        append_ivf_vectors,
        read_ivf_centroids,
        train_ivf_centroids,
    )

    vecs = _ivf_fixture_vecs(spark)
    base, batch = vecs.filter("vec_id < 30"), vecs.filter("vec_id >= 30")
    cents = train_ivf_centroids(base)

    appended = str(tmp_path / "ivf_appended")
    _write_ivf_centroids(spark, cents, appended)
    _write_ivf_assignments(_assign_cells(base, cents), appended)
    append_ivf_vectors(spark, batch, appended)

    bulk = str(tmp_path / "ivf_bulk")
    _write_ivf_centroids(spark, cents, bulk)
    _write_ivf_assignments(_assign_cells(vecs, cents), bulk)

    assert read_ivf_centroids(spark, appended) == read_ivf_centroids(spark, bulk)
    a = sorted(
        tuple(r)
        for r in spark.read.parquet(f"{appended}/assignments").collect()
    )
    b = sorted(
        tuple(r) for r in spark.read.parquet(f"{bulk}/assignments").collect()
    )
    assert a == b and len(a) == 40


def test_ivf_duplicate_append_and_compaction(spark, tmp_path):
    """IVF twin of the trigram duplicate-postings pin plus compaction,
    on the REAL registry query path: (1) a retried append (existing
    vectors blind-appended again) must leave ann_ivf_query_prebuilt's
    results unchanged — the query dedups probed candidates on
    (query_id, neighbor_id) before ranking, else a duplicate would
    occupy two of the top-3 ranks; (2) compact_ivf_assignments is
    row-preserving (multiset identical, duplicates included) and does
    not grow the file count; (3) search results are unchanged by
    compaction."""
    import glob

    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        ann_ivf_query_prebuilt,
        append_ivf_vectors,
        build_ivf_index,
        compact_ivf_assignments,
    )

    path = str(tmp_path / "ivf_dup")
    build_ivf_index(spark, SF_SMOKE, path)
    clean = [
        tuple(r) for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, path).collect()
    ]
    assert len(clean) > 0
    n_rows = spark.read.parquet(f"{path}/assignments").count()

    # the retry storm: half the candidate set appends AGAIN
    retry = (
        _emb_double(spark, SF_SMOKE)
        .filter(f"vec_id >= {N_QUERIES} and vec_id % 2 = 0")
        .select("vec_id", "emb")
    )
    append_ivf_vectors(spark, retry, path)
    dup_rows = spark.read.parquet(f"{path}/assignments").count()
    assert dup_rows == n_rows + retry.count()  # blind append, no merge
    got = [
        tuple(r) for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, path).collect()
    ]
    assert got == clean  # candidate dedup makes duplicates harmless

    files_before = len(glob.glob(f"{path}/assignments/cell=*/*.parquet"))
    before = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/assignments").collect()
    )
    compact_ivf_assignments(spark, path)
    after = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/assignments").collect()
    )
    assert after == before  # row-preserving, duplicates included
    files_after = len(glob.glob(f"{path}/assignments/cell=*/*.parquet"))
    assert files_after <= files_before
    got2 = [
        tuple(r) for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, path).collect()
    ]
    assert got2 == clean


def test_lease_race_across_processes(spark, tmp_path):
    """The REAL append-vs-compaction race (r16): two separate Spark
    PROCESSES hammer one manifest-managed BM25 slot concurrently — an
    appender ingesting 4 batches of 10 new docs, a compactor looping 3
    row-preserving compactions. The per-slot writer lease serializes
    them, so the live generation must end containing EVERY appended
    document — without the lease an append landing inside a compactor's
    read-then-promote window would be stranded in the superseded
    generation and vanish from the live view. (The in-process threaded
    test pins the mechanism; this pins it where it matters, across
    JVMs on one scratch volume.)"""
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import (
        build_bm25_index,
    )
    from weather_database_system_spark.session import ensure_index, slot_live
    from weather_database_system_spark.sources.star import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    slot = str(tmp_path / "bm25_race_slot")
    ensure_index(
        slot,
        {"kind": "bm25_index", "test": "cross-process-race"},
        lambda gen: build_bm25_index(docs, gen),
    )
    base_ids = {r.doc_id for r in docs.select("doc_id").collect()}

    probe = os.path.join(os.path.dirname(__file__), "lease_race_probe.py")
    procs = [
        subprocess.Popen(
            [sys.executable, probe, slot, role, n, "2000000"],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for role, n in (("appender", "4"), ("compactor", "3"))
    ]
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"stdout:\n{out}\nstderr:\n{err[-2000:]}"

    live = slot_live(slot)
    got_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{live}/doclens")
        .select("doc_id")
        .distinct()
        .collect()
    }
    appended = {2_000_000 + i * 10 + j for i in range(4) for j in range(10)}
    assert appended <= got_ids  # no appended row was silently dropped
    assert got_ids == base_ids | appended  # and nothing else appeared


def test_cold_session_index_reads(tmp_path):
    """The stored indexes must be the ONLY load-bearing state for the
    prebuilt query paths (r14 VERDICT task #4): a subprocess builds the
    trigram + IVF indexes in one SparkSession, STOPS it, and answers the
    registry searches from a brand-new session through the query-only
    halves — reading the index files cold. Subprocess because a stopped
    SparkContext would poison the shared pytest fixture. Asserts all
    five cold reads (trigram, IVF single-probe, IVF nprobe, dedup probe,
    PQ ADC) match the warm results and are non-empty."""
    import subprocess
    import sys

    probe = os.path.join(os.path.dirname(__file__), "cold_session_probe.py")
    res = subprocess.run(
        [sys.executable, probe, SF_SMOKE, str(tmp_path / "scratch")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-2000:]}"
    # 9 pinned registry reads (all six stored families + the r17 IVF+PQ
    # composition in both encodings, IVF twice) + 2 USER-query reads
    # (r16: a cold session answers an arbitrary non-pinned needle/term
    # set from index bytes)
    assert res.stdout.count("cold == warm") == 11, res.stdout


def test_dedup_index_append_equals_rebuild(spark, tmp_path):
    """The stored dedup index must be blind-append exact, like the
    trigram postings: build(part A) + append(part B) holds row-for-row
    the same digests and band signatures as build(A UNION B) — both
    tables are pure per-doc functions — and answers the prebuilt probe
    identically."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        append_dedup_index,
        build_dedup_index,
        dedup_against_index_prebuilt,
    )
    from weather_database_system_spark.sources.star import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    evens = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)

    whole = str(tmp_path / "idx_whole")
    incr = str(tmp_path / "idx_incr")
    build_dedup_index(evens, whole)
    build_dedup_index(evens.filter(F.pmod("doc_id", F.lit(4)) == 0), incr)
    append_dedup_index(evens.filter(F.pmod("doc_id", F.lit(4)) == 2), incr)

    for sub in ("digests", "bands"):
        a = sorted(
            tuple(r) for r in spark.read.parquet(f"{whole}/{sub}").collect()
        )
        b = sorted(
            tuple(r) for r in spark.read.parquet(f"{incr}/{sub}").collect()
        )
        assert a == b and len(a) > 0

    got_whole = [
        tuple(r)
        for r in dedup_against_index_prebuilt(spark, SF_SMOKE, whole).collect()
    ]
    got_incr = [
        tuple(r)
        for r in dedup_against_index_prebuilt(spark, SF_SMOKE, incr).collect()
    ]
    assert got_whole == got_incr and len(got_whole) > 0


def test_dedup_index_duplicate_append_and_compaction(spark, tmp_path):
    """At-least-once ingest on the dedup index: re-appending an already
    ingested batch duplicates stored rows, and the prebuilt probe must
    return identical verdicts — the band-side distinct restores
    exactly-once semantics before the bucket cap (an inflated count(*)
    would otherwise push true buckets over BAND_BUCKET_CAP and silently
    flip near_dup verdicts to unique), and min() aggregates absorb
    duplicate matches. compact_dedup_index is then row-preserving
    (duplicates included) and leaves the probe unchanged."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import (
        append_dedup_index,
        build_dedup_index,
        compact_dedup_index,
        dedup_against_index_prebuilt,
    )
    from weather_database_system_spark.sources.star import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    evens = docs.filter(F.pmod("doc_id", F.lit(2)) == 0)
    idx = str(tmp_path / "idx_dup")
    build_dedup_index(evens, idx)
    clean = [
        tuple(r)
        for r in dedup_against_index_prebuilt(spark, SF_SMOKE, idx).collect()
    ]
    assert any(r[1] != "unique" for r in clean)  # real matches at SF_SMOKE

    # retry storm: half the index ingests AGAIN
    append_dedup_index(evens.filter(F.pmod("doc_id", F.lit(4)) == 0), idx)
    got = [
        tuple(r)
        for r in dedup_against_index_prebuilt(spark, SF_SMOKE, idx).collect()
    ]
    assert got == clean

    before = {
        sub: sorted(
            tuple(r) for r in spark.read.parquet(f"{idx}/{sub}").collect()
        )
        for sub in ("digests", "bands")
    }
    compact_dedup_index(spark, idx)
    for sub in ("digests", "bands"):
        after = sorted(
            tuple(r) for r in spark.read.parquet(f"{idx}/{sub}").collect()
        )
        assert after == before[sub]
    got2 = [
        tuple(r)
        for r in dedup_against_index_prebuilt(spark, SF_SMOKE, idx).collect()
    ]
    assert got2 == clean


def test_pq_append_equals_bulk_encode_base_trained(spark, tmp_path):
    """FAISS IndexPQ train-then-add, in the real deployment shape:
    codebooks trained on the BASE corpus only, new vectors encoded
    later with the STORED books. append_pq_codes must hold row-for-row
    the codes a bulk encode of the union produces — encoding is a pure
    deterministic function of (emb, books) — and answer ADC probes
    identically."""
    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        _write_pq_codebooks,
        _write_pq_codes,
        ann_pq_query_prebuilt,
        append_pq_codes,
        encode_pq_codes,
        read_pq_books,
        train_pq_books,
    )

    cand = (
        _emb_double(spark, SF_SMOKE)
        .filter(f"vec_id >= {N_QUERIES}")
        .select("vec_id", "emb")
    )
    base, batch = cand.filter("vec_id % 3 != 0"), cand.filter("vec_id % 3 = 0")
    books = train_pq_books(base)

    appended = str(tmp_path / "pq_appended")
    _write_pq_codebooks(spark, books, appended)
    _write_pq_codes(encode_pq_codes(base, books), appended)
    append_pq_codes(spark, batch, appended)

    bulk = str(tmp_path / "pq_bulk")
    _write_pq_codebooks(spark, books, bulk)
    _write_pq_codes(encode_pq_codes(cand, books), bulk)

    assert read_pq_books(spark, appended) == read_pq_books(spark, bulk)
    a = sorted(
        tuple(r) for r in spark.read.parquet(f"{appended}/codes").collect()
    )
    b = sorted(tuple(r) for r in spark.read.parquet(f"{bulk}/codes").collect())
    assert a == b and len(a) > 0

    got_a = [
        tuple(r)
        for r in ann_pq_query_prebuilt(spark, SF_SMOKE, appended).collect()
    ]
    got_b = [
        tuple(r) for r in ann_pq_query_prebuilt(spark, SF_SMOKE, bulk).collect()
    ]
    assert got_a == got_b and len(got_a) > 0


def test_pq_duplicate_append_and_compaction(spark, tmp_path):
    """The sharpest duplicate hazard of the four stored indexes: a
    duplicated (vec_id, m, code) row would DOUBLE that subspace's
    contribution to the ADC sum and corrupt the ranking outright (not
    just drop or double-rank a row). Pin that the query path's
    (vec_id, m) distinct makes a retried append harmless, and that
    compact_pq_codes is row-preserving and leaves the probe unchanged."""
    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        ann_pq_query_prebuilt,
        append_pq_codes,
        build_pq_index,
        compact_pq_codes,
    )

    path = str(tmp_path / "pq_dup")
    build_pq_index(spark, SF_SMOKE, path)
    clean = [
        tuple(r) for r in ann_pq_query_prebuilt(spark, SF_SMOKE, path).collect()
    ]
    assert len(clean) > 0
    n = spark.read.parquet(f"{path}/codes").count()

    retry = (
        _emb_double(spark, SF_SMOKE)
        .filter(f"vec_id >= {N_QUERIES} and vec_id % 2 = 0")
        .select("vec_id", "emb")
    )
    append_pq_codes(spark, retry, path)
    assert spark.read.parquet(f"{path}/codes").count() > n  # blind append
    got = [
        tuple(r) for r in ann_pq_query_prebuilt(spark, SF_SMOKE, path).collect()
    ]
    assert got == clean

    before = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/codes").collect()
    )
    compact_pq_codes(spark, path)
    after = sorted(
        tuple(r) for r in spark.read.parquet(f"{path}/codes").collect()
    )
    assert after == before
    got2 = [
        tuple(r) for r in ann_pq_query_prebuilt(spark, SF_SMOKE, path).collect()
    ]
    assert got2 == clean


def test_ivfpq_matches_numpy_replay_from_stored_bytes(spark, tmp_path):
    """IVF+PQ composition (r17) grounded against a dense numpy replay
    OVER THE STORED BYTES: read back centroids/codebooks/codes with
    plain parquet reads, route each pinned query to its argmin stored
    centroid, ADC-score ONLY that cell's stored codes, rank by
    (adc_d2, vec_id) — the engine's top-5 neighbor sets must match
    exactly. The replay never touches the Spark expressions, so a
    store/layout/router defect cannot hide behind a shared bug. Also
    pins the composition's defining property: every returned neighbor
    is stored in the query's routed cell."""
    import numpy as np

    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        PQ_M,
        PQ_SUBDIM,
        PQ_TOPK,
        ann_ivfpq_query_prebuilt,
        build_ivfpq_index,
    )
    from weather_database_system_spark.sources.star import load_table

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(spark, SF_SMOKE, path)
    got = ann_ivfpq_query_prebuilt(spark, SF_SMOKE, path).collect()
    spark_top: dict[int, list] = {}
    for r in got:
        spark_top.setdefault(r.query_id, []).append(r.neighbor_id)

    cents = {
        int(r.cell): np.array([float(v) for v in r.emb])
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    books: dict[tuple[int, int], np.ndarray] = {
        (int(r.m), int(r.code)): np.array([float(v) for v in r.vals])
        for r in spark.read.parquet(f"{path}/codebooks").collect()
    }
    stored: dict[int, dict] = {}
    cell_of: dict[int, int] = {}
    for r in spark.read.parquet(f"{path}/codes").collect():
        stored.setdefault(int(r.vec_id), {})[int(r.m)] = int(r.code)
        cell_of[int(r.vec_id)] = int(r.cell)

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = {r.vec_id: np.array([float(v) for v in r.embedding]) for r in emb}
    q_ids = sorted(i for i in X if i < N_QUERIES)

    for qi in q_ids:
        best = min(
            (((X[qi] - c) ** 2).sum(), k) for k, c in cents.items()
        )[1]
        members = sorted(v for v, c in cell_of.items() if c == best)
        adc = sorted(
            (
                sum(
                    (
                        (
                            X[qi][m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                            - books[(m, stored[v][m])]
                        )
                        ** 2
                    ).sum()
                    for m in range(PQ_M)
                ),
                v,
            )
            for v in members
        )
        want = [v for _, v in adc[:PQ_TOPK]]
        assert spark_top[qi] == want, qi
        assert all(cell_of[v] == best for v in spark_top[qi])


def test_ivfpq_append_equals_rebuild_and_duplicate_safe(spark, tmp_path):
    """The IVF+PQ lifecycle contracts, mirroring the per-family pins:
    (1) append ≡ rebuild — routing AND encoding are pure functions of
    (emb, stored centroids, stored books), so a base build + appended
    batch holds exactly the bulk build's (cell, vec_id, m, code)
    multiset and answers queries identically; (2) a retried
    at-least-once append (duplicate code rows, which would DOUBLE a
    subspace's ADC contribution) leaves results unchanged — the query
    distincts (query, vec, m) before the sum; (3) compact_ivfpq_codes
    is row-preserving and leaves the probe unchanged."""
    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        ann_ivfpq_query_prebuilt,
        append_ivfpq_vectors,
        build_ivfpq_index,
        compact_ivfpq_codes,
    )

    vecs = _emb_double(spark, SF_SMOKE).select("vec_id", "emb")
    cand = vecs.filter(f"vec_id >= {N_QUERIES}")
    is_batch = f"vec_id % 3 = 1"

    bulk = str(tmp_path / "ivfpq_bulk")
    build_ivfpq_index(spark, SF_SMOKE, bulk)
    clean = [
        tuple(r)
        for r in ann_ivfpq_query_prebuilt(spark, SF_SMOKE, bulk).collect()
    ]
    assert len(clean) > 0

    # (1) same trained state, base codes only, then append the batch
    import shutil

    appended = str(tmp_path / "ivfpq_appended")
    import os

    os.makedirs(appended)
    shutil.copytree(f"{bulk}/centroids", f"{appended}/centroids")
    shutil.copytree(f"{bulk}/codebooks", f"{appended}/codebooks")
    from weather_database_system_spark.operators.similarity import (
        _encode_ivfpq,
        _write_ivfpq_codes,
        read_ivf_centroids,
        read_pq_books,
    )

    cents = read_ivf_centroids(spark, bulk)
    books = read_pq_books(spark, bulk)
    _write_ivfpq_codes(
        _encode_ivfpq(cand.filter(f"not ({is_batch})"), cents, books), appended
    )
    append_ivfpq_vectors(spark, cand.filter(is_batch), appended)
    a = sorted(
        tuple(r) for r in spark.read.parquet(f"{appended}/codes").collect()
    )
    b = sorted(tuple(r) for r in spark.read.parquet(f"{bulk}/codes").collect())
    assert a == b
    got = [
        tuple(r)
        for r in ann_ivfpq_query_prebuilt(spark, SF_SMOKE, appended).collect()
    ]
    assert got == clean

    # (2) retry storm: a slice appends AGAIN — results unchanged
    retry = cand.filter(f"vec_id % 2 = 0")
    append_ivfpq_vectors(spark, retry, appended)
    got = [
        tuple(r)
        for r in ann_ivfpq_query_prebuilt(spark, SF_SMOKE, appended).collect()
    ]
    assert got == clean

    # (3) compaction: row-preserving (duplicates included), probe unchanged
    before = sorted(
        tuple(r) for r in spark.read.parquet(f"{appended}/codes").collect()
    )
    compact_ivfpq_codes(spark, appended)
    after = sorted(
        tuple(r) for r in spark.read.parquet(f"{appended}/codes").collect()
    )
    assert after == before
    got2 = [
        tuple(r)
        for r in ann_ivfpq_query_prebuilt(spark, SF_SMOKE, appended).collect()
    ]
    assert got2 == clean


def test_pq_qtable_twins_stay_in_lockstep(spark):
    """_pq_qtable_cells is a deliberate twin of _pq_qtable (it adds the
    per-probed-cell passthrough the residual composition's ADC join
    keys on); the two ~30-line expansion bodies must stay in lockstep
    or the residual path would silently score with a stale formula.
    Lock them together on real data: with a constant cell column, the
    cells variant must emit exactly the base variant's (query_id, m,
    code, d2) rows."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        _pq_qtable,
        _pq_qtable_cells,
        train_pq_books,
    )

    vecs = _emb_double(spark, SF_SMOKE).select("vec_id", "emb")
    books = train_pq_books(
        vecs.filter(f"vec_id >= {N_QUERIES}").repartition(8, "vec_id").persist()
    )
    q = vecs.filter(f"vec_id < {N_QUERIES}").select(
        F.col("vec_id").alias("query_id"), "emb"
    )
    base = sorted(tuple(r) for r in _pq_qtable(q, books).collect())
    withc = _pq_qtable_cells(q.withColumn("cell", F.lit(7)), books).collect()
    assert all(r.cell == 7 for r in withc)
    got = sorted((r.query_id, r.m, r.code, r.d2) for r in withc)
    assert got == base and len(got) > 0


def test_ivfpq_residual_matches_numpy_replay_and_append(spark, tmp_path):
    """Residual-encoded IVF+PQ (r17, FAISS by_residual=true) grounded
    against a dense numpy replay OVER THE STORED BYTES: route each
    pinned query by argmin stored centroid, residualize the query
    against THAT cell's centroid, ADC-score only that cell's stored
    residual codes — exact neighbor-set equality. Then the lifecycle
    pin: appending a batch (assign + residualize + encode against the
    STORED state — all pure functions) answers queries identically to
    a bulk build containing the union."""
    import numpy as np

    from weather_database_system_spark.operators.similarity import (
        N_QUERIES,
        PQ_M,
        PQ_SUBDIM,
        PQ_TOPK,
        _encode_cell_codes,
        _with_residual,
        _write_ivfpq_codes,
        ann_ivfpq_residual_query_prebuilt,
        append_ivfpq_residual_vectors,
        build_ivfpq_residual_index,
        read_ivf_centroids,
        read_pq_books,
    )
    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.sources.star import load_table

    path = str(tmp_path / "ivfpq_res")
    build_ivfpq_residual_index(spark, SF_SMOKE, path)
    got = ann_ivfpq_residual_query_prebuilt(spark, SF_SMOKE, path).collect()
    spark_top: dict[int, list] = {}
    for r in got:
        spark_top.setdefault(r.query_id, []).append(r.neighbor_id)

    cents = {
        int(r.cell): np.array([float(v) for v in r.emb])
        for r in spark.read.parquet(f"{path}/centroids").collect()
    }
    books = {
        (int(r.m), int(r.code)): np.array([float(v) for v in r.vals])
        for r in spark.read.parquet(f"{path}/codebooks").collect()
    }
    stored: dict[int, dict] = {}
    cell_of: dict[int, int] = {}
    for r in spark.read.parquet(f"{path}/codes").collect():
        stored.setdefault(int(r.vec_id), {})[int(r.m)] = int(r.code)
        cell_of[int(r.vec_id)] = int(r.cell)

    emb = load_table(spark, SF_SMOKE, "embeddings").collect()
    X = {r.vec_id: np.array([float(v) for v in r.embedding]) for r in emb}

    for qi in sorted(i for i in X if i < N_QUERIES):
        best = min((((X[qi] - c) ** 2).sum(), k) for k, c in cents.items())[1]
        rq = X[qi] - cents[best]  # residual query against the probed cell
        adc = sorted(
            (
                sum(
                    (
                        (
                            rq[m * PQ_SUBDIM : (m + 1) * PQ_SUBDIM]
                            - books[(m, stored[v][m])]
                        )
                        ** 2
                    ).sum()
                    for m in range(PQ_M)
                ),
                v,
            )
            for v, c in cell_of.items()
            if c == best
        )
        assert spark_top[qi] == [v for _, v in adc[:PQ_TOPK]], qi

    # append ≡ rebuild: base codes + appended batch == bulk codes, and
    # query answers are unchanged
    import os
    import shutil

    cand = _emb_double(spark, SF_SMOKE).select("vec_id", "emb").filter(
        f"vec_id >= {N_QUERIES}"
    )
    appended = str(tmp_path / "ivfpq_res_appended")
    os.makedirs(appended)
    shutil.copytree(f"{path}/centroids", f"{appended}/centroids")
    shutil.copytree(f"{path}/codebooks", f"{appended}/codebooks")
    cents_l = read_ivf_centroids(spark, path)
    books_l = read_pq_books(spark, path)
    _write_ivfpq_codes(
        _encode_cell_codes(
            _with_residual(cand.filter("vec_id % 3 != 1"), cents_l), books_l
        ),
        appended,
    )
    append_ivfpq_residual_vectors(spark, cand.filter("vec_id % 3 = 1"), appended)
    a = sorted(
        tuple(r) for r in spark.read.parquet(f"{appended}/codes").collect()
    )
    b = sorted(tuple(r) for r in spark.read.parquet(f"{path}/codes").collect())
    assert a == b
    got2 = [
        tuple(r)
        for r in ann_ivfpq_residual_query_prebuilt(
            spark, SF_SMOKE, appended
        ).collect()
    ]
    assert got2 == [tuple(r) for r in got]


def test_ivf_snapshot_immutable_under_diverging_append(spark, tmp_path, monkeypatch):
    """IVF twin of the bm25 snapshot-immutability pin (r17, the second
    family to surface grace-generation time travel): after the snapshot
    state exists, an APPEND into the live generation diverges live from
    snapshot — the snapshot's answers must not move (generations are
    immutable once superseded), while the live read sees the appended
    rows' effect on its candidate sets. Also pins creation-once: a
    repeat call reuses the two-generation state without another
    compaction (no generation churn)."""
    from weather_database_system_spark.operators.similarity import (
        ann_ivf_prebuilt_snapshot,
        ann_ivf_query_prebuilt,
        append_ivf_vectors,
    )
    from weather_database_system_spark.session import (
        list_generations,
        scratch_path,
        snapshot_generation,
    )

    monkeypatch.setenv("WDSS_SCRATCH_DIR", str(tmp_path / "scratch"))
    first = [tuple(r) for r in ann_ivf_prebuilt_snapshot(spark, SF_SMOKE).collect()]
    assert len(first) > 0 and all(r[-1] == 1 for r in first)  # claim TRUE
    slot = scratch_path("ivf_index", SF_SMOKE)
    gens = [g["generation"] for g in list_generations(slot)]
    again = [tuple(r) for r in ann_ivf_prebuilt_snapshot(spark, SF_SMOKE).collect()]
    assert again == first
    assert [g["generation"] for g in list_generations(slot)] == gens  # no churn

    snap = snapshot_generation(slot)
    snap_before = [
        tuple(r)
        for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, snap).collect()
    ]
    n_snap = spark.read.parquet(f"{snap}/assignments").count()
    # diverge LIVE: append new vector ids into the live generation's
    # cell directories (the snapshot's directories must not move)
    from weather_database_system_spark.operators.dedup import _emb_double
    from weather_database_system_spark.session import slot_live
    from pyspark.sql import functions as F

    batch = (
        _emb_double(spark, SF_SMOKE)
        .filter("vec_id < 3")
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"), "emb")
    )
    append_ivf_vectors(spark, batch, slot)
    assert (
        spark.read.parquet(f"{slot_live(slot)}/assignments").count()
        == n_snap + 3
    )  # live grew by the appended rows
    assert spark.read.parquet(f"{snap}/assignments").count() == n_snap
    snap_after = [
        tuple(r)
        for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, snap).collect()
    ]
    assert snap_after == snap_before  # the snapshot's answers never moved


def test_migrate_flat_slot_contracts(spark, tmp_path):
    """migrate_flat_slot (r17): a legacy FLAT index layout is wrapped
    into manifest-managed form IN PLACE — bytes preserved (no rebuild),
    the marker moves with the content so ensure_* still reads the index
    as current, queries answer identically, and generation-level
    features (snapshots, atomic promotes) become available. A
    manifest-managed slot passes through untouched; the sibling flat
    lease is never swept into the generation."""
    import os

    from weather_database_system_spark.operators.similarity import (
        ann_ivf_query_prebuilt,
        build_ivf_index,
    )
    from weather_database_system_spark.session import (
        INDEX_MANIFEST,
        list_generations,
        migrate_flat_slot,
        resolve_generation,
    )

    slot = str(tmp_path / "flat_ivf")
    build_ivf_index(spark, SF_SMOKE, slot)  # legacy flat: files at root
    before = [
        tuple(r) for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, slot).collect()
    ]
    assert resolve_generation(slot) == slot  # flat layout resolves to root

    live = migrate_flat_slot(slot)
    assert os.path.basename(live).startswith("gen-")
    assert os.path.isfile(os.path.join(slot, INDEX_MANIFEST))
    assert resolve_generation(slot) == live
    gens = list_generations(slot)
    assert len(gens) == 1
    after = [
        tuple(r) for r in ann_ivf_query_prebuilt(spark, SF_SMOKE, slot).collect()
    ]
    assert after == before  # bytes preserved, answers identical

    # idempotent: a second call is a no-op returning the same live path
    assert migrate_flat_slot(slot) == live
    assert [g["generation"] for g in list_generations(slot)] == [
        g["generation"] for g in gens
    ]


def test_index_marker_and_swap_dir_contracts(tmp_path):
    """Unit pins for the build-once index plumbing (no Spark needed):
    (1) marker round-trip — index_is_current is True only for the EXACT
    meta that was stamped; any field change, a missing marker, or a
    corrupt marker all read as stale (rebuild, never serve wrong);
    (2) swap_dir promotes tmp to live and removes both tmp and the
    set-aside old generation; a pre-existing stale __old leftover (a
    prior crash) is cleared rather than tripping the swap."""
    import json

    from weather_database_system_spark.session import (
        INDEX_MARKER,
        index_is_current,
        swap_dir,
        write_index_marker,
    )

    idx = tmp_path / "idx"
    idx.mkdir()
    meta = {"kind": "t", "algo": 1, "source": {"files": [["a", 1, 2]]}}
    assert not index_is_current(str(idx), meta)  # no marker yet
    write_index_marker(str(idx), meta)
    assert index_is_current(str(idx), meta)
    assert not index_is_current(str(idx), {**meta, "algo": 2})
    assert not index_is_current(
        str(idx), {**meta, "source": {"files": [["a", 1, 3]]}}
    )
    (idx / INDEX_MARKER).write_text("{corrupt")
    assert not index_is_current(str(idx), meta)

    live, tmp = tmp_path / "live", tmp_path / "tmpgen"
    live.mkdir(), tmp.mkdir()
    (live / "old.txt").write_text("old")
    (tmp / "new.txt").write_text("new")
    stale_old = tmp_path / "live__old"
    stale_old.mkdir()
    (stale_old / "crashed.txt").write_text("leftover")
    swap_dir(str(live), str(tmp))
    assert (live / "new.txt").read_text() == "new"
    assert not (live / "old.txt").exists()
    assert not tmp.exists() and not stale_old.exists()


def test_manifest_generation_contracts(tmp_path):
    """Unit pins for the manifest-managed generation layer (r15 — the
    atomic-pointer swap the 100 TB deployment story promised, no Spark
    needed): (1) generation numbering is monotone and never reuses a
    crashed half-written directory's number; (2) promote is an atomic
    pointer flip that keeps EXACTLY the previous live generation as the
    reader-grace window and prunes every OLDER STAMPED generation —
    UNSTAMPED generations are never pruned by promote (ADVICE r15 #1: an
    unstamped dir may be a concurrent builder's in-flight write;
    rmtree'ing it mid-build would let that builder stamp and promote a
    partially-deleted, corrupt-but-marked index), they are reclaimed by
    the age-gated sweep_stale_generations instead; (3) resolve recovery:
    a lost/corrupt manifest falls back to the newest STAMPED generation
    (a crash can only lose the O(1) pointer write, never a promoted
    generation) and to None when only unstamped — possibly half-built —
    generations exist (ADVICE r15 #2: forcing a rebuild beats silently
    serving a maybe-incomplete index); a pre-manifest flat layout
    resolves to the slot itself; an empty slot to None."""
    import os

    from weather_database_system_spark.session import (
        INDEX_MANIFEST,
        INDEX_MARKER,
        new_generation_path,
        promote_generation,
        resolve_generation,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    assert resolve_generation(slot) is None  # nothing built

    g1 = new_generation_path(slot)
    assert os.path.basename(g1) == "gen-0001"
    os.makedirs(g1)
    write_index_marker(g1, {"v": 1})
    assert promote_generation(slot, g1) == g1
    assert resolve_generation(slot) == g1

    # crashed half-written generation: created but never promoted —
    # the next builder supersedes its number instead of reusing it
    g_crash = new_generation_path(slot)
    assert os.path.basename(g_crash) == "gen-0002"
    os.makedirs(g_crash)

    g3 = new_generation_path(slot)
    assert os.path.basename(g3) == "gen-0003"
    os.makedirs(g3)
    write_index_marker(g3, {"v": 3})
    promote_generation(slot, g3)
    assert resolve_generation(slot) == g3
    assert os.path.isdir(g1)  # previous LIVE generation survives (grace)
    # the unstamped dir is NOT pruned by promote — it may be a concurrent
    # builder's in-flight generation (ADVICE r15 #1) ...
    assert os.path.isdir(g_crash)
    # ... it is reclaimed by the age-gated sweep instead — but only once
    # old enough to be a certainly-abandoned half-build, and the sweep
    # never touches the live or any stamped generation
    from weather_database_system_spark.session import sweep_stale_generations

    assert sweep_stale_generations(slot) == []  # too young: in-flight?
    assert os.path.isdir(g_crash)
    assert sweep_stale_generations(slot, max_age_s=0.0) == ["gen-0002"]
    assert not os.path.isdir(g_crash)
    assert os.path.isdir(g1) and os.path.isdir(g3)  # stamped+live kept

    g4 = os.path.join(slot, "gen-0004")
    os.makedirs(g4)
    write_index_marker(g4, {"v": 4})
    promote_generation(slot, g4)
    assert os.path.isdir(g3) and not os.path.isdir(g1)  # grace = ONE gen

    # recovery: corrupt manifest → newest stamped generation (g4)
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        fh.write("{corrupt")
    assert resolve_generation(slot) == g4
    # manifest pointing at a deleted generation → same stamped fallback
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        fh.write('{"generation": "gen-9999"}')
    assert resolve_generation(slot) == g4

    # APPENDED generations stay stamped (r16, VERDICT r15 task #5): the
    # chained append marker keeps the generation eligible for manifest-
    # loss recovery — previously an append DELETED the marker, so this
    # exact recovery silently reverted to the pre-append ancestor g3
    from weather_database_system_spark.session import (
        append_index_marker,
        index_is_current,
        read_index_marker,
    )

    append_index_marker(g4, {"batch": "b-001", "rows": 7})
    append_index_marker(g4, {"batch": "b-002"})
    assert resolve_generation(slot) == g4  # recovery keeps the appends
    # ... but ensure_*'s currency check still reads it as stale (append
    # staleness semantics unchanged vs the old marker-delete)
    assert not index_is_current(g4, {"v": 4})
    base, n_appends = read_index_marker(g4)
    assert base == {"v": 4} and n_appends == 2

    # unstamped-ONLY slot → None (ADVICE r15 #2): with the pointer gone,
    # an unstamped generation is indistinguishable from a crashed
    # half-build — force a rebuild instead of serving it
    slot2 = str(tmp_path / "slot2")
    os.makedirs(os.path.join(slot2, "gen-0001"))
    with open(
        os.path.join(slot2, "gen-0001", "part-0.parquet"), "w"
    ) as fh:
        fh.write("x")
    assert resolve_generation(slot2) is None

    # bookkeeping-only slot → None: a managed slot whose generations
    # were all deleted holds only _WDSS artifacts (manifest, a crashed
    # writer's lease) — that is NOT a legacy flat index, and resolving
    # to the empty root would serve nothing as something
    slot3 = str(tmp_path / "slot3")
    os.makedirs(os.path.join(slot3, "_WDSS_LEASE"))
    with open(os.path.join(slot3, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        fh.write('{"generation": "gen-0009"}')
    assert resolve_generation(slot3) is None

    # legacy flat layout (pre-manifest): index files at the slot root
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    write_index_marker(flat, {"v": 0})
    assert resolve_generation(flat) == flat
    assert os.path.isfile(os.path.join(flat, INDEX_MARKER))

    # mkdir is the claim: a racing builder that already created the next
    # number forces the claimer onto the one after — two processes can
    # never build into the same generation directory
    from weather_database_system_spark.session import claim_new_generation

    os.makedirs(os.path.join(slot, "gen-0005"))  # the "other process"
    claimed = claim_new_generation(slot)
    assert os.path.basename(claimed) == "gen-0006"
    assert os.path.isdir(claimed)  # claim creates (atomically owns) it


def _lease_worker(args):
    """Cross-process lease contender (module-level for spawn pickling):
    acquires the slot lease N times, appending ENTER/EXIT records to a
    shared O_APPEND log while inside the critical section."""
    import os
    import time

    slot, log, wid, n = args
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from weather_database_system_spark.session import slot_writer_lease

    for i in range(n):
        with slot_writer_lease(slot, f"w{wid}", wait_s=30):
            with open(log, "a", encoding="utf-8") as fh:
                fh.write(f"ENTER {wid} {i}\n")
            time.sleep(0.01)
            with open(log, "a", encoding="utf-8") as fh:
                fh.write(f"EXIT {wid} {i}\n")
    return wid


def _fence_promote_worker(args):
    """Cross-process fenced writer (module-level for spawn pickling):
    acquires the slot lease, claims + stamps a generation, promotes it,
    and returns the fence its lease drew."""
    import json
    import os
    import sys

    slot, = args
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from weather_database_system_spark.session import (
        INDEX_LEASE,
        claim_new_generation,
        promote_generation,
        slot_writer_lease,
        write_index_marker,
    )

    with slot_writer_lease(slot, "xproc-writer", wait_s=30):
        with open(os.path.join(slot, INDEX_LEASE, "owner.json"),
                  encoding="utf-8") as fh:
            fence = json.load(fh)["fence"]
        gen = claim_new_generation(slot)
        write_index_marker(gen, {"kind": "t", "algo": 1})
        promote_generation(slot, gen)
    return fence


def test_slot_writer_lease_cross_process_serialization(tmp_path):
    """The lease's atomic claim is os.mkdir, which is atomic ACROSS
    PROCESSES — the thread-based contract test cannot prove that, and
    cross-process is the deployment case (an ingest job racing a
    maintenance cron on one scratch volume). Four processes each take
    the lease five times and write ENTER/EXIT records while inside; the
    merged log must show strictly alternating critical sections — every
    ENTER immediately followed by its own EXIT, 40 records, no
    interleave."""
    import json
    import multiprocessing as mp
    import os

    slot = str(tmp_path / "slot")
    os.makedirs(os.path.join(slot, "gen-0001"))
    with open(os.path.join(slot, "_WDSS_MANIFEST.json"), "w",
              encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    log = str(tmp_path / "log.txt")

    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        done = pool.map(_lease_worker, [(slot, log, w, 5) for w in range(4)])
    assert sorted(done) == [0, 1, 2, 3]

    lines = open(log, encoding="utf-8").read().splitlines()
    assert len(lines) == 40
    for j in range(0, 40, 2):
        e_op, e_w, e_i = lines[j].split()
        x_op, x_w, x_i = lines[j + 1].split()
        assert (e_op, x_op) == ("ENTER", "EXIT"), lines[j : j + 2]
        assert (e_w, e_i) == (x_w, x_i), lines[j : j + 2]


def test_slot_writer_lease_contracts(tmp_path):
    """The single-writer MECHANISM (r16, VERDICT r15 task #4 — replacing
    the documented-only contract): mkdir of <slot>/_WDSS_LEASE is the
    atomic claim. Pins: (1) acquire/release round-trip with owner
    metadata; (2) a held lease makes a second writer WAIT and proceed
    once released (serialization); (3) a bounded wait that expires
    raises SlotBusyError (fail-loud, never a silent interleave); (4) a
    lease older than the TTL is a crashed writer and is taken over; (5)
    the lease root is the SLOT for both the slot path and its generation
    dirs — an append into gen-N and a compaction promoting gen-N+1 must
    contend on ONE lease, or the mechanism guards nothing."""
    import json
    import os
    import threading
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        SlotBusyError,
        _lease_root,
        slot_writer_lease,
    )

    slot = str(tmp_path / "slot")
    os.makedirs(os.path.join(slot, "gen-0001"))
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)

    # (5) one lease root for slot and every generation dir under it
    assert _lease_root(slot) == slot
    assert _lease_root(os.path.join(slot, "gen-0001")) == slot
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    assert _lease_root(flat) == flat

    # (1) round-trip
    lease_dir = os.path.join(slot, INDEX_LEASE)
    with slot_writer_lease(slot, "unit") as root:
        assert root == slot and os.path.isdir(lease_dir)
        with open(os.path.join(lease_dir, "owner.json"), encoding="utf-8") as fh:
            owner = json.load(fh)
        assert owner["pid"] == os.getpid() and owner["purpose"] == "unit"
    assert not os.path.isdir(lease_dir)  # released

    # (2) serialization: holder releases after 0.4 s; waiter (entered via
    # the GENERATION path — same root) acquires strictly after
    order = []

    def holder():
        with slot_writer_lease(slot, "compact"):
            order.append(("acquired", "compact"))
            time.sleep(0.4)
            order.append(("releasing", "compact"))

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.1)  # let the holder win the lease
    with slot_writer_lease(os.path.join(slot, "gen-0001"), "append", wait_s=10):
        order.append(("acquired", "append"))
    t.join()
    assert order == [
        ("acquired", "compact"),
        ("releasing", "compact"),
        ("acquired", "append"),
    ]

    # (3) fail-loud: bounded wait expires while held
    os.mkdir(lease_dir)  # a foreign holder
    try:
        with _pytest.raises(SlotBusyError, match="lease-held"):
            with slot_writer_lease(slot, "append", wait_s=0.3, ttl_s=3600):
                pass
        assert os.path.isdir(lease_dir)  # foreign lease untouched
        # (4a) past the TTL but the owner pid is ALIVE on this host: a
        # long-running writer, NOT a crash — takeover is refused (the
        # silent-interleave guard) and the bounded wait fails loudly
        old = time.time() - 7200
        with open(os.path.join(lease_dir, "owner.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({"pid": os.getpid(), "purpose": "long-compact"}, fh)
        os.utime(lease_dir, (old, old))
        with _pytest.raises(SlotBusyError):
            with slot_writer_lease(slot, "steal", wait_s=0.3, ttl_s=3600):
                pass
        assert os.path.isdir(lease_dir)  # the live writer keeps its lease
        # (4b) owner pid DEAD → crashed writer: take over
        import subprocess

        child = subprocess.Popen(["true"])
        child.wait()  # child.pid is now a real, certainly-dead pid
        with open(os.path.join(lease_dir, "owner.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({"pid": child.pid, "purpose": "crashed"}, fh)
        os.utime(lease_dir, (old, old))
        with slot_writer_lease(slot, "takeover", wait_s=0.3, ttl_s=3600):
            assert os.path.isdir(lease_dir)  # now OURS (recreated)
        assert not os.path.isdir(lease_dir)
    finally:
        import shutil

        shutil.rmtree(lease_dir, ignore_errors=True)


def test_lease_takeover_atomic_and_heartbeat(tmp_path):
    """r17 lease hardening (ADVICE r16 #1 + VERDICT r16 next-round #6).
    Pins: (1) TTL takeover of one stale lease by MANY concurrent waiters
    admits exactly one holder at a time (the rename-aside fix — the old
    direct rmtree let a slow second rmtree delete the winner's fresh
    lease, i.e. two holders); (2) a heartbeat-FRESH lease is never taken
    over even when its acquisition mtime is long past the TTL and its
    owner pid is dead (the shared-storage liveness signal) — while a
    heartbeat-DEAD lease is; (3) the holder's heartbeat thread actually
    re-touches the beacon while the context is held; (4) release is
    inode-guarded: a holder whose lease was externally replaced must NOT
    delete the successor's live lease on exit."""
    import json
    import os
    import shutil
    import subprocess
    import threading
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        SlotBusyError,
        slot_writer_lease,
    )

    slot = str(tmp_path / "slot")
    os.makedirs(os.path.join(slot, "gen-0001"))
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    lease_dir = os.path.join(slot, INDEX_LEASE)

    def _make_stale_lease() -> None:
        child = subprocess.Popen(["true"])
        child.wait()  # a real, certainly-dead pid
        os.mkdir(lease_dir)
        with open(os.path.join(lease_dir, "owner.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({"pid": child.pid, "purpose": "crashed"}, fh)
        old = time.time() - 7200
        os.utime(lease_dir, (old, old))

    # (1) concurrent takeover: 8 waiters race one stale lease; a shared
    # counter asserts the critical section is single-occupancy throughout
    _make_stale_lease()
    inside = 0
    max_inside = 0
    errors: list[BaseException] = []
    guard = threading.Lock()
    barrier = threading.Barrier(8)

    def _contender() -> None:
        nonlocal inside, max_inside
        barrier.wait()
        try:
            with slot_writer_lease(slot, "race", wait_s=30, ttl_s=0.5):
                with guard:
                    inside += 1
                    max_inside = max(max_inside, inside)
                time.sleep(0.02)
                with guard:
                    inside -= 1
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=_contender) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert max_inside == 1  # never two holders, even during takeover
    assert not os.path.isdir(lease_dir)  # last holder released
    leftovers = [e for e in os.listdir(slot) if "__takeover" in e]
    assert leftovers == []  # rename-aside remnants are cleaned up

    # (2a) dead pid + ancient acquisition, but a FRESH heartbeat: the
    # holder is alive somewhere (shared storage) — takeover refused
    _make_stale_lease()
    with open(os.path.join(lease_dir, "heartbeat"), "w", encoding="utf-8") as fh:
        fh.write(str(time.time()))
    with _pytest.raises(SlotBusyError):
        with slot_writer_lease(slot, "steal", wait_s=0.3, ttl_s=600):
            pass
    assert os.path.isdir(lease_dir)
    # (2b) heartbeat gone stale too → genuinely crashed: takeover
    old = time.time() - 7200
    os.utime(os.path.join(lease_dir, "heartbeat"), (old, old))
    os.utime(lease_dir, (old, old))
    with slot_writer_lease(slot, "takeover", wait_s=0.5, ttl_s=600):
        assert os.path.isdir(lease_dir)
    assert not os.path.isdir(lease_dir)

    # (3) the holder's heartbeat thread re-touches the beacon
    with slot_writer_lease(slot, "beating", ttl_s=0.2, heartbeat_s=0.05):
        hb = os.path.join(lease_dir, "heartbeat")
        first = os.stat(hb).st_mtime
        deadline = time.time() + 5.0
        while os.stat(hb).st_mtime == first and time.time() < deadline:
            time.sleep(0.02)
        assert os.stat(hb).st_mtime > first
    assert not os.path.isdir(lease_dir)

    # (4) inode-guarded release: replace the holder's lease externally;
    # the holder's exit must leave the successor's lease alone. The old
    # lease is renamed aside (not rmtree'd) so its inode stays allocated
    # and the successor's mkdir is GUARANTEED a different inode.
    stolen = lease_dir + ".stolen"
    with slot_writer_lease(slot, "victim"):
        os.rename(lease_dir, stolen)
        os.mkdir(lease_dir)  # successor's live lease (different inode)
        with open(os.path.join(lease_dir, "owner.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({"pid": os.getpid(), "purpose": "successor"}, fh)
    assert os.path.isdir(lease_dir)  # survived the victim's release
    with open(os.path.join(lease_dir, "owner.json"), encoding="utf-8") as fh:
        assert json.load(fh)["purpose"] == "successor"
    shutil.rmtree(lease_dir)
    shutil.rmtree(stolen, ignore_errors=True)


def test_lease_path_recomputed_across_migration(tmp_path):
    """ADVICE r17 #1: the lease PATH moves when a flat slot migrates to
    manifest form (sibling '<slot>._WDSS_LEASE' → in-slot
    '<slot>/_WDSS_LEASE'). A waiter that computed the sibling path
    before the migration must not acquire it afterwards — it would hold
    a lease no newer writer contends on (two holders on one slot). Pins:
    (1) a waiter blocked on the sibling lease re-resolves after the
    migration and acquires the IN-SLOT lease; (2) while it holds, a
    second writer contends (SlotBusyError) and no sibling lease dir
    exists — single-holder preserved across the path transition."""
    import json
    import os
    import threading
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        SlotBusyError,
        _lease_dir,
        slot_writer_lease,
        write_index_marker,
    )

    slot = str(tmp_path / "flatslot")
    os.makedirs(slot)
    with open(os.path.join(slot, "data.parquet"), "w", encoding="utf-8") as fh:
        fh.write("x")
    write_index_marker(slot, {"kind": "t", "algo": 1})
    sibling = slot + "." + INDEX_LEASE
    assert _lease_dir(slot) == sibling  # flat → sibling path

    acquired = threading.Event()
    release = threading.Event()
    got: dict = {}

    def waiter() -> None:
        with slot_writer_lease(slot, "late-waiter", wait_s=30):
            got["lease"] = _lease_dir(slot)
            acquired.set()
            release.wait(30)

    # hold the SIBLING lease so the waiter loops on the pre-migration path
    with slot_writer_lease(slot, "pre-migration-holder"):
        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.3)  # waiter observes the sibling lease and polls
        # migrate IN PLACE while holding the writer lease (what
        # migrate_flat_slot does; inlined because the lease is ours)
        gen = os.path.join(slot, "gen-0001")
        os.makedirs(gen)
        for e in list(os.listdir(slot)):
            if e != "gen-0001" and INDEX_LEASE not in e:
                os.rename(os.path.join(slot, e), os.path.join(gen, e))
        with open(os.path.join(slot, INDEX_MANIFEST), "w",
                  encoding="utf-8") as fh:
            json.dump({"generation": "gen-0001"}, fh)
    # release → the waiter's NEXT retry must recompute the lease path
    assert acquired.wait(10)
    try:
        assert got["lease"] == os.path.join(slot, INDEX_LEASE)
        assert os.path.isdir(got["lease"])
        assert not os.path.isdir(sibling)  # no stale sibling holder
        with _pytest.raises(SlotBusyError):
            with slot_writer_lease(slot, "contender", wait_s=0.3):
                pass
    finally:
        release.set()
        t.join(10)
    assert not os.path.isdir(os.path.join(slot, INDEX_LEASE))  # released


def test_promote_fencing_rejects_taken_over_writer(tmp_path):
    """r18 fencing tokens (VERDICT r17 task #4): a writer paused
    pre-promote whose lease was TTL-taken-over must get its promote
    REJECTED once the successor has published, not silently clobber the
    successor's generation. Pins: (1) the zombie's promote raises
    FencedWriterError and the manifest still points at the successor's
    generation; (2) fences are strictly monotonic across acquisitions
    and the published fence rides the manifest; (3) an UNFENCED promote
    (ensure-build path, no lease) still works and carries the published
    fence forward unchanged."""
    import json
    import os
    import subprocess
    import threading
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        FencedWriterError,
        claim_new_generation,
        promote_generation,
        resolve_generation,
        slot_writer_lease,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, {"kind": "t", "algo": 1})
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    lease_dir = os.path.join(slot, INDEX_LEASE)

    zombie_holding = threading.Event()
    takeover_done = threading.Event()
    outcome: dict = {}

    def zombie() -> None:
        # heartbeat_s huge: after the initial beat the beacon never
        # re-touches, so back-dating below makes the lease takeover-able
        try:
            with slot_writer_lease(slot, "zombie", ttl_s=0.5,
                                   heartbeat_s=3600):
                gen = claim_new_generation(slot)
                write_index_marker(gen, {"kind": "t", "algo": 1})
                outcome["zombie_gen"] = gen
                zombie_holding.set()
                takeover_done.wait(30)  # paused pre-promote
                try:
                    promote_generation(slot, gen)
                    outcome["promoted"] = True
                except FencedWriterError as exc:
                    outcome["promoted"] = False
                    outcome["err"] = str(exc)
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            outcome["crash"] = exc
            zombie_holding.set()

    t = threading.Thread(target=zombie)
    t.start()
    assert zombie_holding.wait(10) and "crash" not in outcome

    # manufacture the crash signature: owner pid dead, every life signal
    # (acquisition mtime + heartbeat) far past the TTL
    child = subprocess.Popen(["true"])
    child.wait()
    with open(os.path.join(lease_dir, "owner.json"), "w",
              encoding="utf-8") as fh:
        json.dump({"pid": child.pid, "purpose": "zombie"}, fh)
    old = time.time() - 7200
    os.utime(os.path.join(lease_dir, "heartbeat"), (old, old))
    os.utime(lease_dir, (old, old))

    # successor takes over, builds, and PUBLISHES
    with slot_writer_lease(slot, "successor", wait_s=10, ttl_s=0.5):
        with open(os.path.join(lease_dir, "owner.json"),
                  encoding="utf-8") as fh:
            successor_fence = json.load(fh)["fence"]
        gen2 = claim_new_generation(slot)
        write_index_marker(gen2, {"kind": "t", "algo": 1})
        promote_generation(slot, gen2)
    with open(os.path.join(slot, INDEX_MANIFEST), encoding="utf-8") as fh:
        manifest = json.load(fh)
    assert manifest["fence"] == successor_fence  # publish carries fence
    assert successor_fence >= 2  # strictly after the zombie's

    # the zombie wakes and tries to publish its stale work
    takeover_done.set()
    t.join(30)
    assert outcome["promoted"] is False
    assert "fence" in outcome["err"]
    assert resolve_generation(slot) == os.path.join(
        slot, manifest["generation"]
    )  # successor's publish survived

    # (3) an unfenced promote (no lease — the ensure-build path) is
    # allowed and carries the published fence forward unchanged
    g4 = claim_new_generation(slot)
    write_index_marker(g4, {"kind": "t", "algo": 2})
    promote_generation(slot, g4)
    with open(os.path.join(slot, INDEX_MANIFEST), encoding="utf-8") as fh:
        m2 = json.load(fh)
    assert m2["generation"] == os.path.basename(g4)
    assert m2["fence"] == manifest["fence"]

    # fence counter recovery: lose the counter file — the next lease
    # re-derives monotonicity from the manifest's published fence
    from weather_database_system_spark.session import INDEX_FENCE

    os.remove(os.path.join(slot, INDEX_FENCE))
    with slot_writer_lease(slot, "post-loss"):
        with open(os.path.join(lease_dir, "owner.json"),
                  encoding="utf-8") as fh:
            assert json.load(fh)["fence"] == manifest["fence"] + 1


def test_promote_fence_gate_is_atomic_under_lock(tmp_path):
    """r18 self-review #1: the fence gate must be check-AND-write atomic,
    not check-then-write — a zombie that read the manifest fence just
    before the successor's publish landed must still be rejected. Pins:
    (1) promote_generation WAITS on a held promote lock and re-reads the
    published fence after acquiring it, so a successor publish that
    lands while the zombie is blocked still rejects the zombie; (2) the
    successor's manifest and generation survive untouched; (3) a LEAKED
    promote lock (crashed promoter) is age-cleared, not waited on
    forever."""
    import json
    import os
    import threading
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_MANIFEST,
        PROMOTE_LOCK,
        FencedWriterError,
        claim_new_generation,
        promote_generation,
        slot_writer_lease,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, {"kind": "t", "algo": 1})
    manifest = os.path.join(slot, INDEX_MANIFEST)
    with open(manifest, "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    lock = os.path.join(slot, PROMOTE_LOCK)

    with slot_writer_lease(slot, "zombie"):  # draws fence 1
        gen = claim_new_generation(slot)
        write_index_marker(gen, {"kind": "t", "algo": 1})
        # a successor is mid-promote: it holds the promote lock and its
        # publish (fence 2) lands WHILE the zombie is blocked on it
        os.mkdir(lock)

        def successor_publish() -> None:
            time.sleep(0.4)
            with open(manifest + ".tmp", "w", encoding="utf-8") as fh:
                json.dump({"generation": "gen-0001", "fence": 2}, fh)
            os.replace(manifest + ".tmp", manifest)
            os.rmdir(lock)  # successor's promote completes

        t = threading.Thread(target=successor_publish)
        t.start()
        t0 = time.monotonic()
        with _pytest.raises(FencedWriterError):
            promote_generation(slot, gen)  # zombie: fence 1 < published 2
        assert time.monotonic() - t0 > 0.3  # it actually waited on the lock
        t.join(10)
    with open(manifest, encoding="utf-8") as fh:
        m = json.load(fh)
    assert m == {"generation": "gen-0001", "fence": 2}  # publish survived
    assert os.path.isdir(g1)  # the zombie's prune never ran

    # (3) a crashed promoter's leaked lock is age-cleared
    os.mkdir(lock)
    old = time.time() - 7200
    os.utime(lock, (old, old))
    promote_generation(slot, gen)  # unfenced (no lease) — succeeds
    assert not os.path.isdir(lock)
    with open(manifest, encoding="utf-8") as fh:
        assert json.load(fh)["generation"] == os.path.basename(gen)


def test_fenced_writes_reject_zombie_before_successor_publishes(tmp_path):
    """r18 lease_soak finding: fence ORDERING alone cannot stop a zombie
    whose successor has not published yet — the manifest still carries
    the older fence, so the promote comparison passes while the
    successor's un-published acked appends get clobbered from the live
    view (the soak measured real record loss through exactly this).
    _verify_held_lease closes it by checking the lease INSTANCE at the
    storage boundary. Pins: a writer paused mid-section whose lease was
    TTL-taken-over gets BOTH its append-stamp and its promote rejected
    even though the successor never promoted; the successor's appended
    state survives untouched."""
    import json
    import os
    import subprocess
    import threading
    import time

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        FencedWriterError,
        append_index_marker,
        claim_new_generation,
        promote_generation,
        read_index_marker,
        resolve_generation,
        slot_writer_lease,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, {"kind": "t", "algo": 1})
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    lease_dir = os.path.join(slot, INDEX_LEASE)

    zombie_holding = threading.Event()
    takeover_done = threading.Event()
    outcome: dict = {}

    def zombie() -> None:
        try:
            with slot_writer_lease(slot, "zombie", ttl_s=0.5,
                                   heartbeat_s=3600):
                gen2 = claim_new_generation(slot)
                write_index_marker(gen2, {"kind": "t", "algo": 1})
                zombie_holding.set()
                takeover_done.wait(30)  # frozen mid-section
                try:
                    append_index_marker(g1, {"rec": "zombie-append"})
                    outcome["append"] = "acked"
                except FencedWriterError:
                    outcome["append"] = "rejected"
                try:
                    promote_generation(slot, gen2)
                    outcome["promote"] = "published"
                except FencedWriterError:
                    outcome["promote"] = "rejected"
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            outcome["crash"] = exc
            zombie_holding.set()

    t = threading.Thread(target=zombie)
    t.start()
    assert zombie_holding.wait(10) and "crash" not in outcome

    # crash signature: owner pid dead, all life signals far past the TTL
    child = subprocess.Popen(["true"])
    child.wait()
    with open(os.path.join(lease_dir, "owner.json"), "w",
              encoding="utf-8") as fh:
        json.dump({"pid": child.pid, "purpose": "zombie"}, fh)
    old = time.time() - 7200
    os.utime(os.path.join(lease_dir, "heartbeat"), (old, old))
    os.utime(lease_dir, (old, old))

    # successor takes over and APPENDS ONLY — no promote, so the
    # manifest fence is still the pre-takeover one when the zombie wakes
    with slot_writer_lease(slot, "successor", wait_s=10, ttl_s=0.5):
        append_index_marker(g1, {"rec": "successor-append"})

    takeover_done.set()
    t.join(30)
    assert outcome == {"append": "rejected", "promote": "rejected"}
    # the successor's un-published state survived the zombie entirely
    assert resolve_generation(slot) == g1
    meta, n_appends = read_index_marker(g1)
    assert meta == {"kind": "t", "algo": 1} and n_appends == 1
    from weather_database_system_spark.session import INDEX_MARKER

    with open(os.path.join(g1, INDEX_MARKER), encoding="utf-8") as fh:
        recs = [e.get("rec") for e in json.load(fh)["appends"]]
    assert recs == ["successor-append"]


def test_lease_identity_is_fence_not_inode(tmp_path):
    """r18 lease_soak finding #2: ext4 hands a freed inode straight back
    to the next mkdir at the same path, so inode equality is NOT
    instance identity — an inode-guarded release or verify silently
    passes against a successor's lease (the soak caught a zombie append
    ACKing through exactly this). Identity must be the acquisition's
    fence in owner.json. Pins: with a successor lease at the SAME path
    (inode typically reused), (1) the zombie's fenced append and promote
    both reject, (2) the zombie's release leaves the successor's lease
    intact, (3) the zombie's heartbeat thread stops re-touching the
    successor's beacon."""
    import json
    import os
    import shutil
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        FencedWriterError,
        append_index_marker,
        claim_new_generation,
        promote_generation,
        slot_writer_lease,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, {"kind": "t", "algo": 1})
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    lease_dir = os.path.join(slot, INDEX_LEASE)

    # ttl 0.4 → heartbeat every 0.1 s: fast enough to pin (3) below
    with slot_writer_lease(slot, "zombie", ttl_s=0.4):
        old_ino = os.stat(lease_dir).st_ino
        time.sleep(0.25)  # let the beater establish its rhythm
        # simulate the takeover: instance removed, successor recreates
        # at the same path — on ext4 with the SAME inode
        shutil.rmtree(lease_dir)
        os.mkdir(lease_dir)
        with open(os.path.join(lease_dir, "owner.json"), "w",
                  encoding="utf-8") as fh:
            json.dump({"pid": os.getpid(), "purpose": "successor",
                       "fence": 99999}, fh)
        hb = os.path.join(lease_dir, "heartbeat")
        with open(hb, "w", encoding="utf-8") as fh:
            fh.write(str(time.time()))
        # absorb any beat already in flight across the swap: a beater
        # descheduled between its identity check (pre-swap: ours) and
        # its write would otherwise bump the successor's beacon AFTER
        # m1 is read below and flake the frozen-mtime assertion
        time.sleep(0.15)
        # (1) both fenced writes reject despite any inode reuse
        with _pytest.raises(FencedWriterError):
            append_index_marker(g1, {"rec": "zombie"})
        gen2 = claim_new_generation(slot)
        write_index_marker(gen2, {"kind": "t", "algo": 1})
        with _pytest.raises(FencedWriterError):
            promote_generation(slot, gen2)
        # (3) the zombie's beater must stop touching the successor's
        # beacon once the instance is no longer its own
        m1 = os.stat(hb).st_mtime
        time.sleep(0.35)  # > 3 beat intervals
        assert os.stat(hb).st_mtime == m1
        reused = os.stat(lease_dir).st_ino == old_ino
    # (2) the zombie's release left the successor's lease alone
    assert os.path.isdir(lease_dir)
    with open(os.path.join(lease_dir, "owner.json"), encoding="utf-8") as fh:
        assert json.load(fh)["purpose"] == "successor"
    # on ext4 the reuse actually happens, which is what makes this test
    # meaningful there; on filesystems with monotonic inode allocation
    # the pins above still hold (identity never consults the inode)
    del reused
    shutil.rmtree(lease_dir)


def test_usurped_claim_never_overwrites_successor_owner(tmp_path, monkeypatch):
    """r18 review #1: a writer frozen past the TTL between its lease
    mkdir and its owner.json write must NOT, on resume, overwrite the
    successor's owner.json — a plain open('w') would invert the fence
    identity (successor fenced out of its own lease, zombie's verifies
    passing). Pins: the resumed claim raises FencedWriterError (O_EXCL
    lost the exclusive-create), the successor's owner.json is
    untouched, and the usurped writer's release leaves the successor's
    populated lease in place (rmdir-only fallback, no inode check)."""
    import json
    import os
    import shutil
    import threading

    from weather_database_system_spark import session as S
    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        FencedWriterError,
        slot_writer_lease,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, {"kind": "t", "algo": 1})
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)
    lease_dir = os.path.join(slot, INDEX_LEASE)

    orig_draw = S._draw_fence
    claimed = threading.Event()
    takeover_done = threading.Event()
    outcome: dict = {}

    def frozen_draw(root: str) -> int:
        # freeze point: after the mkdir claim, before the owner stamp
        claimed.set()
        takeover_done.wait(10)
        return orig_draw(root)

    monkeypatch.setattr(S, "_draw_fence", frozen_draw)

    def victim() -> None:
        try:
            with slot_writer_lease(slot, "victim", ttl_s=0.5):
                outcome["acquired"] = True
        except FencedWriterError:
            outcome["fenced"] = True
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            outcome["crash"] = exc

    t = threading.Thread(target=victim)
    t.start()
    assert claimed.wait(10)
    # the takeover while the victim is frozen: instance replaced at the
    # same path (ext4 would even reuse the inode), successor stamped
    shutil.rmtree(lease_dir)
    os.mkdir(lease_dir)
    with open(os.path.join(lease_dir, "owner.json"), "w",
              encoding="utf-8") as fh:
        json.dump({"pid": os.getpid(), "purpose": "successor",
                   "fence": 12345}, fh)
    takeover_done.set()
    t.join(10)
    assert outcome == {"fenced": True}, outcome
    # successor's lease and stamp survived the victim's failure path
    assert os.path.isdir(lease_dir)
    with open(os.path.join(lease_dir, "owner.json"), encoding="utf-8") as fh:
        doc = json.load(fh)
    assert doc["purpose"] == "successor" and doc["fence"] == 12345
    shutil.rmtree(lease_dir)


def test_prune_never_deletes_currently_published_generation(
    tmp_path, monkeypatch
):
    """r18 review #2: promote's prune runs after the publish, so a
    promoter frozen past the lock TTL between its os.replace and its
    prune could delete the STAMPED generation its successor has since
    published — the manifest would point at a rmtree'd directory and
    manifest-loss recovery would revert to stale state, losing the
    successor's acked appends. The prune now re-reads the manifest
    directly before each rmtree and never removes the generation it
    currently names."""
    import json
    import os
    import threading

    from weather_database_system_spark import session as S
    from weather_database_system_spark.session import (
        INDEX_MANIFEST,
        claim_new_generation,
        promote_generation,
        resolve_generation,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, {"kind": "t", "algo": 1})
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)

    g2 = claim_new_generation(slot)
    write_index_marker(g2, {"kind": "t", "algo": 1})

    orig_dirs = S._generation_dirs
    frozen_tid: set = set()
    at_prune = threading.Event()
    resume = threading.Event()

    def gated_dirs(s: str):
        # freeze ONLY the victim thread's prune-time listing; every
        # other caller (the successor's promote below) passes through
        if threading.get_ident() in frozen_tid:
            frozen_tid.clear()  # freeze once — the victim's retry passes
            at_prune.set()
            assert resume.wait(30)
        return orig_dirs(s)

    monkeypatch.setattr(S, "_generation_dirs", gated_dirs)

    def victim() -> None:
        frozen_tid.add(threading.get_ident())
        promote_generation(slot, g2)  # unfenced: publish then freeze

    t = threading.Thread(target=victim)
    t.start()
    assert at_prune.wait(10)
    # victim has PUBLISHED g2 and is frozen before its prune, still
    # holding the promote lock — exactly a promoter frozen past the
    # lock TTL. The successor age-clears the stale lock (backdated
    # here, as sweep/test precedent does for the lease TTL) and
    # publishes g3
    import time as _time

    lock = os.path.join(slot, S.PROMOTE_LOCK)
    old = _time.time() - 7200
    os.utime(lock, (old, old))
    g3 = claim_new_generation(slot)
    write_index_marker(g3, {"kind": "t", "algo": 1})
    promote_generation(slot, g3)
    assert resolve_generation(slot) == g3
    resume.set()
    t.join(10)
    # the victim's resumed prune must NOT have deleted the successor's
    # currently-published generation
    assert os.path.isdir(g3)
    assert resolve_generation(slot) == g3
    meta, _ = S.read_index_marker(g3)
    assert meta == {"kind": "t", "algo": 1}


def test_fence_bookkeeping_never_reads_as_index_content(tmp_path, monkeypatch):
    """r18 self-review #2/#3: fence counters and promote locks are slot
    BOOKKEEPING. Pins: (1) a managed slot whose generations were all
    deleted but which retains fence files / a promote-lock remnant
    resolves to None (not to its own root as a phantom flat index); (2)
    migrate_flat_slot leaves an in-slot stray fence file behind instead
    of moving it into the new generation; (3) a failure while drawing
    the fence RELEASES the freshly-claimed lease instead of leaking an
    ownerless lease that waiters can only clear by TTL."""
    import os

    import pytest as _pytest

    from weather_database_system_spark import session as S

    # (1) bookkeeping-only slot resolves to None
    slot = str(tmp_path / "emptied")
    os.makedirs(slot)
    with open(os.path.join(slot, S.INDEX_FENCE), "w", encoding="utf-8") as fh:
        fh.write('{"fence": 3}')
    with open(
        os.path.join(slot, "gen-0001." + S.INDEX_FENCE), "w", encoding="utf-8"
    ) as fh:
        fh.write('{"fence": 1}')  # a pre-manifest build's sibling remnant
    os.mkdir(os.path.join(slot, S.PROMOTE_LOCK))
    assert S.resolve_generation(slot) is None

    # (2) migration leaves the stray fence file at the slot root
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    with open(os.path.join(flat, "data.parquet"), "w", encoding="utf-8") as fh:
        fh.write("x")
    S.write_index_marker(flat, {"kind": "t", "algo": 1})
    with open(os.path.join(flat, S.INDEX_FENCE), "w", encoding="utf-8") as fh:
        fh.write('{"fence": 9}')
    live = S.migrate_flat_slot(flat)
    assert os.path.isfile(os.path.join(flat, S.INDEX_FENCE))
    assert not os.path.isfile(os.path.join(live, S.INDEX_FENCE))
    assert os.path.isfile(os.path.join(live, "data.parquet"))

    # (3) a fence-draw failure releases the claimed lease
    slot2 = str(tmp_path / "slot2")
    os.makedirs(slot2)

    def _boom(root: str) -> int:
        raise OSError("disk full")

    monkeypatch.setattr(S, "_draw_fence", _boom)
    with _pytest.raises(OSError, match="disk full"):
        with S.slot_writer_lease(slot2, "doomed"):
            pass
    monkeypatch.undo()
    assert not os.path.isdir(S._lease_dir(slot2))  # released, not leaked
    with S.slot_writer_lease(slot2, "next", wait_s=0.5):
        pass  # immediately acquirable — no TTL wait needed


def test_fence_monotonic_across_processes(tmp_path):
    """Fence numbers must be monotonic ACROSS PROCESSES — the deployment
    case is separate hosts/jobs on one scratch volume, where the
    per-thread held-fence registry cannot help and monotonicity rests
    entirely on the on-disk counter + manifest recovery. Four spawned
    writers serialize through the lease, each promoting a generation;
    their drawn fences must be four DISTINCT ascending values, the
    manifest must publish the highest, and a subsequent in-process
    acquisition must draw a strictly higher fence than all of them."""
    import json
    import multiprocessing as mp
    import os

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        INDEX_MANIFEST,
        slot_writer_lease,
    )

    slot = str(tmp_path / "slot")
    os.makedirs(os.path.join(slot, "gen-0001"))
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)

    ctx = mp.get_context("spawn")
    with ctx.Pool(4) as pool:
        fences = pool.map(_fence_promote_worker, [(slot,)] * 4)
    assert len(set(fences)) == 4  # no two writers shared a fence
    with open(os.path.join(slot, INDEX_MANIFEST), encoding="utf-8") as fh:
        assert json.load(fh)["fence"] == max(fences)
    with slot_writer_lease(slot, "after"):
        with open(os.path.join(slot, INDEX_LEASE, "owner.json"),
                  encoding="utf-8") as fh:
            assert json.load(fh)["fence"] > max(fences)


def test_ensure_snapshot_state_meta_gate_and_require(tmp_path):
    """ensure_snapshot_state hardening (ADVICE r17 #2 + VERDICT r17 task
    #5). Pins: (1) a retained generation whose marker meta does NOT
    match the live generation's (the live index was rebuilt over a
    source/algo change) is never served as the snapshot — the compaction
    re-runs and mints a snapshot of the CURRENT lineage; (2) a
    lineage-matching snapshot is reused without compacting (gated); (3)
    require=True raises SnapshotMissingError on a miss instead of
    mutating the slot — the serving-side contract."""
    import json
    import os

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_MANIFEST,
        SnapshotMissingError,
        claim_new_generation,
        ensure_snapshot_state,
        promote_generation,
        read_index_marker,
        snapshot_generation,
        write_index_marker,
    )

    slot = str(tmp_path / "slot")
    meta_a = {"kind": "t", "algo": 1, "source": "v1"}
    g1 = os.path.join(slot, "gen-0001")
    os.makedirs(g1)
    write_index_marker(g1, meta_a)
    with open(os.path.join(slot, INDEX_MANIFEST), "w", encoding="utf-8") as fh:
        json.dump({"generation": "gen-0001"}, fh)

    calls = {"n": 0}

    def compact(s: str) -> None:
        # row-preserving stand-in: new generation, marker carried from
        # the live one (what every family's compact_* does)
        calls["n"] += 1
        from weather_database_system_spark.session import resolve_generation

        live = resolve_generation(s)
        gen = claim_new_generation(s)
        meta, _ = read_index_marker(live)
        write_index_marker(gen, meta)
        promote_generation(s, gen)

    # (3) serving mode on a snapshot-less slot: raise, do not compact
    with _pytest.raises(SnapshotMissingError):
        ensure_snapshot_state(slot, compact, require=True)
    assert calls["n"] == 0 and snapshot_generation(slot) is None

    # manufacturing default: one compaction mints the snapshot …
    snap = ensure_snapshot_state(slot, compact)
    assert calls["n"] == 1 and snap == g1
    # … and repeat calls (and require=True now) reuse it without another
    assert ensure_snapshot_state(slot, compact) == g1
    assert ensure_snapshot_state(slot, compact, require=True) == g1
    assert calls["n"] == 1

    # (1) the live index is REBUILT under a new meta (source changed):
    # the retained pre-rebuild generation no longer matches the live
    # lineage and must NOT be served as the snapshot
    meta_b = {"kind": "t", "algo": 1, "source": "v2"}
    g3 = claim_new_generation(slot)
    write_index_marker(g3, meta_b)
    promote_generation(slot, g3)  # prunes g1; g2 (meta_a) is retained
    stale = snapshot_generation(slot)
    assert stale is not None
    assert read_index_marker(stale)[0] == meta_a  # the trap ADVICE names
    with _pytest.raises(SnapshotMissingError):
        ensure_snapshot_state(slot, compact, require=True)
    snap2 = ensure_snapshot_state(slot, compact)
    assert calls["n"] == 2  # re-minted through the compaction
    assert read_index_marker(snap2)[0] == meta_b  # current lineage
    assert snapshot_generation(slot) == snap2


def test_flat_dir_lease_survives_compaction(tmp_path):
    """ADVICE r16 #2: for a flat (non-manifest) directory the lease must
    live OUTSIDE the directory being compacted — the in-place swap_dir
    renames the flat dir away and back, so a lease INSIDE it would be
    silently relocated out of the live path mid-compaction (releasing it
    to a second writer whose fresh lease the compactor's exit then
    deletes). Pins: the flat-dir lease is a sibling path; it still
    excludes a second writer across an entire in-place compaction; and
    compact_into_generation on a flat dir never disturbs it."""
    import os
    import threading
    import time

    import pytest as _pytest

    from weather_database_system_spark.session import (
        INDEX_LEASE,
        SlotBusyError,
        _lease_dir,
        compact_into_generation,
        slot_writer_lease,
        write_index_marker,
    )

    flat = str(tmp_path / "flat_index")
    os.makedirs(flat)
    with open(os.path.join(flat, "data.txt"), "w", encoding="utf-8") as fh:
        fh.write("v1")
    write_index_marker(flat, {"kind": "flat_test", "algo": 1})

    sibling = flat + "." + INDEX_LEASE
    assert _lease_dir(flat) == sibling

    excluded_during_compaction: list[bool] = []

    def _rewrite(dst: str) -> None:
        os.makedirs(dst, exist_ok=True)
        with open(os.path.join(dst, "data.txt"), "w", encoding="utf-8") as fh:
            fh.write("v2")
        # mid-compaction: the lease must still be held at its stable
        # sibling path, and a second writer must still be excluded
        try:
            with slot_writer_lease(flat, "intruder", wait_s=0.2):
                excluded_during_compaction.append(False)
        except SlotBusyError:
            excluded_during_compaction.append(True)

    with slot_writer_lease(flat, "compact") as root:
        assert root == flat
        assert os.path.isdir(sibling)
        assert not os.path.isdir(os.path.join(flat, INDEX_LEASE))
        compact_into_generation(flat, _rewrite)
        # the swap did NOT relocate the held lease
        assert os.path.isdir(sibling)
    assert excluded_during_compaction == [True]
    assert not os.path.isdir(sibling)  # released at the stable path
    with open(os.path.join(flat, "data.txt"), encoding="utf-8") as fh:
        assert fh.read() == "v2"

    # and a fresh writer can now acquire immediately (nothing leaked)
    with slot_writer_lease(flat, "next", wait_s=1):
        pass


def test_sweep_ages_by_tree_mtime(tmp_path):
    """ADVICE r16 #4: sweep_stale_generations must age a generation by
    the newest mtime anywhere under its TREE — parquet writes land in
    subdirectories (assignments/, postings/, …) and do not bump the
    generation root, so root-mtime aging wrongly reaped a long in-flight
    build whose root went quiet while its subdirs were actively written."""
    import os
    import time

    from weather_database_system_spark.session import sweep_stale_generations

    slot = str(tmp_path / "slot")
    gen = os.path.join(slot, "gen-0001")
    sub = os.path.join(gen, "assignments")
    os.makedirs(sub)
    with open(os.path.join(sub, "part-0.parquet"), "w", encoding="utf-8") as fh:
        fh.write("bytes")

    # root looks ancient, but a file deep in the tree is FRESH — a live
    # builder mid-write: must survive any age gate the root would fail
    old = time.time() - 7200
    os.utime(gen, (old, old))
    assert sweep_stale_generations(slot, max_age_s=3600) == []
    assert os.path.isdir(gen)

    # the whole tree gone quiet past the gate → genuinely abandoned
    for dirpath, dirs, files in os.walk(gen):
        for n in dirs + files:
            os.utime(os.path.join(dirpath, n), (old, old))
    os.utime(gen, (old, old))
    assert sweep_stale_generations(slot, max_age_s=3600) == ["gen-0001"]
    assert not os.path.isdir(gen)


def test_append_vs_compaction_lease_serializes(spark, tmp_path, monkeypatch):
    """End-to-end pin for VERDICT r15 task #4's done-criterion: a
    compaction racing an append either SERIALIZES or RAISES — appended
    rows are never silently dropped between a compactor's scan and its
    promote. A simulated in-flight compaction (the lease held with the
    compactor's purpose) blocks a concurrent ``append_bm25_docs``:
    with a short bounded wait the append fails loudly (SlotBusyError);
    with a generous wait it parks until the compactor releases, then
    lands in the post-compaction LIVE generation — the exact rows a
    silent interleave would have lost — and the prebuilt query sees the
    union."""
    import threading

    import pytest as _pytest
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import (
        append_bm25_docs,
        bm25_query_prebuilt,
        bm25_search,
        build_bm25_index,
        compact_bm25_index,
    )
    from weather_database_system_spark.session import (
        SlotBusyError,
        ensure_index,
        slot_writer_lease,
    )
    from weather_database_system_spark.sources.star import load_table

    sf = SF_SMOKE
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    slot = str(tmp_path / "bm25_slot")
    ensure_index(
        slot,
        {"kind": "bm25_index", "test": "lease-race"},
        lambda gen: build_bm25_index(
            docs.filter(F.pmod("doc_id", F.lit(2)) == 0), gen
        ),
    )
    odd = docs.filter(F.pmod("doc_id", F.lit(2)) == 1)

    # fail-loud half: the bounded wait expires while the compactor holds
    with slot_writer_lease(slot, "compact_bm25"):
        monkeypatch.setenv("WDSS_LEASE_WAIT_S", "0.3")
        with _pytest.raises(SlotBusyError):
            append_bm25_docs(odd, slot)
        monkeypatch.delenv("WDSS_LEASE_WAIT_S")

    # serialize half: hold the lease (the compactor's read-then-promote
    # window — compact_bm25_index takes the lease itself, so the window
    # is simulated rather than nested, which would self-deadlock), park
    # an append behind it, run the REAL compaction's promote effect by
    # releasing, and watch the append land in the post-release live
    # generation instead of interleaving
    import time

    appended = threading.Event()

    def parked_append():
        append_bm25_docs(odd, slot)  # default wait: parks on the lease
        appended.set()

    with slot_writer_lease(slot, "compact_bm25"):
        t = threading.Thread(target=parked_append)
        t.start()
        time.sleep(0.5)
        assert not appended.is_set()  # append is parked, not interleaved
    t.join(timeout=60)
    assert appended.is_set()  # released → append proceeded
    compact_bm25_index(spark, slot)  # real compaction serializes after

    # the appended rows are IN the live index: prebuilt == in-query form
    # over the full corpus
    expected = sorted(tuple(r) for r in bm25_search(spark, sf).collect())
    got = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, sf, slot).collect()
    )
    assert got == expected


def test_index_rebuild_never_disturbs_readers(spark, tmp_path, monkeypatch):
    """The atomicity guarantee the manifest layer exists for (r15):
    a reader that resolved the live generation BEFORE a rebuild or a
    compaction keeps answering from its (immutable) generation directory
    while the promote lands — no FileNotFound window, which the in-place
    swap_dir could not guarantee concurrent readers. Pin the full cycle
    on the trigram index over a mutable source: build → hold a LAZY plan
    over gen-0001 → source changes → ensure rebuilds and promotes
    gen-0002 → the stale plan still collects (grace window) and a fresh
    resolve answers from the new generation; one more promote prunes
    gen-0001."""
    import os
    import shutil

    from weather_database_system_spark.operators.textan import (
        append_trigram_postings,
        compact_trigram_postings,
        ensure_trigram_postings,
        trigram_query_prebuilt,
    )
    from weather_database_system_spark.session import resolve_generation
    from weather_database_system_spark.sources.star import load_table

    # mutable sf_dir: the smoke documents table copied somewhere writable
    sf_mut = str(tmp_path / "sf")
    os.makedirs(sf_mut)
    src = os.path.join(SF_SMOKE, "documents.parquet")
    dst = os.path.join(sf_mut, "documents.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy2)(src, dst)
    monkeypatch.setenv("WDSS_SCRATCH_DIR", str(tmp_path / "scratch"))

    p1 = ensure_trigram_postings(spark, sf_mut)
    assert os.path.basename(p1) == "gen-0001"
    stale_reader = spark.read.parquet(p1)  # resolved pre-rebuild, lazy
    baseline = sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf_mut, p1).collect()
    )
    assert baseline

    # source "changes" (mtime bump flips the signature) → rebuild
    os.utime(dst if os.path.isfile(dst) else os.path.join(dst, os.listdir(dst)[0]))
    p2 = ensure_trigram_postings(spark, sf_mut)
    assert os.path.basename(p2) == "gen-0002" and p2 != p1
    assert os.path.isdir(p1)  # grace window: old generation intact
    assert stale_reader.count() > 0  # in-flight reader undisturbed
    assert sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf_mut, p1).collect()
    ) == baseline  # old generation still answers identically
    assert sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf_mut).collect()
    ) == baseline  # default path resolves the NEW live generation

    # a compaction promote is equally reader-safe — and prunes gen-0001
    docs = load_table(spark, sf_mut, "documents").select("doc_id", "text")
    append_trigram_postings(docs.filter("doc_id % 5 = 0"), p2)
    reader_g2 = spark.read.parquet(p2)
    p3 = compact_trigram_postings(spark, p2)
    assert os.path.basename(p3) == "gen-0003"
    assert os.path.isdir(p2) and not os.path.isdir(p1)
    assert reader_g2.count() > 0  # reader of the compacted-away gen OK
    assert sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf_mut, p3).collect()
    ) == baseline  # duplicates from the append stay harmless post-compact


def test_index_catalog_and_snapshot_reads(spark, tmp_path, monkeypatch):
    """Ops surface for the manifest layer: index_catalog inventories
    every slot (kind, algo, live generation, retained count, bytes)
    with NO SparkSession; list_generations exposes the retained grace
    generation, whose path is a SNAPSHOT READ — querying it answers the
    previous index state even after a compaction promoted a new one."""
    import os

    from weather_database_system_spark.operators.textan import (
        append_bm25_docs,
        bm25_query_prebuilt,
        compact_bm25_index,
        ensure_bm25_index,
        ensure_trigram_postings,
    )
    from weather_database_system_spark.session import (
        index_catalog,
        list_generations,
    )
    from weather_database_system_spark.sources.star import load_table

    scratch = str(tmp_path / "scratch")
    monkeypatch.setenv("WDSS_SCRATCH_DIR", scratch)
    ensure_trigram_postings(spark, SF_SMOKE)
    bm = ensure_bm25_index(spark, SF_SMOKE)

    cat = {r["kind"]: r for r in index_catalog(scratch)}
    assert set(cat) == {"trigram_postings", "bm25_index"}
    assert cat["bm25_index"]["live_generation"] == "gen-0001"
    assert cat["bm25_index"]["n_generations"] == 1
    assert cat["bm25_index"]["live_bytes"] > 0

    baseline = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, SF_SMOKE, bm).collect()
    )
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    append_bm25_docs(docs.filter("doc_id % 2 = 0"), bm)  # duplicates half
    bm2 = compact_bm25_index(spark, bm)

    slot = os.path.dirname(bm2)
    gens = list_generations(slot)
    assert [g["generation"] for g in gens] == ["gen-0001", "gen-0002"]
    assert [g["live"] for g in gens] == [False, True]
    # the retained grace generation IS a snapshot read: the pre-append
    # index state still answers from its immutable directory
    snap = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, SF_SMOKE, bm).collect()
    )
    assert snap == baseline
    # catalog reflects the promote: live generation advanced, both
    # generations retained; the append CHAINED onto the build stamp
    # (r16 — previously it deleted the marker and the catalog lost the
    # kind), so the catalog surfaces the BASE build meta plus the append
    # count, carried forward by row-preserving compaction
    row = next(
        r for r in index_catalog(scratch) if r["slot"] == os.path.basename(slot)
    )
    assert row["kind"] == "bm25_index"
    assert row["appends"] == 1
    assert row["live_generation"] == "gen-0002"
    assert row["n_generations"] == 2
    # the compaction ran under the writer lease, so its promote
    # published a fence — surfaced in the catalog for ops (r18)
    assert row["fence"] >= 1

    # ADVICE r15 #3: non-index scratch dirs (warehouse tables, rehearsal
    # data) are NOT listed as slots — a manifest, gen-NNNN subdirs, or a
    # root index marker is required
    os.makedirs(os.path.join(scratch, "not_an_index", "data"))
    with open(
        os.path.join(scratch, "not_an_index", "data", "p.parquet"), "w"
    ) as fh:
        fh.write("x")
    assert "not_an_index" not in {r["slot"] for r in index_catalog(scratch)}


def test_bm25_prebuilt_snapshot_time_travel(spark, tmp_path, monkeypatch):
    """The snapshot-read registry entry (r16, VERDICT r15 task #7):
    (1) first call creates the two-generation state once (ensure-build +
    row-preserving compaction) and answers the pinned BM25 question from
    the RETAINED pre-compaction generation, claim snapshot_equals_live=1;
    (2) repeat calls reuse the state — no generation churn; (3) a
    post-snapshot append of NEW docs diverges the LIVE read (corpus
    stats shift) while the snapshot generation's bytes and answer stay
    immutable — read directly, because the registry wrapper's ensure
    would treat the appended index as stale and rebuild (the append
    staleness contract)."""
    from weather_database_system_spark.operators.textan import (
        append_bm25_docs,
        bm25_prebuilt_snapshot,
        bm25_query_prebuilt,
        bm25_search,
    )
    from weather_database_system_spark.session import (
        _generation_dirs,
        scratch_path,
        slot_live,
        snapshot_generation,
    )

    monkeypatch.setenv("WDSS_SCRATCH_DIR", str(tmp_path / "scratch"))
    got = bm25_prebuilt_snapshot(spark, SF_SMOKE).collect()
    spine = sorted((r.rank, r.doc_id, r.bm25) for r in got)
    expected = sorted(tuple(r) for r in bm25_search(spark, SF_SMOKE).collect())
    assert spine == expected  # snapshot answers the same pinned question
    assert got and all(r.snapshot_equals_live == 1 for r in got)

    slot = scratch_path("bm25_index", SF_SMOKE)
    assert sorted(_generation_dirs(slot)) == ["gen-0001", "gen-0002"]
    got2 = bm25_prebuilt_snapshot(spark, SF_SMOKE).collect()
    assert sorted(_generation_dirs(slot)) == ["gen-0001", "gen-0002"]
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))

    # diverge live: append NEW docs carrying query terms (N/avgdl/df all
    # shift; duplicate docs would be absorbed by the query-path dedup)
    new_docs = spark.createDataFrame(
        [(1_000_001, "hash join stream hash join stream stream")],
        "doc_id long, text string",
    )
    append_bm25_docs(new_docs, slot)
    snap = snapshot_generation(slot)
    snap_rows = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, SF_SMOKE, snap).collect()
    )
    live_rows = sorted(
        tuple(r)
        for r in bm25_query_prebuilt(spark, SF_SMOKE, slot_live(slot)).collect()
    )
    assert snap_rows == expected  # immutable: pre-append state preserved
    assert live_rows != snap_rows  # live took the append
    assert any(r[1] == 1_000_001 for r in live_rows)


def test_bm25_diverged_snapshot_state_and_answers(spark, tmp_path, monkeypatch):
    """The DIVERGED snapshot entry (r18, VERDICT r17 task #1 — actual
    time travel, snapshot ≠ live). Pins: (1) the snapshot half answers
    BM25 over the BASE SUBSET exactly (ground truth: a throwaway
    one-shot index of the same subset) while live answers the full
    corpus (= bm25_search); (2) the divergence counts are the true
    both-ways anti-join of the two ranked lists and are NONZERO; (3)
    the state manufacture is gated — repeat calls reuse the
    two-generation diverged state with identical output and no
    generation churn; (4) an externally over-appended slot fails the
    closing invariant and is rebuilt from scratch once, converging
    instead of serving an unknown state."""
    import os

    from weather_database_system_spark.operators.textan import (
        BM25_APPEND_MOD,
        _ensure_bm25_diverged_state,
        append_bm25_docs,
        bm25_prebuilt_diverged_snapshot,
        bm25_query_prebuilt,
        bm25_search,
        build_bm25_index,
    )
    from weather_database_system_spark.session import (
        _generation_dirs,
        read_index_marker,
        scratch_path,
        slot_live,
    )
    from weather_database_system_spark.sources.star import load_table

    monkeypatch.setenv("WDSS_SCRATCH_DIR", str(tmp_path / "scratch"))
    got = bm25_prebuilt_diverged_snapshot(spark, SF_SMOKE).collect()
    assert got
    n_only_live = {r.n_only_live for r in got}
    n_only_snap = {r.n_only_snap for r in got}
    assert len(n_only_live) == 1 and len(n_only_snap) == 1  # 1-row claims
    assert n_only_live.pop() > 0 and n_only_snap.pop() > 0  # truly diverged

    # (1) ground truth for the snapshot half: a throwaway ONE-SHOT index
    # of the same base subset (doc_id % MOD != MOD-1)
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    subset = docs.filter(f"doc_id % {BM25_APPEND_MOD} != {BM25_APPEND_MOD - 1}")
    ref = str(tmp_path / "ref_subset_index")
    build_bm25_index(subset, ref)
    expected_snap = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, SF_SMOKE, ref).collect()
    )
    assert sorted((r.rank, r.doc_id, r.bm25) for r in got) == expected_snap

    # live half = the full corpus (in-query form is the yardstick), and
    # the divergence counts are the true both-ways anti-join
    slot = scratch_path("bm25_diverged", SF_SMOKE)
    live_rows = sorted(
        tuple(r)
        for r in bm25_query_prebuilt(spark, SF_SMOKE, slot_live(slot)).collect()
    )
    assert live_rows == sorted(
        tuple(r) for r in bm25_search(spark, SF_SMOKE).collect()
    )
    assert got[0].n_only_live == len(set(live_rows) - set(expected_snap))
    assert got[0].n_only_snap == len(set(expected_snap) - set(live_rows))

    # (3) gated reuse: same generations, same marker state, same output
    gens = sorted(_generation_dirs(slot))
    _, n_app = read_index_marker(slot_live(slot))
    assert n_app == 1
    got2 = bm25_prebuilt_diverged_snapshot(spark, SF_SMOKE).collect()
    assert sorted(_generation_dirs(slot)) == gens
    assert read_index_marker(slot_live(slot))[1] == 1
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))

    # (4) sabotage: a SECOND append breaks the recorded invariant (live
    # must carry exactly one ingest batch) — the state machine rebuilds
    # from scratch and converges to the same answer
    append_bm25_docs(
        spark.createDataFrame(
            [(2_000_001, "hash join stream")], "doc_id long, text string"
        ),
        slot,
    )
    assert read_index_marker(slot_live(slot))[1] == 2
    snap3, live3 = _ensure_bm25_diverged_state(spark, SF_SMOKE)
    assert read_index_marker(live3)[1] == 1  # rebuilt, re-diverged once
    assert read_index_marker(snap3)[1] == 0
    assert os.path.dirname(snap3.rstrip("/")) == slot
    got3 = bm25_prebuilt_diverged_snapshot(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, got3)) == sorted(map(tuple, got))


def test_contamination_index_lifecycle(spark, tmp_path):
    """The SIXTH stored family (r16): eval-set fingerprints. (1)
    build(suite A) + append(suite B) screens a training batch EXACTLY
    like a one-shot build of the full eval set, which equals the
    in-query form; (2) a retried at-least-once append leaves results
    unchanged — free by construction here, every aggregate is
    countDistinct/min; (3) compaction is row-preserving and leaves
    screening unchanged; (4) the probe plan reads the documents table
    exactly once (the training side) — the eval corpus is never
    re-read or re-tokenized."""
    import re

    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.trainprep import (
        EVAL_SET_MAX_DOC,
        build_contamination_index,
        append_contamination_grams,
        compact_contamination_index,
        contamination_eval_overlap,
        contamination_query_prebuilt,
    )
    from weather_database_system_spark.sources.star import load_table

    sf = SF_SMOKE
    docs = load_table(spark, sf, "documents")
    ev = docs.filter(F.col("doc_id") < EVAL_SET_MAX_DOC)
    half = EVAL_SET_MAX_DOC // 2

    whole = str(tmp_path / "contam_whole")
    incr = str(tmp_path / "contam_incr")
    build_contamination_index(ev, whole)
    build_contamination_index(ev.filter(F.col("doc_id") < half), incr)
    append_contamination_grams(ev.filter(F.col("doc_id") >= half), incr)

    expected = sorted(
        tuple(r) for r in contamination_eval_overlap(spark, sf).collect()
    )
    assert len(expected) > 0
    got_whole = sorted(
        tuple(r)
        for r in contamination_query_prebuilt(spark, sf, whole).collect()
    )
    got_incr = sorted(
        tuple(r)
        for r in contamination_query_prebuilt(spark, sf, incr).collect()
    )
    assert got_whole == expected  # stored round-trip == in-query form
    assert got_incr == expected   # append == rebuild

    # retry storm: a suite ingests AGAIN — distinct/min aggregates absorb it
    append_contamination_grams(ev.filter(F.col("doc_id") >= half), incr)
    assert sorted(
        tuple(r)
        for r in contamination_query_prebuilt(spark, sf, incr).collect()
    ) == expected

    # compaction: row-preserving (duplicates included), screening unchanged
    before = sorted(tuple(r) for r in spark.read.parquet(incr).collect())
    compact_contamination_index(spark, incr)
    assert sorted(tuple(r) for r in spark.read.parquet(incr).collect()) == before
    assert sorted(
        tuple(r)
        for r in contamination_query_prebuilt(spark, sf, incr).collect()
    ) == expected

    # plan pin: ONE documents scan (train side); eval text never read
    plan = (
        contamination_query_prebuilt(spark, sf, whole)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"Location.*documents", plan)) == 1
    # the index scan (plan strings abbreviate paths — pin its schema)
    assert plan.count("struct<eval_doc_id:bigint,gram:string>") == 1


def test_bm25_index_lifecycle(spark, tmp_path):
    """The fifth stored-index family (r15). BM25 is the one whose scores
    depend on CORPUS-GLOBAL statistics (N, avgdl, df) that change with
    every ingest batch — the design derives all three at query time from
    index bytes, so: (1) build(batch1) + append(batch2) answers EXACTLY
    like build(union) — not approximately, the stats see the union either
    way; (2) a retried at-least-once append leaves results unchanged
    (postings dedup on (doc_id, term), doclens on doc_id, BEFORE any
    statistic — a duplicated doclen row would otherwise inflate N/avgdl
    and shift every score); (3) compaction is row-preserving for both
    tables and leaves the ranking unchanged."""
    from pyspark.sql import functions as F

    from weather_database_system_spark.operators.textan import (
        append_bm25_docs,
        bm25_query_prebuilt,
        bm25_search,
        build_bm25_index,
        compact_bm25_index,
    )
    from weather_database_system_spark.sources.star import load_table

    sf = SF_SMOKE
    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    whole = str(tmp_path / "bm25_whole")
    incr = str(tmp_path / "bm25_incr")
    build_bm25_index(docs, whole)
    build_bm25_index(docs.filter(F.pmod("doc_id", F.lit(2)) == 0), incr)
    append_bm25_docs(docs.filter(F.pmod("doc_id", F.lit(2)) == 1), incr)

    expected = sorted(tuple(r) for r in bm25_search(spark, sf).collect())
    assert len(expected) > 0
    got_whole = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, sf, whole).collect()
    )
    got_incr = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, sf, incr).collect()
    )
    assert got_whole == expected  # stored round-trip == in-query form
    assert got_incr == expected   # append == rebuild, stats included

    # retry storm: half the corpus ingests AGAIN (duplicated postings
    # AND doclens rows — the N/avgdl inflation hazard)
    append_bm25_docs(docs.filter(F.pmod("doc_id", F.lit(2)) == 0), incr)
    got_dup = sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, sf, incr).collect()
    )
    assert got_dup == expected

    before = {
        sub: sorted(
            tuple(r) for r in spark.read.parquet(f"{incr}/{sub}").collect()
        )
        for sub in ("postings", "doclens")
    }
    compact_bm25_index(spark, incr)
    for sub in ("postings", "doclens"):
        after = sorted(
            tuple(r) for r in spark.read.parquet(f"{incr}/{sub}").collect()
        )
        assert after == before[sub]  # row-preserving, duplicates included
    assert sorted(
        tuple(r) for r in bm25_query_prebuilt(spark, sf, incr).collect()
    ) == expected


def test_slot_handles_survive_promotes(spark, tmp_path, monkeypatch):
    """Ingest loops hold the SLOT path, never a generation dir (the
    manifest layer's writer contract): append/compact/query called with
    the slot re-resolve the live pointer per call, so a long-running
    stream keeps landing its batches in the CURRENT generation across
    compaction promotes — appending via a captured generation path would
    instead write into the grace generation, and the next promote would
    silently prune those rows."""
    import os

    from weather_database_system_spark.operators.textan import (
        append_trigram_postings,
        compact_trigram_postings,
        ensure_trigram_postings,
        trigram_query_prebuilt,
    )
    from weather_database_system_spark.session import scratch_path, slot_live
    from weather_database_system_spark.sources.star import load_table

    monkeypatch.setenv("WDSS_SCRATCH_DIR", str(tmp_path / "scratch"))
    sf = SF_SMOKE
    g1 = ensure_trigram_postings(spark, sf)
    slot = os.path.dirname(g1)
    assert slot_live(slot) == g1  # the slot handle resolves to live

    baseline = sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf, slot).collect()
    )
    assert baseline  # querying BY SLOT answers from the live generation

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    append_trigram_postings(docs.filter("doc_id % 3 = 0"), slot)  # by slot
    n_g1 = spark.read.parquet(g1).count()

    g2 = compact_trigram_postings(spark, slot)  # maintenance by slot too
    assert g2 != g1 and os.path.basename(g2) == "gen-0002"
    assert spark.read.parquet(g2).count() == n_g1  # append was captured

    # post-promote ingest through the SAME slot handle lands in gen-0002
    append_trigram_postings(docs.filter("doc_id % 3 = 1"), slot)
    assert spark.read.parquet(g2).count() > n_g1
    assert spark.read.parquet(g1).count() == n_g1  # grace gen untouched
    assert sorted(
        tuple(r) for r in trigram_query_prebuilt(spark, sf, slot).collect()
    ) == baseline  # duplicate postings stay harmless throughout

    # a STALE generation handle must fail loudly on compaction: rewriting
    # the grace generation and promoting it would silently REVERT the
    # index to pre-promote content (publish old data as live)
    import pytest

    with pytest.raises(ValueError, match="non-live generation"):
        compact_trigram_postings(spark, g1)
