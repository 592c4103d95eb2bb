"""Property tests for the round-8 catalog additions.

The DuckDB oracle (tests/test_oracle.py, scripts/driver_sim.py) checks
engine parity; these tests check the MATH — invariants that both
engines could get identically wrong.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_a22_moments_match_numpy(spark, sf_small):
    """Exact-decimal power sums must reproduce numpy's two-pass
    mean/std (ddof=1) to float tolerance."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.core import a22_feature_moments

    got = {r["feature"]: r for r in a22_feature_moments(spark, sf_small).collect()}
    li = load_table(spark, sf_small, "lineitem").select(
        "l_quantity", "l_discount", "l_tax"
    )
    pdf = li.toPandas()
    for feat in ["l_quantity", "l_discount", "l_tax"]:
        vals = pdf[feat].to_numpy(dtype=np.float64)
        assert got[feat]["n"] == len(vals)
        assert got[feat]["mean"] == pytest.approx(vals.mean(), abs=1e-5)
        assert got[feat]["std"] == pytest.approx(vals.std(ddof=1), abs=1e-5)
        z = np.abs(vals - vals.mean()) > 3 * vals.std(ddof=1)
        assert got[feat]["n_outliers"] == int(z.sum())


def test_w10_sessions_conserve_events(spark, sf_small):
    """Session spans partition the event stream: per-user session
    event counts must sum back to the user's event count, and w10's
    session count must agree with w4's independent lag-flag count."""
    from pypgsync_spark.queries.core import w4_sessionize_lag, w10_session_spans

    w10 = {r["user_id"]: r for r in w10_session_spans(spark, sf_small).collect()}
    w4 = {r["user_id"]: r["n_sessions"] for r in w4_sessionize_lag(spark, sf_small).collect()}
    from pypgsync_spark.catalog import load_table

    ev = load_table(spark, sf_small, "events")
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(w10) == set(per_user)
    for uid, row in w10.items():
        assert row["n_sessions"] == w4[uid]
        # avg_events * n_sessions recovers the user's total events
        assert round(row["avg_events"] * row["n_sessions"]) == per_user[uid]
        assert row["max_span_ms"] >= 0


def test_v8_recall_bounds_and_truth(spark, sf_small):
    """Recall is n_overlap/k with 0 <= n_overlap <= k, and must equal
    a direct python comparison of the two top-k sets."""
    from pypgsync_spark.queries.vector import (
        _TOPK,
        v1_ann_bruteforce,
        v5_ivf_topk,
        v8_ivf_recall_audit,
    )

    row = v8_ivf_recall_audit(spark, sf_small).collect()[0]
    assert 0 <= row["n_overlap"] <= row["k"] == _TOPK
    assert row["recall"] == pytest.approx(row["n_overlap"] / _TOPK)
    truth = {r["vec_id"] for r in v1_ann_bruteforce(spark, sf_small).collect()}
    approx = {r["vec_id"] for r in v5_ivf_topk(spark, sf_small).collect()}
    assert row["n_overlap"] == len(truth & approx)


def test_samp4_deterministic_and_monotone(spark, sf_small):
    """Two runs agree exactly (seedless hash), and longer docs are
    kept at least as often in aggregate (keep prob is monotone in
    n_chars up to the cap)."""
    from pypgsync_spark.queries.textops import samp4_quality_weighted

    a = sorted(map(tuple, samp4_quality_weighted(spark, sf_small).collect()))
    b = sorted(map(tuple, samp4_quality_weighted(spark, sf_small).collect()))
    assert a == b
    for row in a:
        _, n_total, n_kept, kept_share, kept_avg_q = row
        assert 0 <= n_kept <= n_total
        assert kept_share == pytest.approx(n_kept / n_total, abs=1e-6)
        assert 0.0 <= kept_avg_q <= 1.0


def test_pack3_conserves_token_mass(spark, sf_small):
    """Bucket token masses must sum to the corpus token count, and
    each bucket's batch count must cover its mass at 4096/batch."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.functions.text import token_count
    from pypgsync_spark.queries.textops import pack3_length_buckets

    rows = pack3_length_buckets(spark, sf_small).collect()
    docs = load_table(spark, sf_small, "documents")
    corpus_tokens = docs.select(
        F.sum(token_count(F.col("text"))).alias("s")
    ).collect()[0]["s"]
    assert sum(r["total_tokens"] for r in rows) == corpus_tokens
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert r["bucket_lo"] == r["bucket"] * 64
        assert r["n_batches"] == math.ceil(r["total_tokens"] / 4096)


def test_profile3_matches_numpy_corr(spark, sf_small):
    """Power-sum Pearson must reproduce numpy's corrcoef."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.core import profile3_correlation_matrix

    row = profile3_correlation_matrix(spark, sf_small).collect()[0]
    pdf = (
        load_table(spark, sf_small, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount")
        .toPandas()
    )
    q = pdf["l_quantity"].to_numpy(dtype=np.float64)
    p = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
    d = pdf["l_discount"].to_numpy(dtype=np.float64)
    assert row["corr_qty_price"] == pytest.approx(np.corrcoef(q, p)[0, 1], abs=1e-5)
    assert row["corr_qty_disc"] == pytest.approx(np.corrcoef(q, d)[0, 1], abs=1e-5)
    assert row["corr_price_disc"] == pytest.approx(np.corrcoef(p, d)[0, 1], abs=1e-5)


def test_j23_share_is_component_ratio(spark, sf_small):
    """mkt_share must equal nation_revenue / mkt_revenue and the
    nation slice can never exceed the market."""
    from pypgsync_spark.queries.joins import j23_market_share

    for r in j23_market_share(spark, sf_small).collect():
        assert 0.0 <= r["nation_revenue"] <= r["mkt_revenue"] + 1e-9
        assert r["mkt_share"] == pytest.approx(
            r["nation_revenue"] / r["mkt_revenue"], abs=1e-6
        )


def test_tx11_ttr_invariants(spark, sf_small):
    """Types <= tokens, hapax <= types, ratios consistent."""
    from pypgsync_spark.queries.textops import tx11_type_token_ratio

    for r in tx11_type_token_ratio(spark, sf_small).collect():
        assert 0 < r["n_types"] <= r["n_tokens"]
        assert 0 <= r["n_hapax"] <= r["n_types"]
        assert r["ttr"] == pytest.approx(r["n_types"] / r["n_tokens"], abs=1e-6)
        assert r["hapax_share"] == pytest.approx(
            r["n_hapax"] / r["n_types"], abs=1e-6
        )


def test_w13_streaks_match_python(spark, sf_small):
    """Gaps-and-islands decomposition must agree with a direct python
    consecutive-run scan over the distinct (user, day) pairs."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.functions.time import to_millis
    from pypgsync_spark.queries.core import w13_user_streaks

    got = {r["user_id"]: r for r in w13_user_streaks(spark, sf_small).collect()}
    ev = load_table(spark, sf_small, "events").select(
        "user_id", (to_millis("ts") / 86400000).cast("long").alias("day")
    )
    days: dict[int, set[int]] = {}
    for r in ev.collect():
        days.setdefault(r["user_id"], set()).add(r["day"])
    assert set(got) == set(days)
    for uid, ds in days.items():
        sd = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        row = got[uid]
        assert row["active_days"] == len(ds) == sum(runs)
        assert row["n_streaks"] == len(runs)
        assert row["max_streak"] == max(runs)


def test_w14_gap_fill_is_locf(spark, sf_small):
    """The spine is dense per type, event counts are conserved, and
    every filled value is exactly the last preceding observed average
    (pandas ffill reproduces the column)."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.core import w14_gap_fill_locf

    pdf = w14_gap_fill_locf(spark, sf_small).toPandas()
    total = load_table(spark, sf_small, "events").count()
    assert int(pdf["n_events"].sum()) == total
    for _, g in pdf.groupby("event_type"):
        g = g.sort_values("hr_ms")
        span = int(g["hr_ms"].max() - g["hr_ms"].min())
        assert len(g) == span // 3600000 + 1
        assert (g["hr_ms"].diff().dropna() == 3600000).all()
        # first spine hour is the type's first observed hour
        assert g["n_events"].iloc[0] > 0
        assert g["filled_avg"].notna().all()
        expected = g["hour_avg"].ffill()
        assert np.allclose(g["filled_avg"], expected, atol=1e-9)
        # gap rows exist only where no events landed
        gaps = g[g["n_events"] == 0]
        assert gaps["hour_avg"].isna().all()


def test_a24_zscore_matches_numpy(spark, sf_small):
    """Decimal power sums must reproduce numpy's population mean/std
    standardization and its outlier census."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.core import a24_zscore_outliers

    got = {r["event_type"]: r for r in a24_zscore_outliers(spark, sf_small).collect()}
    pdf = (
        load_table(spark, sf_small, "events")
        .select("event_type", "value")
        .toPandas()
    )
    for et, g in pdf.groupby("event_type"):
        vals = g["value"].to_numpy(dtype=np.float64)
        az = np.abs((vals - vals.mean()) / vals.std(ddof=0))
        row = got[et]
        assert row["n_total"] == len(vals)
        assert row["n_outliers"] == int((az > 2).sum())
        assert row["outlier_rate"] == pytest.approx((az > 2).mean(), abs=1e-5)
        assert row["max_abs_z"] == pytest.approx(az.max(), abs=1e-5)


def test_v9_quantization_matches_numpy(spark, sf_small):
    """Per-label MSE must reproduce a direct numpy int8 uniform
    quantizer, and stay under the worst-case bound (scale/2)^2."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.vector import v9_quantization_error

    got = {r["label"]: r for r in v9_quantization_error(spark, sf_small).collect()}
    pdf = load_table(spark, sf_small, "embeddings").toPandas()
    per_label: dict[int, list[float]] = {}
    bounds: dict[int, float] = {}
    for _, r in pdf.iterrows():
        x = np.asarray(r["embedding"], dtype=np.float64)
        mn, mx = x.min(), x.max()
        scale = (mx - mn) / 255.0
        q = np.floor((x - mn) / scale + 0.5)
        rec = q * scale + mn
        mse = float(((x - rec) ** 2).mean())
        per_label.setdefault(r["label"], []).append(mse)
        bounds[r["label"]] = max(bounds.get(r["label"], 0.0), (scale / 2) ** 2)
    assert set(got) == set(per_label)
    for lbl, mses in per_label.items():
        row = got[lbl]
        assert row["n_vecs"] == len(mses)
        assert row["avg_mse"] == pytest.approx(float(np.mean(mses)), abs=1e-9)
        assert row["max_mse"] == pytest.approx(max(mses), abs=1e-9)
        # uniform quantization can never err more than half a level
        assert row["max_mse"] <= bounds[lbl] + 1e-12


def test_v10_mips_matches_numpy(spark, sf_small):
    """Exact MIPS top-k must equal numpy's dot-product ranking, and
    the plan must be a heap top-k, not a global sort."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.vector import v10_mips_topk

    df = v10_mips_topk(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [(r["vec_id"], r["dot_sim"]) for r in df.collect()]
    pdf = load_table(spark, sf_small, "embeddings").toPandas()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    q = mat[list(ids).index(0)]
    dots = mat @ q
    order = sorted(zip(ids, np.round(dots, 6)), key=lambda t: (-t[1], t[0]))[:10]
    assert [i for i, _ in got] == [int(i) for i, _ in order]
    for (_, a), (_, b) in zip(got, order):
        assert a == pytest.approx(b, abs=2e-6)


def test_tx14_gopher_rules_match_python(spark, sf_small):
    """Every tx14 metric and flag must reproduce a pure-Python
    re-derivation of the Gopher rules over the raw text."""
    import re

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.functions.text import EN_STOPWORDS
    from pypgsync_spark.queries.textops import tx14_gopher_rules

    got = {r["doc_id"]: r for r in tx14_gopher_rules(spark, sf_small).collect()}
    docs = load_table(spark, sf_small, "documents").select("doc_id", "text").collect()
    assert set(got) == {r["doc_id"] for r in docs}
    for r in docs:
        tk = re.split(r"\s+", r["text"].strip().lower())
        n = max(len(tk), 1)
        mwl = round(sum(len(w) for w in tk) / n, 6)
        sym = round(sum(1 for w in tk if re.search(r"#|\.\.\.", w)) / n, 6)
        alpha = round(sum(1 for w in tk if re.search("[a-z]", w)) / n, 6)
        nsw = len(set(tk) & set(EN_STOPWORDS))
        g = got[r["doc_id"]]
        assert g["n_words"] == len(tk)
        assert g["mean_word_len"] == pytest.approx(mwl, abs=1e-9)
        assert g["symbol_word_ratio"] == pytest.approx(sym, abs=1e-9)
        assert g["alpha_word_frac"] == pytest.approx(alpha, abs=1e-9)
        assert g["n_marker_stopwords"] == nsw
        flags = {
            "r_word_count": 50 <= len(tk) <= 100000,
            "r_mean_word_len": 3.0 <= mwl <= 10.0,
            "r_symbol_ratio": sym <= 0.1,
            "r_alpha_words": alpha >= 0.8,
            "r_stopwords": nsw >= 2,
        }
        for k, v in flags.items():
            assert g[k] == int(v), (r["doc_id"], k)
        assert g["passes"] == int(all(flags.values()))


def test_tx15_bigram_xent_matches_python_lm(spark, sf_small):
    """tx15's per-doc cross-entropy must reproduce a counter-based
    add-0.5-smoothed bigram LM built in pure Python."""
    import re
    from collections import Counter

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.textops import tx15_bigram_lm_ppl

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text").collect()
    toks = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower()) for r in docs
    }
    c2, c1, vocab = Counter(), Counter(), set()
    for tk in toks.values():
        vocab.update(tk)
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    V = len(vocab)
    got = {r["doc_id"]: r for r in tx15_bigram_lm_ppl(spark, sf_small).collect()}
    expected_docs = {d for d, tk in toks.items() if len(tk) >= 2}
    assert set(got) == expected_docs
    for d in expected_docs:
        tk = toks[d]
        terms = [
            math.log2(c1[a] + 0.5 * V) - math.log2(c2[(a, b)] + 0.5)
            for a, b in zip(tk, tk[1:])
        ]
        g = got[d]
        assert g["n_bigrams"] == len(terms)
        assert g["xent2"] == pytest.approx(sum(terms) / len(terms), abs=1e-5)
        # smoothed probability < 1 => positive cross-entropy
        assert g["xent2"] > 0


def test_tx16_dup_fraction_matches_python(spark, sf_small):
    """tx16's cross-corpus duplicate-shingle fraction must reproduce a
    pure-Python document-frequency recount, and a corpus of unique
    documents must score dup_frac bounds sanely."""
    import re
    from collections import Counter

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.queries.textops import tx16_dup_shingle_fraction

    docs = load_table(spark, sf_small, "documents").select("doc_id", "text").collect()

    def shingles(text):
        tk = re.split(r"\s+", text.strip().lower())
        return {
            " ".join(tk[i : i + 3]) for i in range(max(len(tk) - 2, 1))
        }

    sh = {r["doc_id"]: shingles(r["text"]) for r in docs}
    df = Counter(s for ss in sh.values() for s in ss)
    got = {
        r["doc_id"]: r for r in tx16_dup_shingle_fraction(spark, sf_small).collect()
    }
    assert set(got) == set(sh)
    for d, ss in sh.items():
        n_dup = sum(1 for s in ss if df[s] > 1)
        g = got[d]
        assert g["n_shingles"] == len(ss)
        assert g["n_dup_shingles"] == n_dup
        assert g["dup_frac"] == pytest.approx(round(n_dup / len(ss), 6), abs=1e-9)
        assert 0.0 <= g["dup_frac"] <= 1.0


def test_d14_semdedup_matches_python(spark, sf_small):
    """d14's per-cell census must reproduce a pure-Python SemDeDup:
    sequential-fold assignment (first-max-wins), exact within-cell
    pairwise cosine, higher-id-dropped keeper rule."""
    from collections import defaultdict

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.operators.similarity import seq_cosine
    from pypgsync_spark.queries.vector import d14_semdedup_cells

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_small, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    cents = [emb[i] for i in sorted(emb) if i < 8]
    cells = defaultdict(list)
    for vid, v in emb.items():
        sims = [seq_cosine(v, c) for c in cents]
        cells[max(range(len(cents)), key=lambda i: (sims[i], -i))].append(vid)
    want = {}
    for cell, vids in cells.items():
        vids = sorted(vids)
        pairs, dropped = 0, set()
        for i, a in enumerate(vids):
            for b in vids[i + 1 :]:
                if seq_cosine(emb[a], emb[b]) > 0.35:
                    pairs += 1
                    dropped.add(b)
        want[cell] = (len(vids), pairs, len(dropped))
    got = {r["cell"]: r for r in d14_semdedup_cells(spark, sf_small).collect()}
    assert set(got) == set(want)
    for cell, (nv, np_, nd) in want.items():
        g = got[cell]
        assert (g["n_vectors"], g["n_pairs"], g["n_dropped"]) == (nv, np_, nd)
        assert g["n_kept"] == nv - nd
    # Threshold-margin canary (the a12b regime-bound pattern): the
    # engine thresholds unrounded GEMM cosines while the oracle
    # thresholds DuckDB's sequential fold — they agree to ~1e-15, so
    # the oracle row is safe only while no fixture pair sits ON the
    # 0.35 boundary. Measured margin: 8.4e-5 at sf0.01, 7.8e-6 at
    # sf0.1; fail loudly if a fixture regeneration ever lands within
    # 1e-9 instead of letting the driver row flake.
    margin = min(
        abs(seq_cosine(emb[a], emb[b]) - 0.35)
        for vids in cells.values()
        for i, a in enumerate(sorted(vids))
        for b in sorted(vids)[i + 1 :]
    )
    assert margin > 1e-9


def test_pipe3_matches_python_replay(spark, sf_small):
    """Full independent replay of pipe3 in pure Python: reference BPE
    trainer -> per-doc rank-greedy encode -> per-source prefix-sum
    packing; the chunk census must match exactly."""
    import re
    from collections import Counter, defaultdict

    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.functions.text import BPE_ISH_PATTERN
    from pypgsync_spark.operators.bpe import encode_word, train_bpe_reference
    from pypgsync_spark.queries.textops import pipe3_bpe_tokenize_pack

    docs = (
        load_table(spark, sf_small, "documents")
        .select("doc_id", "source", "text")
        .collect()
    )
    pattern = re.compile(BPE_ISH_PATTERN)
    words = {r["doc_id"]: pattern.findall(r["text"].lower()) for r in docs}
    wf = Counter(w for ws in words.values() for w in ws)
    merges = train_bpe_reference(dict(wf), n_merges=20)
    ranks = {p: i for i, p in enumerate(merges)}
    enc_len = {w: len(encode_word(w, ranks)) for w in wf}
    n_tok = {d: sum(enc_len[w] for w in ws) for d, ws in words.items()}

    by_source = defaultdict(list)
    for r in docs:
        by_source[r["source"]].append(r["doc_id"])
    want: dict = {}
    for src, ids in by_source.items():
        off = 0
        for d in sorted(ids):
            chunk = off // 1024
            n, tot = want.get((src, chunk), (0, 0))
            want[(src, chunk)] = (n + 1, tot + n_tok[d])
            off += n_tok[d]
    got = {
        (r["source"], r["chunk_id"]): (r["n_docs"], r["chunk_tokens"])
        for r in pipe3_bpe_tokenize_pack(spark, sf_small).collect()
    }
    assert got == want


def test_kmeans_fit_partition_invariant(spark, sf_small):
    """kmeans_fit's decimal-exact means make the trained centroids
    BIT-identical under any input partitioning — the property that
    lets v11 be golden-pinned."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.operators.similarity import kmeans_fit

    emb = load_table(spark, sf_small, "embeddings")
    a = kmeans_fit(emb, k=8, n_iter=3)
    b = kmeans_fit(emb.repartition(7), k=8, n_iter=3)
    assert a == b  # element-wise float equality, no tolerance


def test_kmeans_fit_improves_over_seeds(spark, sf_small):
    """Three Lloyd iterations must not make the index worse than the
    raw lowest-id seeds: mean cosine of members to their assigned
    centroid is at least the seed assignment's."""
    from pypgsync_spark.catalog import load_table
    from pypgsync_spark.operators.similarity import (
        ivf_assign,
        kmeans_fit,
        seq_cosine,
    )

    emb = load_table(spark, sf_small, "embeddings")
    rows = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.select("vec_id", "embedding").collect()
    }
    seeds = [rows[i] for i in sorted(rows) if i < 8]
    fitted = kmeans_fit(emb, k=8, n_iter=3)

    def quality(cents):
        tot = 0.0
        for v in rows.values():
            tot += max(seq_cosine(v, c) for c in cents)
        return tot / len(rows)

    assert quality(fitted) >= quality(seeds) - 1e-12
