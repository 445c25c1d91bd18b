"""Deterministic sampling/splitting operators (operators/sampling.py):
the properties that matter at corpus scale — reproducibility under
re-run and repartitioning, disjoint/exhaustive splits, rate accuracy.
"""

import pytest
from pyspark.sql import functions as F

from libmr_spark.operators.sampling import (
    _hex_cut,
    hash_sample,
    mix_sources,
    sample_fixed_k,
    split_column,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hex_cut_bounds():
    assert _hex_cut(0.5) == "8000"
    # boundary rates can't be expressed as a string compare — _hex_cut
    # refuses them (keep_condition turns them into literal TRUE/FALSE)
    with pytest.raises(ValueError):
        _hex_cut(0.0)
    with pytest.raises(ValueError):
        _hex_cut(1.0)


def test_hash_sample_reproducible_and_partition_invariant(docs):
    ids1 = sorted(r.doc_id for r in hash_sample(docs, 0.2, "doc_id").select("doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in hash_sample(docs.repartition(7, "source"), 0.2, "doc_id").select("doc_id").collect()
    )
    assert ids1 == ids2 and len(ids1) > 0


def test_hash_sample_rate_accuracy(docs):
    n = docs.count()
    k = hash_sample(docs, 0.3, "doc_id").count()
    # binomial 3-sigma bound at n=500, p=0.3 → ±~31
    assert abs(k - 0.3 * n) < 4 * (n * 0.3 * 0.7) ** 0.5


def test_hash_sample_seed_changes_membership(docs):
    a = {r.doc_id for r in hash_sample(docs, 0.3, "doc_id", seed="a").collect()}
    b = {r.doc_id for r in hash_sample(docs, 0.3, "doc_id", seed="b").collect()}
    assert a != b


def test_split_disjoint_exhaustive(docs):
    out = docs.select("doc_id", split_column(F.col("doc_id"), {"train": 0.8, "val": 0.1, "test": 0.1}))
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # exhaustive, no overlap possible (single label col)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_weights_must_sum_to_one():
    with pytest.raises(ValueError):
        split_column(F.col("x"), {"a": 0.5, "b": 0.2})


def test_split_consistent_with_sample(docs):
    """The 'train' split at 0.8 is exactly the rows hash_sample(0.8) keeps
    (same bucket ranges) — membership can't drift between operators."""
    train = {
        r.doc_id
        for r in docs.select("doc_id", split_column(F.col("doc_id"), {"train": 0.8, "rest": 0.2}))
        .filter(F.col("split") == "train")
        .collect()
    }
    sampled = {r.doc_id for r in hash_sample(docs, 0.8, "doc_id").collect()}
    assert train == sampled


def test_mix_sources_rates_and_drop(docs):
    out = mix_sources(docs, {"src0": 1.0, "src1": 0.0}, "source", "doc_id")
    per_src = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src.get("src0", 0) == docs.filter(F.col("source") == "src0").count()  # keep-all
    assert "src1" not in per_src  # rate 0
    assert "src2" not in per_src  # absent from rates → dropped


def test_sample_fixed_k_exact_and_stable(docs):
    s1 = sorted(r.doc_id for r in sample_fixed_k(docs, 37, "doc_id").collect())
    s2 = sorted(r.doc_id for r in sample_fixed_k(docs.repartition(5), 37, "doc_id").collect())
    assert len(s1) == 37 and s1 == s2


def test_sample_k_per_group_exact_and_stable(docs):
    from libmr_spark.operators.sampling import sample_k_per_group

    out = sample_k_per_group(docs, 7, "doc_id", ["source"])
    per_src = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    sizes = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src == {s: min(7, n) for s, n in sizes.items()}
    # partitioning-invariant membership (no RNG, pure content hash)
    a = sorted((r.source, r.doc_id) for r in out.collect())
    b = sorted(
        (r.source, r.doc_id)
        for r in sample_k_per_group(docs.repartition(11), 7, "doc_id", ["source"]).collect()
    )
    assert a == b


def test_temperature_mixture_weights_alpha_limits(spark):
    from libmr_spark.operators.sampling import temperature_mixture_weights

    df = spark.createDataFrame(
        [("a", i) for i in range(160)]
        + [("b", i) for i in range(40)]
        + [("c", i) for i in range(10)],
        "source string, doc_id long",
    )
    # alpha=1 reproduces raw proportions; alpha=0 is uniform
    for alpha, expect in [
        (1.0, {"a": 160 / 210, "b": 40 / 210, "c": 10 / 210}),
        (0.0, {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}),
    ]:
        got = {r.source: r.weight for r in temperature_mixture_weights(df, alpha=alpha).collect()}
        assert got == {s: pytest.approx(w, abs=2e-6) for s, w in expect.items()}

    # alpha=0.3 compresses: small domains boosted, large damped, order kept
    rows = {r.source: r for r in temperature_mixture_weights(df, alpha=0.3).collect()}
    assert rows["a"].boost < 1 < rows["c"].boost
    assert rows["a"].weight > rows["b"].weight > rows["c"].weight
    assert abs(sum(r.weight for r in rows.values()) - 1.0) < 1e-5
    assert sum(r.target_docs for r in rows.values()) <= 210
    # partitioning invariance (DECIMAL normalizer): same bits at any layout
    again = {
        r.source: r.weight
        for r in temperature_mixture_weights(df.repartition(13), alpha=0.3).collect()
    }
    assert again == {s: r.weight for s, r in rows.items()}


def test_quality_weighted_sample_props(spark, sf_dir):
    from libmr_spark.queries_pipeline import quality_weighted_sample_q

    out = quality_weighted_sample_q(spark, sf_dir).collect()
    assert len(out) == 100 and len({r.doc_id for r in out}) == 100
    # weighting must bias the sample toward quality: sampled mean
    # quality clears the corpus mean (deterministic given fixed hashes)
    from libmr_spark.functions.text import quality_score
    from libmr_spark.sources.readers import load_table

    docs = load_table(spark, "documents", sf_dir)
    corpus_mean = (
        docs.select(quality_score(F.col("text")).alias("q")).agg(F.avg("q")).first()[0]
    )
    sample_mean = sum(r.quality for r in out) / len(out)
    assert sample_mean > corpus_mean
    # determinism: a re-run returns the same members (content-hash
    # uniforms, no RNG state)
    again = {r.doc_id for r in quality_weighted_sample_q(spark, sf_dir).collect()}
    assert again == {r.doc_id for r in out}


def test_kanon_release_levels_and_invariants(spark):
    # all three release levels in one dataset; invariants: every
    # released row has n >= k except the single terminal bucket, and
    # total membership is conserved across the release
    from pyspark.sql import functions as F

    from libmr_spark.operators.sampling import kanon_release

    rows = []
    rows += [("a", "s1", 10.0)] * 12          # released as-is
    rows += [("a", "s2", 5.0)] * 4            # a: suppressed 4+7=11 -> released
    rows += [("a", "s3", 2.0)] * 7
    rows += [("b", "s1", 1.0)] * 3            # b: suppressed 3 < k -> terminal
    rows += [("c", "s2", 8.0)] * 2            # c: suppressed 2 < k -> terminal
    df = spark.createDataFrame(rows, ["nat", "seg", "bal"])
    out = kanon_release(df, ["nat", "seg"], k=10, value_col="bal").collect()
    got = {
        (r.nat, r.seg): (r.n, None if r.total is None else float(r.total))
        for r in out
    }
    # the sub-k terminal bucket releases its COUNT (conservation) but
    # a NULL sum — a 5-member global remainder's exact total would
    # break the k guarantee the API advertises
    assert got == {
        ("a", "s1"): (12, 120.0),
        ("a", "__suppressed__"): (11, 34.0),
        (None, "__suppressed__"): (5, None),
    }
    assert sum(n for n, _ in got.values()) == len(rows)  # conservation
    assert all(n >= 10 for (nat, _), (n, _) in got.items() if nat is not None)
    # every released SUM aggregates >= k members
    assert all(n >= 10 for n, total in got.values() if total is not None)

    # a terminal bucket that reaches k releases its sum: add a third
    # sub-k nation so the global remainder crosses k=10
    rows2 = rows + [("d", "s3", 4.0)] * 6
    df2 = spark.createDataFrame(rows2, ["nat", "seg", "bal"])
    out2 = kanon_release(df2, ["nat", "seg"], k=10, value_col="bal").collect()
    got2 = {(r.nat, r.seg): (r.n, r.total) for r in out2}
    n_t, tot_t = got2[(None, "__suppressed__")]
    assert n_t == 11 and float(tot_t) == 43.0


def test_dp_geometric_release_noise_exact_and_scaled(spark):
    # the derandomized mechanism is a pure function of (seed, key):
    # noise must equal the python replay of the md5/washed-ln/round
    # chain exactly, shrink when epsilon grows, and repeat identically
    import hashlib
    import math

    from libmr_spark.operators.sampling import dp_geometric_release

    rows = [(f"g{i}", j) for i in range(8) for j in range(i + 1)]
    df = spark.createDataFrame(rows, ["grp", "x"])
    true_n = {f"g{i}": i + 1 for i in range(8)}

    def py_noise(key, eps, seed="42"):
        h = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16)
        t = (2 * h + 1) / 8589934592.0 - 0.5
        mag = round(math.log(1 - 2 * abs(t)), 6)
        x = -(1.0 / eps) * math.copysign(1.0, t) * mag
        # Spark/DuckDB ROUND(x, 0) is half-away-from-zero
        return int(math.floor(abs(x) + 0.5) * math.copysign(1.0, x))

    got = {
        r.grp: r.n_noisy
        for r in dp_geometric_release(df, ["grp"], epsilon=0.5).collect()
    }
    assert got == {
        k: n + py_noise(k, 0.5) for k, n in true_n.items()
    }
    # determinism
    again = {
        r.grp: r.n_noisy
        for r in dp_geometric_release(df, ["grp"], epsilon=0.5).collect()
    }
    assert again == got
    # larger epsilon (weaker privacy) -> noise magnitude never grows
    loose = {
        r.grp: r.n_noisy
        for r in dp_geometric_release(df, ["grp"], epsilon=2.0).collect()
    }
    for k, n in true_n.items():
        assert abs(loose[k] - n) <= abs(got[k] - n), k
    # a different seed moves the noise (the release is seed-keyed)
    other = {
        r.grp: r.n_noisy
        for r in dp_geometric_release(df, ["grp"], epsilon=0.5, seed="7").collect()
    }
    assert other == {k: n + py_noise(k, 0.5, "7") for k, n in true_n.items()}


def test_dp_sum_release_clamp_and_independent_stream(spark):
    # clamping bounds one individual's contribution; noise is the
    # python-replayable rounded-Laplace(S/eps) chain on a stream
    # DISJOINT from the count release's (joint publication composes
    # two independent mechanisms)
    import hashlib
    import math

    from libmr_spark.operators.sampling import (
        dp_geometric_release,
        dp_sum_release,
    )

    rows = [("g", 100.0)] * 3 + [("g", 99999.0)] + [("h", -50.0)] * 2
    df = spark.createDataFrame(rows, ["grp", "v"])

    def py_noise(key, b, seed="42", tag="sum"):
        h = int(
            hashlib.md5(f"{seed}:{tag}:{key}".encode()).hexdigest()[:8], 16
        )
        t = (2 * h + 1) / 8589934592.0 - 0.5
        mag = round(math.log(1 - 2 * abs(t)), 6)
        x = -b * math.copysign(1.0, t) * mag
        return int(math.floor(abs(x) + 0.5) * math.copysign(1.0, x))

    out = {
        r.grp: r.sum_noisy
        for r in dp_sum_release(
            df, ["grp"], "v", lo=0.0, hi=500.0, epsilon=0.5
        ).collect()
    }
    # clamped true sums: g = 3*100 + 500 (outlier clamped), h = 0 + 0
    assert out == {
        "g": round(800.0 + py_noise("g", 1000.0), 2),
        "h": round(0.0 + py_noise("h", 1000.0), 2),
    }
    # the count release's noise comes from its own (untagged) stream:
    # its exact value is count + the tagless chain, which for these
    # groups differs from the sum-tagged chain's draw
    cnt = {
        r.grp: r.n_noisy
        for r in dp_geometric_release(df, ["grp"], epsilon=0.5).collect()
    }
    def py_count_noise(key, eps=0.5, seed="42"):
        h = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:8], 16)
        t = (2 * h + 1) / 8589934592.0 - 0.5
        mag = round(math.log(1 - 2 * abs(t)), 6)
        x = -(1.0 / eps) * math.copysign(1.0, t) * mag
        return int(math.floor(abs(x) + 0.5) * math.copysign(1.0, x))

    assert cnt == {"g": 4 + py_count_noise("g"), "h": 2 + py_count_noise("h")}
    with __import__("pytest").raises(ValueError, match="lo < hi"):
        dp_sum_release(df, ["grp"], "v", lo=5.0, hi=5.0)


def test_kanon_dp_release_composition(spark):
    # exact above k, noisy-count/NULL-sum below k, every group present,
    # sub-k counts clamped at zero, noise from the 'kanon' stream
    import hashlib
    import math

    from libmr_spark.operators.sampling import kanon_dp_release

    rows = [("big", 1.0)] * 12 + [("tiny", 9.0)] * 2 + [("solo", 4.0)]
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = {
        r.grp: (r.n_released, r.total)
        for r in kanon_dp_release(df, ["grp"], k=10, value_col="v").collect()
    }

    def noise(key, eps=0.5, seed="42"):
        h = int(hashlib.md5(f"{seed}:kanon:{key}".encode()).hexdigest()[:8], 16)
        t = (2 * h + 1) / 8589934592.0 - 0.5
        mag = round(math.log(1 - 2 * abs(t)), 6)
        x = -(1.0 / eps) * math.copysign(1.0, t) * mag
        return int(math.floor(abs(x) + 0.5) * math.copysign(1.0, x))

    assert set(out) == {"big", "tiny", "solo"}  # every group appears
    assert out["big"] == (12, 12.0)             # exact above k
    assert out["tiny"] == (max(0, 2 + noise("tiny")), None)
    assert out["solo"] == (max(0, 1 + noise("solo")), None)


def test_dp_release_public_domain_frame(spark):
    # the known-domain fix (ADVICE r10): with a public domain frame,
    # EVERY domain key emits a row — empty groups release noise around
    # a true count of 0 / sum of 0.0 — and keys outside the domain are
    # dropped; row existence therefore carries no information
    import hashlib
    import math

    from libmr_spark.operators.sampling import (
        dp_geometric_release,
        dp_sum_release,
        kanon_dp_release,
    )

    df = spark.createDataFrame(
        [("a", 1.0)] * 12 + [("b", 2.0)] * 2 + [("zz", 5.0)], ["grp", "v"]
    )
    dom = spark.createDataFrame([("a",), ("b",), ("c",)], ["grp"])

    def noise(key, prefix="", eps=0.5, seed="42", b=None):
        h = int(hashlib.md5(f"{seed}:{prefix}{key}".encode()).hexdigest()[:8], 16)
        t = (2 * h + 1) / 8589934592.0 - 0.5
        mag = round(math.log(1 - 2 * abs(t)), 6)
        x = -(b if b is not None else 1.0 / eps) * math.copysign(1.0, t) * mag
        return int(math.floor(abs(x) + 0.5) * math.copysign(1.0, x))

    out = {
        r.grp: r.n_noisy
        for r in dp_geometric_release(df, ["grp"], domain=dom).collect()
    }
    # empty group 'c' released (noisy 0), out-of-domain 'zz' dropped
    assert set(out) == {"a", "b", "c"}
    assert out["c"] == 0 + noise("c")
    assert out["a"] == 12 + noise("a")

    out = {
        r.grp: r.sum_noisy
        for r in dp_sum_release(
            df, ["grp"], "v", lo=0.0, hi=10.0, domain=dom
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["c"] == round(0.0 + noise("c", prefix="sum:", b=10.0 / 0.5), 2)

    out = {
        r.grp: (r.n_released, r.total)
        for r in kanon_dp_release(
            df, ["grp"], k=10, value_col="v", domain=dom
        ).collect()
    }
    assert set(out) == {"a", "b", "c"}
    assert out["a"] == (12, 12.0)  # exact above k, unaffected by framing
    assert out["c"] == (max(0, 0 + noise("c", prefix="kanon:")), None)


def test_dsir_importance_select_invariants(docs):
    from libmr_spark.operators.sampling import dsir_importance_select

    tgt = F.substring("source", 4, 10).cast("int") < 2
    sel = dsir_importance_select(
        docs, tgt, keep_cols=["source"], k=50, buckets=512, seed="t"
    ).collect()
    # exactly k winners, ranks 1..k, no target docs in the sample
    assert len(sel) == 50
    assert sorted(r["rank"] for r in sel) == list(range(1, 51))
    assert all(int(r.source[3:]) >= 2 for r in sel)
    # ordered by gumbel_key descending
    by_rank = sorted(sel, key=lambda r: r["rank"])
    keys = [r.gumbel_key for r in by_rank]
    assert keys == sorted(keys, reverse=True)
    # partition-invariant: identical winner set under a hostile layout
    sel2 = dsir_importance_select(
        docs.repartition(13, "lang"), tgt,
        keep_cols=["source"], k=50, buckets=512, seed="t",
    ).collect()
    assert {(r.doc_id, r["rank"]) for r in sel} == {(r.doc_id, r["rank"]) for r in sel2}
    # the selection skews toward target-like docs: mean log-weight of
    # winners strictly above the raw-pool mean (DSIR's whole point)
    all_scored = dsir_importance_select(
        docs, tgt, k=10**9, buckets=512, seed="t"
    ).collect()
    mean_sel = sum(r.log_weight for r in sel) / len(sel)
    mean_all = sum(r.log_weight for r in all_scored) / len(all_scored)
    assert mean_sel > mean_all


def test_dp_user_level_contribution_bounding(spark):
    from libmr_spark.operators.sampling import dp_user_level_count_release

    rows = []
    eid = 0
    for u in range(10):
        for t in ("a", "b", "c"):
            for _ in range(4):
                rows.append((u, t, eid)); eid += 1
    base = spark.createDataFrame(
        rows, "user_id bigint, event_type string, event_id bigint"
    )
    # neighboring dataset: one HEAVY user adds 100 rows of one type and
    # 50 of another — without bounding this swings counts by 150
    heavy = [(99, "a", 10_000 + i) for i in range(100)]
    heavy += [(99, "b", 20_000 + i) for i in range(50)]
    neigh = base.union(
        spark.createDataFrame(
            heavy, "user_id bigint, event_type string, event_id bigint"
        )
    )
    dom = spark.createDataFrame([("a",), ("b",), ("c",)], "event_type string")

    def release(df):
        return {
            r.event_type: r.n_noisy
            for r in dp_user_level_count_release(
                df, "user_id", ["event_type"], "event_id",
                rows_per_group=3, groups_per_user=2,
                epsilon=0.5, seed="s", domain=dom,
            ).collect()
        }

    a, b = release(base), release(neigh)
    # noise is a pure function of (seed, group key), so the per-group
    # release difference IS the capped-count difference: one extra
    # user moves each group by <= rows_per_group and the whole vector
    # by <= rows_per_group * groups_per_user
    diffs = {t: b[t] - a[t] for t in a}
    assert all(0 <= d <= 3 for d in diffs.values()), diffs
    assert sum(diffs.values()) <= 6, diffs
    # every domain key released exactly once, membership covered
    assert set(a) == {"a", "b", "c"}
    # determinism: identical rerun, identical release
    assert release(base) == a
