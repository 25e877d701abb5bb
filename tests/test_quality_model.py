"""Learned quality filter: the classifier must actually distill the
heuristic (AUC floor on held-out docs), and the score surface must be
complete and well-formed."""

from doeecommerce_datapipeline_spark.operators.quality_model import (
    HOLDOUT_MOD,
    holdout_auc,
    quality_classifier_scores,
    quality_classifier_scores_full,
    train_quality_classifier,
)

SF = "/root/testdata/sf0.001"


def test_holdout_auc_floor(spark):
    auc = holdout_auc(spark, SF)
    assert auc >= 0.70, f"holdout AUC {auc:.3f} below floor"


def test_scores_cover_every_document(spark):
    rows = quality_classifier_scores_full(spark, SF).collect()
    n_docs = spark.read.parquet(SF + "/documents.parquet").count()
    assert len(rows) == n_docs
    assert all(0.0 <= r["p_keep"] <= 1.0 for r in rows)
    # holdout flag matches the documented slice
    assert all(
        r["is_holdout"] == (r["doc_id"] % HOLDOUT_MOD == HOLDOUT_MOD - 1)
        for r in rows
    )
    # the model must agree with the heuristic on the vast majority —
    # it is a distillation, not an independent signal
    agree = sum(r["heuristic_keep"] == r["model_keep"] for r in rows)
    assert agree / len(rows) >= 0.8


def test_registry_face_contract_flags_hold(spark):
    """The r7 oracle-paired face: exact halves match an independent
    recount of the full score table, and both contract flags are TRUE
    on every slice (the oracle pins them as literals)."""
    rows = {
        r.is_holdout: r
        for r in quality_classifier_scores(spark, SF).collect()
    }
    assert set(rows) == {True, False}
    full = quality_classifier_scores_full(spark, SF).collect()
    for flag, r in rows.items():
        sl = [x for x in full if x.is_holdout == flag]
        assert r.n_docs == len(sl)
        assert r.n_heuristic_keep == sum(x.heuristic_keep for x in sl)
        assert r.cells_conserve
        assert r.accuracy_ge_070


def test_training_survives_session_observations(spark):
    """Regression: once any df.observe instantiates the session's
    ObservationManager, an in-memory LogisticRegressionModel's
    trainingSummary (which holds the SparkSession) becomes
    unserializable inside scoring closures. The trainer save/load
    round-trips the model to strip the summary — bronze's audit
    observations and MLlib scoring must coexist on one session."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("pollute")
    spark.range(10).observe(obs, F.count(F.lit(1)).alias("n")).write.format(
        "noop"
    ).mode("overwrite").save()
    assert obs.get["n"] == 10
    scored = quality_classifier_scores_full(spark, SF)
    assert scored.count() > 0
    assert holdout_auc(spark, SF) >= 0.70


def test_shared_model_fits_once(spark):
    """Scoring + evaluation accept one pre-trained model, so a combined
    quality report runs the L-BFGS fit exactly once."""
    from doeecommerce_datapipeline_spark.io import table

    model = train_quality_classifier(table(spark, SF, "documents"))
    scored = quality_classifier_scores_full(spark, SF, model=model)
    auc = holdout_auc(spark, SF, model=model)
    assert scored.count() > 0 and auc >= 0.70


def test_isotonic_calibration_matches_bruteforce_and_is_monotone(
    spark, tmp_path
):
    """The distributed PAVA must equal a straightforward reference
    implementation on a planted non-monotone (score, label) set, and
    its block rates must be nondecreasing with nonoverlapping spans."""
    import pytest

    from doeecommerce_datapipeline_spark.operators.quality_model import (
        isotonic_calibration_model,
    )

    # verify via the operator's own kernel against an independent
    # reference PAVA on a fixture exercised through the full Spark path
    d = "/root/testdata/sf0.001"
    rows = sorted(
        isotonic_calibration_model(spark, d).collect(),
        key=lambda r: r.score_lo,
    )
    assert rows
    total = sum(r.n for r in rows)
    assert total == 500  # every doc lands in exactly one block
    for a, b in zip(rows, rows[1:]):
        assert a.score_hi <= b.score_lo + 1e-12  # ordered spans
        assert a.calibrated_rate <= b.calibrated_rate + 1e-12  # isotone
    assert all(0.0 <= r.calibrated_rate <= 1.0 for r in rows)

    # independent reference PAVA over the same (score, label) pairs
    from doeecommerce_datapipeline_spark.operators.quality_model import (
        quality_classifier_scores_full,
        train_quality_classifier,
    )
    from doeecommerce_datapipeline_spark.io import table

    model = train_quality_classifier(table(spark, d, "documents"))
    pairs = sorted(
        (r.p_keep, r.doc_id, int(r.heuristic_keep))
        for r in quality_classifier_scores_full(spark, d, model=model).collect()
    )
    vals = [y for _, _, y in pairs]
    # classic stack PAVA on rates
    blk = []  # (n, sum)
    for y in vals:
        blk.append([1, y])
        while len(blk) > 1 and blk[-1][1] * blk[-2][0] < blk[-2][1] * blk[-1][0]:
            n2, s2 = blk.pop()
            blk[-1][0] += n2
            blk[-1][1] += s2
    rows2 = sorted(
        isotonic_calibration_model(spark, d, model=model).collect(),
        key=lambda r: r.score_lo,
    )
    assert [r.n for r in rows2] == [n for n, _ in blk]
    for r, (n, s) in zip(rows2, blk):
        assert r.calibrated_rate == pytest.approx(s / n, abs=1e-12)


def test_isotonic_registry_face_matches_minimax(spark):
    """The r6 oracle-paired face: the PAVA per-point fit must equal
    the closed-form minimax characterization fitted(i) = max_{j<=i}
    min_{k>=i} mean(y[j..k]) BIT-EXACTLY (this identity is what the
    DuckDB twin evaluates), and be nondecreasing in (score, doc_id)
    order."""
    from doeecommerce_datapipeline_spark.operators.quality_model import (
        isotonic_calibration,
    )

    d = "/root/testdata/sf0.001"
    got = isotonic_calibration(spark, d).collect()
    assert got
    # every holdout doc, exactly once
    assert sorted(r.doc_id for r in got) == sorted(
        set(r.doc_id for r in got)
    )
    assert all(r.doc_id % 5 == 4 for r in got)

    pts = sorted((r.score, r.doc_id, r.y_keep) for r in got)
    y = [p[2] for p in pts]
    n = len(y)
    cum = [0]
    for v in y:
        cum.append(cum[-1] + v)
    mean = lambda j, k: (cum[k + 1] - cum[j]) / (k + 1 - j)  # noqa: E731
    fitted = [
        max(min(mean(j, k) for k in range(i, n)) for j in range(i + 1))
        for i in range(n)
    ]
    by_id = {r.doc_id: r.calibrated_rate for r in got}
    for (s, did, _), f in zip(pts, fitted):
        assert by_id[did] == f, (did, s)
    assert fitted == sorted(fitted)
