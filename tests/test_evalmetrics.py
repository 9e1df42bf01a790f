"""Evaluation metrics (operators/evalmetrics.py): hand-checked
confusion/AUC values incl. tie handling, degenerate-class NULLs, and
calibration bin arithmetic."""

from __future__ import annotations

import pytest


def _report(spark, rows, thr=500_000):
    from modeltracking_spark.operators.evalmetrics import (
        binary_classification_report,
    )

    df = spark.createDataFrame(rows, "y long, score_e6 long")
    return binary_classification_report(df, threshold_e6=thr).first()


def test_confusion_and_ratios_hand_example(spark):
    rows = [
        (1, 900_000), (1, 700_000), (1, 400_000),   # 2 tp, 1 fn
        (0, 600_000), (0, 300_000), (0, 100_000),   # 1 fp, 2 tn
    ]
    r = _report(spark, rows)
    assert (r["tp"], r["fp"], r["tn"], r["fn"]) == (2, 1, 2, 1)
    assert r["acc_e6"] == 666_667        # 4/6
    assert r["prec_e6"] == 666_667       # 2/3
    assert r["rec_e6"] == 666_667        # 2/3
    assert r["f1_e6"] == 666_667         # 4/6 via 2tp/(2tp+fp+fn)
    # AUC by hand: positive scores {9,7,4}, negative {6,3,1} (x1e5);
    # pairs won 8 of 9 -> 0.888889
    assert r["auc_e6"] == 888_889


def test_auc_tie_handling_exact(spark):
    """A tied positive/negative pair contributes exactly 1/2 — the
    average-rank formula, not a biased > or >= count."""
    rows = [(1, 500_000), (0, 500_000)]  # one tied pair: AUC = 0.5
    assert _report(spark, rows)["auc_e6"] == 500_000
    rows = [(1, 500_000), (1, 500_000), (0, 500_000), (0, 900_000)]
    # pairs: vs tied neg -> 1/2 + 1/2; vs higher neg -> 0 + 0 => 1/4
    assert _report(spark, rows)["auc_e6"] == 250_000


def test_perfect_and_inverted_rankers(spark):
    good = [(1, 900_000), (1, 800_000), (0, 200_000), (0, 100_000)]
    assert _report(spark, good)["auc_e6"] == 1_000_000
    bad = [(0, 900_000), (0, 800_000), (1, 200_000), (1, 100_000)]
    assert _report(spark, bad)["auc_e6"] == 0


def test_degenerate_single_class_yields_nulls_not_errors(spark):
    r = _report(spark, [(1, 700_000), (1, 200_000)])
    assert r["auc_e6"] is None and r["rec_e6"] == 500_000
    r = _report(spark, [(0, 700_000), (0, 200_000)])
    assert r["auc_e6"] is None and r["rec_e6"] is None
    # no positives predicted -> precision NULL (0/0), while F1 is a
    # well-defined 0 (2tp+fp+fn = fn = 1 > 0)
    r = _report(spark, [(1, 100_000), (0, 200_000)], thr=900_000)
    assert r["prec_e6"] is None and r["f1_e6"] == 0


def test_calibration_bins_arithmetic(spark):
    from modeltracking_spark.operators.evalmetrics import calibration_bins

    rows = [(1, 950_000), (0, 940_000), (1, 60_000), (0, 50_000),
            (0, 55_000)]
    df = spark.createDataFrame(rows, "y long, score_e6 long")
    bins = {r["bin"]: r for r in calibration_bins(df).collect()}
    assert set(bins) == {0, 9}
    assert bins[0]["n"] == 3 and bins[0]["n_pos"] == 1
    assert bins[0]["mean_score_e6"] == 55_000
    assert bins[0]["pos_rate_e6"] == 333_333
    assert bins[9]["n"] == 2 and bins[9]["mean_score_e6"] == 945_000
    # the 1.0-score edge stays in the top bin, not bin 10
    top = spark.createDataFrame([(1, 1_000_000)], "y long, score_e6 long")
    assert calibration_bins(top).first()["bin"] == 9
