"""End-to-end evaluation CLI drive (reference `evaluate_onevision.py`
workflow): synthetic data, tiny model, predictions CSV with the exact
reference columns + incremental summary — including the int8 serving
path (`--quant int8`)."""

import os

import pandas as pd
import pytest

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli import (
    evaluate_onevision,
)

pytestmark = pytest.mark.slow

REF_COLUMNS = ["Question_Id", "Questions", "Question_Type", "Answers",
               "Model_Answer"]


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_evaluate_onevision_cli(tmp_path, quant):
    preds = str(tmp_path / f"preds_{quant}")
    evaluate_onevision.main([
        "--synthetic_data", "--cpu", "--subset_percentage", "0.02",
        "--max_new_tokens", "4", "--predictions_dir", preds,
        "--quant", quant,
    ])
    csvs = [f for f in os.listdir(preds) if f.endswith(".csv")]
    assert csvs, os.listdir(preds)
    df = pd.read_csv(os.path.join(preds, csvs[0]))
    assert list(df.columns)[: len(REF_COLUMNS)] == REF_COLUMNS
    assert len(df) >= 1 and df["Model_Answer"].notna().all()
    summary = os.path.join(preds, "summary", "results_summary.csv")
    assert os.path.exists(summary)
    sdf = pd.read_csv(summary)
    assert {"Simple_Accuracy", "Neural_Similarity"} <= set(sdf.columns)


def test_evaluate_onevision_batched_matches_bs1(tmp_path):
    """--eval_batch_size 2 (with a padded ragged tail batch) must produce
    exactly the rows of the bs=1 run: same Question_Ids, same answers, no
    duplicated pad row.  Batched decode is the eval workflow's cheap
    throughput multiplier (VERDICT r2 next #8)."""
    outs = {}
    for bs in (1, 2):
        preds = str(tmp_path / f"preds_bs{bs}")
        evaluate_onevision.main([
            "--synthetic_data", "--cpu", "--subset_percentage", "0.03",
            "--max_new_tokens", "4", "--predictions_dir", preds,
            "--eval_batch_size", str(bs),
        ])
        csvs = [f for f in os.listdir(preds) if f.endswith(".csv")]
        outs[bs] = pd.read_csv(os.path.join(preds, csvs[0]))
    a, b = outs[1], outs[2]
    assert list(a["Question_Id"]) == list(b["Question_Id"])
    assert list(a["Model_Answer"].fillna("")) == list(b["Model_Answer"].fillna(""))
