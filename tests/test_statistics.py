"""Dataset statistics baselines + misc eval utilities."""

import numpy as np
import pandas as pd
import pytest

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.statistics import (
    calculate_confidence_interval,
    calculate_proportion_confidence_interval,
    oracle_model,
    random_model,
)


def _df():
    rows = []
    for i in range(40):
        rows.append({
            "Questions": f"q{i}",
            "Answers": ["chair", "table"][i % 2],
            "Question_Type": "Object Identification",
        })
        rows.append({
            "Questions": f"yn{i}",
            "Answers": ["yes", "no"][i % 2],
            "Question_Type": "Yes/No",
        })
    return pd.DataFrame(rows)


def test_random_model_expected_accuracy():
    out = random_model(_df(), seed=0)
    assert out["Yes/No"]["Expected Accuracy"] == 50.0
    assert out["Object Identification"]["Expected Accuracy"] == 50.0
    for m in out.values():
        assert 0.0 <= m["Accuracy"] <= 1.0


def test_oracle_model():
    df = _df()
    q, a = oracle_model(df, 0)
    assert q == "q0" and a == "chair"
    with pytest.raises(IndexError):
        oracle_model(df, 10_000)


def test_confidence_intervals():
    data = pd.Series(np.random.default_rng(0).normal(10, 2, size=400))
    lo, hi = calculate_confidence_interval(data)
    assert lo < 10 < hi and (hi - lo) < 1.0

    binary = pd.Series([1] * 90 + [2] * 10)
    lo, hi = calculate_proportion_confidence_interval(binary)
    assert 0.0 <= lo < 0.1 < hi <= 1.0


def test_openai_depth_image_prep():
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli.openai_eval_depth import (
        depth_images_for_eval,
    )

    depth = np.random.default_rng(0).integers(0, 65535, (30, 40)).astype(np.uint16)
    png1, png3 = depth_images_for_eval(depth)
    import io

    from PIL import Image

    im1 = Image.open(io.BytesIO(png1))
    im3 = Image.open(io.BytesIO(png3))
    assert im1.size == (40, 30) and im1.mode == "L"
    assert im3.size == (40, 30) and im3.mode == "RGB"


def test_statistics_and_results_clis(tmp_path):
    """Standalone statistics + aggregator CLIs (reference's
    dataset_statistics scripts and get_all_results.py)."""
    import pandas as pd

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli.dataset_statistics import (
        main as stats_main,
    )
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.cli.get_all_results import (
        main as results_main,
    )

    stats_main(["--synthetic_data", "--root_data_dir", str(tmp_path / "d"),
                "--accuracy", "0.45", "--n", "200"])

    preds = tmp_path / "preds"
    preds.mkdir()
    pd.DataFrame({
        "Question_Id": [0, 1], "Questions": ["q0?", "q1?"],
        "Question_Type": ["Count", "Color"], "Answers": ["two", "red"],
        "Model_Answer": ["two", "blue"],
    }).to_csv(preds / "results_val_demo.csv", index=False)
    results_main(["--predictions_dir", str(preds)])
    assert (preds / "summary" / "results_summary.csv").exists()
    results_main(["--file", str(preds / "results_val_demo.csv"), "--bert"])
