"""Unit tests for KD losses vs independent torch implementations of the same
formulas (torch is CPU-only here and used purely as a numerical oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.losses import (
    masked_cross_entropy,
    feature_mse_loss,
    kd_kl_loss,
    loca_loss,
    loca_calibrated_probs,
    ntxent_loss,
    ofa_loss,
    pool_and_normalize,
    vision_phase1_loss,
)

B, S, V_S, V_T = 2, 7, 64, 80
T = 0.8


@pytest.fixture(scope="module")
def tensors():
    rng = np.random.default_rng(0)
    student = rng.normal(size=(B, S, V_S)).astype(np.float32) * 2.0
    teacher = rng.normal(size=(B, S, V_T)).astype(np.float32) * 2.0
    labels = rng.integers(0, V_S, size=(B, S)).astype(np.int32)
    labels[0, 0] = -100
    return student, teacher, labels


def test_masked_ce(tensors):
    student, _, labels = tensors
    got = float(masked_cross_entropy(student, labels))
    s = torch.tensor(student)
    l = torch.tensor(labels, dtype=torch.long)
    expected = F.cross_entropy(
        s[:, :-1].reshape(-1, V_S), l[:, 1:].reshape(-1), ignore_index=-100
    ).item()
    assert abs(got - expected) < 1e-5


def test_kd_kl_loss(tensors):
    student, teacher, _ = tensors
    got = float(kd_kl_loss(student, teacher, T))
    s = torch.tensor(student)
    t = torch.tensor(teacher)[:, :, :V_S]
    expected = (
        F.kl_div(
            F.log_softmax(s / T, dim=-1),
            F.softmax(t / T, dim=-1),
            reduction="mean",
        )
        * T**2
    ).item()
    assert abs(got - expected) < 1e-6


def _torch_loca_faithful(teacher, student, labels, temperature, alpha):
    """Torch oracle replicating the reference's fancy-indexing LoCa."""
    t = torch.tensor(teacher)[:, :, :student.shape[-1]]
    s = torch.tensor(student)
    lab = torch.tensor(np.where(labels < 0, 0, labels), dtype=torch.long)

    teacher_probs = F.softmax(t / temperature, dim=-1)
    student_probs = torch.clamp(F.softmax(s / temperature, dim=-1), min=1e-8)

    target_probs_teacher = teacher_probs.gather(2, lab.unsqueeze(-1)).squeeze(-1)
    _, top2 = teacher_probs.topk(2, dim=-1)
    klogits = top2[:, :, 1]
    non_target = teacher_probs.gather(2, klogits.unsqueeze(-1)).squeeze(-1)
    sigma = 1 / (1 - target_probs_teacher + non_target)
    sc = alpha * sigma
    loca = teacher_probs.clone()
    loca[:, :, lab] = 1 - sc * (teacher_probs.sum(dim=-1) - target_probs_teacher)
    loca[:, :, klogits] = sc * non_target
    out = F.kl_div(student_probs.log(), loca, reduction="mean") * temperature**2
    return out.item()


def test_loca_faithful_matches_torch_fancy_indexing(tensors):
    student, teacher, labels = tensors
    got = float(loca_loss(teacher, student, labels, T, alpha=0.8, faithful_indexing=True))
    expected = _torch_loca_faithful(teacher, student, labels, T, 0.8)
    assert abs(got - expected) < 1e-5


def test_loca_correct_sums_to_one(tensors):
    student, teacher, labels = tensors
    import jax.nn
    import jax.numpy as jnp

    p_t = jax.nn.softmax(jnp.asarray(teacher[:, :, :V_S]) / T, axis=-1)
    cal = loca_calibrated_probs(p_t, jnp.asarray(labels), alpha=0.8)
    sums = np.asarray(cal.sum(-1))
    valid = labels >= 0
    # Valid positions: calibrated distribution sums to ~1
    np.testing.assert_allclose(sums[valid], 1.0, atol=1e-4)
    # Ignored positions untouched
    np.testing.assert_allclose(
        np.asarray(cal)[~valid], np.asarray(p_t)[~valid], atol=1e-7
    )


def test_loca_loss_finite_and_positive(tensors):
    student, teacher, labels = tensors
    val = float(loca_loss(teacher, student, labels, T))
    assert np.isfinite(val)


def test_ntxent_matches_torch():
    rng = np.random.default_rng(1)
    s = rng.normal(size=(4, 16)).astype(np.float32)
    t = rng.normal(size=(4, 16)).astype(np.float32)
    got = float(ntxent_loss(s, t, 0.07))
    st = F.normalize(torch.tensor(s), p=2, dim=-1)
    tt = F.normalize(torch.tensor(t), p=2, dim=-1)
    logits = st @ tt.T / 0.07
    expected = F.cross_entropy(logits, torch.arange(4)).item()
    assert abs(got - expected) < 1e-5


def test_ntxent_zero_at_batch_one():
    """SURVEY.md §2.5 #2: NT-Xent over a 1x1 sim matrix is exactly 0."""
    rng = np.random.default_rng(2)
    s = rng.normal(size=(1, 16)).astype(np.float32)
    t = rng.normal(size=(1, 16)).astype(np.float32)
    assert float(ntxent_loss(s, t)) == 0.0


def test_ofa_matches_torch(tensors):
    student, teacher, _ = tensors
    got = float(ofa_loss(teacher[:, :, :V_S], student, T, gamma=2.0))
    t = torch.tensor(teacher)[:, :, :V_S]
    s = torch.tensor(student)
    soft_t = F.softmax(t / T, dim=-1)
    log_s = F.log_softmax(s / T, dim=-1)
    pt = soft_t.max(dim=-1, keepdim=True)[0]
    expected = (-(1 + pt).pow(2.0) * log_s).mean().item()
    assert abs(got - expected) < 1e-5


def test_feature_mse_matches_torch():
    """Eval-side module's mse_loss (`evaluation/onevisionv3/
    OnlineKnowledgeDistillationLLavaOneVision.py:160-166`): upcast to f32,
    plain mean of squared differences."""
    rng = np.random.default_rng(4)
    fs = rng.normal(size=(B, 1152)).astype(np.float16)
    ft = rng.normal(size=(B, 1152)).astype(np.float16)
    got = float(feature_mse_loss(fs.astype(np.float32), ft.astype(np.float32)))
    expected = torch.mean(
        (torch.tensor(fs).float() - torch.tensor(ft).float()) ** 2
    ).item()
    assert abs(got - expected) < 1e-6


def test_vision_phase1_composition(tensors):
    student, teacher, _ = tensors
    rng = np.random.default_rng(3)
    fs = pool_and_normalize(rng.normal(size=(B, 9, 32)).astype(np.float32))
    ft = pool_and_normalize(rng.normal(size=(B, 9, 32)).astype(np.float32))
    total = float(
        vision_phase1_loss(student, teacher, fs, ft, T, 0.1, 0.5, 0.07)
    )
    kl = float(kd_kl_loss(student, teacher, T))
    con = float(ntxent_loss(fs, ft, 0.07))
    assert abs(total - (0.1 * kl + 0.5 * con)) < 1e-6
