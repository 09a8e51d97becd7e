"""Panesar VGG16+LSTM VQA baseline: converter parity vs a torch VGG16
replica, fusion modes, and a train step."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp
import optax

from knowledge_distillation_for_sensory_substitution_in_multimodal_models_tpu.models.panesar import (

    ImageEncoder,
    PanesarVQAModel,
    VGG16_CFG,
    convert_vgg16_state_dict,
)

pytestmark = pytest.mark.slow


def _torch_vgg16_encoder():
    """torchvision-layout VGG16 features + avgpool + classifier[:-1]."""
    layers = []
    in_ch = 3
    for v in VGG16_CFG:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers.append(tnn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(tnn.ReLU(inplace=True))
            in_ch = v
    features = tnn.Sequential(*layers)
    classifier = tnn.Sequential(
        tnn.Linear(25088, 4096), tnn.ReLU(True), tnn.Dropout(0.5),
        tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(0.5),
    )

    class Enc(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = features
            self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
            self.classifier = classifier

        def forward(self, x):
            x = self.features(x)
            x = self.avgpool(x)
            x = torch.flatten(x, 1)
            return self.classifier(x)

    return Enc()


def test_image_encoder_parity_with_torch():
    torch.manual_seed(0)
    enc = _torch_vgg16_encoder().eval()
    x = np.random.default_rng(0).normal(size=(1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    model = ImageEncoder()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = convert_vgg16_state_dict(
        {k: v for k, v in enc.state_dict().items()}, params
    )
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize(
    "fusion", ["hadamard", "addition", "maxpool", "conv1d", "fusion_at_start"]
)
def test_fusion_modes_and_train_step(fusion):
    model = PanesarVQAModel(
        vocab_size=50, num_classes=10, embed_size=8, hidden_size=8,
        fusion_method=fusion,
    )
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    q = jnp.asarray(rng.integers(1, 50, size=(2, 6)).astype(np.int32))
    y = jnp.asarray([1, 3])
    params = model.init(jax.random.PRNGKey(0), img, img, q)["params"]
    logits = model.apply({"params": params}, img, img, q)
    assert logits.shape == (2, 10)

    tx = optax.adadelta(1.0)  # reference trains with Adadelta
    opt_state = tx.init(params)

    def loss_fn(p):
        lg = model.apply({"params": p}, img, img, q)
        return optax.softmax_cross_entropy_with_integer_labels(lg, y).mean()

    l0 = float(loss_fn(params))
    g = jax.grad(loss_fn)(params)
    updates, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params))
    assert np.isfinite(l0) and np.isfinite(l1)
