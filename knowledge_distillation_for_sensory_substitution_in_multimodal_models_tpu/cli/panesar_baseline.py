"""Panesar VGG16+LSTM baseline trainer/evaluator (reference
`further_scripts/Panesar_Recreation/panesar_model_baseline_{train,eval}.py`).

Differences from the reference, by necessity/offline design:
* trains on the local SUNRGBD CSVs instead of the HF-hub dataset
  (`panesar_model_baseline_train.py:214-216` pulls `shayekh00/VQA_SUNRGBD_v2`,
  unavailable offline) — same columns, same QA task;
* Adadelta + early stopping kept (`:203-341`); the Optuna Bayesian lr
  search is implemented with the reference's semantics (log-uniform lr in
  [1e-4, 2.0], per-epoch report/prune, direction=minimize) behind
  ``--optuna_trials N``; like the reference it requires the optuna
  package (ImportError is loud, not silently skipped);
* question/answer vocabularies are frozen to JSON exactly like the eval
  script expects (`panesar_model_baseline_eval.py:44-108`).

Smoke:
  python -m ...cli.panesar_baseline train --synthetic_data --cpu \
      --epochs 1 --max_items 6
  python -m ...cli.panesar_baseline eval --synthetic_data --cpu --max_items 6
"""

from __future__ import annotations

import argparse
import json
import os
import re
import tempfile

import numpy as np

from . import common

IMG_SIZE = 224


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("mode", choices=["train", "eval"])
    p.add_argument("--root_data_dir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1.0)  # Adadelta default
    p.add_argument("--fusion", type=str, default="conv1d",
                   choices=["hadamard", "addition", "maxpool", "conv1d",
                            "fusion_at_start"])
    p.add_argument("--early_stop_patience", type=int, default=3)
    p.add_argument("--vocab_dir", type=str, default="panesar_vocab")
    p.add_argument("--ckpt", type=str, default="checkpoints/panesar")
    p.add_argument("--max_items", type=int, default=None)
    p.add_argument("--img_size", type=int, default=IMG_SIZE,
                   help="input resolution (VGG16 trunk is size-agnostic "
                   "before the flatten; torchvision classifier weights "
                   "only line up at 224 — smaller sizes are for offline "
                   "smoke/CI, e.g. the Optuna-search test)")
    p.add_argument("--optuna_trials", type=int, default=0,
                   help="Bayesian lr search when optuna is installed")
    common.add_tpu_flags(p)
    return p


def _tokenize_q(q: str):
    return re.findall(r"[a-z0-9']+", str(q).lower())


def build_vocabs(ds, vocab_dir: str):
    """Frozen question-word and answer-class vocabularies -> JSON."""
    qwords, answers = {"<pad>": 0, "<unk>": 1}, {}
    for i in range(len(ds)):
        q, a = ds.df.iloc[i, 1], str(ds.df.iloc[i, 2]).strip().lower()
        for w in _tokenize_q(q):
            qwords.setdefault(w, len(qwords))
        answers.setdefault(a, len(answers))
    os.makedirs(vocab_dir, exist_ok=True)
    json.dump(qwords, open(os.path.join(vocab_dir, "question_vocab.json"), "w"))
    json.dump(answers, open(os.path.join(vocab_dir, "answer_vocab.json"), "w"))
    return qwords, answers


def load_vocabs(vocab_dir: str):
    qwords = json.load(open(os.path.join(vocab_dir, "question_vocab.json")))
    answers = json.load(open(os.path.join(vocab_dir, "answer_vocab.json")))
    return qwords, answers


def encode_batch(ds, idxs, qwords, answers, seq_len=16, img_size=IMG_SIZE):
    from PIL import Image

    b = len(idxs)
    rgb = np.zeros((b, img_size, img_size, 3), np.float32)
    depth = np.zeros((b, img_size, img_size, 3), np.float32)
    qids = np.zeros((b, seq_len), np.int32)
    ys = np.zeros((b,), np.int32)
    valid = np.ones((b,), bool)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    for j, i in enumerate(idxs):
        q, a, rgb_np, depth3, _ = ds[i]
        for arr, out in ((rgb_np, rgb), (depth3, depth)):
            im = Image.fromarray(arr).resize((img_size, img_size), Image.BILINEAR)
            out[j] = (np.asarray(im, np.float32) / 255.0 - mean) / std
        toks = _tokenize_q(q)[:seq_len]
        qids[j, : len(toks)] = [qwords.get(w, 1) for w in toks]
        key = str(a).strip().lower()
        if key in answers:
            ys[j] = answers[key]
        else:
            valid[j] = False
    return rgb, depth, qids, ys, valid


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.load_env()
    common.setup_platform(args)

    import jax
    import jax.numpy as jnp
    import optax

    from ..data.dataset import SUNRGBDVQADataset
    from ..models.panesar import PanesarVQAModel

    root = args.root_data_dir or os.environ.get("ROOT_DATA_DIR")
    if args.synthetic_data:
        root = common.ensure_synthetic_dataset(root or tempfile.mkdtemp(prefix="kdss_synth_"))
    train_ds = SUNRGBDVQADataset(root, "train_dataset.csv")
    val_ds = SUNRGBDVQADataset(root, "val_dataset.csv")
    n_train = min(len(train_ds), args.max_items or len(train_ds))
    n_val = min(len(val_ds), args.max_items or len(val_ds))

    if args.mode == "train":
        qwords, answers = build_vocabs(train_ds, args.vocab_dir)
    else:
        qwords, answers = load_vocabs(args.vocab_dir)
    model = PanesarVQAModel(
        vocab_size=max(len(qwords), 2), num_classes=max(len(answers), 2),
        fusion_method=args.fusion,
    )

    rng = jax.random.PRNGKey(args.seed)
    rgb0, depth0, q0, _, _ = encode_batch(train_ds, [0], qwords, answers,
                                          img_size=args.img_size)
    params = model.init(rng, jnp.asarray(rgb0), jnp.asarray(depth0), jnp.asarray(q0))["params"]

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckpt_path = os.path.abspath(args.ckpt)

    if args.mode == "eval":
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), {"params": params}
        )
        params = ckptr.restore(ckpt_path, abstract)["params"]
        correct = total = 0
        fwd = jax.jit(lambda p, r, d, q: model.apply({"params": p}, r, d, q))
        for start in range(0, n_val, args.batch_size):
            idxs = range(start, min(start + args.batch_size, n_val))
            rgb, depth, qids, ys, valid = encode_batch(
                val_ds, idxs, qwords, answers, img_size=args.img_size)
            logits = np.asarray(fwd(params, jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(qids)))
            pred = logits.argmax(-1)
            correct += int(((pred == ys) & valid).sum())
            total += int(valid.sum())
        acc = correct / max(total, 1)
        print(f"panesar eval accuracy: {acc:.4f} ({correct}/{total})")
        return

    # ---- train (Adadelta + early stopping; optional Optuna lr search,
    # reference `panesar_model_baseline_train.py:203-341`) ----
    # The learning rate rides INSIDE the optimizer state
    # (optax.inject_hyperparams), so every Optuna trial reuses ONE
    # compiled train step instead of re-jitting the VGG16 fwd+bwd per lr
    # (a multi-minute compile per trial on CPU).  Ragged tail batches are
    # padded to --batch_size with zeroed validity for the same reason.
    tx = optax.inject_hyperparams(optax.adadelta)(learning_rate=args.lr)

    @jax.jit
    def step(params, opt_state, rgb, depth, qids, ys, valid):
        def loss_fn(p):
            logits = model.apply({"params": p}, rgb, depth, qids,
                                 deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, ys)
            return (ce * valid).sum() / jnp.maximum(valid.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def val_loss_fn(params, rgb, depth, qids, ys, valid):
        logits = model.apply({"params": params}, rgb, depth, qids)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, ys)
        return (ce * valid).sum(), valid.sum()

    def padded_batches(n, order=None):
        for start in range(0, n, args.batch_size):
            idxs = list(
                (order[start:start + args.batch_size]) if order is not None
                else range(start, min(start + args.batch_size, n))
            )
            pad = args.batch_size - len(idxs)
            yield list(idxs) + [idxs[-1]] * pad, pad

    def run_training(lr, epochs, seed=0, save_to=None, trial=None):
        """One Adadelta training run; returns the best val loss.

        ``trial``: an optuna trial — per-epoch ``report`` + ``should_prune``
        mirror the reference's pruning hook
        (`panesar_model_baseline_train.py:307-311`).
        """
        params = model.init(
            jax.random.PRNGKey(seed), jnp.asarray(rgb0), jnp.asarray(depth0),
            jnp.asarray(q0),
        )["params"]
        opt_state = tx.init(params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, jnp.float32)

        best_val, patience = float("inf"), 0
        loss = jnp.zeros(())
        for epoch in range(epochs):
            order = np.random.default_rng(epoch).permutation(n_train)
            for idxs, pad in padded_batches(n_train, order):
                rgb, depth, qids, ys, valid = encode_batch(
                    train_ds, idxs, qwords, answers, img_size=args.img_size)
                if pad:
                    valid = valid.copy()
                    valid[len(valid) - pad:] = 0
                params, opt_state, loss = step(
                    params, opt_state, jnp.asarray(rgb), jnp.asarray(depth),
                    jnp.asarray(qids), jnp.asarray(ys), jnp.asarray(valid),
                )
            num = den = 0.0
            for idxs, pad in padded_batches(n_val):
                rgb, depth, qids, ys, valid = encode_batch(
                    val_ds, idxs, qwords, answers, img_size=args.img_size)
                if pad:
                    valid = valid.copy()
                    valid[len(valid) - pad:] = 0
                s, c = val_loss_fn(
                    params, jnp.asarray(rgb), jnp.asarray(depth),
                    jnp.asarray(qids), jnp.asarray(ys), jnp.asarray(valid))
                num += float(s); den += float(c)
            val_loss = num / max(den, 1.0)
            print(f"epoch {epoch} train_loss {float(loss):.4f} "
                  f"val_loss {val_loss:.4f}")
            if trial is not None:
                import optuna

                trial.report(val_loss, epoch)
                if trial.should_prune():
                    raise optuna.exceptions.TrialPruned()
            if val_loss < best_val - 1e-4:
                best_val, patience = val_loss, 0
                if save_to is not None:
                    import shutil

                    shutil.rmtree(save_to, ignore_errors=True)
                    ckptr.save(save_to, {"params": params})
                    ckptr.wait_until_finished()
            else:
                patience += 1
                if patience >= args.early_stop_patience:
                    print("early stopping")
                    break
        return best_val

    lr = args.lr
    if args.optuna_trials > 0:
        # Bayesian lr search, reference semantics: log-uniform lr in
        # [1e-4, 2.0] (`panesar_model_baseline_train.py:238`), objective =
        # best CrossEntropy val loss, direction=minimize (`:325-327`).
        import optuna

        def objective(trial):
            lr_t = trial.suggest_float("lr", 1e-4, 2.0, log=True)
            return run_training(
                lr_t, epochs=args.epochs, seed=trial.number, trial=trial)

        study = optuna.create_study(direction="minimize")
        print(f"Starting Bayesian Optimization with {args.optuna_trials} "
              "trials... Target: CrossEntropy Val Loss")
        study.optimize(objective, n_trials=args.optuna_trials)
        lr = study.best_params["lr"]
        print(f"optuna best lr: {lr:.6g} "
              f"(best val loss {study.best_value:.4f})")

    best = run_training(lr, args.epochs, seed=args.seed, save_to=ckpt_path)
    print(f"panesar training complete (best val loss {best:.4f})")


if __name__ == "__main__":
    main()
