"""Pixtral zero-shot evaluator (parity with
`evaluation/pixtral/evaluate_pixtral.py:105-198,240-330`).

The reference script is import-broken (it imports a nonexistent
``distillation.pixtral.PixtralModule``, `:15`, and its color-similarity
helper references an undefined global, `:153-160`); this is the working
rebuild of what it evidently intends: walk the val/test CSV on the RGB
stream, prompt ``<s>[INST] {q}.Answer in one word.Don't use the word
'based'.\\n[IMG][/INST]``, greedy-generate 32 tokens, extract the answer
(split on '.', last segment, lowercase, numbers->words), and write
``dataset/predictions/results_{gts}_pixtral.csv`` with the exact columns
Question_Id / Questions / Question_Type / Answers / Model_Answer.

Backends:
  * ``--backend hf --model_path <local snapshot>`` — the reference's
    mistral-community/pixtral-12b via transformers (needs local weights;
    exact parity path incl. the prompt and fp16 generate).
  * ``--backend student`` (default) — routes the same loop through the
    framework's OneVision student (eval/runner.py): the whole evaluator
    (dataset walk, prompt quirks, extraction, CSV, summary) runs and is
    tested offline; only the 12B weights themselves need a download.
"""

from __future__ import annotations

import argparse
import os
import tempfile

from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch_size", type=int, default=1,
                   help="reference flag (per-row loop; kept for parity)")
    p.add_argument("--subset_percentage", type=float, default=None)
    p.add_argument("--gts_type", type=str, default="val",
                   choices=["val", "test"])
    p.add_argument("--backend", type=str, default="student",
                   choices=["hf", "student"])
    p.add_argument("--model_path", type=str, default=None,
                   help="local Pixtral snapshot (--backend hf)")
    p.add_argument("--student_ckpt_dir", type=str, default=None)
    p.add_argument("--predictions_dir", type=str,
                   default="dataset/predictions")
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--root_data_dir", type=str, default=None)
    common.add_tpu_flags(p)
    return p


ADDITIONAL_INSTRUCTIONS = ".Answer in one word.Don't use the word 'based'."


def extract_answer(text: str) -> str:
    """Reference extraction (`evaluate_pixtral.py:137-150`): last
    '.'-separated segment, lowercased, digits -> words."""
    from ..utils.numwords import digits_to_words

    final = text.split(".")[-1].strip().lower()
    return digits_to_words(final).strip()


def make_hf_answer_fn(model_path: str, max_new_tokens: int):
    """The reference's generate path on a local Pixtral snapshot
    (`evaluate_pixtral.py:105-136`)."""
    import torch
    from PIL import Image
    from transformers import AutoProcessor, LlavaForConditionalGeneration

    processor = AutoProcessor.from_pretrained(model_path, local_files_only=True)
    model = LlavaForConditionalGeneration.from_pretrained(
        model_path, local_files_only=True,
        torch_dtype=torch.float16 if torch.cuda.is_available() else torch.float32,
    )
    if torch.cuda.is_available():
        model = model.to("cuda:0")
    model.eval()
    pad = (processor.tokenizer.pad_token_id
           if processor.tokenizer.pad_token_id is not None
           else processor.tokenizer.eos_token_id)

    def answer(image, question):
        prompt = f"<s>[INST]{question}{ADDITIONAL_INSTRUCTIONS}\n[IMG][/INST]"
        inputs = processor(images=Image.fromarray(image), text=prompt,
                           return_tensors="pt").to(model.device)
        with torch.no_grad():
            out = model.generate(**inputs, max_new_tokens=max_new_tokens,
                                 pad_token_id=pad)
        return processor.decode(out[0], skip_special_tokens=True)

    return answer


def main(argv=None):
    args = build_parser().parse_args(argv)
    common.load_env()
    common.setup_platform(args)

    import pandas as pd

    from ..data.dataset import SUNRGBDVQADataset
    from ..eval.results import update_summary

    root = args.root_data_dir or os.environ.get("ROOT_DATA_DIR")
    if args.synthetic_data:
        root = common.ensure_synthetic_dataset(
            root or tempfile.mkdtemp(prefix="kdss_synth_")
        )
    if not root:
        raise SystemExit("set ROOT_DATA_DIR or pass --root_data_dir / --synthetic_data")

    if args.backend == "hf":
        if not args.model_path:
            raise SystemExit("--backend hf needs --model_path (local snapshot)")
        answer_fn = make_hf_answer_fn(args.model_path, args.max_new_tokens)
    else:
        from ..eval.runner import load_student_for_eval

        tiny = common.is_tiny(args)
        answer_fn = load_student_for_eval(
            args.student_ckpt_dir, args.tokenizer_path,
            tiny=tiny, cpu=args.cpu, max_new_tokens=args.max_new_tokens,
        )

    ds = SUNRGBDVQADataset(
        root, f"{args.gts_type}_dataset.csv", args.subset_percentage
    )
    df = ds.df

    rows = []
    errors = 0
    for i in range(len(ds)):
        try:  # reference error tolerance (`evaluate_pixtral.py:326-328`)
            question, gt, rgb, _depth, _ = ds[i]
            raw = answer_fn(rgb, question + ADDITIONAL_INSTRUCTIONS)
            rows.append({
                "Question_Id": int(df.iloc[i]["Question_Id"])
                if "Question_Id" in df.columns else i,
                "Questions": question,
                "Question_Type": df.iloc[i].get("Question_Type", ""),
                "Answers": gt,
                "Model_Answer": extract_answer(raw),
            })
        except Exception:
            errors += 1
            continue
        if i % 25 == 0:
            print(f"evaluated {i + 1}/{len(ds)}", flush=True)

    os.makedirs(args.predictions_dir, exist_ok=True)
    out_path = os.path.join(
        args.predictions_dir, f"results_{args.gts_type}_pixtral.csv"
    )
    pd.DataFrame(rows).to_csv(out_path, index=False)
    print(f"Results saved to: {out_path} ({errors} errors)")

    summary = update_summary(args.predictions_dir)
    print("summary:", summary.tail(1).to_dict("records"))


if __name__ == "__main__":
    main()
