"""Answer text post-processing (`dataset/dataset_creation/post_process.py`).

Pipeline parity (`process_text_only`, `post_process.py:43-67`):
1. split concatenated words via ``combined_words_mapping.csv``;
2. numbers -> words;
3. strip trailing digits from words;
4. spell-correct (TextBlob word-level, then an HF text2text model) —
   **gated**: neither package/model is available offline, so these steps
   are skipped unless the caller installs them (``enable_spellcheck``);
5. lowercase.

A built-in default mapping covers the common SUNRGBD concatenations; pass
``mapping_csv`` to use the dataset's own file when present.
"""

from __future__ import annotations

import functools
import re
from typing import Dict, Optional

import pandas as pd

from ...utils.numwords import num2words

# Most frequent concatenations in SUNRGBD annotations (subset of the
# reference's combined_words_mapping.csv, which is not committed there).
DEFAULT_COMBINED_WORDS: Dict[str, str] = {
    "nightstand": "night stand",
    "garbagebin": "garbage bin",
    "sidetable": "side table",
    "coffeetable": "coffee table",
    "endtable": "end table",
    "diningtable": "dining table",
    "bookshelf": "book shelf",
    "whiteboard": "white board",
    "bulletinboard": "bulletin board",
    "paperbox": "paper box",
}


def load_combined_words(mapping_csv: Optional[str] = None) -> Dict[str, str]:
    if mapping_csv:
        df = pd.read_csv(mapping_csv)
        return df.set_index("Combined Word").to_dict()["Separated Word"]
    return dict(DEFAULT_COMBINED_WORDS)


@functools.lru_cache(maxsize=1)
def _spell_fixers():
    """(textblob_correct, hf_pipeline) or (None, None) when unavailable."""
    tb = hf = None
    try:
        from textblob import Word

        tb = Word
    except Exception:
        pass
    try:
        import torch
        from transformers import pipeline

        hf = pipeline(
            "text2text-generation",
            model="oliverguhr/spelling-correction-english-base",
            device=0 if torch.cuda.is_available() else -1,
        )
    except Exception:
        pass
    return tb, hf


def process_text_only(
    text: Optional[str],
    combined_words: Optional[Dict[str, str]] = None,
    enable_spellcheck: bool = True,
) -> str:
    text = str(text) if text is not None else ""
    combined = combined_words or DEFAULT_COMBINED_WORDS

    for joined, fixed in combined.items():
        text = re.sub(rf"\b{joined}\b", fixed, text, flags=re.IGNORECASE)
    text = re.sub(r"\b\d+\b", lambda m: num2words(int(m.group())), text)
    text = re.sub(r"\b(\w+?)(\d+)\b", r"\1", text)

    if enable_spellcheck:
        tb, hf = _spell_fixers()
        if tb is not None:
            text = " ".join(str(tb(w).correct()) for w in text.split())
        if hf is not None:
            text = hf(text, max_length=20)[0]["generated_text"].rstrip(".")

    return text.lower()


def process_answers_column(
    df: pd.DataFrame,
    combined_words: Optional[Dict[str, str]] = None,
) -> pd.DataFrame:
    """`post_process.py:15-38` (column variant — no spellcheck there)."""
    combined = combined_words or DEFAULT_COMBINED_WORDS

    def process(text):
        text = str(text) if text is not None else ""
        for joined, fixed in combined.items():
            text = re.sub(rf"\b{joined}\b", fixed, text, flags=re.IGNORECASE)
        text = re.sub(r"\b\d+\b", lambda m: num2words(int(m.group())), text)
        text = re.sub(r"\b(\w+?)(\d+)\b", r"\1", text)
        return text.lower()

    df["Answers"] = df["Answers"].apply(process)
    return df


def clean_and_dedupe(values) -> list:
    """`dataset/utils.py:58-76`-style cleanup of the unique-items list."""
    out = []
    seen = set()
    for v in values:
        if v is None or (isinstance(v, float) and v != v):
            continue
        s = str(v).strip().lower()
        if s and s not in seen:
            seen.add(s)
            out.append(s)
    return out
