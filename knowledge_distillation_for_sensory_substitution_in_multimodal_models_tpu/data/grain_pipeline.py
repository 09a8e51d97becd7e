"""Grain-backed input pipeline (optional alternative to ``loader.py``).

The BASELINE north star calls for a Grain/tf.data pipeline; Grain provides
deterministic shuffling, worker processes and checkpointable iterators.
This wraps :class:`..data.dataset.SUNRGBDVQADataset` (any map-style
(len/getitem) source works) and applies the collator as a batch transform.

Gated on the ``grain`` package; ``loader.OneVisionLoader`` remains the
dependency-free default.
"""

from __future__ import annotations

from typing import Iterator, Optional


def make_grain_loader(
    dataset,
    collator,
    batch_size: int = 1,
    accum: int = 1,
    shuffle: bool = False,
    seed: int = 0,
    num_epochs: Optional[int] = 1,
    read_threads: int = 4,
):
    """Returns an iterator of [A, B, ...] accumulation batches.

    Bucketing note: grain's static batch transform cannot group by emitted
    bucket, so this path pads every batch to the collator's LARGEST bucket
    (single compiled shape) — simpler and grain-native; the custom loader
    keeps per-bucket grouping.
    """
    import copy

    import grain.python as grain

    from .collate import add_accum_axis

    # Dedicated single-bucket collator copy: grain reads with multiple
    # threads, so the fixed bucket must not be patched onto shared state.
    fixed_collator = copy.copy(collator)
    fixed_collator.buckets = (max(collator.buckets),)

    def fixed(samples):
        return fixed_collator(list(samples))

    ds = grain.MapDataset.source(dataset)
    if shuffle:
        ds = ds.seed(seed).shuffle()
    if num_epochs is not None and num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size, drop_remainder=True, batch_fn=fixed)
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=read_threads, prefetch_buffer_size=2 * accum)
    )

    def batches() -> Iterator[dict]:
        group = []
        for micro in it:
            group.append(micro)
            if len(group) == accum:
                yield add_accum_axis(group)
                group = []

    return batches()
