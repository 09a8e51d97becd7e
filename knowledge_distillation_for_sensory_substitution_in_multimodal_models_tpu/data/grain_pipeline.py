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

    Bucketing: each grain-side micro-batch is collated with the normal
    per-batch bucket pick (longest sample -> smallest covering bucket),
    then micro-batches are grouped by their emitted bucket before stacking
    the accumulation axis — same shape discipline as
    ``loader.OneVisionLoader`` (one compiled program per bucket, no
    pad-to-largest throughput cliff).
    """
    import grain.python as grain

    from .collate import add_accum_axis

    def collate(samples):
        return collator(list(samples))

    ds = grain.MapDataset.source(dataset)
    if shuffle:
        ds = ds.seed(seed).shuffle()
    if num_epochs is not None and num_epochs > 1:
        ds = ds.repeat(num_epochs)
    ds = ds.batch(batch_size, drop_remainder=True, batch_fn=collate)
    it = ds.to_iter_dataset(
        grain.ReadOptions(num_threads=read_threads, prefetch_buffer_size=2 * accum)
    )

    def batches() -> Iterator[dict]:
        pending: dict = {}
        for micro in it:
            bucket = micro["student_input_ids"].shape[1]
            pending.setdefault(bucket, []).append(micro)
            if len(pending[bucket]) == accum:
                yield add_accum_axis(pending.pop(bucket))
        # flush leftovers (partial accumulation groups), largest first
        for bucket in sorted(pending, reverse=True):
            group = pending[bucket]
            while len(group) < accum:  # repeat-pad to the static A axis
                group.append(group[-1])
            yield add_accum_axis(group)

    return batches()
