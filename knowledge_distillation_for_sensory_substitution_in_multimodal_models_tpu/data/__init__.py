"""Data layer: SUNRGBD CSV ingest, depth->3ch Prewitt encoding, anyres image
processing, chat templating/tokenization, static-shape collation and the
host->device input pipeline."""
