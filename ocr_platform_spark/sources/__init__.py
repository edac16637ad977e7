"""Ingestion sources that land external corpora in the engine's
interleaved ``documents`` + ``media`` shape (BASELINE.json input_hint)."""
