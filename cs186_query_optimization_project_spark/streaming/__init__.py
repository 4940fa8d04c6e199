"""Structured Streaming operators over the ``events`` stream (SURVEY.md
§2.9 — absent in the batch-only reference; designed per the driver's
north star): watermarked tumbling/sliding/session windows, streaming
dedup, and custom stateful processing via ``applyInPandasWithState``.

Every transformation here is source-agnostic: it takes a (possibly
streaming) DataFrame and returns one, so the same code runs on
``readStream`` in production and on a batch DataFrame in tests — the
recommended way to unit-test Structured Streaming logic."""
