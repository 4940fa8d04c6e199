"""Python UDTFs — the table-function extension point (SURVEY §2.10).

Third Python extension mechanism alongside ``mapInPandas``
(functions/multimodal.py) and ``applyInPandasWithState``
(streaming/stateful.py): a UDTF emits ZERO OR MORE rows per input row
and composes with LATERAL joins, the shape for custom parsers and
expanders that don't fit a 1:1 UDF.

Use sparingly: rows cross the JVM↔Python boundary (Arrow-batched here
via ``useArrow=True``, which amortizes but does not remove the cost).
When a built-in can express the expansion — e.g. this demo's sentence
split is exactly ``posexplode(split(text, '\\. '))`` — the built-in
stays in whole-stage codegen and wins; the UDTF exists for the cases
built-ins can't express (stateful tokenizers, format-specific parsers,
model-based segmenters).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx: int, sentence: string", useArrow=True)
class SplitSentences:
    """Emit one row per '. '-delimited sentence with its 0-based index
    (deliberately a literal, not regex, split: the demo's contract is
    the UDTF mechanism, and the literal split is replayable everywhere,
    including engines whose regex dialect lacks lookbehind)."""

    def eval(self, text: str):
        if text is None:
            return
        for i, s in enumerate(text.split(". ")):
            yield i, s


def register_all(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
