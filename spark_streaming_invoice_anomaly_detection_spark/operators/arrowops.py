"""Arrow-native batch operators (``DataFrame.mapInArrow``).

``mapInArrow`` is the lowest-overhead Python boundary Spark offers: record
batches cross the JVM<->Python hop as Arrow buffers and stay Arrow on the
Python side — no pandas materialization, no per-value boxing. The right
surface when the per-batch work is itself expressible in vectorized
``pyarrow.compute`` kernels (C++ under the hood): the Python interpreter
touches only batch metadata, so throughput tracks Arrow kernel speed, not
Python speed. (The pandas surfaces — mapInPandas/applyInPandas — remain
the right choice when the logic needs numpy/pandas semantics.)

Functions passed to mapInArrow are defined inside the builders so
cloudpickle serializes them by value — executors in the grading driver do
not have this package importable (see operators/cogroup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def text_stats_arrow(docs: DataFrame) -> DataFrame:
    """Per-doc text stats (utf8 length, ascii-lowercase-word count) computed
    entirely in pyarrow.compute kernels — zero pandas, zero per-row Python.

    Input needs (doc_id, text, source); output one row per doc:
    (doc_id, source, n_chars_utf8, n_words).
    """

    def batch_stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            n_chars = pc.utf8_length(text)
            # count_substring over a regex: word = run of alnum characters
            n_words = pc.count_substring_regex(text, "[a-zA-Z0-9]+")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("source"),
                    pc.cast(n_chars, pa.int64()),
                    pc.cast(n_words, pa.int64()),
                ],
                names=["doc_id", "source", "n_chars_utf8", "n_words"],
            )

    return docs.select("doc_id", "text", "source").mapInArrow(
        batch_stats,
        schema="doc_id long, source string, n_chars_utf8 long, n_words long",
    )
