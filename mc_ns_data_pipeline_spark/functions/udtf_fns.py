"""Python UDTF surface (Spark 4 `@udtf`): table-generating functions.

API-surface parity only: a UDTF is the PYTHON SLOW PATH (row-at-a-time
eval in a Python worker). Every declared query keeps segmentation on
the JVM (split + posexplode — see x39/x50); this module exists because
a complete engine must also expose the escape hatch for logic that
genuinely cannot be expressed relationally, and the test suite pins
the UDTF's output equal to the built-in path so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="seg_idx int, segment string, n_chars int")
class SplitSegments:
    """Fixed-width word segmentation (3 words per segment, tail kept) —
    the same contract as x50's relational segmenter."""

    WORDS_PER_SEG = 3

    def eval(self, text: str):  # noqa: A002 - UDTF contract
        if text is None:
            return
        ws = " ".join(text.lower().strip().split()).split(" ")
        n = self.WORDS_PER_SEG
        for i in range(0, len(ws), n):
            seg = " ".join(ws[i:i + n])
            yield i // n, seg, len(seg)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL LATERAL use."""
    spark.udtf.register("split_segments", SplitSegments)
