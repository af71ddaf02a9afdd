"""Python UDTF surface (Spark 4 `@udtf`): table-generating functions.

API-surface parity only: a UDTF is the PYTHON SLOW PATH (row-at-a-time
eval in a Python worker). Every declared query keeps segmentation on
the JVM (split + posexplode — see x39/x50); this module exists because
a complete engine must also expose the escape hatch for logic that
genuinely cannot be expressed relationally, and the test suite pins
the UDTF's output equal to the built-in path so the two can't drift.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# norm_text's EXACT Java semantics, not Python's: Spark `trim` strips
# only the space character, and Java regex \s is ASCII-only
# ([ \t\n\x0B\f\r]), while Python str.strip()/str.split() treat Unicode
# whitespace (e.g.  ) as separators — on non-ASCII whitespace the
# two segmenters would silently produce different segments.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


@udtf(returnType="seg_idx int, segment string, n_chars int")
class SplitSegments:
    """Fixed-width word segmentation (3 words per segment, tail kept) —
    the same contract as x50's relational segmenter over
    `norm_text` + split(' ')."""

    WORDS_PER_SEG = 3

    def eval(self, text: str):  # noqa: A002 - UDTF contract
        if text is None:
            return
        ws = _JAVA_WS.sub(" ", text.strip(" ").lower()).split(" ")
        n = self.WORDS_PER_SEG
        for i in range(0, len(ws), n):
            seg = " ".join(ws[i:i + n])
            yield i // n, seg, len(seg)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL LATERAL use."""
    spark.udtf.register("split_segments", SplitSegments)
