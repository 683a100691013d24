"""String expression helpers mirroring the reference's per-record Python
string munging (SURVEY.md section 2.3 P3-P6), as pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def topic_safe_name(col: Column | str) -> Column:
    """Normalize a human station name into a kafka-topic-safe token.

    Reference semantics (producers/models/station.py:22-28): lower-case,
    ``/`` -> ``_and_``, spaces and dashes -> ``_``, apostrophes stripped.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    c = F.regexp_replace(c, "/", "_and_")
    c = F.regexp_replace(c, " ", "_")
    c = F.regexp_replace(c, "-", "_")
    c = F.regexp_replace(c, "'", "")
    return c


def display_status(col: Column | str) -> Column:
    """``train_status.replace('_', ' ')`` (consumers/models/station.py:35)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "_", " ")


def train_id(color: Column | str, number: Column | str) -> Column:
    """Format a train id like ``BL037`` (producers/models/line.py:55-57):
    first letter of the line color upper-cased + 'L' + zero-padded number.
    """
    color_c = F.col(color) if isinstance(color, str) else color
    num_c = F.col(number) if isinstance(number, str) else number
    return F.concat(
        F.upper(F.substring(color_c, 1, 1)),
        F.lit("L"),
        F.lpad(num_c.cast("string"), 3, "0"),
    )
